"""Streaming ingest: incremental file pickup, batch parity, idempotent resume."""

from __future__ import annotations

import pandas as pd

from ocr_spark.corpus import generate_docs_pandas
from ocr_spark.operators.extract import extract_docs
from ocr_spark.schema import DOC_SCHEMA
from ocr_spark.storage import Catalog
from ocr_spark.streaming.ingest import stream_extract


def _spans_key(rows):
    return sorted(
        (r.doc_id, tuple((s.kind, s.text, s.media_ref, s.offset) for s in r.spans))
        for r in rows
    )


def _write_part(spark, pdf: pd.DataFrame, out_dir: str) -> None:
    spark.createDataFrame(pdf, DOC_SCHEMA).coalesce(2).write.mode("append").parquet(out_dir)


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    input_dir = str(tmp_path / "incoming")
    catalog = Catalog(spark, str(tmp_path / "catalog"))

    all_docs = generate_docs_pandas(30, seed=7, heavy_pct=0.0)
    part1, part2 = all_docs.iloc[:18], all_docs.iloc[18:]

    # round 1: only part1 visible
    _write_part(spark, part1, input_dir)
    stream_extract(spark, input_dir, catalog, max_files_per_trigger=1)
    got1 = catalog.read("extracted_stream").collect()
    want1 = extract_docs(spark.createDataFrame(part1, DOC_SCHEMA)).collect()
    assert _spans_key(got1) == _spans_key(want1)

    # round 2: part2 lands; rerun with same checkpoint → only new files read,
    # final table equals the full batch result with no duplicates
    _write_part(spark, part2, input_dir)
    stream_extract(spark, input_dir, catalog, max_files_per_trigger=1)
    got2 = catalog.read("extracted_stream").collect()
    want_all = extract_docs(spark.createDataFrame(all_docs, DOC_SCHEMA)).collect()
    assert len(got2) == 30
    assert _spans_key(got2) == _spans_key(want_all)

    # round 3: no new files → no-op (idempotent re-run)
    stream_extract(spark, input_dir, catalog, max_files_per_trigger=1)
    got3 = catalog.read("extracted_stream").collect()
    assert _spans_key(got3) == _spans_key(got2)


def test_stream_curation_incremental(spark, tmp_path):
    """The streaming stage generalizes to curation: text docs landing in a
    directory flow through gopher_quality -> PII redaction -> MERGE, with
    the same incremental pickup and idempotent re-run guarantees."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.curation import gopher_quality, redact_pii

    def curate(df):
        kept = (
            gopher_quality(df, min_words=5, min_stopwords=0, carry_text=True)
            .filter(F.col("keep"))
            .select("doc_id", "text")
        )
        return kept.withColumn("text", redact_pii("text"))

    good = "the quick brown fox jumps over the lazy dog with mail to a@b.com"
    rows1 = [(1, good), (2, "too short")]
    rows2 = [(3, good + " and more words follow here")]
    input_dir = str(tmp_path / "incoming")
    catalog = Catalog(spark, str(tmp_path / "catalog"))
    schema = "doc_id long, text string"

    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(input_dir)
    stream_extract(spark, input_dir, catalog, table="curated_stream",
                   transform=curate, schema=schema, max_files_per_trigger=1)
    got1 = {r["doc_id"]: r["text"] for r in catalog.read("curated_stream").collect()}
    assert set(got1) == {1}                       # quality reject dropped
    assert "a@b.com" not in got1[1] and "<EMAIL>" in got1[1]

    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(input_dir)
    stream_extract(spark, input_dir, catalog, table="curated_stream",
                   transform=curate, schema=schema, max_files_per_trigger=1)
    stream_extract(spark, input_dir, catalog, table="curated_stream",
                   transform=curate, schema=schema, max_files_per_trigger=1)  # no-op rerun
    got2 = {r["doc_id"] for r in catalog.read("curated_stream").collect()}
    assert got2 == {1, 3}
