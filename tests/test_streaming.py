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
