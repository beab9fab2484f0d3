"""M4 tests: merge upsert idempotency, crash-resume via manifest, error
split, batch vs granular stage equivalence, end-to-end pipeline."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from ocr_spark import corpus
from ocr_spark.operators.extract import extract_docs
from ocr_spark.plans.pipeline import run_pipeline, run_pipeline_checkpointed
from ocr_spark.schema import DOC_SCHEMA
from ocr_spark.storage import Catalog, run_stage

from .conftest import spans_of


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


def test_merge_upsert_idempotent(spark, catalog):
    df1 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    catalog.merge_upsert(df1, "t", ["k"])
    # re-run same data → identical table
    catalog.merge_upsert(df1, "t", ["k"])
    assert sorted((r.k, r.v) for r in catalog.read("t").collect()) == [("a", 1), ("b", 2)]
    # update one key, add one
    df2 = spark.createDataFrame([("b", 99), ("c", 3)], "k string, v int")
    catalog.merge_upsert(df2, "t", ["k"])
    assert sorted((r.k, r.v) for r in catalog.read("t").collect()) == [
        ("a", 1), ("b", 99), ("c", 3)
    ]


def test_run_stage_resume_after_crash(spark, catalog):
    docs = corpus.generate_docs(spark, 80, seed=21, heavy_pct=0.0)
    # crash after 2 of 4 partitions
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_stage(
            catalog, "extracted", docs, extract_docs,
            n_partitions=4, lineage="docs", fail_after_partitions=2,
        )
    m = catalog.manifest()
    assert m.count() == 2  # two completed partitions checkpointed
    # resume: only pending partitions run; result is complete, no dups
    out = run_stage(catalog, "extracted", docs, extract_docs, n_partitions=4, lineage="docs")
    assert out.count() == 80
    assert out.select("doc_id").distinct().count() == 80
    assert catalog.manifest().count() == 4
    # re-run again: fully no-op, manifest unchanged
    out2 = run_stage(catalog, "extracted", docs, extract_docs, n_partitions=4, lineage="docs")
    assert catalog.manifest().count() == 4
    assert spans_of(out2) == spans_of(extract_docs(docs))


def test_run_stage_batch_equals_granular(spark, catalog, tmp_path):
    docs = corpus.generate_docs(spark, 60, seed=33, heavy_pct=0.0)
    cat2 = Catalog(spark, str(tmp_path / "w2"))
    g = run_stage(catalog, "ext", docs, extract_docs, n_partitions=4, lineage="docs", granular=True)
    b = run_stage(cat2, "ext", docs, extract_docs, n_partitions=4, lineage="docs", granular=False)
    assert spans_of(g) == spans_of(b)
    mg = {(r.partition_id, r.rows_in, r.rows_out, r.errors) for r in catalog.manifest().collect()}
    mb = {(r.partition_id, r.rows_in, r.rows_out, r.errors) for r in cat2.manifest().collect()}
    assert mg == mb


def test_error_split(spark, catalog):
    df = spark.createDataFrame(
        [("a", 1), ("b", -1), ("c", 2), ("d", -2)], "doc_id string, v int"
    )

    def transform(d):
        return d.withColumn(
            "error", F.when(F.col("v") < 0, F.lit("negative value")).otherwise(F.lit(None).cast("string"))
        )

    out = run_stage(
        catalog, "checked", df, transform, n_partitions=2, lineage="raw",
        error_col="error", granular=False,
    )
    assert sorted(r.doc_id for r in out.collect()) == ["a", "c"]
    errs = catalog.read("checked_errors")
    assert sorted(r.doc_id for r in errs.collect()) == ["b", "d"]
    m = catalog.manifest()
    assert m.agg(F.sum("errors")).collect()[0][0] == 2
    assert m.agg(F.sum("rows_in")).collect()[0][0] == 4
    assert m.agg(F.sum("rows_out")).collect()[0][0] == 2


def test_pipeline_end_to_end(spark, catalog):
    docs = corpus.generate_docs(spark, 40, seed=9, heavy_pct=0.0)
    lazy = run_pipeline(docs, dim=32)
    ck = run_pipeline_checkpointed(catalog, docs, dim=32, n_partitions=3, granular=False)
    # checkpointed output == lazy output, stage by stage
    assert spans_of(ck["extracted"]) == spans_of(lazy["extracted"])
    lq = {r.question_id: (r.year, r.content) for r in lazy["questions"].collect()}
    cq = {r.question_id: (r.year, r.content) for r in ck["questions"].collect()}
    assert lq == cq
    le = {r.doc_id: tuple(r.embedding) for r in lazy["embeddings"].collect()}
    ce = {r.doc_id: tuple(r.embedding) for r in ck["embeddings"].collect()}
    assert le == ce
    lp = {r.doc_id: str(r.problems) for r in lazy["problems"].collect()}
    cp = {r.doc_id: str(r.problems) for r in ck["problems"].collect()}
    assert lp == cp
    # manifest covers 4 stages × 3 partitions
    assert catalog.manifest().count() == 12
