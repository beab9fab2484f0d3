"""applyInPandasWithState: cross-batch first-seen dedup with resume."""

from __future__ import annotations

from ocr_spark.storage import Catalog
from ocr_spark.streaming.stateful import stream_dedup_firstseen

_SCHEMA = "doc_id string, text string"


def _land(spark, rows, input_dir):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("append").parquet(input_dir)


def test_first_seen_across_runs(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    catalog = Catalog(spark, str(tmp_path / "cat"))

    # run 1: two uniques + an intra-run duplicate (same normalized text)
    _land(spark, [("a", "Hello  World"), ("b", "other doc"), ("c", "hello world")], input_dir)
    stream_dedup_firstseen(spark, input_dir, catalog, _SCHEMA)
    d1 = {r.doc_id: r.is_first for r in catalog.read("dedup_decisions").collect()}
    assert d1["b"] is True
    # exactly one of the hello-world pair is first
    assert sorted([d1["a"], d1["c"]]) == [False, True]

    # run 2 (new process-equivalent: same checkpoint): a cross-RUN duplicate
    # and a fresh doc — state must remember run 1's fingerprints
    _land(spark, [("d", "HELLO WORLD"), ("e", "brand new")], input_dir)
    stream_dedup_firstseen(spark, input_dir, catalog, _SCHEMA)
    d2 = {r.doc_id: r.is_first for r in catalog.read("dedup_decisions").collect()}
    assert d2["d"] is False  # duplicate of run-1 content
    assert d2["e"] is True
    assert len(d2) == 5
