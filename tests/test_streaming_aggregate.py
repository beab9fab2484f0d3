"""Watermarked windowed streaming aggregation: batch parity + incremental
revision of open windows across waves."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ocr_spark.storage import Catalog
from ocr_spark.streaming.aggregate import stream_event_counts, windowed_event_counts

_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, 1, et, float(v), "{}") for i, (ts, et, v) in enumerate(rows)],
        _SCHEMA,
    )


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_stream_counts_match_batch_and_revise_open_windows(spark, tmp_path):
    input_dir = str(tmp_path / "events_in")
    catalog = Catalog(spark, str(tmp_path / "cat"))

    wave1 = [(_t(9, 10), "view", 1), (_t(9, 40), "view", 2), (_t(10, 5), "click", 5)]
    _events(spark, wave1).coalesce(1).write.mode("append").parquet(input_dir)
    stream_event_counts(spark, input_dir, catalog)

    got1 = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in catalog.read("event_counts").collect()
    }
    assert got1[(_t(9), "view")] == (2, 3.0)
    assert got1[(_t(10), "click")] == (1, 5.0)

    # wave 2: more rows for an existing window (late-but-within-watermark)
    # plus a new window — the open window must be REVISED, not duplicated
    wave2 = [(_t(9, 55), "view", 10), (_t(11, 1), "view", 7)]
    _events(spark, wave2).coalesce(1).write.mode("append").parquet(input_dir)
    stream_event_counts(spark, input_dir, catalog)

    final = catalog.read("event_counts")
    got2 = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in final.collect()
    }
    assert got2[(_t(9), "view")] == (3, 13.0)  # revised
    assert got2[(_t(11), "view")] == (1, 7.0)  # new window
    assert final.count() == len(got2)  # no duplicate (window, type) rows

    # parity: streamed result == one-shot batch aggregation of all events
    all_events = _events(spark, wave1 + wave2)
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_event_counts(all_events).collect()
    }
    assert got2 == batch
