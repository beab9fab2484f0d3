"""Event-time windowed streaming aggregation with watermarks.

Complements :mod:`ocr_spark.streaming.ingest`: where ingest gives
incremental extraction, this gives incremental metrics — e.g. per-source
document counts and span volumes as files land, with late data handled by a
watermark instead of full recomputation.

Design: ``withWatermark`` bounds state (windows older than the watermark are
finalized and evicted — mandatory for an unbounded run over a 10^12-doc
feed); ``foreachBatch`` upserts finalized/updated windows into the catalog
keyed on (window_start, group), so replays stay idempotent exactly like the
ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.storage import Catalog


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Shared batch/streaming transform: per-(window, group) counts + value
    sums. Works on a static DataFrame (tests compare against this) and on a
    readStream DataFrame (watermark applies only there)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), F.col(group_col))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n_events",
            "total_value",
        )
    )


def stream_event_counts(
    spark: SparkSession,
    input_dir: str,
    catalog: Catalog,
    table: str = "event_counts",
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    window: str = "1 hour",
    watermark: str = "2 hours",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Stream files of events → watermarked windowed counts → MERGE upsert.

    ``update`` output mode emits rows for windows changed in each batch; the
    MERGE keyed on (window_start, event_type) makes re-emission and replay
    idempotent while late-but-within-watermark data revises its window.
    """
    if checkpoint_dir is None:
        checkpoint_dir = catalog.path(table + "__checkpoint")
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_counts(stream, window=window, watermark=watermark)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        catalog.merge_upsert(batch_df, table, ["window_start", "event_type"])

    writer = (
        agg.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
