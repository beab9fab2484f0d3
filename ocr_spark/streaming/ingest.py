"""Incremental ingest via Structured Streaming.

The reference is batch-only; its incremental semantics are stage skipping +
UPSERT idempotency (/root/reference/run_pipeline.sh:52-64,
src/markdown_importer.py:202-210). This module is the streaming twin of
those semantics for continuously-arriving document files:

    files landing in a directory ──readStream──▶ extract_docs (same narrow
    plan as batch) ──foreachBatch──▶ Catalog.merge_upsert (idempotent)

* **Exactly-once effect**: the checkpoint tracks which source files each
  batch consumed; a replayed batch re-MERGEs the same keys, which is a
  no-op for already-written rows (UPSERT on ``doc_id``).
* **Resume**: restarting with the same ``checkpoint_dir`` picks up only
  files not yet committed — the streaming analog of the per-partition
  manifest in ``storage.run_stage``.
* **Scale**: ``maxFilesPerTrigger`` bounds per-batch work; the extraction
  itself is the identical shuffle-free plan the batch path uses, so
  streaming adds no new shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ocr_spark.operators.extract import extract_docs
from ocr_spark.schema import DOC_SCHEMA
from ocr_spark.storage import Catalog


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    catalog: Catalog,
    table: str = "extracted_stream",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 16,
    available_now: bool = True,
    transform=extract_docs,
    schema=None,
):
    """Start (and for ``available_now`` drain) a streaming extraction job.

    Returns the StreamingQuery. With ``available_now=True`` the call blocks
    until every currently-visible file is processed, then stops — the
    incremental-batch pattern (run it on a schedule; each run processes only
    new files, like the reference's resumable stage re-runs).

    ``transform``/``schema`` generalize the stage: any batch operator whose
    output carries ``doc_id`` streams through the same
    checkpoint + MERGE machinery — e.g. incremental corpus CURATION
    (``schema="doc_id long, text string"``, transform = gopher_quality
    filter → redact_pii), tested in tests/test_streaming.py. A custom
    ``transform`` REQUIRES an explicit ``schema``: silently defaulting to
    DOC_SCHEMA would misread the input parquet, and the checkpoint would
    then mark those files consumed — a corrected re-run skips them.
    """
    if schema is None:
        if transform is not extract_docs:
            raise ValueError(
                "a custom transform requires an explicit schema= matching "
                "its input (the DOC_SCHEMA default only fits extract_docs)"
            )
        schema = DOC_SCHEMA
    if checkpoint_dir is None:
        checkpoint_dir = catalog.path(table + "__checkpoint")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    extracted = transform(stream)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # MERGE keyed on doc_id: batch replays after a crash are no-ops
        catalog.merge_upsert(batch_df, table, ["doc_id"])

    writer = (
        extracted.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
