"""Custom stateful streaming operator: cross-batch first-seen dedup.

``applyInPandasWithState`` keeps a per-key GroupState across micro-batches:
the key is the normalized-content fingerprint, the state is the first doc_id
that claimed it. A document whose fingerprint was already claimed (in this
or any earlier batch) is suppressed — streaming exact-dedup with bounded
per-key state, the streaming twin of ``operators.dedup.exact_dedup``.

This is the pattern for any custom stateful operator the built-in windowed
aggregations can't express (sessionization, dedup, monotonic counters):
state lives in the checkpoint, so restarts resume with the seen-set intact.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ocr_spark.operators.dedup import normalized_text
from ocr_spark.storage import Catalog

_OUT_SCHEMA = "fp long, doc_id string, is_first boolean"
_STATE_SCHEMA = "first_doc_id string"


def _first_seen(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (fp,) = key
    if state.exists:
        (first_doc,) = state.get
    else:
        first_doc = None
    out = []
    for pdf in pdfs:
        for doc_id in pdf["doc_id"]:
            if first_doc is None:
                first_doc = doc_id
                out.append((fp, doc_id, True))
            else:
                out.append((fp, doc_id, False))
    state.update((first_doc,))
    yield pd.DataFrame(out, columns=["fp", "doc_id", "is_first"])


def streaming_first_seen(stream_docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs stream → (fp, doc_id, is_first) with state across batches."""
    keyed = stream_docs.select(
        F.xxhash64(normalized_text(text_col)).alias("fp"), F.col("doc_id").cast("string")
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        _first_seen,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup_firstseen(
    spark: SparkSession,
    input_dir: str,
    catalog: Catalog,
    schema: str,
    text_col: str = "text",
    table: str = "dedup_decisions",
    checkpoint_dir: str | None = None,
):
    """Drain currently-visible files through the stateful dedup; appends
    per-document decisions (is_first) to the catalog. Re-runs resume from
    the checkpointed state: a duplicate landing in a later run is still
    recognized as a duplicate of a first-run document."""
    if checkpoint_dir is None:
        checkpoint_dir = catalog.path(table + "__checkpoint")
    stream = spark.readStream.schema(schema).parquet(input_dir)
    decisions = streaming_first_seen(stream, text_col=text_col)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        catalog.merge_upsert(batch_df, table, ["doc_id"])

    q = (
        decisions.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
