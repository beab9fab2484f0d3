"""JSONL (JSON-lines) document source — the standard interchange format for
web-scale text corpora (one JSON object per line: id, text/span payload,
metadata).

The reference ingests per-page markdown + JSON analysis files from disk
(/root/reference/src/markdown_importer.py:96-137 walks a directory of
``*_analysis.json``); the corpus-scale analog is a JSONL table. Two paths:

* :func:`read_jsonl` — ``spark.read.json`` with an EXPLICIT schema (never
  schema inference at 100 TB: inference scans the data once just to guess
  types; a declared schema makes malformed lines land in
  ``_corrupt_record`` under PERMISSIVE mode instead of failing the job,
  mirroring the per-item error isolation contract F3).
* :func:`parse_jsonl_column` — ``from_json`` over an already-loaded string
  column (e.g. a raw-lines Iceberg table or a message queue payload),
  returning typed doc rows without re-reading files.

Both produce the ``input_hint`` doc shape (``doc_id``,
``spans: array<struct<kind,text,media_ref,offset>>``) ready for
``extract_docs``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocr_spark.schema import SPAN_STRUCT

DOC_JSON_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
        T.StructField("source", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Load a JSONL corpus with a declared schema (PERMISSIVE: malformed
    lines carry their raw text in ``_corrupt_record`` and null doc fields —
    split them off with :func:`split_corrupt` instead of failing the job)."""
    return (
        spark.read.schema(schema or DOC_JSON_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad): per-item error isolation for the JSONL scan (F3).

    ``bad`` keeps FULL rows: Spark refuses queries that reference only the
    corrupt-record column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — project
    ``_corrupt_record`` after materializing if only the raw line is needed.
    """
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return good, bad


def parse_jsonl_column(
    df: DataFrame, json_col: str = "line", schema: T.StructType | None = None
) -> DataFrame:
    """Typed doc rows from a string column of JSON objects (``from_json``;
    unparseable lines yield a null struct — filter on ``doc.doc_id``)."""
    target = schema or T.StructType(
        [f for f in DOC_JSON_SCHEMA.fields if f.name != "_corrupt_record"]
    )
    return df.withColumn("doc", F.from_json(F.col(json_col), target))


def doc_to_json(doc_id: Column | str, spans: Column | str) -> Column:
    """Inverse: serialize a doc row to a JSONL-ready string (``to_json``)."""
    d = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    s = F.col(spans) if isinstance(spans, str) else spans
    return F.to_json(F.struct(d.alias("doc_id"), s.alias("spans")))
