"""WARC / WET web-archive source — the Common Crawl ingest path.

Every public web-scale corpus (C4, CCNet, Gopher/MassiveWeb, RefinedWeb,
Dolma, FineWeb) starts from Common Crawl WARC or WET files; this module is
the engine's front door for that shape. The reference walks a directory of
per-page files (/root/reference/src/markdown_importer.py:96-137); the
crawl-scale analog is a directory of ``*.warc.wet[.gz]`` archives.

Design — record splitting stays JVM-side, parsing is columnar:

* :func:`read_wet` reads archives with ``spark.read.text`` and the
  ``lineSep="WARC/1.0"`` RECORD delimiter, so the Hadoop line reader
  hands back one row per WARC record with zero Python in the loop.
  Uncompressed archives split WITHIN a file at delimiter boundaries
  (block-level parallelism); gzip members are per-file tasks — Common
  Crawl ships ~1 GB .gz segments by the tens of thousands, so file-count
  parallelism is the real axis at crawl scale (set
  ``spark.sql.files.maxPartitionBytes`` accordingly; never one giant
  archive).
* :func:`wet_record_columns` turns a raw record chunk into typed columns
  with built-in regexps only (header fields + payload slice) — reusable
  over any string column (an Iceberg raw-records table, a Kafka payload)
  without touching the file reader.

Non-conversion records (``warcinfo``, request/response of full WARC) and
the pre-delimiter preamble parse to null fields; ``read_wet`` keeps only
``conversion`` records with a target URI — the WET contract. Malformed
records therefore drop out as nulls instead of failing the job (the F3
per-item isolation convention, same as the JSONL source).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["wet_record_columns", "read_wet"]

# a WARC header line: "Name: value" with CRLF or LF endings
_HDR = r"(?m)^{name}:[ \t]*([^\r\n]*)\r?$"


def _header(rec: Column, name: str) -> Column:
    got = F.regexp_extract(rec, _HDR.format(name=name), 1)
    return F.when(got == "", F.lit(None).cast("string")).otherwise(got)


def wet_record_columns(rec: Column | str) -> dict[str, Column]:
    """Typed columns from one WARC record chunk (headers + blank line +
    payload, WITHOUT the leading ``WARC/1.0`` version line — exactly what
    the ``lineSep``-split reader yields).

    Returns ``record_type`` / ``url`` / ``warc_date`` / ``content_length``
    (declared, from the header) and ``text`` (the actual payload: bytes
    after the first blank line, record-separator padding stripped). All
    row-local regexp/slice work; a chunk with no header block yields
    nulls."""
    c = F.col(rec) if isinstance(rec, str) else rec
    # payload = everything after the first blank line; non-greedy dotall
    # header strip, then drop the inter-record CRLF CRLF tail padding
    # anchored + dotall without (?m): can only match once, at offset 0
    body = F.regexp_replace(c, r"(?s)^.*?\r?\n\r?\n", "")
    has_blank = c.rlike(r"(?s)\r?\n\r?\n")
    payload = F.when(has_blank, F.regexp_replace(body, r"(\r?\n)+$", ""))
    return {
        "record_type": _header(c, "WARC-Type"),
        "url": _header(c, "WARC-Target-URI"),
        "warc_date": _header(c, "WARC-Date"),
        "content_length": _header(c, "Content-Length").cast("long"),
        "text": payload,
    }


def read_wet(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    keep_all_records: bool = False,
) -> DataFrame:
    """One row per WET document: ``(doc_id, url, warc_date,
    content_length, text)``; ``doc_id`` is ``xxhash64(url, warc_date)``
    (stable across re-reads and re-partitioning — never
    ``monotonically_increasing_id``, which renumbers per task layout).

    ``keep_all_records=True`` returns every record (any ``record_type``,
    nulls included, plus the chunk) for archive forensics; the default
    keeps the WET contract — ``conversion`` records with a URI."""
    raw = spark.read.option("lineSep", "WARC/1.0").text(path)
    cols = wet_record_columns("value")
    rec = raw.select(
        *[v.alias(k) for k, v in cols.items()], F.col("value").alias("_raw")
    )
    if keep_all_records:
        return rec
    return rec.filter(
        (F.col("record_type") == "conversion") & F.col("url").isNotNull()
    ).select(
        F.xxhash64("url", "warc_date").alias(id_col),
        "url",
        "warc_date",
        "content_length",
        "text",
    )
