from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("ocr_spark-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


def spans_of(df, doc_id_col: str = "doc_id", spans_col: str = "spans") -> dict:
    """Collect {doc_id: [(kind, text, media_ref, offset), ...]} for equality checks."""
    out = {}
    for row in df.collect():
        out[row[doc_id_col]] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row[spans_col]
        ]
    return out
