"""Deterministic sampling operators (S3).

Replaces the reference's evenly-spaced sample-page extraction
(/root/reference/src/extract_sample_pages.py:18-64): ``step = total/num;
indices = [int(i*step) for i in range(num)]``, with the last page forced in.

Semantics here are defined engine-portably as integer ``floor((i*n)/k)``
(equal to the reference's float truncation for all realistic n, k) so the
same indices are computable in any SQL engine for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stride_sample(df: DataFrame, order_col: str, k: int = 10) -> DataFrame:
    """Keep ``k`` evenly-spaced rows (always including the last) in
    ``order_col`` order; returns the rows plus their 0-based ``idx``.

    Note: the global ``row_number`` makes this a single-partition sort —
    appropriate for its reference use (picking sample pages of ONE
    document). For corpus-level deterministic sampling at scale use
    ``df.filter(pmod(xxhash64(key), m) == 0)`` instead.
    """
    w = Window.orderBy(order_col)
    n = F.col("__n")
    cnt = df.select(F.count("*").alias("__n"))
    ranked = (
        df.crossJoin(F.broadcast(cnt))
        .withColumn("__idx", (F.row_number().over(w) - 1).cast("long"))
    )
    base = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.floor((i.cast("long") * n) / F.lit(k)).cast("long"),
    )
    last = (n - 1).cast("long")
    fixed = F.when(F.array_contains(base, last), base).otherwise(
        F.concat(F.slice(base, 1, k - 1), F.array(last))
    )
    return (
        ranked.filter(
            (n <= F.lit(k)) | F.array_contains(fixed, F.col("__idx"))
        )
        .withColumnRenamed("__idx", "idx")
        .drop("__n")
    )
