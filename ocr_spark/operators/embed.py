"""T14/T15 — deterministic embedding generation (M2).

Re-creates the reference's dummy-embedding contract
(/root/reference/src/generate_embedding.py:158-166): seeded N(0, 1/√d) vector,
L2-normalized, float32. Two deliberate upgrades for cluster determinism:

* the seed is ``xxhash64(text) pmod 10000`` computed JVM-side (the reference's
  CPython ``hash()`` is process-unstable — SURVEY §4.2.4); empty/null text
  seeds 42 exactly like the reference;
* the normal draw uses ``np.random.RandomState(seed)`` (MT19937 — the same
  generator/sequence as the reference's ``np.random.seed``).

The vector materialization is a scalar pandas UDF over the PRE-COMPUTED seed
column, so the Python stage is pure Arrow-batched numpy with no string
hashing and no per-row interpreter work beyond the draw itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ocr_spark.schema import DEFAULT_EMBEDDING_DIM


def seed_for_text(col: Column | str) -> Column:
    """JVM-side stable seed: xxhash64(text) pmod 10000; 42 for empty/null.

    (reference: ``hash(text) % 10000 if text else 42``,
    /root/reference/src/generate_embedding.py:161-163)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull() | (c == ""), F.lit(42).cast("long")
    ).otherwise(F.pmod(F.xxhash64(c), F.lit(10000)))


def seed_for_media(media_ref: Column | str, text: Column | str) -> Column:
    """T15 multimodal seed: stable hash over (media_ref, text)."""
    m = F.col(media_ref) if isinstance(media_ref, str) else media_ref
    t = F.col(text) if isinstance(text, str) else text
    return F.pmod(F.xxhash64(F.coalesce(m, F.lit("")), F.coalesce(t, F.lit(""))), F.lit(10000))


def make_embedding_udf(dim: int = DEFAULT_EMBEDDING_DIM):
    """Scalar pandas UDF: seed:long → unit-norm float32[dim]."""

    @pandas_udf("array<float>")
    def embed(seeds: pd.Series) -> pd.Series:
        scale = 1.0 / np.sqrt(dim)
        out = []
        for seed in seeds.to_numpy():
            v = np.random.RandomState(int(seed)).normal(0, scale, dim)
            v = v / np.linalg.norm(v)
            out.append(v.astype(np.float32))
        return pd.Series(out)

    return embed


def embed_text(
    df: DataFrame,
    text_col: str = "content",
    out_col: str = "embedding",
    dim: int = DEFAULT_EMBEDDING_DIM,
) -> DataFrame:
    """Append a deterministic text embedding column (T14)."""
    udf = make_embedding_udf(dim)
    return df.withColumn(out_col, udf(seed_for_text(text_col)))


def embed_multimodal(
    df: DataFrame,
    media_col: str = "media_ref",
    text_col: str = "content",
    out_col: str = "embedding",
    dim: int = DEFAULT_EMBEDDING_DIM,
) -> DataFrame:
    """Append a deterministic multimodal embedding column (T15)."""
    udf = make_embedding_udf(dim)
    return df.withColumn(out_col, udf(seed_for_media(media_col, text_col)))


def oracle_embedding(seed: int, dim: int = DEFAULT_EMBEDDING_DIM) -> np.ndarray:
    """Driver-side twin for tests."""
    v = np.random.RandomState(int(seed)).normal(0, 1.0 / np.sqrt(dim), dim)
    return (v / np.linalg.norm(v)).astype(np.float32)
