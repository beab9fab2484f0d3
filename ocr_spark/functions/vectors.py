"""Native vector math over ``array<float>`` columns — all JVM-side.

Replaces the reference's pgvector operators (``embedding <=> q`` cosine
distance, /root/reference/src/db_utils.py:285-302) and numpy/sklearn paths
(/root/reference/src/embedding_analyzer.py:86-91) with ``zip_with`` +
``aggregate`` expressions that run inside whole-stage codegen — no Python,
no UDF, usable in any filter/join/window without breaking pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as a double (inputs cast element-wise to double first so the
    accumulation order-independent error stays ~1e-15)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b); the reference computes 1 − cosine_distance
    (/root/reference/src/db_utils.py:286)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_similarity_unit(a: Column | str, b: Column | str) -> Column:
    """Fast path when both sides are unit-normalized (our embedding contract)."""
    return dot(a, b)


def euclidean_distance(a: Column | str, b: Column | str) -> Column:
    """(/root/reference/src/embedding_analyzer.py:89-91)"""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                _c(a), _c(b),
                lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def normalize(a: Column | str) -> Column:
    """L2-normalize an array<float> column natively — float output.

    PERFORMANCE FOOTGUN — prefer :func:`unit_vector` in any hot path: this
    form references the norm inside a ``transform`` lambda, and Catalyst
    re-inlines aliased expressions into HOF lambda bodies (no CSE there), so
    the O(dim) norm is recomputed per ELEMENT — O(dim²) per row.
    ``unit_vector`` computes the identical normalization in O(dim)/row.
    Kept only for the float-typed output contract and as the documented
    counter-example (tests pin that no operator path imports it)."""
    n = l2_norm(a)
    return F.transform(_c(a), lambda x: (x.cast("double") / n).cast("float"))


def unit_vector(a: Column | str) -> Column:
    """L2-normalize with the norm evaluated ONCE per row, as array<double>.

    ``normalize`` references the norm inside a ``transform`` lambda; Catalyst
    re-inlines aliased expressions into HOF lambda bodies (no CSE there), so
    that form recomputes the O(dim) norm per ELEMENT — O(dim²)/row. Here the
    norm sits in ``array_repeat``'s argument — evaluated once, outside any
    lambda — and the division is a ``zip_with`` over (vec, norm-array):
    O(dim)/row. Use below self-joins so per-pair work is a bare dot product
    (``cosine_similarity_unit``)."""
    c = _c(a)
    return F.zip_with(
        c,
        F.array_repeat(l2_norm(c), F.size(c)),
        lambda x, n: x.cast("double") / n,
    )
