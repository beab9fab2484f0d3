"""Embedding-space corpus clustering and SemDeDup semantic deduplication.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) is the embedding-space
complement to the token-level dedup family (dedup.py): k-means-cluster the
corpus embeddings, then look for near-duplicate pairs ONLY inside each
cluster — the cluster structure bounds the candidate set the way LSH bands
bound it for MinHash. The reference's similarity tooling compares documents
pairwise through pgvector (/root/reference/src/compare_similarity.py:74-138);
this module is the 10^12-doc version of that comparison, where brute-force
pairs are impossible and cell-local pairs are the plan.

Scale design:

* **Centroids are model-sized, data-flow is bounded.** ``kmeans_fit`` is the
  standard distributed Lloyd loop: the only driver-side materializations are
  the k seeded picks and the k x dim per-iteration means (model rows, never
  data rows); each iteration is one broadcast-column assignment (no shuffle)
  plus one map-side-combined aggregation (reuses
  similarity.lloyd_iteration — the machinery behind IVF's refine_iters).
* **Assignment never shuffles.** The centroid set rides in as ONE broadcast
  row holding array<struct<cell,cvec>> (similarity.with_best_cells) — no
  plan literals, flat plan at production dims.
* **Pairs are cell-local.** The self-join keys on the cell id, so candidate
  volume is sum(|cell| choose 2), not (n choose 2). Cell granularity is the
  knob: n_cells ~ corpus_size / target_cell_size keeps cells bounded; a hot
  cell is a centroid-resolution problem (raise n_cells / refine more), not a
  plan problem.
* **The duplicate stream collapses before it moves.** A doc is a duplicate
  iff SOME smaller-id cell-mate sits within the threshold; that exists-
  aggregation runs as groupBy(id).count-style map-side combine over the pair
  stream — never a dropDuplicates over the pairs (the CLAUDE.md pair-stream
  pitfall) — and the result joins back at one row per duplicate doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.vectors import cosine_similarity
from ocr_spark.operators.similarity import (
    ivf_centroid_pick,
    lloyd_iteration,
    with_best_cells,
)

__all__ = ["kmeans_fit", "assign_clusters", "semdedup"]


def kmeans_fit(
    embeddings: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> list[dict]:
    """Distributed Lloyd k-means; returns ``[{"cell": int, "cvec": [...]}]``.

    Init = the deterministic LCG pick (similarity.ivf_centroid_pick — a
    TakeOrderedAndProject, no global sort); each iteration = one broadcast
    assignment + one map-side-combined (cell, component) mean. Empty cells
    drop out and survivors renumber densely, so the result may have fewer
    than ``k`` rows. ``n_iter=0`` returns the seeded pick itself — the
    bit-reproducible form the SQL oracles use (float means are not
    cross-engine reproducible; see lloyd_iteration)."""
    if k < 1:
        raise ValueError("kmeans_fit needs k >= 1")
    spark = embeddings.sparkSession
    picked = ivf_centroid_pick(embeddings, k, id_col, vec_col, seed)
    rows = sorted(picked.collect(), key=lambda r: (r["__key"], r["__cid"]))
    cent_rows = [{"cell": i, "cvec": r["cvec"]} for i, r in enumerate(rows)]
    for _ in range(n_iter):
        cent_rows = lloyd_iteration(spark, embeddings, cent_rows, vec_col=vec_col)
    return cent_rows


def assign_clusters(
    embeddings: DataFrame,
    cent_rows: list[dict],
    vec_col: str = "embedding",
    cell_col: str = "cell",
    blas: bool = False,
) -> DataFrame:
    """Every row + its nearest-centroid ``cell_col`` (max cosine, ties to
    the smaller cell) — one broadcast nested-loop join, zero shuffles.

    ``blas=True`` switches to the Arrow-batched numpy-matmul assignment
    (similarity.make_ivf_assign_blas_udf) — the throughput path when
    n_cells x dim makes the per-row native fold interpreter-bound (SemDeDup
    at production scale runs ~100k clusters). Same tie rule; summation
    order differs, so oracle-gated paths stay native (see the UDF's
    docstring)."""
    if blas:
        from ocr_spark.operators.similarity import make_ivf_assign_blas_udf

        assign_udf = make_ivf_assign_blas_udf(cent_rows)
        return embeddings.withColumn(cell_col, assign_udf(F.col(vec_col)))
    spark = embeddings.sparkSession
    return (
        with_best_cells(spark, embeddings, F.col(vec_col), 1, cent_rows)
        .withColumn(cell_col, F.element_at("__cells", 1))
        .drop("__cells")
    )


def semdedup(
    embeddings: DataFrame,
    n_cells: int = 16,
    threshold: float = 0.95,
    n_iter: int = 0,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    seed: int = 0,
    blas: bool = False,
    materialize: bool = False,
) -> DataFrame:
    """SemDeDup keep/drop marking: adds ``cell`` and ``keep``.

    A document is dropped iff some SMALLER-id document in the same cell has
    cosine similarity >= ``threshold`` — the deterministic representative
    rule (the group's minimum id always survives; every other member has
    that witness). Output carries every input row with its verdict so
    callers can filter or audit.

    ``n_iter=0`` (default) clusters on the seeded centroid pick — the
    oracle-reproducible configuration; pass ``n_iter>0`` for real Lloyd
    refinement in production (pytest-pinned equivalence, no SQL twin).

    Plan: broadcast assignment (no shuffle) -> cell-keyed self-join (the one
    real shuffle, on the cell id) -> per-id map-side-combined witness
    aggregation -> id-keyed left join back. The pair stream is never
    distinct-ed or windowed.

    ``assigned`` feeds THREE plan branches (both join sides + the verdict
    join); ``materialize=True`` localCheckpoints the assignments so the
    k-means assignment runs once instead of three times — the production
    setting (same reason the jobs checkpoint their fan-out frames).
    Default False keeps the plan pure for the oracle gate."""
    assigned = semdedup_assign(
        embeddings, n_cells, n_iter=n_iter, id_col=id_col,
        vec_col=vec_col, seed=seed, blas=blas,
    )
    if materialize:
        assigned = assigned.localCheckpoint()
    left = assigned.select(
        F.col("cell"), F.col(id_col).alias("__id_a"), F.col(vec_col).alias("__va")
    )
    right = assigned.select(
        F.col("cell"), F.col(id_col).alias("__id_b"), F.col(vec_col).alias("__vb")
    )
    witnesses = (
        left.join(right, "cell")
        .filter(F.col("__id_b") < F.col("__id_a"))
        .filter(
            cosine_similarity("__va", "__vb") >= F.lit(float(threshold))
        )
        # collapse the pair stream map-side: one output row per dropped doc
        .groupBy(F.col("__id_a").alias(id_col))
        .agg(F.min("__id_b").alias("dup_witness"))
    )
    return (
        assigned.join(witnesses, id_col, "left")
        .withColumn("keep", F.col("dup_witness").isNull())
        .drop("dup_witness")
    )


def semdedup_assign(
    embeddings: DataFrame,
    n_cells: int,
    n_iter: int = 0,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    seed: int = 0,
    blas: bool = False,
) -> DataFrame:
    """The clustering half of :func:`semdedup` (fit + assign), exposed for
    pipelines that persist assignments once and run several threshold
    sweeps over them."""
    cent_rows = kmeans_fit(
        embeddings, n_cells, n_iter=n_iter, id_col=id_col,
        vec_col=vec_col, seed=seed,
    )
    return assign_clusters(embeddings, cent_rows, vec_col=vec_col, blas=blas)
