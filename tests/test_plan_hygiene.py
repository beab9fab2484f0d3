"""Plan-hygiene regression tests: scans must stay pruned and pushed down.

These pin the physical-plan properties the 100 TB design depends on; a
refactor that silently widens a scan or adds a shuffle fails here, not in a
benchmark three rounds later.
"""

from __future__ import annotations

import os

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = entry_mod.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # PushedFilters
    plan = _plan(spark, "recent_events")
    assert "LessThan(user_id,10)" in plan


def test_column_pruning(spark):
    plan = _plan(spark, "token_stats")
    # 2-column projection over a 5-column table: scan must read only those
    assert "struct<doc_id:bigint,text:string>" in plan
    assert "lang" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_dim_joins_broadcast(spark):
    plan = _plan(spark, "topk_orders")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_narrow_queries_have_no_exchange(spark):
    for name in ("t4_math_rewrite", "t6_layout", "token_stats", "quality_score"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, f"{name} gained a shuffle:\n{plan[:1500]}"


def test_topk_plans_as_take_ordered(spark):
    plan = _plan(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan  # no global sort for ORDER BY+LIMIT


def test_head_tail_has_no_global_window(spark):
    """head/tail slices must plan as TakeOrderedAndProject heaps, never as
    un-partitioned row_number windows (global single-task sorts)."""
    plan = _plan(spark, "head_tail")
    assert "Window" not in plan, plan[:1500]
    assert "TakeOrderedAndProject" in plan


def test_extreme_pair_has_no_cartesian(spark):
    """most/least-similar pair must route through the blocked-matmul path —
    no per-pair expression cartesian."""
    plan = _plan(spark, "extreme_pair")
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]
    assert "FlatMapGroupsInPandas" in plan  # the blocked matmul stage


def test_ivf_centroid_pick_is_take_ordered(spark):
    """The IVF coarse-quantizer sample must not globally sort the corpus:
    orderBy(lcg_key).limit(k) plans as TakeOrderedAndProject with no
    single-partition Exchange and no Window."""
    from ocr_spark.operators.similarity import ivf_centroid_pick

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumnRenamed(
        "vec_id", "doc_id"
    )
    df = ivf_centroid_pick(emb, 16)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan, plan[:1500]


def test_ivf_centroid_pick_accepts_string_ids(spark):
    """A string id column must not crash the LCG key (ANSI CAST_INVALID_INPUT
    at scale: the r4 semdedup protocol leg fed doc_id='R03_page_…' and died
    in the cast at similarity.py's centroid pick) — string ids fold through
    a bounded xxhash64 instead, same TakeOrderedAndProject shape, and the
    pick stays deterministic across partition layouts."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.similarity import ivf_centroid_pick

    emb = spark.range(500).select(
        F.concat(F.lit("R03_page_"), F.col("id").cast("string")).alias("doc_id"),
        F.array(F.sin("id"), F.cos("id")).alias("embedding"),
    )
    df = ivf_centroid_pick(emb, 8)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    picked = sorted(r["__cid"] for r in df.collect())
    repicked = sorted(
        r["__cid"] for r in ivf_centroid_pick(emb.repartition(7), 8).collect()
    )
    assert picked == repicked
    assert len(picked) == 8


def test_north_rule_ops_have_no_single_partition_exchange(spark):
    """boilerplate / layout / pdf plans must never funnel through one task:
    all their windows are partitioned and all shuffles are keyed."""
    for name in ("html_boilerplate", "layout_regions", "reading_order", "pdf_pages"):
        plan = _plan(spark, name)
        assert "Exchange SinglePartition" not in plan, f"{name}:\n{plan[:1500]}"


def test_allpairs_norms_stay_below_the_join(spark):
    """Pre-normalization must survive optimization: exactly one SQRT per
    side, both BELOW the join — none in the pair-level filter (which would
    mean O(n²) norm recomputation). Pinned on the expression-path operator
    directly (the allpairs gate itself now runs the blocked-matmul path)."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.similarity import all_pairs_similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumnRenamed(
        "vec_id", "doc_id"
    )
    df = all_pairs_similarity(emb, threshold=0.25)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    join_pos = plan.find("Join")
    assert plan.count("SQRT") == 2, plan[:1200]
    assert plan[:join_pos].count("SQRT") == 0  # nothing pair-level


def test_allpairs_gate_routes_through_blocked_matmul(spark):
    """The label-counts gate must use the blocked-BLAS pair source (one
    matmul per block-pair task), not the per-pair expression cross join."""
    plan = _plan(spark, "allpairs_label_counts")
    assert "FlatMapGroupsInPandas" in plan, plan[:1500]
    assert "CartesianProduct" not in plan, plan[:1500]


def test_no_operator_path_imports_the_normalize_footgun():
    """functions.vectors.normalize recomputes the O(dim) norm per ELEMENT
    (Catalyst re-inlines aliased exprs into HOF lambdas — no CSE there), so
    it is O(dim²)/row; every operator path must use unit_vector instead.
    Source-level pin so a future caller can't silently pick the slow form."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1] / "ocr_spark"
    # capture the whole import body — parenthesized multi-line form included
    # (the style black produces), which a single-line [^\n]* scan missed —
    # then look for the name inside it
    imp = re.compile(
        r"from ocr_spark\.functions\.vectors import\s*(\([^)]*\)|[^\n]*)"
    )
    name = re.compile(r"(?<![\w.])normalize\b")

    def _uses_footgun(src: str) -> bool:
        if re.search(r"vectors\.normalize\b", src):
            return True
        return any(name.search(m.group(1)) for m in imp.finditer(src))

    offenders = [
        str(p)
        for p in root.rglob("*.py")
        if p.name != "vectors.py" and _uses_footgun(p.read_text())
    ]
    assert not offenders, f"O(dim²) normalize used outside vectors.py: {offenders}"


def test_media_meta_is_python_free(spark):
    """The metadata-only media query must stay on the native byte-stat path:
    no Arrow/Python stage may ship multi-KB blobs out of the JVM (the r1
    two-UDF version was 52% of the whole bench)."""
    plan = _plan(spark, "media_meta")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan[:1500]
    assert "Exchange" not in plan  # narrow projection, no shuffle either

def test_ivf_probe_explode_has_no_inferred_filter(spark):
    """The probed-cells explode must not carry the optimizer's inferred
    size()>0 filter: pushdown re-substitutes the full centroid-scoring fold
    (lambdas re-inlined — no CSE there) below the projection, doubling the
    O(n_cells × dim) work per query row. explode_outer on the provably
    non-empty __cells array generates no such filter, and the Generate must
    consume __cells as a materialized attribute, not an inlined expression."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.similarity import ivf_topk_per_query

    rows = [(i, [float((i * 7 + j) % 13) for j in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    qs = spark.createDataFrame(rows[:3], "query_id long, query_vec array<double>")
    df = ivf_topk_per_query(emb, qs, n_cells=4, n_probe=2, k=3)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if line.strip().lstrip("+-: ").startswith("Filter"):
            assert "lambdafunction" not in line, line[:500]
    gens = [l for l in plan.splitlines() if "Generate explode" in l]
    assert gens, plan[:1500]
    for g in gens:
        assert "true" in g.split("],", 1)[-1] or ", true," in g, g  # outer
        assert "lambdafunction" not in g, g[:500]


def test_simhash_pair_stream_never_shuffles(spark):
    """Cross-index duplicate pairs are removed by the canonical-index
    filter (pidx == first equal block pair — a per-row predicate), NOT by
    dropDuplicates([id_a, id_b]): that distinct's exchange shuffles the
    full candidate-pair stream, the largest dataset in the job on a
    self-similar corpus (measured 135 s -> ~105 s at 8 cores on 500k docs
    when eliminated). No aggregate or exchange may key on the pair ids, in
    either hash variant."""
    from ocr_spark.operators.dedup import simhash_dup_pairs

    plan = _plan(spark, "simhash_dups")  # md5-portable multi-index gate
    assert "HashAggregate(keys=[id_a" not in plan, plan[:2000]
    assert "hashpartitioning(id_a" not in plan, plan[:2000]

    rows = [(i, f"some words repeated {i % 7} across documents {i % 3}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for multi in (False, True):
        df = simhash_dup_pairs(docs, max_hamming=3, n_blocks=8, multi_index=multi)
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate(keys=[id_a" not in p, p[:2000]
        assert "hashpartitioning(id_a" not in p, p[:2000]


def test_ann_candidate_stream_never_distincts(spark):
    """Both ANN consumers of band_buckets use the canonical-band filter;
    no aggregate may key on the candidate ids (the old dropDuplicates
    shuffled every candidate WITH its carried embedding vectors). The
    per-query ranking window legitimately exchanges on __qid alone."""
    from ocr_spark.operators.similarity import ann_topk_per_query, lsh_bucket_pairs

    rows = [(i, [float((i * 7 + j) % 13) for j in range(16)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    qdf = spark.createDataFrame(rows[:3], "query_id long, query_vec array<double>")
    p1 = ann_topk_per_query(emb, qdf, dim=16, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate(keys=[__qid" not in p1, p1[:2000]
    p2 = lsh_bucket_pairs(emb, dim=16)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate(keys=[id_a" not in p2, p2[:2000]
    assert "hashpartitioning(id_a" not in p2, p2[:2000]


def test_curation_ops_plan_shape(spark):
    """The curation family keeps its designed shuffle budget: ONE doc-pinned
    repartition for repetition_stats/token_entropy (every later groupBy is
    partition-local), the min-struct keeper + winners rebuild + totals join
    for chunk_dedup, and NO inferred size()>0 filter re-substituting the
    words split below an explode (the word_shingles lesson — curation
    materializes arrays and explodes with posexplode_outer)."""
    from ocr_spark.operators.curation import (
        chunk_dedup,
        gopher_quality,
        repetition_stats,
        token_entropy,
    )

    rows = [(i, f"alpha beta gamma {i % 5} delta beta") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for op, budget in ((repetition_stats, 1), (token_entropy, 1), (chunk_dedup, 5)):
        p = op(docs)._jdf.queryExecution().executedPlan().toString()
        assert p.count("Exchange") <= budget, (op.__name__, p[:2000])
        bad = [l for l in p.splitlines() if "Filter" in l and "split(" in l]
        assert not bad, (op.__name__, bad[:2])
    # chunk_dedup's keeper must stay a map-side-combined aggregate — a
    # Window partitioned by the chunk text puts every copy of a duplicated
    # chunk in ONE task (measured 0.13 N->4N efficiency on a self-similar
    # corpus before the rewrite)
    p = chunk_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p, p[:2000]
    # gopher_quality is row-local: zero exchanges, one codegen projection
    p = gopher_quality(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p[:2000]


def test_dedup_lines_gate_has_no_reinlined_split(spark):
    """q_dedup_lines synthesizes 2-word lines inside an F.transform lambda;
    the words array must be a materialized COLUMN there — referencing the
    words_column expression directly re-inlines the full regexp split per
    line (O(W^2)/doc, the lambda-CSE pitfall; caught by the r3 review)."""
    plan = _plan(spark, "dedup_lines")
    bad = [l for l in plan.splitlines() if "lambdafunction" in l and "split(" in l]
    assert not bad, bad[:2]
