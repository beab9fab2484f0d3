"""Tests: dedup family (exact, minhash-LSH, simhash) + text-stats functions."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest

from ocr_spark.functions.textstats import (
    bpe_token_count,
    detect_language,
    doc_fingerprint,
    quality_score,
    rolling_fingerprints,
    whitespace_token_count,
)
from ocr_spark.operators.dedup import (
    exact_dedup,
    hamming64,
    jaccard_pairs,
    minhash_dedup,
    minhash_lsh_candidates,
    simhash64,
    simhash_dup_pairs,
    word_shingles,
)

DOCS = [
    ("a1", "the quick brown fox jumps over the lazy dog near the river bank today"),
    ("a2", "The quick  brown fox jumps over the lazy dog near the river bank today"),  # exact dup (normalized)
    ("a3", "the quick brown fox jumps over the lazy dog near the river bank yesterday"),  # near dup
    ("b1", "completely different content about electrical circuits and impedance analysis methods"),
    ("b2", "a totally unrelated sentence regarding Japanese exam question extraction pipelines"),
    ("c1", "short text"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_exact_dedup(spark, docs_df):
    out = sorted(r.doc_id for r in exact_dedup(docs_df).collect())
    assert out == ["a1", "a3", "b1", "b2", "c1"]  # a2 dropped (keeps smallest id)


def test_word_shingles_oracle(spark, docs_df):
    got = {r.doc_id: sorted(r.sh) for r in docs_df.select("doc_id", word_shingles("text", 3).alias("sh")).collect()}
    for doc_id, text in DOCS:
        words = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        if len(words) < 3:
            want = sorted({" ".join(words)})
        else:
            want = sorted({" ".join(words[i : i + 3]) for i in range(len(words) - 2)})
        assert got[doc_id] == want, doc_id


def test_minhash_near_dup_detection(spark, docs_df):
    cands = minhash_lsh_candidates(docs_df, n_hashes=32, n_bands=16)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in jaccard_pairs(docs_df, cands, threshold=0.5).collect()}
    assert ("a1", "a2") in pairs and pairs[("a1", "a2")] == 1.0
    assert ("a1", "a3") in pairs and 0.5 <= pairs[("a1", "a3")] < 1.0
    assert all(not (a.startswith("a") and b.startswith("b")) for a, b in pairs)

    kept = sorted(r.doc_id for r in minhash_dedup(docs_df, threshold=0.5, n_hashes=32, n_bands=16).collect())
    assert kept == ["a1", "b1", "b2", "c1"]


def test_simhash_near_dup(spark, docs_df):
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_dup_pairs(docs_df, max_hamming=12, n_blocks=16).collect()}
    assert ("a1", "a2") in pairs and pairs[("a1", "a2")] == 0
    assert ("a1", "a3") in pairs
    assert ("b1", "b2") not in pairs
    # hamming function sanity
    d = spark.createDataFrame([(0b1011, 0b0010)], "x long, y long")
    assert d.select(hamming64("x", "y").alias("h")).collect()[0].h == 2


def test_simhash_md5_variant_matches_python_oracle(spark, docs_df):
    """The oracle-portable md5 SimHash must (a) agree with a pure-Python
    reimplementation of the bit math, (b) behave like the xxhash64 variant
    structurally: exact dup at hamming 0, near dup close, unrelated apart."""
    import hashlib
    import re as _re

    from ocr_spark.operators.dedup import simhash_bits_md5, simhash_md5_dup_pairs

    def py_bits(text: str) -> list[int]:
        words = _re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        counters = [0] * 64
        for w in words:
            h = hashlib.md5(w.encode()).hexdigest()[:16]
            v = int(h, 16)
            for j in range(64):
                counters[j] += 1 if (v >> j) & 1 else -1
        return [1 if c > 0 else 0 for c in counters]

    got = {r.id: list(r.bits) for r in simhash_bits_md5(docs_df).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == py_bits(text), doc_id

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_md5_dup_pairs(docs_df, max_hamming=12, n_blocks=16).collect()
    }
    assert ("a1", "a2") in pairs and pairs[("a1", "a2")] == 0
    assert ("a1", "a3") in pairs
    assert ("b1", "b2") not in pairs


def test_simhash_multi_index_matches_single_block(spark, docs_df):
    """Pair-of-blocks candidates must yield EXACTLY the single-block result
    set whenever both recall guards hold (the verified pairs are a pure
    function of the hashes; only candidate pruning differs) — for both the
    xxhash64 and md5 variants."""
    from ocr_spark.operators.dedup import simhash_md5_dup_pairs

    single = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_dup_pairs(docs_df, max_hamming=12, n_blocks=16).collect()
    }
    multi = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_dup_pairs(
            docs_df, max_hamming=12, n_blocks=16, multi_index=True
        ).collect()
    }
    assert single == multi and ("a1", "a2") in multi

    single_md5 = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_md5_dup_pairs(docs_df, max_hamming=12, n_blocks=16).collect()
    }
    multi_md5 = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_md5_dup_pairs(
            docs_df, max_hamming=12, n_blocks=16, multi_index=True
        ).collect()
    }
    assert single_md5 == multi_md5 and ("a1", "a2") in multi_md5


def test_simhash_multi_index_recall_guard(spark, docs_df):
    """h differing bits can dirty h blocks; fewer than 2 clean blocks ⇒ no
    shared pair is guaranteed — the guard must refuse, not silently miss."""
    from ocr_spark.operators.dedup import simhash_md5_dup_pairs

    with pytest.raises(ValueError, match="pair-index recall"):
        simhash_dup_pairs(docs_df, max_hamming=7, n_blocks=8, multi_index=True)
    with pytest.raises(ValueError, match="pair-index recall"):
        simhash_md5_dup_pairs(docs_df, max_hamming=15, n_blocks=16, multi_index=True)


def test_simhash_pair_index_occupancy_sublinear(spark):
    """The scale rationale for the multi-index, measured on the gate-shaped
    smoke corpus (sf0.001 docs + planted near-copies; SimHashes of same-
    vocabulary docs are CORRELATED, so this is the adversarial case, not
    the uniform one): pair-of-blocks buckets must be at most half as
    occupied as single 8-bit blocks and generate at most half the candidate
    pairs. Measured at 625 docs: max occupancy 172 → 41 (27.5% → 6.6% of
    the corpus in the hottest bucket), candidates 65,407 → 14,246 (4.6×).
    On uniform hashes the occupancy ratio approaches 2^width = 256×; the
    guarantee pinned here is the conservative 2× floor."""
    import os

    from ocr_spark.operators.dedup import _pair_index_candidates, simhash_bits_md5

    sf = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    un = docs.unionByName(near).withColumn(
        "doc_id", F.lpad(F.col("doc_id").cast("string"), 7, "0")
    )
    n_docs = un.count()
    n_blocks, width = 8, 8
    base = simhash_bits_md5(un, n_blocks=n_blocks)

    single_occ = (
        base.select(
            F.posexplode(
                F.array(*[F.col(f"block_{b}") for b in range(n_blocks)])
            ).alias("b", "v")
        )
        .groupBy("b", "v")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    pair_keys = F.array(
        *[
            F.struct(
                F.lit(i * n_blocks + j).alias("pidx"),
                (
                    F.col(f"block_{i}").cast("long") * F.lit(1 << width)
                    + F.col(f"block_{j}")
                ).alias("pkey"),
            )
            for i in range(n_blocks)
            for j in range(i + 1, n_blocks)
        ]
    )
    pair_occ = (
        base.select(F.explode(pair_keys).alias("k"))
        .groupBy("k.pidx", "k.pkey")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert n_docs > 0
    assert 2 * pair_occ <= single_occ, (pair_occ, single_occ)

    # candidate volume: pair-index candidates ⊆ never exceed single-block's
    n_pair_cands = _pair_index_candidates(base, n_blocks, width).count()
    blocks = base.select(
        "id",
        F.posexplode(
            F.array(*[F.col(f"block_{b}") for b in range(n_blocks)])
        ).alias("block", "block_val"),
    )
    a = blocks.select(F.col("id").alias("id_a"), "block", "block_val")
    b = blocks.select(F.col("id").alias("id_b"), "block", "block_val")
    n_single_cands = (
        a.join(b, ["block", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .count()
    )
    assert 2 * n_pair_cands <= n_single_cands, (n_pair_cands, n_single_cands)


def test_with_shingles_materializes_words_once(spark, docs_df):
    """with_shingles must equal word_shingles AND keep the normalize+split
    OUT of the transform lambda: the column-expression form re-inlines the
    split per element (no CSE in HOF lambdas) — measured O(len²): 67s vs
    2.3s on ONE 20k-word doc. The optimized plan must contain exactly one
    regexp_replace (in the words projection), none inside the lambda."""
    from ocr_spark.operators.dedup import with_shingles

    got = {
        r.doc_id: sorted(r.shingles)
        for r in with_shingles(docs_df, "text", 3).select("doc_id", "shingles").collect()
    }
    want = {
        r.doc_id: sorted(r.sh)
        for r in docs_df.select("doc_id", word_shingles("text", 3).alias("sh")).collect()
    }
    assert got == want

    plan = (
        with_shingles(docs_df, "text", 3)
        .select("doc_id", "shingles")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("regexp_replace") == 1, plan[:1500]


def test_exploded_shingles_have_no_inferred_lambda_filter(spark, docs_df):
    """The EXPLODED path (what minhash_signatures runs) must not carry the
    optimizer's inferred size()>0 Filter: predicate pushdown substitutes the
    full shingle expression into it with the split re-inlined inside the
    lambda — O(len²) per row, caught by jstack on the 47k-word corpus docs.
    explode_outer (arrays provably non-empty) generates no such filter."""
    from ocr_spark.operators.dedup import minhash_signatures, simhash_bits_md5

    for df in (
        minhash_signatures(docs_df, n_hashes=4),
        simhash_bits_md5(docs_df),
    ):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        for line in plan.splitlines():
            if line.strip().startswith(("Filter", "+- Filter")):
                assert "lambdafunction" not in line, line[:500]
                assert "split(" not in line, line[:500]


def test_dup_clusters_transitive_chain(spark):
    """A≈B and B≈C (A,C never a pair) must share one cluster; isolated
    nodes become singletons; star + chain shapes both converge — under
    BOTH methods (alternating star and min-label propagation)."""
    from ocr_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(2, 9), (9, 4), (4, 30), (50, 51), (52, 51)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in [2, 9, 4, 30, 50, 51, 52, 77]],
                                  "doc_id long")
    want = {2: 2, 9: 2, 4: 2, 30: 2, 50: 50, 51: 50, 52: 50, 77: 77}
    for method in ("star", "propagation"):
        got = {r.doc_id: r.cluster
               for r in dup_clusters(pairs, nodes=nodes, method=method).collect()}
        assert got == want, method


def test_dup_clusters_raises_on_non_convergence(spark):
    """A chain longer than max_iter PROPAGATION rounds must raise (not
    silently split); allow_partial=True opts into the partial labels."""
    from ocr_spark.operators.dedup import dup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(chain, max_iter=3, method="propagation")
    partial = dup_clusters(chain, max_iter=3, allow_partial=True,
                           method="propagation")
    assert partial.count() == 13
    # converged run resolves the whole chain to min id 0
    full = dup_clusters(chain, max_iter=15, method="propagation")
    assert {r.cluster for r in full.collect()} == {0}


def test_dup_clusters_star_bounds_rounds_on_long_chains(spark):
    """The alternating large-star/small-star method converges in O(log²)
    rounds regardless of graph DIAMETER: a 1000-link chain — which needs
    ~1000 min-label-propagation rounds — must resolve to one cluster well
    inside the default max_iter=20, while propagation at the same budget
    provably cannot (it raises)."""
    from ocr_spark.operators.dedup import dup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1000)], "id_a long, id_b long"
    )
    stats: dict = {}
    out = dup_clusters(chain, max_iter=20, stats=stats)
    assert stats["method"] == "star" and stats["rounds"] <= 15
    assert {r.cluster for r in out.collect()} == {0}
    assert out.count() == 1001
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(chain, max_iter=20, method="propagation")


def test_dup_clusters_methods_agree_on_random_graphs(spark):
    """Property check: star and propagation produce IDENTICAL (id, cluster)
    maps on a seeded random mix of chains, stars, cliques, and isolated
    nodes (the shapes the q_dedup_clusters planted edges stress)."""
    import random

    from ocr_spark.operators.dedup import dup_clusters

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(40, 70)]              # 30-link chain
    edges += [(100, 100 + j) for j in range(1, 8)]           # star
    edges += [(a, b) for a in range(200, 205)
              for b in range(a + 1, 205)]                    # clique
    edges += [(rng.randrange(300, 340), rng.randrange(300, 340))
              for _ in range(25)]                            # random (w/ self loops)
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.createDataFrame(
        [(i,) for i in range(400, 410)], "doc_id long"
    )
    star = {(r.doc_id, r.cluster)
            for r in dup_clusters(pairs, nodes=nodes, max_iter=40,
                                  method="star").collect()}
    prop = {(r.doc_id, r.cluster)
            for r in dup_clusters(pairs, nodes=nodes, max_iter=40,
                                  method="propagation").collect()}
    assert star == prop and len(star) > 0


def test_minhash_dedup_clustered_keeps_one_per_component(spark):
    """Chained near-dups (base ≈ c1 ≈ c2, base vs c2 below threshold) must
    collapse to the single smallest id per component."""
    from ocr_spark.operators.dedup import jaccard_pairs, minhash_dedup_clustered, minhash_lsh_candidates

    base = "the quick brown fox jumps over the lazy dog near the river bank today again and again"
    c1 = base + " drift one two three four five"
    c2 = c1 + " more drift six seven eight nine ten"
    rows = [("a1", base), ("a2", c1), ("a3", c2), ("z9", "entirely unrelated content about transformers")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(
            df, minhash_lsh_candidates(df, n_hashes=32, n_bands=16), threshold=0.55
        ).collect()
    }
    # the chain premise: adjacent pairs pass, the far pair does not
    assert ("a1", "a2") in pairs and ("a2", "a3") in pairs
    assert ("a1", "a3") not in pairs
    kept = sorted(
        r.doc_id
        for r in minhash_dedup_clustered(df, threshold=0.55, n_bands=16).collect()
    )
    assert kept == ["a1", "z9"]


def test_token_counts(spark):
    rows = [("x", "hello world, this is 42 tokens-ish"), ("y", ""), ("z", None), ("w", "  padded   text  ")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: (r.ws, r.bpe) for r in df.select(
        "doc_id",
        whitespace_token_count("text").alias("ws"),
        bpe_token_count("text").alias("bpe"),
    ).collect()}
    assert got["x"][0] == 6
    # hello|world|,|this|is|42|tokens|-|ish
    assert got["x"][1] == 9
    assert got["y"] == (0, 0) and got["z"] == (0, 0)
    assert got["w"][0] == 2


def test_detect_language(spark):
    rows = [
        ("ja", "この回路の合成抵抗を求めよ。電圧と電流の関係を示せ。"),
        ("en", "The quick brown fox jumps over the lazy dog."),
        ("other", "12345 67890 !!!! ????"),
        ("unknown", ""),
    ]
    df = spark.createDataFrame(rows, "want string, text string")
    for r in df.select("want", detect_language("text").alias("got")).collect():
        assert r.got == r.want, (r.want, r.got)


def test_quality_score_ranges(spark):
    rows = [
        ("good", "A well formed paragraph of reasonable length. " * 6),
        ("digits", "1 2 3 4 5 6 7 8 9 0 " * 20),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r.q for r in df.select("doc_id", quality_score("text").alias("q")).collect()}
    assert got["good"] >= 0.75
    assert got["digits"] <= 0.5
    assert 0.0 <= got["empty"] <= 0.5


def test_fingerprints(spark, docs_df):
    got = {r.doc_id: (r.fp, r.roll) for r in docs_df.select(
        "doc_id", doc_fingerprint("text").alias("fp"), rolling_fingerprints("text", 4).alias("roll")
    ).collect()}
    assert got["a1"][0] == got["a2"][0]  # normalization-equal docs → same fingerprint
    assert got["a1"][0] != got["a3"][0]
    n_words = len(DOCS[0][1].split())
    assert len(got["a1"][1]) == n_words - 3
    # near-dup docs share most rolling chunks
    shared = set(got["a1"][1]) & set(got["a3"][1])
    assert len(shared) >= len(got["a1"][1]) - 4


def test_simhash_canonical_index_emits_each_pair_once(spark, docs_df):
    """The canonical-index filter must leave EXACTLY one copy of every
    near-dup pair (the dropDuplicates it replaced guaranteed uniqueness;
    a filter bug would either duplicate pairs or drop them)."""
    from ocr_spark.operators.dedup import simhash_dup_pairs, simhash_md5_dup_pairs

    for fn, kw in [
        (simhash_dup_pairs, {"max_hamming": 12, "n_blocks": 16}),
        (simhash_dup_pairs, {"max_hamming": 12, "n_blocks": 16, "multi_index": True}),
        (simhash_md5_dup_pairs, {"max_hamming": 12, "n_blocks": 16}),
        (simhash_md5_dup_pairs, {"max_hamming": 12, "n_blocks": 16, "multi_index": True}),
    ]:
        pairs = [(r.id_a, r.id_b) for r in fn(docs_df, **kw).collect()]
        assert len(pairs) == len(set(pairs)), (fn.__name__, kw)
        assert pairs, (fn.__name__, kw)  # corpus has planted near-dups
