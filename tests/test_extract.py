"""M1 golden tests: span-sequence equality (kind, text, media_ref, order).

Spark implementation vs pure-CPython oracle on fixture archetypes G01–G10
(FIXTURES.md §2) plus a seeded random corpus slice.
"""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_spark import corpus
from ocr_spark.operators.extract import (
    convert_text_reference_exact,
    extract_docs,
    extract_docs_salted,
    render_markdown,
)
from ocr_spark.schema import DOC_SCHEMA

from .conftest import spans_of
from . import oracle

import pyspark.sql.functions as F


def _mk(doc_id, triples):
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": mr, "offset": o}
            for o, (k, t, mr) in enumerate(triples)
        ],
    }


GOLDEN_DOCS = [
    # G01 formula problem
    _mk("R04_page_000001", [
        ("heading", "1. 電気回路の基礎", None),
        ("text", "インピーダンスは √2 で与えられ x^2 + a_1 を満たす", None),
        ("choice", "1． 抵抗は 3/4 Ωである", None),
        ("choice", "2、 sin(ωt) に比例する", None),
        ("choice", "3. cos(θ) に等しい", None),
        ("choice", "4. tan(x) となる", None),
        ("text", "解説: [数式:E=mc^2] が成り立つ", None),
        ("math", "∫x dx を計算すると α β γ θ π ∞", None),
    ]),
    # G02 figure problem — ref rewritten in place
    _mk("R04_page_000002", [
        ("text", "次の回路 [図1] を見て答えよ", None),
        ("text", "図の説明文", None),
        ("math", "Z = √4", None),
    ]),
    # G03 table problem
    _mk("R04_page_000003", [
        ("text", "[表2] の値を参照", None),
        ("table", "| 項目 | 値 |\n| R | 1/2 |", None),
    ]),
    # G04 circuit page with media span
    _mk("R04_page_000004", [
        ("text", "回路図を示す", None),
        ("media", "", "img://R04_page_000004/fig_1.png"),
        ("choice", "1. 電流は 5/10 Aとなる", None),
    ]),
    # G05 multi-figure page
    _mk("R04_page_000005", [
        ("math", "V = I R", None),
        ("media", "", "img://R04_page_000005/fig_1.png"),
        ("math", "P = V I", None),
        ("media", "", "img://R04_page_000005/fig_2.png"),
        ("text", "[Fig.3] and [Table4] discussed", None),
    ]),
    # G06 plain text
    _mk("R04_page_000006", [
        ("heading", "2． 施工管理の要点", None),
        ("text", "• 配線は 3 回路に分割する\n・ 接地抵抗", None),
        ("text", "普通の文章です", None),
    ]),
    # G07/G08 content edge cases handled in structure tests; here passthrough
    # G09 giant doc exercised in test_salted_path_equivalence
    # G10 empty/edge
    _mk("R04_page_000010", [
        ("text", "", None),
        ("media", "", "img://R04_page_000010/fig_1.png"),
        ("text", "ユニコード： 数式 √9 と ∞ と π", None),
    ]),
    # out-of-order offsets must be re-sorted before processing
    {
        "doc_id": "R04_page_000011",
        "spans": [
            {"kind": "text", "text": "second √4", "media_ref": None, "offset": 1},
            {"kind": "text", "text": "first [図1]", "media_ref": None, "offset": 0},
        ],
    },
]


@pytest.fixture(scope="module")
def golden_df(spark):
    return spark.createDataFrame(pd.DataFrame(GOLDEN_DOCS), schema=DOC_SCHEMA)


def _oracle_spans(docs):
    return {
        d["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in oracle.extract_doc(d["doc_id"], d["spans"])
        ]
        for d in docs
    }


def test_extract_golden_span_sequence(spark, golden_df):
    got = spans_of(extract_docs(golden_df))
    want = _oracle_spans(GOLDEN_DOCS)
    assert got.keys() == want.keys()
    for doc_id in want:
        assert got[doc_id] == want[doc_id], f"span mismatch in {doc_id}"


def test_extract_random_corpus_vs_oracle(spark):
    docs_pdf = corpus.generate_docs_pandas(60, seed=7, heavy_pct=0.0)
    df = spark.createDataFrame(docs_pdf, schema=DOC_SCHEMA)
    got = spans_of(extract_docs(df))
    want = _oracle_spans(docs_pdf.to_dict("records"))
    assert got == want


def test_corpus_partition_invariance(spark):
    a = corpus.generate_docs(spark, 200, seed=42, partitions=2)
    b = corpus.generate_docs(spark, 200, seed=42, partitions=13)
    assert spans_of(a) == spans_of(b)


def test_salted_path_equivalence(spark):
    """G09: giant doc (10k spans) + tiny docs — salted exploded path must
    produce byte-identical span sequences to the narrow path."""
    docs_pdf = corpus.generate_docs_pandas(12, seed=11, heavy_pct=0.0)
    giant = corpus._gen_doc(99, 0, 0.15, 0.0)
    import numpy as np
    rng = np.random.RandomState(5)
    spans = []
    for off in range(10_000):
        k = int(rng.randint(0, 3))
        if k == 0:
            spans.append({"kind": "media", "text": "", "media_ref": f"img://G/{off}.png", "offset": off})
        elif k == 1:
            spans.append({"kind": "text", "text": f"span {off} with √{off % 97} and [図{off % 9 + 1}]", "media_ref": None, "offset": off})
        else:
            spans.append({"kind": "math", "text": f"x^{off % 13} + a_{off % 7}", "media_ref": None, "offset": off})
    rows = docs_pdf.to_dict("records") + [{"doc_id": "GIANT_page_000001", "spans": spans}]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=DOC_SCHEMA)
    narrow = spans_of(extract_docs(df))
    salted = spans_of(extract_docs_salted(df, salt_buckets=8, chunk=128))
    assert narrow == salted


def test_reference_exact_text_path(spark):
    texts = [
        ("√4 and 3/4 then x^2 a_1 sin(x) cos(y) tan(z)", "doc_a"),
        ("[数式:E=mc^2] ∫x dx α β γ θ π ∞", "doc_b"),
        ("前文 [図1] 中文 [表2] 後文 [Fig.3] end [Table4]", "doc_c"),
        ("1． 見出し\n2、選択肢\n• item\n\n\n\n\nend\n3.14 not heading", "doc_d"),
    ]
    df = spark.createDataFrame(texts, ["text", "base"])
    got = [
        r.o
        for r in df.select(
            convert_text_reference_exact("text", F.col("base")).alias("o")
        ).collect()
    ]
    want = [oracle.convert_text_reference_exact(t, b) for t, b in texts]
    assert got == want


def test_render_markdown(spark, golden_df):
    ext = extract_docs(golden_df)
    got = {r.doc_id: r.content for r in render_markdown(ext).collect()}
    for d in GOLDEN_DOCS:
        want = oracle.render_markdown(oracle.extract_doc(d["doc_id"], d["spans"]))
        assert got[d["doc_id"]] == want


def test_extract_plan_is_shuffle_free(spark, golden_df):
    plan = extract_docs(golden_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"narrow path must not shuffle:\n{plan}"
