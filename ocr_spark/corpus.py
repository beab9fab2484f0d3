"""Deterministic synthetic corpus generator (M0, FIXTURES.md §1).

Generates the ``input_hint`` table shape — ``doc_id:string,
spans:array<struct<kind,text,media_ref,offset>>`` — entirely inside Spark via
``mapInPandas`` over ``spark.range(n)``. Every document is a pure function of
``(seed, doc index)`` so the corpus is byte-identical no matter the
partitioning or parallelism (asserted in tests at local[2] vs local[8]).

Content mirrors the reference's demo corpus
(/root/reference/ocr_demo_results.md): prose interleaved with raw math the
rewrite chain must hit, bullets, numbered/choice lines, figure refs
``[図N] [表N] [Fig.N] [TableN]``, and media spans with ``img://`` refs. Skew
knobs model multi-hundred-page PDFs (0.1% of docs at 5k–20k spans) and
media-dense circuit pages (1% of docs at 60% media density).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ocr_spark.schema import DOC_SCHEMA

# Bump whenever _gen_doc / fragments / knob semantics change: bench.py and
# scripts/bench_scaling.py key their /tmp parquet cache on this token, so a
# generator change invalidates cached corpora instead of silently reusing
# stale data in the headline/scaling evidence.
CORPUS_VERSION = "v1"

_TEXT_FRAGMENTS = (
    "この回路の合成抵抗を求めよ",
    "The impedance is given by √{n}",
    "電圧 V は {n}/100 で表される",
    "x^{n} + a_{n} の値を計算する",
    "sin(θt) の波形を考える",
    "[数式:E=mc^2] が成り立つとき",
    "∫x dx を計算すると",
    "係数 α と β の積は γ に等しい",
    "周波数 f が ∞ に近づくとき位相は π/2 となる",
    "次の文章を読み、正しいものを選べ",
)

_HEADING_FRAGMENTS = (
    "{n}. 電気回路の基礎",
    "{n}． 電力系統に関する問題",
    "{n}、 施工管理の要点",
)

_CHOICE_FRAGMENTS = (
    "{n}. 抵抗は {m} Ωである",
    "{n}． インピーダンスは √{m} で与えられる",
    "{n}、 電流は {m}/10 Aとなる",
)

_BULLET_FRAGMENTS = (
    "• 配線は {n} 回路に分割する",
    "・ 接地抵抗は {n} Ω以下とする",
    "· Check item {n}",
)

_MATH_FRAGMENTS = (
    "Z = √{n} + x^2",
    "I = {n}/50 × sin(ωt)",
    "V_1 = α × ∫i dt",
    "[数式:P = {n}V I cos(θ)]",
)

_FIGURE_REF_FRAGMENTS = (
    "[図{n}]に示す回路について",
    "[表{n}]の値を参照せよ",
    "See [Fig.{n}] for the diagram",
    "[Table{n}] lists the constants",
)


def _gen_doc(seed: int, idx: int, media_pct: float, heavy_pct: float) -> tuple[str, list]:
    """Generate one document deterministically from (seed, idx)."""
    rng = np.random.RandomState((seed * 1_000_003 + idx) % (2**31 - 1))
    doc_id = f"R{(idx % 7) + 1:02d}_page_{idx:06d}"

    # span count: lognormal clipped [3, 400]; heavy tail 5k–20k (FIXTURES §1)
    if rng.rand() < heavy_pct:
        n_spans = int(rng.randint(5_000, 20_001))
    else:
        n_spans = int(np.clip(rng.lognormal(2.5, 1.0), 3, 400))

    # media density: default 15%, media-dense tail 60%
    density = 0.60 if rng.rand() < 0.01 else media_pct

    spans = []
    fig_no = 0
    for off in range(n_spans):
        r = rng.rand()
        n, m = int(rng.randint(1, 100)), int(rng.randint(1, 10))
        if r < density:
            fig_no += 1
            spans.append(
                ("media", "", f"img://{doc_id}/fig_{fig_no}.png", off)
            )
        elif r < density + 0.08:
            spans.append(("heading", _HEADING_FRAGMENTS[n % 3].format(n=m), None, off))
        elif r < density + 0.18:
            spans.append(("choice", _CHOICE_FRAGMENTS[n % 3].format(n=m, m=n), None, off))
        elif r < density + 0.28:
            spans.append(("math", _MATH_FRAGMENTS[n % 4].format(n=n), None, off))
        elif r < density + 0.36:
            fig_no += 1
            spans.append(("text", _FIGURE_REF_FRAGMENTS[n % 4].format(n=fig_no), None, off))
        elif r < density + 0.42:
            spans.append(("text", _BULLET_FRAGMENTS[n % 3].format(n=m), None, off))
        else:
            spans.append(("text", _TEXT_FRAGMENTS[n % 10].format(n=n), None, off))
    return doc_id, spans


def generate_docs(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    media_pct: float = 0.15,
    heavy_pct: float = 0.001,
    partitions: int | None = None,
) -> DataFrame:
    """Build the synthetic ``docs`` DataFrame (schema = DOC_SCHEMA)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in pdf["id"].tolist():
                doc_id, spans = _gen_doc(seed, int(idx), media_pct, heavy_pct)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "spans": [
                            {"kind": k, "text": t, "media_ref": mr, "offset": o}
                            for k, t, mr, o in spans
                        ],
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    n_parts = partitions or max(2, min(n_docs // 250, 256))
    base = spark.range(0, n_docs, numPartitions=n_parts)
    return base.mapInPandas(gen, schema=DOC_SCHEMA)


def generate_docs_pandas(n_docs: int, seed: int = 42, media_pct: float = 0.15,
                         heavy_pct: float = 0.001) -> pd.DataFrame:
    """Driver-side twin of :func:`generate_docs` for oracle tests."""
    rows = []
    for idx in range(n_docs):
        doc_id, spans = _gen_doc(seed, idx, media_pct, heavy_pct)
        rows.append(
            {
                "doc_id": doc_id,
                "spans": [
                    {"kind": k, "text": t, "media_ref": mr, "offset": o}
                    for k, t, mr, o in spans
                ],
            }
        )
    return pd.DataFrame(rows, columns=["doc_id", "spans"])
