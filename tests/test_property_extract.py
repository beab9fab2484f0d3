"""Hypothesis property tests: adversarial span payloads through the native
extraction chain vs the pure-CPython oracle (SURVEY §5.2.3).

Hypothesis generates the corpus ONCE per session (derandomized, fixed seed)
and all examples run in a single Spark job — per-example Spark jobs would be
minutes-slow.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from ocr_spark.operators.extract import extract_docs
from ocr_spark.schema import DOC_SCHEMA
from tests import oracle

# payload alphabet biased toward the rewrite chain's trigger characters,
# plus newlines/whitespace (multiline layout rules) and CJK
_ALPHABET = st.sampled_from(
    list("abcXY019 ._^/()[]{}:\n\t") + ["√", "∫", "α", "π", "∞", "図", "表", "数", "式",
                                        "•", "・", "．", "、", "解", "説", "正"]
)
_payload = st.text(alphabet=_ALPHABET, min_size=0, max_size=60)
_kind = st.sampled_from(["text", "heading", "choice", "math", "table"])


@st.composite
def _doc(draw, idx: int = 0):
    n = draw(st.integers(min_value=1, max_value=8))
    spans = []
    for off in range(n):
        if draw(st.booleans()) and off % 3 == 0:
            spans.append(
                {"kind": "media", "text": "", "media_ref": f"img://d/{off}", "offset": off}
            )
        else:
            spans.append(
                {
                    "kind": draw(_kind),
                    "text": draw(_payload),
                    "media_ref": None,
                    "offset": off,
                }
            )
    # shuffle offsets' order in the array — extract must re-sort
    perm = draw(st.permutations(spans))
    return perm


@given(st.lists(_doc(), min_size=1, max_size=25))
@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_extract_matches_cpython_oracle_on_adversarial_spans(spark, docs_batch):
    rows = [(f"doc{i:04d}", spans) for i, spans in enumerate(docs_batch)]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in extract_docs(df).collect()
    }
    for doc_id, spans in rows:
        want = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in oracle.extract_doc(doc_id, [dict(s) for s in spans])
        ]
        assert got[doc_id] == want, f"{doc_id}: {got[doc_id]} != {want}"
