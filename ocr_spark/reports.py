"""S10 — similarity comparison report renderer.

Driver-side markdown rendering of a head/tail similarity result, mirroring
the reference's per-base comparison report structure
(/root/reference/src/compare_samples.py:156-241: ``# {base} の類似・非類似問題
比較`` header, ``## ベース問題`` / ``## 類似問題`` / ``## 非類似問題``
sections, ``### {name} (距離: {d:.4f})`` entries). The visual-grid half of
the reference (:243-315, matplotlib) has no renderer in this container; the
markdown report is the complete textual artifact.

Input is a COLLECTED top-k result (tens of rows — the distributed work is
the scoring upstream, e.g. ``head_tail_similar``); rendering is pure string
assembly and is golden-tested byte-exact.
"""

from __future__ import annotations

from collections.abc import Sequence


def render_comparison_report(
    base_name: str,
    base_content: str,
    similar: Sequence[tuple[str, float, str]],
    dissimilar: Sequence[tuple[str, float, str]],
    max_samples: int = 3,
) -> str:
    """Markdown comparison report.

    ``similar`` / ``dissimilar``: (name, distance, content) tuples, already
    ranked; only the first ``max_samples`` of each render (reference
    ``[:max_samples]``, compare_samples.py:169-170).
    """
    md = f"# {base_name} の類似・非類似問題比較\n\n"
    md += "## ベース問題\n\n"
    md += base_content + "\n\n"
    md += "## 類似問題\n\n"
    for name, distance, content in list(similar)[:max_samples]:
        md += f"### {name} (距離: {distance:.4f})\n\n"
        md += content + "\n\n"
    md += "## 非類似問題\n\n"
    for name, distance, content in list(dissimilar)[:max_samples]:
        md += f"### {name} (距離: {distance:.4f})\n\n"
        md += content + "\n\n"
    return md


def report_from_head_tail(
    head_tail_rows: Sequence,
    base_name: str,
    base_content: str = "",
    content_by_id: dict | None = None,
    max_samples: int = 3,
) -> str:
    """Adapter: rows from ``head_tail_similar`` (with ``doc_id``,
    ``similarity``, ``side``) → comparison report. Distance = 1 − cosine
    (the reference stores pgvector cosine DISTANCE, src/db_utils.py:285)."""
    content_by_id = content_by_id or {}
    sim = sorted(
        (r for r in head_tail_rows if r.side == "similar"),
        key=lambda r: (-r.similarity, r.doc_id),
    )
    dis = sorted(
        (r for r in head_tail_rows if r.side == "dissimilar"),
        key=lambda r: (r.similarity, r.doc_id),
    )
    mk = lambda r: (  # noqa: E731
        str(r.doc_id), 1.0 - r.similarity, content_by_id.get(r.doc_id, "")
    )
    return render_comparison_report(
        base_name, base_content, [mk(r) for r in sim], [mk(r) for r in dis],
        max_samples=max_samples,
    )
