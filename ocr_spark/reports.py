"""S10 — similarity comparison report renderer.

Driver-side markdown rendering of a head/tail similarity result, mirroring
the reference's per-base comparison report structure
(/root/reference/src/compare_samples.py:156-241: ``# {base} の類似・非類似問題
比較`` header, ``## ベース問題`` / ``## 類似問題`` / ``## 非類似問題``
sections, ``### {name} (距離: {d:.4f})`` entries). The visual-grid half of
the reference (:243-315, matplotlib) is split across the codec-seam
pattern: :func:`plan_visual_grid` (pure layout plan, golden-tested here)
and :func:`render_visual_grid` (env-gated matplotlib Agg executor — raises
``NotImplementedError`` in this container, runs on cluster images that
ship matplotlib).

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


# ---------------------------------------------------------------------------
# S10 visual half — the reference's matplotlib comparison grid
# (/root/reference/src/compare_samples.py:243-315), split across the same
# seam pattern as the codecs: a PURE draw-plan (deterministic, golden-tested
# in this container) and an env-gated matplotlib executor that consumes it.
# ---------------------------------------------------------------------------
def plan_visual_grid(
    base_name: str,
    base_image: str | None,
    similar: Sequence[tuple[str, float]],
    dissimilar: Sequence[tuple[str, float]],
    max_rows: int = 3,
) -> dict | None:
    """Draw-command plan for the visual comparison grid.

    Mirrors the reference layout exactly (compare_samples.py:243-315):
    ``n_rows = 1 + min(max(n_sim, n_dis), 3)`` on a 3-column GridSpec,
    figsize ``(15, 5*n_rows)``; the base image centered in row 0, up to 3
    similar images down column 0 titled ``類似問題 {i+1} (距離: {d:.4f})``,
    up to 3 dissimilar down column 2 titled ``非類似問題 …``; every axis
    off; saved as ``{base_name}_visual_comparison.png`` at dpi 150.
    Returns ``None`` when the base image or either side is missing (the
    reference warns and skips).

    ``similar`` / ``dissimilar``: ranked ``(image_path, distance)`` pairs.
    """
    if not base_image or not similar or not dissimilar:
        return None
    n_rows = 1 + min(max(len(similar), len(dissimilar)), max_rows)
    cells = [
        {
            "row": 0,
            "col": 1,
            "image": base_image,
            "title": f"ベース問題: {base_name}",
        }
    ]
    for i, (img, distance) in enumerate(list(similar)[:max_rows]):
        cells.append(
            {
                "row": i + 1,
                "col": 0,
                "image": img,
                "title": f"類似問題 {i + 1} (距離: {distance:.4f})",
            }
        )
    for i, (img, distance) in enumerate(list(dissimilar)[:max_rows]):
        cells.append(
            {
                "row": i + 1,
                "col": 2,
                "image": img,
                "title": f"非類似問題 {i + 1} (距離: {distance:.4f})",
            }
        )
    return {
        "grid": (n_rows, 3),
        "figsize": (15, 5 * n_rows),
        "dpi": 150,
        "filename": f"{base_name}_visual_comparison.png",
        "title_fontsize": 12,
        "cells": cells,
    }


def render_visual_grid(plan: dict, output_dir: str, image_loader=None) -> str:
    """Execute a :func:`plan_visual_grid` plan with matplotlib (headless
    Agg) + the image codec seam; returns the written png path.

    Env-gated exactly like the real codecs: this container ships no
    matplotlib, so calling it here raises ``NotImplementedError`` — the
    plan half carries all the layout logic and is golden-tested without it.
    ``image_loader``: ``path → ndarray``; defaults to PIL via
    :func:`ocr_spark.operators.media._real_decode`'s library."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.gridspec import GridSpec
    except ImportError as exc:
        raise NotImplementedError(
            "visual comparison grid needs matplotlib; swap point only — "
            "this environment ships none (the markdown half of S10 is "
            "complete, reports.render_comparison_report)"
        ) from exc

    import os

    def _default_loader(path: str):
        import numpy as np
        from PIL import Image

        return np.array(Image.open(path))

    load = image_loader or _default_loader
    n_rows, n_cols = plan["grid"]
    fig = plt.figure(figsize=plan["figsize"])
    gs = GridSpec(n_rows, n_cols, figure=fig)
    for cell in plan["cells"]:
        ax = fig.add_subplot(gs[cell["row"], cell["col"]])
        ax.imshow(load(cell["image"]))
        ax.set_title(cell["title"], fontsize=plan["title_fontsize"])
        ax.axis("off")
    plt.tight_layout()
    out_path = os.path.join(output_dir, plan["filename"])
    plt.savefig(out_path, dpi=plan["dpi"])
    plt.close(fig)
    return out_path
