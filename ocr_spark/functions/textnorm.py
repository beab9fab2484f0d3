"""Text-normalization column functions (the extraction core, JVM-side).

Re-expresses the reference's per-record Python regex transforms as chained
native ``regexp_replace`` column expressions so they run inside whole-stage
codegen — no Python in the hot path.

Semantics parity notes (verified against CPython ``re`` in tests):

* The reference uses Python3 ``re`` where ``\\w \\d \\s`` are Unicode-aware and
  ``re.MULTILINE`` is a flag argument. Java regex needs inline ``(?U)`` /
  ``(?m)`` flags for the same behavior — every pattern below carries them
  explicitly where the reference relied on Python defaults.
* Pattern application ORDER is semantics (later patterns see earlier
  rewrites); the chain preserves the reference's exact sequence
  (/root/reference/src/ocr_to_markdown.py:231-246 applies them in list order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# T4 — math-pattern rewrite (KaTeX normalization)
# Ordered (java_pattern, java_replacement) pairs mirroring the reference's
# pattern table at /root/reference/src/ocr_to_markdown.py:61-86.
# Replacement syntax is Java Matcher.replaceAll: $1 = group ref, \$ = literal $.
# ---------------------------------------------------------------------------
MATH_PATTERNS: tuple[tuple[str, str], ...] = (
    # √a → $\sqrt{a}$
    (r"√(\d+)", r"\$\\sqrt{$1}\$"),
    # a/b → $\frac{a}{b}$
    (r"(\d+)/(\d+)", r"\$\\frac{$1}{$2}\$"),
    # superscript a^b → $a^{b}$   ((?U): Python \w is Unicode-aware)
    (r"(?U)(\w+)\^(\d+)", r"\$$1^{$2}\$"),
    # subscript a_b → $a_{b}$
    (r"(?U)(\w+)_(\d+)", r"\$$1_{$2}\$"),
    # trig functions
    (r"sin\(([^)]+)\)", r"\$\\sin($1)\$"),
    (r"cos\(([^)]+)\)", r"\$\\cos($1)\$"),
    (r"tan\(([^)]+)\)", r"\$\\tan($1)\$"),
    # block math [数式:x] → $$x$$
    (r"\[数式:([^]]+)\]", r"\$\$$1\$\$"),
    # integral ∫ expr d x → $\int expr d x$ (reference keeps a space before d)
    (r"∫\s*([^d]+)d([a-z])", r"\$\\int $1 d$2\$"),
    # Greek letters
    (r"α", r"\$\\alpha\$"),
    (r"β", r"\$\\beta\$"),
    (r"γ", r"\$\\gamma\$"),
    (r"θ", r"\$\\theta\$"),
    (r"π", r"\$\\pi\$"),
    # infinity
    (r"∞", r"\$\\infty\$"),
)


def apply_math_patterns(col: Column | str) -> Column:
    """T4: ordered KaTeX rewrite chain as native regexp_replace expressions.

    All 15 rewrites fuse into one whole-stage-codegen projection — zero
    shuffles, zero Python.
    """
    out = F.col(col) if isinstance(col, str) else col
    for pattern, replacement in MATH_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


# ---------------------------------------------------------------------------
# T5 — figure-tag insertion
# Reference: /root/reference/src/ocr_to_markdown.py:89,331-350 — a single
# alternation regex [図N]|[表N]|[Fig.N]|[TableN] whose callback picks whichever
# group matched. Java replaceAll cannot conditionally pick groups, but the four
# alternatives are disjoint literal prefixes, so four sequential rewrites are
# exactly equivalent.
# ---------------------------------------------------------------------------
FIGURE_REF_PATTERNS: tuple[str, ...] = (
    r"\[図(\d+)\]",
    r"\[表(\d+)\]",
    r"\[Fig\.(\d+)\]",
    r"\[Table(\d+)\]",
)

# Sentinel used to mark inserted image tags so a downstream native `split`
# can promote them to media spans (see operators/extract.py).
_IMG_SENTINEL = "\x00"


def insert_image_tags(
    col: Column | str,
    base_filename: Column,
    image_base_path: str = "images",
    sentinel: bool = False,
) -> Column:
    """T5: rewrite figure refs to markdown image tags in document order.

    ``[図N]`` → ``\\n\\n![図N]({image_base_path}/{base}_figure_N.png)\\n\\n``
    (reference format string at /root/reference/src/ocr_to_markdown.py:347-348).

    With ``sentinel=True`` the inserted tag is wrapped in NUL sentinels so the
    span-splitter can losslessly promote it to a ``media`` span natively.
    """
    out = F.col(col) if isinstance(col, str) else col
    pre = _IMG_SENTINEL if sentinel else "\n\n"
    post = _IMG_SENTINEL if sentinel else "\n\n"
    for pattern in FIGURE_REF_PATTERNS:
        replacement = F.concat(
            F.lit(pre + "![図$1](" + image_base_path + "/"),
            base_filename,
            F.lit("_figure_$1.png)" + post),
        )
        out = F.regexp_replace(out, F.lit(pattern), replacement)
    return out


# ---------------------------------------------------------------------------
# T6 — layout formatting
# Reference: /root/reference/src/ocr_to_markdown.py:352-371 — four ordered
# multiline rewrites.
# ---------------------------------------------------------------------------
LAYOUT_PATTERNS: tuple[tuple[str, str], ...] = (
    # collapse ≥3 newlines to 2
    (r"\n{3,}", "\n\n"),
    # bullets •·・ → "- "   ((?mU): multiline + Unicode \s incl. U+3000)
    (r"(?mU)^(\s*)([•·・])(\s*)", "$1- "),
    # "N. heading text" line → "## N. heading text"
    (r"(?mU)^(\d+)[\.．、]\s+(.+)$", "## $1. $2"),
    # normalize choice numbering N[.．、] → "N. " (not followed by a digit)
    (r"(?mU)^(\s*)(\d+)[\.．、](\s*)(?!\d)", "$1$2. "),
)


def format_layout(col: Column | str) -> Column:
    """T6: layout formatting as a native 4-step rewrite chain."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, replacement in LAYOUT_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


# ---------------------------------------------------------------------------
# T13 — question-ID derivation from a document/file name
# Reference: /root/reference/src/markdown_importer.py:145-169,186-192 — three
# ordered regex attempts with "000" fallback, zero-padded to 3, prefixed.
# ---------------------------------------------------------------------------
def derive_question_number(col: Column | str) -> Column:
    """First non-empty of ``_page_(\\d+)`` / ``[_-](\\d+)`` / ``^(\\d+)``, else 000."""
    c = F.col(col) if isinstance(col, str) else col
    first = F.regexp_extract(c, r"_page_(\d+)", 1)
    second = F.regexp_extract(c, r"[_-](\d+)", 1)
    third = F.regexp_extract(c, r"^(\d+)", 1)
    num = F.when(first != "", first).when(second != "", second).when(third != "", third).otherwise(F.lit("000"))
    return num


def derive_question_id(col: Column | str, prefix: str = "Q") -> Column:
    """T13: ``{prefix}{zfill(num, 3)}`` (reference :192).

    Python ``zfill`` never truncates, but Spark ``lpad`` truncates to the
    target length — so only pad when shorter than 3.
    """
    num = derive_question_number(col)
    padded = F.when(F.length(num) < 3, F.lpad(num, 3, "0")).otherwise(num)
    return F.concat(F.lit(prefix), padded)


# ---------------------------------------------------------------------------
# T9 — fenced-JSON block extraction
# Reference: /root/reference/src/generate_embedding.py:187-193 and
# src/compare_samples.py:106-154 — pull ```json ... ``` out of text.
# ---------------------------------------------------------------------------
def extract_json_block(col: Column | str) -> Column:
    """Extract the first ```json fenced block; empty string when absent.

    ``(?s)`` lets ``.`` cross newlines (fenced blocks are multi-line).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_extract(c, r"(?s)```json(.*?)```", 1))


# ---------------------------------------------------------------------------
# T12 — MIME sniff from extension
# Reference: /root/reference/src/ocr_to_markdown.py:105-123.
# ---------------------------------------------------------------------------
def mime_type(path_col: Column | str) -> Column:
    ext = F.lower(F.substring_index(F.col(path_col) if isinstance(path_col, str) else path_col, ".", -1))
    return (
        F.when(ext == "png", "image/png")
        .when(ext.isin("jpg", "jpeg"), "image/jpeg")
        .when(ext == "webp", "image/webp")
        .when(ext == "gif", "image/gif")
        .otherwise("application/octet-stream")
    )
