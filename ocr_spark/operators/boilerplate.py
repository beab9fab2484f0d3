"""HTML main-content extraction — Readability/Boilerpipe-style density
scoring as native DataFrame transforms (north_rule: "HTML boilerplate strip
… via text-density/link-density heuristics (Readability/Boilerpipe-style DOM
scoring)").

The classic algorithms score DOM blocks by how much of their text is link
anchor text (link density) and how dense the text is relative to markup
(text density), then keep high-text/low-link blocks as main content
(Kohlschütter et al., WSDM 2010 — the shallow-features result: densities
alone recover most of the gain of full DOM parsing). This implementation is
the distributed analog:

1. **Block split** (:func:`html_blocks`): the raw HTML string is split on
   block-level tags (``p/div/nav/header/footer/h1-6/li/ul/ol/article/
   section/aside/table/tr/td/br``) and EXPLODED — one row per block, so a
   single 100 MB page spreads over tasks instead of sitting in one cell, and
   every per-block stat below is a materialized plain column (never an
   expensive expression referenced inside a HOF lambda — see the project's
   Catalyst lambda-CSE pitfall).
2. **Density features**: per block — visible text (tags stripped, whitespace
   collapsed), ``text_chars``, ``n_words``, anchor text via
   ``regexp_extract_all(<a…>(.*?)</a>)``, ``link_chars``,
   ``link_density = link_chars / max(text_chars, 1)`` and
   ``text_density = text_chars / (1 + n_tags)``. All native ``regexp_*`` —
   zero Python, fuses into the scan.
3. **Classification** (:func:`classify_blocks`): content ⇔
   ``text_chars ≥ min_text_chars AND link_density < max_link_density`` — the
   simplified Boilerpipe "DefaultExtractor" rule (no sequence smoothing;
   documented swap point for a trained classifier).
4. **Reassembly** (:func:`strip_boilerplate`): kept blocks concatenated in
   document order per doc — one shuffle on ``doc_id`` with map-side-combined
   aggregation.

Everything is SQL-expressible, so the driver gate checks the whole chain
value-exactly against DuckDB (``html_boilerplate`` / ``html_blocks``).

Reference anchor: the reference repo OCRs PDFs rather than scraping HTML,
but its pipeline's "strip non-content noise before import" role
(/root/reference/src/ocr_to_markdown.py:352-371 layout cleanup) is the same
stage; this operator is the web-corpus generalization the north rule asks
for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.textstats import WS_CLASS

# block-level elements: opening OR closing tags act as block boundaries
BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|nav|header|footer|h[1-6]|li|ul|ol|article|section|"
    r"aside|table|tr|td|br)\b[^>]*>"
)
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
_TAG_RE = r"(?s)<[^>]*>"

DEFAULT_MIN_TEXT_CHARS = 25
DEFAULT_MAX_LINK_DENSITY = 1.0 / 3.0


def visible_text(raw: Column | str) -> Column:
    """Markup → visible text: strip tags, collapse whitespace, trim."""
    c = F.col(raw) if isinstance(raw, str) else raw
    return F.trim(F.regexp_replace(F.regexp_replace(c, _TAG_RE, " "), WS_CLASS + "+", " "))


def html_blocks(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, block_no, text, text_chars, n_words, n_tags, link_chars,
    link_density, text_density) — one row per DOM block.

    ``posexplode`` keeps document order in ``block_no``; per-block features
    are plain materialized columns computed after the explode, so each regex
    runs once per block."""
    # posexplode_OUTER: plain (pos)explode makes the optimizer infer a
    # `size(...) > 0` filter that re-evaluates the regex split once more per
    # row; split() never returns an empty array, so outer is row-identical
    # and skips that filter entirely
    blocks = df.select(
        F.col(id_col),
        F.posexplode_outer(F.split(F.col(html_col), BLOCK_TAG_RE)).alias(
            "block_no", "raw"
        ),
    )
    text = visible_text("raw")
    link_chars = F.aggregate(
        F.transform(
            F.regexp_extract_all("raw", F.lit(_ANCHOR_RE), 1),
            lambda a: F.length(
                F.trim(F.regexp_replace(F.regexp_replace(a, _TAG_RE, " "), WS_CLASS + "+", " "))
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_tags = F.size(F.regexp_extract_all("raw", F.lit(_TAG_RE), 0))
    with_text = blocks.withColumn("text", text).withColumn(
        "link_chars", link_chars
    ).withColumn("n_tags", n_tags)
    text_chars = F.length("text")
    n_words = F.when(F.col("text") == "", 0).otherwise(
        F.size(F.split("text", " "))
    )
    return with_text.select(
        id_col,
        "block_no",
        "text",
        text_chars.alias("text_chars"),
        n_words.alias("n_words"),
        "n_tags",
        "link_chars",
        F.round(
            F.col("link_chars") / F.greatest(text_chars, F.lit(1)), 6
        ).alias("link_density"),
        F.round(text_chars / (1 + F.col("n_tags")), 6).alias("text_density"),
    )


def classify_blocks(
    blocks: DataFrame,
    min_text_chars: int = DEFAULT_MIN_TEXT_CHARS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> DataFrame:
    """Append ``is_content`` — the simplified Boilerpipe density rule."""
    return blocks.withColumn(
        "is_content",
        (F.col("text_chars") >= min_text_chars)
        & (F.col("link_density") < max_link_density),
    )


def strip_boilerplate(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_text_chars: int = DEFAULT_MIN_TEXT_CHARS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> DataFrame:
    """(doc_id, main_text, n_blocks, n_content) — main content per document.

    Kept blocks join with blank lines in block order (order-exact via
    sort_array over (block_no, text) structs — no per-doc window). One
    shuffle on doc_id; blocks of a huge page arrive from many map tasks."""
    cls = classify_blocks(
        html_blocks(df, html_col, id_col), min_text_chars, max_link_density
    )
    kept_struct = F.when(
        F.col("is_content"), F.struct("block_no", "text")
    )
    agg = cls.groupBy(id_col).agg(
        F.count("*").alias("n_blocks"),
        F.sum(F.col("is_content").cast("int")).alias("n_content"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["text"]
            ),
            "\n\n",
        ).alias("main_text"),
    )
    return agg.select(
        id_col,
        "main_text",
        "n_blocks",
        F.col("n_content").cast("int").alias("n_content"),
    )
