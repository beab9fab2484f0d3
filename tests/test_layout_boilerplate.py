"""Unit tests: HTML boilerplate strip + layout-region detection (the two
north-rule operators), on hand-built fixtures independent of the driver
gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.boilerplate import (
    classify_blocks,
    html_blocks,
    strip_boilerplate,
    visible_text,
)
from ocr_spark.operators.layout import assemble_reading_order, detect_regions


# ---------------------------------------------------------------------------
# boilerplate
# ---------------------------------------------------------------------------
_PAGE = (
    '<nav><a href="/">Home</a> <a href="/a">Archive</a> <a href="/c">Contact</a></nav>'
    "<h1>A real article headline about circuits</h1>"
    "<p>This is the first substantive paragraph of the article body, long "
    "enough to pass any sane length threshold, with <b>inline</b> markup.</p>"
    '<p>Second paragraph with one <a href="/ref">reference link</a> inside '
    "plenty of surrounding prose so the link density stays low.</p>"
    "<p>ok</p>"
    '<div><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a> '
    '<a href="/4">four</a></div>'
    '<footer>© 2026 <a href="/p">Privacy</a> <a href="/t">Terms</a></footer>'
)


def test_visible_text_strips_tags_and_collapses(spark):
    df = spark.createDataFrame(
        [("<p>a  <b>b</b>\n c</p>",)], ["raw"]
    ).select(visible_text("raw").alias("t"))
    assert df.collect()[0].t == "a b c"


def test_boilerplate_classification(spark):
    df = spark.createDataFrame([(1, _PAGE)], "doc_id long, html string")
    cls = classify_blocks(html_blocks(df)).filter(F.col("text_chars") > 0)
    by_text = {r.text: r for r in cls.collect()}
    # content: headline + two paragraphs
    assert by_text["A real article headline about circuits"].is_content
    first = next(t for t in by_text if t.startswith("This is the first"))
    assert by_text[first].is_content
    second = next(t for t in by_text if t.startswith("Second paragraph"))
    assert by_text[second].is_content
    assert by_text[second].link_density < 1 / 3
    # boilerplate: nav (short + link-heavy), tiny block, link farm, footer
    assert not by_text["Home Archive Contact"].is_content
    assert not by_text["ok"].is_content
    assert not by_text["one two three four"].is_content
    footer = next(t for t in by_text if "Privacy" in t)
    assert not by_text[footer].is_content
    assert by_text["one two three four"].link_density > 0.5


def test_strip_boilerplate_reassembles_in_order(spark):
    df = spark.createDataFrame([(1, _PAGE)], "doc_id long, html string")
    out = strip_boilerplate(df).collect()[0]
    parts = out.main_text.split("\n\n")
    assert parts[0] == "A real article headline about circuits"
    assert parts[1].startswith("This is the first substantive paragraph")
    assert parts[2].startswith("Second paragraph")
    assert out.n_content == 3


def test_strip_boilerplate_empty_and_plain(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "no markup at all but a reasonably long plain sentence")],
        "doc_id long, html string",
    )
    rows = {r.doc_id: r for r in strip_boilerplate(df).collect()}
    assert rows[1].main_text == "" and rows[1].n_content == 0
    assert rows[2].n_content == 1
    assert rows[2].main_text.startswith("no markup")


# ---------------------------------------------------------------------------
# layout
# ---------------------------------------------------------------------------
def _page_tokens(spark):
    """Two columns; left column has two blocks (y-gap 79 > threshold), right
    column one block; 1px baseline jitter between consecutive tokens stays
    under the gap threshold (tokens sort strictly by (y, x) — jitter must
    not flip x order, which monotone-x lines guarantee)."""
    rows = [
        # left column, block A (region rank 1)
        (1, 10.0, 0.0, "Left"), (1, 60.0, 0.0, "block"), (1, 120.0, 0.0, "one"),
        (1, 10.0, 20.0, "second"), (1, 60.0, 21.0, "line"),
        # left column, block B (gap 100-21 = 79 > 30) (rank 2)
        (1, 10.0, 100.0, "Left"), (1, 60.0, 100.0, "block"), (1, 120.0, 100.0, "two"),
        # right column, one block (rank 3)
        (1, 410.0, 5.0, "Right"), (1, 470.0, 5.0, "column"), (1, 410.0, 25.0, "text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, x double, y double, token string")


def test_detect_regions_clusters_and_orders(spark):
    regions = detect_regions(
        _page_tokens(spark), column_width=400.0, gap_threshold=30.0
    ).collect()
    by_rank = {r.reading_rank: r for r in regions}
    assert len(regions) == 3
    assert by_rank[1].text == "Left block one second line"
    assert by_rank[1].column == 0 and by_rank[1].region_no == 1
    assert (by_rank[1].y0, by_rank[1].y1) == (0.0, 21.0)
    assert by_rank[2].text == "Left block two"
    assert by_rank[2].region_no == 2
    assert by_rank[3].text == "Right column text"
    assert by_rank[3].column == 1


def test_assemble_reading_order(spark):
    regions = detect_regions(
        _page_tokens(spark), column_width=400.0, gap_threshold=30.0
    )
    out = assemble_reading_order(regions).collect()[0]
    assert out.n_regions == 3
    assert out.content == (
        "Left block one second line\n\nLeft block two\n\nRight column text"
    )


def test_detect_regions_partitioning_invariant(spark):
    toks = _page_tokens(spark)
    a = sorted(
        (r.reading_rank, r.text)
        for r in detect_regions(toks, column_width=400.0, gap_threshold=30.0).collect()
    )
    b = sorted(
        (r.reading_rank, r.text)
        for r in detect_regions(
            toks.repartition(7), column_width=400.0, gap_threshold=30.0
        ).collect()
    )
    assert a == b
