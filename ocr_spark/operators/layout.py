"""Layout-region detection: text-block clustering + reading-order sort
(north_rule: "PDF/image page parse, layout-region detection (text-block
clustering + reading-order sort)").

The reference renders PDF pages to images and lets the OCR model handle
layout implicitly (/root/reference/src/pdf_to_images.py:25-88,
src/ocr_engine.py:83-130). Here layout is explicit and distributed: given
page tokens with coordinates — the shape any OCR/PDF text extractor emits —
regions are recovered geometrically and ordered for reading:

1. **Column assignment**: ``column = floor(x / column_width)`` (newspaper
   columns; a learned page segmenter is the documented swap point).
2. **Vertical block clustering**: within (doc, column), tokens sort by
   (y, x); a new block starts where the vertical gap to the previous token
   exceeds ``gap_threshold``. This is 1-D single-linkage clustering done as
   ``lag`` + running ``sum`` over a window PARTITIONED BY (doc, column) —
   never an un-partitioned window, so a 10^12-doc corpus shuffles once on
   the partition key and each doc's tokens stay task-local.
3. **Region aggregation**: bounding box, token count, and region text
   (tokens joined in (y, x) order — order-exact via sort_array, no second
   window).
4. **Reading order**: regions rank by (column, y0, x0) per doc — columns
   left-to-right, top-to-bottom inside a column — and
   :func:`assemble_reading_order` concatenates region text in that order,
   giving the page's linear reading text.

Everything is native window/groupBy arithmetic (SQL-expressible → the
``layout_regions`` / ``reading_order`` driver gates check it value-exactly
against DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def detect_regions(
    tokens: DataFrame,
    doc_col: str = "doc_id",
    x_col: str = "x",
    y_col: str = "y",
    text_col: str = "token",
    column_width: float = 400.0,
    gap_threshold: float = 30.0,
) -> DataFrame:
    """tokens(doc, x, y, token) → regions(doc, column, region_no, y0, y1,
    x0, x1, n_tokens, text, reading_rank).

    ``region_no`` numbers blocks top-to-bottom within a column;
    ``reading_rank`` orders regions (column asc, y0 asc, x0 asc) per doc.
    """
    col_id = F.floor(F.col(x_col) / F.lit(column_width)).cast("int")
    t = tokens.withColumn("__col", col_id)
    w = Window.partitionBy(doc_col, "__col").orderBy(y_col, x_col)
    gap = F.col(y_col) - F.lag(y_col).over(w)
    t = t.withColumn(
        "__new_block",
        F.when(gap.isNull() | (gap > gap_threshold), 1).otherwise(0),
    ).withColumn("__blk", F.sum("__new_block").over(w))
    regions = t.groupBy(doc_col, "__col", "__blk").agg(
        F.min(y_col).alias("y0"),
        F.max(y_col).alias("y1"),
        F.min(x_col).alias("x0"),
        F.max(x_col).alias("x1"),
        F.count("*").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(y_col, x_col, F.col(text_col).alias("t")))
                ),
                lambda s: s["t"],
            ),
            " ",
        ).alias("text"),
    )
    w_doc = Window.partitionBy(doc_col).orderBy("__col", "y0", "x0")
    return regions.withColumn("reading_rank", F.row_number().over(w_doc)).select(
        doc_col,
        F.col("__col").alias("column"),
        F.col("__blk").cast("int").alias("region_no"),
        "y0",
        "y1",
        "x0",
        "x1",
        "n_tokens",
        "text",
        "reading_rank",
    )


def assemble_reading_order(regions: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """regions → (doc, content): region text joined with blank lines in
    reading order. Order-exact via sort_array over (rank, text) structs —
    one shuffle on the doc key, no per-doc window."""
    return regions.groupBy(doc_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("reading_rank", "text"))),
                lambda s: s["text"],
            ),
            "\n\n",
        ).alias("content"),
        F.count("*").alias("n_regions"),
    )
