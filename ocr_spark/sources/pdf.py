"""S1 — PDF → page scan plumbing: ``binaryFile`` source + distributed page
splitter.

The reference's first stage loads a PDF and emits one image per page named
``{stem}_page_{N:03d}`` (/root/reference/src/pdf_to_images.py:25-88, via
pdf2image ``convert_from_path``). The Spark-native shape of that stage:

1. **Scan**: ``spark.read.format("binaryFile")`` over a path glob — each
   file becomes one row ``(path, modificationTime, length, content:binary)``;
   Spark parallelizes across files and prunes on path filters.
2. **Split** (:func:`split_pages`): ``mapInPandas`` fans each file row into
   page rows — iterator-of-batches, Arrow both ways, one input row → many
   output rows. This container has no PDF codec (pdf2image/pypdf absent), so
   the page boundary logic is a clearly-marked deterministic STUB
   (:func:`_fake_split_pages`: form-feed ``\\x0c`` separation — the classic
   plain-text page delimiter). Swap ``_fake_split_pages`` for a
   pypdf/pdfium page iterator to get real splitting with zero plan changes
   (same pattern as operators/media.py's ``_fake_*`` stubs).
3. **Page docs** (:func:`pages_to_docs`): page rows → document rows with the
   reference's ``{stem}_page_{N:03d}`` id scheme, ready for the extraction
   pipeline.

Skew note: a multi-hundred-page PDF is ONE input row but fans out inside
the UDF per batch; downstream repartition on ``(doc_id)`` (or the salted
extract path) spreads its pages before heavy per-page work.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGE_SEP = b"\x0c"  # form feed — the stub page delimiter


def scan_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """``binaryFile`` scan: (path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _fake_split_pages(data: bytes) -> list[bytes]:
    """STUB page splitter — deterministic pure function of the bytes: pages
    are form-feed-separated segments. Swap point for a real PDF page
    iterator (:func:`_real_split_pages` / pdfium)."""
    if data is None:
        return []
    return data.split(PAGE_SEP)


def _real_split_pages(data: bytes) -> list[bytes]:
    """REAL page splitter — same ``bytes → list[bytes]`` contract as
    :func:`_fake_split_pages`, backed by pypdf: one UTF-8 page-text payload
    per PDF page (the reference fans one file into per-page artifacts,
    /root/reference/src/pdf_to_images.py:25-88). The import lives inside
    the function so the module stays importable on workers without pypdf;
    calling it there raises ``NotImplementedError``. Plug into
    :func:`split_pages` via ``page_splitter=_real_split_pages`` — zero plan
    or schema changes (tests/test_codec_seams.py pins both)."""
    try:
        from pypdf import PdfReader
    except ImportError as exc:
        raise NotImplementedError(
            "real PDF page splitting needs pypdf; swap point only — this "
            "environment ships none"
        ) from exc
    import io

    if data is None:
        return []
    reader = PdfReader(io.BytesIO(data))
    return [(p.extract_text() or "").encode("utf-8") for p in reader.pages]


def split_pages(
    files: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    page_splitter=None,
) -> DataFrame:
    """(path, content) → (path, page_no, page:binary, n_bytes) — one row per
    page, page_no 1-based in document order (the reference numbers pages
    ``i+1``, src/pdf_to_images.py:71-75).

    ``page_splitter`` is the codec seam: any ``bytes → list[bytes]``
    callable — defaults to the deterministic :func:`_fake_split_pages`;
    pass :func:`_real_split_pages` on clusters with pypdf."""
    splitter = page_splitter or _fake_split_pages

    def _pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, nos, pages, sizes = [], [], [], []
            for path, data in zip(pdf[path_col], pdf[content_col]):
                if data is None:
                    continue
                for i, page in enumerate(splitter(bytes(data))):
                    paths.append(path)
                    nos.append(i + 1)
                    pages.append(page)
                    sizes.append(len(page))
            yield pd.DataFrame(
                {path_col: paths, "page_no": nos, "page": pages, "n_bytes": sizes}
            )

    return files.select(path_col, content_col).mapInPandas(
        _pages, schema=f"{path_col} string, page_no int, page binary, n_bytes int"
    )


def pages_to_docs(pages: DataFrame, path_col: str = "path") -> DataFrame:
    """Page rows → extraction-ready docs with the reference id scheme
    ``{stem}_page_{NNN}`` (src/pdf_to_images.py:71-75: ``_page_{i+1:03d}``)."""
    stem = F.regexp_replace(
        F.element_at(F.split(F.col(path_col), "/"), -1), r"\.[^.]+$", ""
    )
    # NOT a bare lpad: Spark's lpad TRUNCATES strings longer than the pad
    # width ('1000' -> '100'), which would collide page 1000 with page 100;
    # the reference's f'{N:03d}' pads without truncating
    page_str = F.col("page_no").cast("string")
    padded = F.when(F.length(page_str) < 3, F.lpad(page_str, 3, "0")).otherwise(
        page_str
    )
    return pages.select(
        F.concat(stem, F.lit("_page_"), padded).alias("doc_id"),
        F.col("page_no"),
        F.decode(F.col("page"), "utf-8").alias("text"),
        F.col("n_bytes"),
    )
