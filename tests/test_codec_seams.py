"""Codec swap-point proof (VERDICT r2 §missing #2).

The container ships neither pypdf nor PIL, so the extraction plumbing runs
deterministic stub codecs. These tests pin the seam from BOTH sides:

* always: the REAL functions are importable objects with the same call
  contract as the stubs (compile-checked, not just documented);
* lib absent (here): calling a real codec raises NotImplementedError;
* lib present (skipif-gated, runs on a real cluster image): the real
  codecs flow through the SAME UDF factories with identical output schema
  and produce correct values — proving the swap works with zero plan
  changes.
"""

from __future__ import annotations

import inspect

import pytest

from ocr_spark.operators.media import (
    _fake_decode,
    _fake_recompress,
    _real_decode,
    _real_recompress,
    make_decode_udf,
    make_resize_udf,
)
from ocr_spark.sources.pdf import (
    _fake_split_pages,
    _real_split_pages,
    pages_to_docs,
    split_pages,
)


def _has(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


# ---------------------------------------------------------------------------
# always-on: the seam is compile-checked
# ---------------------------------------------------------------------------
def test_real_codec_functions_share_the_stub_contract():
    """Real and fake codecs must be interchangeable callables: same arity,
    importable as function objects (a docstring-only 'swap point' would
    pass review but fail at swap time)."""
    for fake, real in (
        (_fake_decode, _real_decode),
        (_fake_recompress, _real_recompress),
        (_fake_split_pages, _real_split_pages),
    ):
        assert callable(real)
        assert len(inspect.signature(real).parameters) == len(
            inspect.signature(fake).parameters
        ), (fake.__name__, real.__name__)


@pytest.mark.skipif(_has("PIL"), reason="PIL present: real path tested below")
def test_real_image_codecs_guard_without_pil():
    with pytest.raises(NotImplementedError):
        _real_decode(b"\x89PNG1234")
    with pytest.raises(NotImplementedError):
        _real_recompress(b"\xff\xd8rest", 80)


@pytest.mark.skipif(_has("pypdf"), reason="pypdf present: real path tested below")
def test_real_pdf_splitter_guards_without_pypdf():
    with pytest.raises(NotImplementedError):
        _real_split_pages(b"%PDF-1.4 fake")


# ---------------------------------------------------------------------------
# lib-present paths (skip cleanly in this container)
# ---------------------------------------------------------------------------
def _minimal_pdf(page_texts: list[str]) -> bytes:
    """Hand-assembled N-page PDF with one Tj text run per page and a
    correct xref table — enough for pypdf's extract_text."""
    n = len(page_texts)
    font_obj = 3 + 2 * n
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    for i, text in enumerate(page_texts):
        page_no, cont_no = 3 + 2 * i, 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {cont_no} 0 R "
                f"/Resources << /Font << /F1 {font_obj} 0 R >> >> >>"
            ).encode()
        )
        stream = f"BT /F1 12 Tf 72 712 Td ({text}) Tj ET".encode()
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def test_real_pdf_split_through_spark(spark):
    """With pypdf present, the REAL splitter must flow through the same
    mapInPandas plumbing: identical schema to the stub path, one row per
    PDF page with the page text as payload."""
    pytest.importorskip("pypdf")

    pdf_bytes = _minimal_pdf(["alpha page one", "beta page two"])
    files = spark.createDataFrame(
        [("mem://t/doc1.pdf", bytearray(pdf_bytes))], "path string, content binary"
    )
    real = split_pages(files, page_splitter=_real_split_pages)
    stub = split_pages(files)  # form-feed stub
    assert real.schema == stub.schema
    docs = {r.page_no: r.text for r in pages_to_docs(real).collect()}
    assert len(docs) == 2
    assert "alpha page one" in docs[1] and "beta page two" in docs[2]


def test_real_pil_decode_and_resize_through_spark(spark):
    """With PIL present, the REAL decode/recompress must flow through the
    same pandas-UDF factories: identical output schema, true dimensions,
    and the reference's quality-loop contract on an oversized JPEG."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from ocr_spark.operators.media import _MAX_BYTES, _QUALITY_STEPS

    buf = io.BytesIO()
    Image.new("RGB", (123, 45), (200, 10, 10)).save(buf, format="PNG")
    png = buf.getvalue()

    import numpy as np

    noise = (np.random.RandomState(7).rand(400, 400, 3) * 255).astype("uint8")
    big = io.BytesIO()
    Image.fromarray(noise).save(big, format="JPEG", quality=95)
    big_jpeg = big.getvalue()
    assert len(big_jpeg) > _MAX_BYTES  # must trigger the loop

    df = spark.createDataFrame(
        [(0, bytearray(png)), (1, bytearray(big_jpeg))], "i long, data binary"
    )
    real_meta = df.withColumn("m", make_decode_udf(decode_fn=_real_decode)("data"))
    stub_meta = df.withColumn("m", make_decode_udf()("data"))
    assert real_meta.schema == stub_meta.schema
    rows = {r.i: r.m for r in real_meta.collect()}
    assert (rows[0].width, rows[0].height, rows[0].format) == (123, 45, "png")
    assert rows[1].format == "jpeg"

    resized = {
        r.i: r.r
        for r in df.withColumn(
            "r", make_resize_udf(recompress_fn=_real_recompress)("data")
        ).collect()
    }
    assert resized[0].resized is False and resized[0].quality == 100
    r1 = resized[1]
    assert r1.resized is True and r1.quality in _QUALITY_STEPS
    assert r1.n_bytes <= _MAX_BYTES or r1.quality == _QUALITY_STEPS[-1]
