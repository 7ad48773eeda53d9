"""PDF text extraction (L48): round-trip exactness, escape handling,
hex strings, TJ arrays, tolerant parsing, bomb guards, Spark path."""

import zlib

import pytest

from novlake_spark.operators import pdftext as P


def test_roundtrip_compressed_and_raw():
    pages = [
        "hello world",
        "parens (nested (deep)) and \\ backslash",
        "tabs\tnewline\n ret\r done",
        "",
    ]
    assert P.extract_pdf_text(P.encode_pdf(pages)) == pages
    assert P.extract_pdf_text(P.encode_pdf(pages, compress=False)) == pages


def test_octal_and_unknown_escapes():
    raw = b"BT (\\101\\102\\103 \\x \\060) Tj ET"
    pdf = _wrap_stream(raw)
    assert P.extract_pdf_text(pdf) == ["ABC x 0"]


def test_hex_strings_and_tj_array():
    raw = b"BT [(he) -120 (llo)] TJ <20776F726C64> Tj ET"
    assert P.extract_pdf_text(_wrap_stream(raw)) == ["hello world"]


def test_line_continuation_in_literal():
    raw = b"BT (split\\\nline) Tj ET"
    assert P.extract_pdf_text(_wrap_stream(raw)) == ["splitline"]


def test_strings_outside_bt_et_ignored():
    raw = b"(not shown) BT (shown) Tj ET (also not)"
    assert P.extract_pdf_text(_wrap_stream(raw)) == ["shown"]


def _wrap_stream(content: bytes, flate: bool = False) -> bytes:
    if flate:
        body = zlib.compress(content, 6)
        head = b"<< /Filter /FlateDecode /Length " + str(len(body)).encode() + b" >>"
    else:
        body = content
        head = b"<< /Length " + str(len(body)).encode() + b" >>"
    return (
        b"%PDF-1.4\n1 0 obj\n" + head + b"\nstream\n" + body
        + b"\nendstream\nendobj\n%%EOF\n"
    )


def test_declared_length_lie_cannot_overread():
    """Stream bounds come from the endstream delimiter, not /Length —
    a lying declared length neither crashes nor swallows the trailer."""
    raw = b"BT (ok) Tj ET"
    pdf = _wrap_stream(raw).replace(b"/Length 13", b"/Length 999999")
    assert P.extract_pdf_text(pdf) == ["ok"]


def test_bombs_and_garbage_quarantine(monkeypatch):
    with pytest.raises(ValueError, match="not a PDF"):
        P.extract_pdf_text(b"garbage")
    with pytest.raises(ValueError, match="unterminated"):
        P.extract_pdf_text(b"%PDF-1.4\n<< >>\nstream\nBT (x) Tj ET")  # no endstream
    with pytest.raises(ValueError, match="no streams"):
        P.extract_pdf_text(b"%PDF-1.4\nnothing here\n%%EOF")
    # inflate bomb capped
    monkeypatch.setattr(P, "_MAX_STREAM_BYTES", 512)
    bomb = _wrap_stream(zlib.compress(b"A" * 10_000, 6), flate=False)
    bomb = bomb.replace(b"<< /Length", b"<< /Filter /FlateDecode /Length")
    with pytest.raises(ValueError, match="cap"):
        P.extract_pdf_text(bomb)
    # unterminated literal inside a text block
    monkeypatch.setattr(P, "_MAX_STREAM_BYTES", 64 * 1024 * 1024)
    with pytest.raises(ValueError, match="unterminated"):
        P.extract_pdf_text(_wrap_stream(b"BT (never closed Tj ET"))


def test_byte_truncations_never_crash():
    pdf = P.encode_pdf(["some words here", "page two"])
    for cut in range(1, len(pdf), 53):
        try:
            P.extract_pdf_text(pdf[:cut])
        except ValueError:
            pass


def test_extract_pdf_docs_spark(spark):
    import pandas as pd

    pdfs = [
        (0, bytearray(P.encode_pdf(["a b", "c"]))),
        (1, bytearray(b"corrupt")),
        (2, bytearray(P.encode_pdf(["solo"], compress=False))),
    ]
    df = spark.createDataFrame(pdfs, "doc_id long, pdf binary")
    got = sorted(
        (r["doc_id"], r["page"], r["text"]) for r in P.extract_pdf_docs(df).collect()
    )
    assert got == [(0, 0, "a b"), (0, 1, "c"), (2, 0, "solo")]
