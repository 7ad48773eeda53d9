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


def test_cmap_roundtrip_all_variants():
    """Round 6: subset-font pages show first-use-order glyph CODES as
    hex strings; the /ToUnicode CMap must reconstruct the text exactly
    — including non-latin-1 text the plain path can't carry, 2-byte
    codespaces past 255 distinct chars, mixed plain/subset pages
    (font switching through Tf), and both compressed and raw CMaps."""
    uni = ["Doc 7", "the fox — 100% übermäßig ✓ λόγος ..."]
    for compress in (True, False):
        pdf = P.encode_pdf(uni, compress=compress, subset_font=True)
        assert b"/ToUnicode" in pdf
        assert P.extract_pdf_text(pdf) == uni
    # mixed fonts: page 0 plain /F1, page 1 subset /F2
    assert P.extract_pdf_text(P.encode_pdf(uni, subset_font=[False, True])) == uni
    # >255 distinct chars forces the 2-byte codespace
    wide = "".join(chr(0x100 + i) for i in range(300)) + " tail"
    pdf = P.encode_pdf([wide], subset_font=True)
    assert P.extract_pdf_text(pdf) == [wide]


def test_cmap_without_handling_would_be_mojibake():
    """The subset page's codes are NOT the characters — a reader that
    ignores the CMap gets garbage, which is what this feature fixes."""
    pages = ["zyxw"]
    pdf = P.encode_pdf(pages, subset_font=True, compress=False)
    # first-use codes are 1..4, so the raw shown string is \x01..\x04
    assert b"<01020304> Tj" in pdf
    assert P.extract_pdf_text(pdf) == pages


def test_parse_tounicode_bfrange_forms():
    """bfrange in both spec forms: incremented destination (consecutive
    codes -> consecutive chars, with carry across UTF-16 units) and the
    explicit array form; plus multi-unit (ligature) bfchar targets."""
    cm = b"""
    /CIDInit /ProcSet findresource begin
    begincmap
    1 begincodespacerange <00> <ff> endcodespacerange
    2 beginbfchar
    <01> <0041>
    <02> <00660069>
    endbfchar
    2 beginbfrange
    <10> <12> <0061>
    <20> <22> [<0058> <0059> <005a>]
    endbfrange
    endcmap end
    """
    width, mapping = P._parse_tounicode(cm)
    assert width == 1
    assert mapping[0x01] == "A"
    assert mapping[0x02] == "fi"  # ligature: two UTF-16 units
    assert [mapping[c] for c in (0x10, 0x11, 0x12)] == ["a", "b", "c"]
    assert [mapping[c] for c in (0x20, 0x21, 0x22)] == ["X", "Y", "Z"]


def test_cmap_malformed_and_bomb_quarantine():
    import re

    with pytest.raises(ValueError, match="width"):
        P._parse_tounicode(b"1 begincodespacerange <000000> <ffffff> endcodespacerange")
    with pytest.raises(ValueError, match="bfchar"):
        P._parse_tounicode(b"beginbfchar <01> endbfchar")
    with pytest.raises(ValueError, match="bounds"):
        P._parse_tounicode(
            b"1 begincodespacerange <0000> <ffff> endcodespacerange\n"
            b"beginbfrange <ff00> <0001> <0041> endbfrange"
        )
    with pytest.raises(ValueError, match="unterminated"):
        P._parse_tounicode(b"beginbfrange <01> <02> [<0041> endbfrange")
    # destination overflow: incrementing past the width is malformed
    with pytest.raises(ValueError, match="overflow"):
        P._parse_tounicode(
            b"1 begincodespacerange <0000> <ffff> endcodespacerange\n"
            b"beginbfrange <0000> <ffff> <ffff> endbfrange"
        )
    # entry-count bomb: overlapping ranges re-writing the same keys
    # must hit the insertion cap, not loop forever
    with pytest.raises(ValueError, match="cap"):
        P._parse_tounicode(
            b"1 begincodespacerange <0000> <ffff> endcodespacerange\n"
            + b"beginbfrange <0000> <fff0> <0000> endbfrange\n" * 3
        )
    # unmapped codes surface as U+FFFD, not a crash ("azq" is
    # non-consecutive so the writer emits bfchar entries, droppable
    # one at a time — consecutive text would fold into a bfrange)
    pdf = P.encode_pdf(["azq"], subset_font=True, compress=False)
    broken = re.sub(rb"<01> <\w+>\n", b"", pdf)  # drop 'a's bfchar entry
    assert broken != pdf
    [page] = P.extract_pdf_text(broken)
    assert page == "�zq"


def test_conflicting_font_bindings_quarantine():
    """One name bound to two different font objects is ambiguous for
    the document-wide map — quarantined, never guessed."""
    pdf = bytearray(P.encode_pdf(["a", "b"], subset_font=True, compress=False))
    # graft a second resources dict binding /F2 to a different object
    evil = bytes(pdf).replace(
        b"%%EOF", b"99 0 obj\n<< /Font << /F2 1 0 R >> >>\nendobj\n%%EOF"
    )
    with pytest.raises(ValueError, match="conflicting"):
        P.extract_pdf_text(evil)


def test_object_scan_linear_on_endobj_free_markers():
    """The object index must stay O(n) on crafted inputs: thousands of
    `N 0 obj` markers with NO endobj would re-scan to EOF per marker
    under a naive find() (the WARC-inflate quadratic class); the
    two-pointer merge parses both shapes in comparable, bounded time."""
    import time

    filler = b"%PDF-1.4\n" + b"9 0 obj\n<< >>\n" * 20000 + b"endobj\n"
    t0 = time.perf_counter()
    spans = P._object_spans(filler)
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"object scan took {dt:.2f}s on 20k endobj-free markers"
    assert len(spans) == 1  # all markers resolve to the single endobj; first wins

    # and many complete objects with /Font dicts parse linearly too
    many = b"%PDF-1.4\n" + b"".join(
        b"%d 0 obj\n<< /Font << /F1 1 0 R >> >>\nendobj\n" % i for i in range(2, 8000)
    )
    t0 = time.perf_counter()
    spans = P._object_spans(many)
    P._font_decoders(many, spans)
    dt = time.perf_counter() - t0
    assert dt < 2.0, f"font-dict walk took {dt:.2f}s on 8k objects"


def test_cmap_byte_truncations_never_crash():
    pdf = P.encode_pdf(["some words here", "—ünïcødé page—"], subset_font=[False, True])
    for cut in range(1, len(pdf), 41):
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
