"""PDF text extraction (crawl-pipeline extension, round 5): the format
books and papers arrive in.

Scope, honestly stated: this is a from-scratch reader for the TEXT
layer of the common machine-written PDF — FlateDecode (or raw) content
streams driving ``Tj``/``TJ``/``'`` show operators between ``BT``/
``ET``, with full string-literal unescaping (``\\(``, ``\\)``,
``\\\\``, ``\\n``, ``\\r``, ``\\t``, ``\\b``, ``\\f``, octal
``\\ddd``, line continuations) and hex strings ``<...>``.

Round 6 extends the standard-encoding case with simple ``/ToUnicode``
CMap remapping — the dominant shape of REAL machine-written PDFs,
whose subset-embedded fonts show glyph CODES (assigned in first-use
order by the subsetter), not character values, and carry a CMap stream
(``bfchar``/``bfrange`` blocks, 1- or 2-byte codespace) mapping codes
back to Unicode. The reader builds font-name → CMap decoders from the
object graph (/Resources /Font → font object → /ToUnicode stream),
tracks the current font through ``Tf`` operators in stream order, and
maps shown strings through the active decoder; fonts without a CMap
keep the latin-1 passthrough. Still OUT of scope: CID-keyed fonts
whose encoding is a PREDEFINED CMap name (no embedded mapping to
read), font-program glyph tables, and scanned-page OCR — text encoded
those ways simply doesn't surface (the same quarantine honesty as the
JPEG decoder refusing arithmetic coding). For the covered cases —
which include everything :func:`encode_pdf` writes, plain or
subset-coded — extraction is exact and FULL-oracle-graded.

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


def _assign_subset_codes(pages: list[str], subset: list[bool]) -> tuple[int, dict[str, int]]:
    """First-use-order glyph-code assignment over the subset pages —
    exactly what real font subsetters do. Returns (code byte width,
    char → code); width widens to 2 past 255 distinct characters."""
    codes: dict[str, int] = {}
    for text, sub in zip(pages, subset):
        if not sub:
            continue
        for ch in text:
            if ch not in codes:
                codes[ch] = len(codes) + 1  # 0 reserved (notdef)
    return (2 if len(codes) > 255 else 1), codes


def _cmap_stream(codes: dict[str, int], width: int) -> bytes:
    """A ToUnicode CMap mapping the assigned codes back to Unicode:
    maximal consecutive runs as ``bfrange``, singletons as ``bfchar``,
    ≤100 entries per block (the spec's block cap), UTF-16BE targets."""
    by_code = sorted((c, ch) for ch, c in codes.items())
    runs: list[tuple[int, int, str]] = []  # (lo_code, hi_code, first char)
    for c, ch in by_code:
        if runs and c == runs[-1][1] + 1 and ord(ch) == ord(runs[-1][2]) + (c - runs[-1][0]):
            runs[-1] = (runs[-1][0], c, runs[-1][2])
        else:
            runs.append((c, c, ch))
    sw = width * 2  # hex digits per code

    def hx(v: int) -> str:
        return f"<{v:0{sw}x}>"

    def uhex(ch: str) -> str:
        return "<" + ch.encode("utf-16-be").hex() + ">"

    chars = [(lo, ch) for lo, hi, ch in runs if lo == hi]
    ranges = [(lo, hi, ch) for lo, hi, ch in runs if lo != hi]
    body: list[str] = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CMapName /Custom-UCS def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        f"{hx(0)} {hx((1 << (8 * width)) - 1)}",
        "endcodespacerange",
    ]
    for i in range(0, len(chars), 100):
        blk = chars[i : i + 100]
        body.append(f"{len(blk)} beginbfchar")
        body += [f"{hx(c)} {uhex(ch)}" for c, ch in blk]
        body.append("endbfchar")
    for i in range(0, len(ranges), 100):
        blk = ranges[i : i + 100]
        body.append(f"{len(blk)} beginbfrange")
        body += [f"{hx(lo)} {hx(hi)} {uhex(ch)}" for lo, hi, ch in blk]
        body.append("endbfrange")
    body += ["endcmap", "CMapName currentdict /CMap defineresource pop", "end", "end"]
    return "\n".join(body).encode("ascii")


def encode_pdf(
    pages: list[str],
    compress: bool = True,
    subset_font: bool | list[bool] = False,
) -> bytes:
    """Page texts → a minimal, valid PDF.

    Plain pages are one content stream ``BT /F1 12 Tf 72 720 Td (…) Tj
    ET`` (FlateDecoded when ``compress``), Helvetica, US-Letter.
    ``subset_font`` pages (bool, or one bool per page) instead show
    HEX strings of first-use-order glyph CODES under /F2 — a
    subset-embedded TrueType whose /ToUnicode CMap stream maps the
    codes back to Unicode, the way real PDF generators write text —
    so a reader sees mojibake unless it applies the CMap. The xref
    table is correct — generators should write well-formed files even
    when readers must tolerate broken ones."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    def add_stream(raw: bytes, extra_dict: bytes = b"") -> int:
        if compress:
            data = _zlib.compress(raw, 6)
            head = b"<< /Filter /FlateDecode " + extra_dict + b"/Length " + str(len(data)).encode() + b" >>"
        else:
            data = raw
            head = b"<< " + extra_dict + b"/Length " + str(len(data)).encode() + b" >>"
        return add(head + b"\nstream\n" + data + b"\nendstream")

    n = len(pages)
    subset = [subset_font] * n if isinstance(subset_font, bool) else list(subset_font)
    if len(subset) != n:
        raise ValueError("subset_font list must match page count")

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    fonts = b"/F1 " + str(font).encode() + b" 0 R"
    width, codes = _assign_subset_codes(pages, subset)
    if codes:
        cmap = add_stream(_cmap_stream(codes, width))
        f2 = add(
            b"<< /Type /Font /Subtype /TrueType /BaseFont /AAAAAB+Helvetica"
            b" /ToUnicode " + str(cmap).encode() + b" 0 R >>"
        )
        fonts += b" /F2 " + str(f2).encode() + b" 0 R"
    content_ids = []
    for text, sub in zip(pages, subset):
        if sub:
            # bytes(...).hex() is one C pass — a per-char f-string
            # format measured ~4x the whole encode cost at sf1
            if width == 1:
                shown = bytes(codes[ch] for ch in text).hex()
            else:
                shown = b"".join(codes[ch].to_bytes(2, "big") for ch in text).hex()
            raw = f"BT /F2 12 Tf 72 720 Td <{shown}> Tj ET".encode("ascii")
        else:
            raw = f"BT /F1 12 Tf 72 720 Td ({_pdf_escape(text)}) Tj ET".encode(
                "latin-1", "replace"
            )
        content_ids.append(add_stream(raw))
    # reserve ids: pages tree node comes after contents, pages after it
    pages_id = len(objs) + n + 1
    page_ids = []
    for cid in content_ids:
        page_ids.append(
            add(
                b"<< /Type /Page /Parent " + str(pages_id).encode()
                + b" 0 R /MediaBox [0 0 612 792] /Resources << /Font << "
                + fonts + b" >> >> /Contents "
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
_OBJ_RE = _re.compile(rb"(\d{1,9})\s+0\s+obj\b")
_ENDOBJ_RE = _re.compile(rb"\bendobj\b")
_FONT_DICT_RE = _re.compile(rb"/Font\s*<<")
_NAME_REF_RE = _re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d{1,9})\s+0\s+R")
_TOUNI_RE = _re.compile(rb"/ToUnicode\s+(\d{1,9})\s+0\s+R")
_TF_RE = _re.compile(rb"/([^\s/<>\[\]()]+)\s+[0-9.+-]+\s+Tf\b")
_CMAP_TOK_RE = _re.compile(rb"<[0-9A-Fa-f\s]*>|\[|\]")
_MAX_CMAP_ENTRIES = 1 << 17

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


def _inflate_stream(head: bytes, raw: bytes) -> bytes:
    """Raw stream bytes (between ``stream``/``endstream``) → content,
    honoring FlateDecode from the dict head, EOL trim, bounded inflate."""
    if raw.endswith(b"\r\n"):
        raw = raw[:-2]
    elif raw.endswith(b"\n") or raw.endswith(b"\r"):
        raw = raw[:-1]
    if b"/FlateDecode" in head:
        dec = _zlib.decompressobj()
        content = dec.decompress(raw, _MAX_STREAM_BYTES + 1)
        if len(content) > _MAX_STREAM_BYTES:
            raise ValueError("PDF stream inflates past cap")
        return content
    return raw


def _object_spans(data: bytes) -> dict[int, tuple[int, int]]:
    """Tolerant object index: obj number → body (start, end) offsets.
    Both marker sets are scanned ONCE and merged two-pointer style — a
    per-object ``find(b"endobj")`` would re-scan to EOF for every
    endobj-free crafted marker, quadratic (the WARC-inflate class)."""
    ends = [m.start() for m in _ENDOBJ_RE.finditer(data)]
    spans: dict[int, tuple[int, int]] = {}
    ei = 0
    for m in _OBJ_RE.finditer(data):
        while ei < len(ends) and ends[ei] < m.end():
            ei += 1
        if ei == len(ends):
            break
        spans.setdefault(int(m.group(1)), (m.end(), ends[ei]))
    return spans


def _parse_tounicode(cm: bytes) -> tuple[int, dict[int, str]]:
    """ToUnicode CMap content → (code byte width, code → text).

    Covers the simple-CMap shape machine-written PDFs embed: 1- or
    2-byte codespace, ``bfchar`` pairs, ``bfrange`` in both the
    incremented-destination and explicit-array forms, UTF-16BE targets
    (multi-unit targets — ligatures — included). Entry/range caps keep
    crafted CMaps from ballooning driver-side state."""

    def hexval(tok: bytes) -> int:
        h = b"".join(tok[1:-1].split())
        if not h:
            raise ValueError("PDF CMap empty hex token")
        return int(h, 16)

    def hexbytes(tok: bytes) -> bytes:
        h = b"".join(tok[1:-1].split())
        if len(h) % 2:
            h += b"0"
        return bytes.fromhex(h.decode("ascii"))

    width = 1
    m = _re.search(rb"begincodespacerange(.*?)endcodespacerange", cm, _re.S)
    if m:
        toks = _CMAP_TOK_RE.findall(m.group(1))
        if toks and toks[0] not in (b"[", b"]"):
            width = max(1, len(b"".join(toks[0][1:-1].split())) // 2)
    if width > 2:
        raise ValueError("PDF CMap code width unsupported")

    mapping: dict[int, str] = {}
    n_put = 0

    def put(code: int, text: str) -> None:
        nonlocal n_put
        n_put += 1
        if n_put > _MAX_CMAP_ENTRIES:  # count INSERTIONS, not dict size —
            # crafted overlapping ranges re-write the same keys forever
            raise ValueError("PDF CMap entry count exceeds cap")
        mapping[code] = text

    for blk in _re.finditer(rb"beginbfchar(.*?)endbfchar", cm, _re.S):
        toks = _CMAP_TOK_RE.findall(blk.group(1))
        if len(toks) % 2 or any(t in (b"[", b"]") for t in toks):
            raise ValueError("PDF bfchar block malformed")
        for src, dst in zip(toks[0::2], toks[1::2]):
            put(hexval(src), hexbytes(dst).decode("utf-16-be", "replace"))
    for blk in _re.finditer(rb"beginbfrange(.*?)endbfrange", cm, _re.S):
        toks = _CMAP_TOK_RE.findall(blk.group(1))
        i = 0
        while i < len(toks):
            if i + 2 >= len(toks) or toks[i] in (b"[", b"]") or toks[i + 1] in (b"[", b"]"):
                raise ValueError("PDF bfrange block malformed")
            lo, hi = hexval(toks[i]), hexval(toks[i + 1])
            if hi < lo or hi - lo >= _MAX_CMAP_ENTRIES:
                raise ValueError("PDF bfrange bounds malformed")
            if toks[i + 2] == b"[":
                j = i + 3
                code = lo
                while j < len(toks) and toks[j] != b"]":
                    put(code, hexbytes(toks[j]).decode("utf-16-be", "replace"))
                    code += 1
                    j += 1
                if j >= len(toks):
                    raise ValueError("PDF bfrange array unterminated")
                i = j + 1
            else:
                base = hexbytes(toks[i + 2])
                base_val = int.from_bytes(base, "big") if base else 0
                for t in range(hi - lo + 1):
                    try:
                        dst = (base_val + t).to_bytes(max(len(base), 2), "big")
                    except OverflowError:
                        raise ValueError(
                            "PDF bfrange destination overflows its width"
                        ) from None
                    put(lo + t, dst.decode("utf-16-be", "replace"))
                i += 3
    return width, mapping


def _apply_cmap(s: str, width: int, mapping: dict[int, str]) -> str:
    """Shown string (latin-1-faithful code bytes) → text via the CMap;
    unmapped codes surface as U+FFFD, the standard extractor behavior.

    Width-1 decoders carry a precomputed 256-entry translate table
    (``_translate_table``) so the per-code Python loop — measured the
    hottest line of the sf1 CMap bench — becomes one C-speed
    ``str.translate`` pass; width-2 keeps the generic path."""
    if width == 1:
        table = mapping.get("_translate_table")  # type: ignore[call-overload]
        if table is None:
            table = {i: mapping.get(i, "�") for i in range(256)}
            mapping["_translate_table"] = table  # type: ignore[index]
        return s.translate(table)
    bs = s.encode("latin-1", "replace")
    if len(bs) % 2:
        bs += b"\x00"
    return "".join(
        mapping.get(int.from_bytes(bs[i : i + 2], "big"), "�")
        for i in range(0, len(bs), 2)
    )


def _font_decoders(
    data: bytes, spans: dict[int, tuple[int, int]]
) -> dict[str, tuple[int, dict[int, str]]]:
    """Font NAME → ToUnicode decoder, from the object graph: every
    ``/Font << /Fx N 0 R … >>`` resource group (scanned in object DICT
    heads only — never inside stream payloads, where compressed bytes
    could fake a match), then each font object's ``/ToUnicode M 0 R``,
    then object M's CMap stream. A name bound to two DIFFERENT font
    objects across pages is ambiguous for this document-wide map —
    quarantine rather than guess."""
    name_to_obj: dict[str, int] = {}
    for s, e in spans.values():
        body = data[s:e]
        sm = _STREAM_RE.search(body)
        head = body[: sm.start()] if sm else body
        for fd in _FONT_DICT_RE.finditer(head):
            win = head[fd.end() : fd.end() + 4096]
            close = win.find(b">>")
            if close < 0:
                continue
            for fm in _NAME_REF_RE.finditer(win[:close]):
                name = fm.group(1).decode("latin-1")
                num = int(fm.group(2))
                prev = name_to_obj.get(name)
                if prev is not None and prev != num:
                    raise ValueError("PDF font name bound to conflicting objects")
                name_to_obj[name] = num
    decoders: dict[str, tuple[int, dict[int, str]]] = {}
    for name, num in name_to_obj.items():
        span = spans.get(num)
        if span is None:
            continue
        body = data[span[0] : span[1]]
        sm = _STREAM_RE.search(body)
        tm = _TOUNI_RE.search(body[: sm.start()] if sm else body)
        if not tm:
            continue
        cspan = spans.get(int(tm.group(1)))
        if cspan is None:
            continue
        cbody = data[cspan[0] : cspan[1]]
        csm = _STREAM_RE.search(cbody)
        if not csm:
            continue
        cend = cbody.find(b"endstream", csm.end())
        if cend < 0:
            raise ValueError("PDF CMap stream unterminated")
        cm = _inflate_stream(cbody[: csm.start()], cbody[csm.end() : cend])
        decoders[name] = _parse_tounicode(cm)
    return decoders


def _stream_text(
    content: bytes,
    decoders: dict[str, tuple[int, dict[int, str]]] | None = None,
) -> str:
    """Text shown by one content stream: strings followed by a show
    operator (Tj, ', "), plus TJ arrays (strings only; kerning numbers
    are positioning, not text). When ``decoders`` carry ToUnicode
    CMaps, the current font is tracked through ``Tf`` operators in
    stream order (font state persists across BT blocks per spec) and
    shown strings map through the active font's CMap."""
    decoders = decoders or {}
    # Tf positions once over the whole stream; merged with show-string
    # positions two-pointer style below (both ascend)
    tf_ops = (
        [(m.start(), m.group(1).decode("latin-1")) for m in _TF_RE.finditer(content)]
        if decoders
        else []
    )
    fi = 0
    cur_font: str | None = None
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
            while fi < len(tf_ops) and tf_ops[fi][0] < bt + 2 + end:
                cur_font = tf_ops[fi][1]
                fi += 1
            dec = decoders.get(cur_font) if cur_font is not None else None
            if dec is not None:
                s = _apply_cmap(s, dec[0], dec[1])
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
    scan, see module docstring). Fonts carrying a /ToUnicode CMap are
    resolved up front and applied per show-string by font tracking."""
    if data[:5] != b"%PDF-":
        raise ValueError("not a PDF payload")
    # Cheap pre-check: the object-graph walk only runs when a CMap can
    # exist — CMap-free documents (the common case) skip it entirely.
    decoders = (
        _font_decoders(data, _object_spans(data)) if b"/ToUnicode" in data else {}
    )
    texts: list[str] = []
    n_streams = 0
    for m in _STREAM_RE.finditer(data):
        if n_streams >= _MAX_STREAMS:
            raise ValueError("PDF stream count exceeds cap")
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            raise ValueError("PDF stream unterminated")
        # The stream's dict is the nearest << ... >> before 'stream'.
        # Bounded window: an UNbounded rfind re-scans the whole prefix
        # whenever a crafted payload omits the dict, going quadratic
        # with stream count (the same amplification class as the WARC
        # inflate bug); a real stream dict sits within a few hundred
        # bytes of its 'stream' keyword.
        lo = max(0, m.start() - 4096)
        dict_at = data.rfind(b"<<", lo, m.start())
        head = data[dict_at : m.start()] if dict_at >= 0 else b""
        content = _inflate_stream(head, data[start:end])
        n_streams += 1
        if b"BT" in content:
            texts.append(_stream_text(content, decoders))
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
