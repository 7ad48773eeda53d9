"""WARC ingestion (crawl-pipeline extension, round 5): the container
format the web actually arrives in.

CommonCrawl and every serious crawler ship WARC (ISO 28500): a
concatenation of records, each a header block (``WARC/1.0`` + named
fields + ``Content-Length``) and a body, usually an embedded HTTP
response; on disk each record is its OWN gzip member, so a reader can
seek to a record and inflate just it. The parser below implements
that layout from the public spec with the same discipline as the
image codecs (operators/multimodal.py): every DECLARED length is
bounded against the actual buffer before any allocation, gzip inflates
through ``decompressobj`` with a hard output cap (bomb guard), record
counts are capped, and every malformed framing raises ValueError —
the quarantine exception the curation path catches.

Charset handling is part of ingestion, not an afterthought: the HTTP
``Content-Type`` header's ``charset=`` parameter selects the body
decoder (utf-8 default, latin-1 and friends honored, undecodable
bytes quarantine the record, not the job).

Scale model: one WARC blob (typically ~1 GB on disk) is one task —
records never split across tasks, parse state never crosses records,
and the mapInPandas reader streams Arrow batches with constant
memory. At 100 TB the unit of parallelism is the WARC file exactly as
it is at CommonCrawl itself.
"""

from __future__ import annotations

import gzip as _gzip
import io as _io
import zlib as _zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from novlake_spark.operators.multimodal import _parse_guard

#: Bomb guards: per-member inflated cap and per-blob record cap.
_MAX_RECORD_BYTES = 64 * 1024 * 1024
_MAX_RECORDS = 65536

_CRLF = b"\r\n"


def encode_warc_record(
    target_uri: str,
    http_status: int,
    content_type: str,
    body: bytes,
    date: str = "2026-01-01T00:00:00Z",
    record_id: str = "urn:example:0",
) -> bytes:
    """One response record → one gzip member (the seekable layout)."""
    http = (
        f"HTTP/1.1 {http_status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii") + body
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <{record_id}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("ascii")
    raw = head + http + _CRLF + _CRLF
    buf = _io.BytesIO()
    # mtime=0 + no filename → byte-deterministic output
    with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


_INFLATE_CHUNK = 1 << 16


def _inflate_member(data: bytes, pos: int) -> tuple[bytes, int]:
    """Inflate ONE gzip member starting at ``pos``; return (raw, next_pos).

    Output hard-capped at _MAX_RECORD_BYTES (a tiny member declaring
    gigabytes must quarantine, not allocate). Input is fed in 64 KiB
    memoryview chunks: handing zlib the whole remaining blob per member
    is quadratic TWICE over — the ``data[pos:]`` slice copies O(blob)
    bytes, and ``unused_data`` copies the rest back out. Chunked, the
    overrun is at most one chunk, so a 1 GB blob with 50k records
    parses in O(blob) (measured: rec/s flat from 500 to 8000 records
    where the naive form degraded 5×)."""
    view = memoryview(data)
    dec = _zlib.decompressobj(wbits=31)
    out: list[bytes] = []
    total = 0
    off = pos
    while not dec.eof:
        if dec.unconsumed_tail:
            piece = dec.unconsumed_tail
        else:
            if off >= len(data):
                raise ValueError("WARC gzip member truncated")
            piece = view[off : off + _INFLATE_CHUNK]
            off += len(piece)
        chunk = dec.decompress(piece, _MAX_RECORD_BYTES + 1 - total)
        total += len(chunk)
        if total > _MAX_RECORD_BYTES:
            raise ValueError("WARC record inflates past cap")
        out.append(chunk)
    return b"".join(out), off - len(dec.unused_data)


def _parse_headers(block: bytes, what: str) -> dict[str, str]:
    lines = block.split(_CRLF)
    out: dict[str, str] = {}
    for line in lines[1:]:  # lines[0] is the version / status line
        if not line:
            continue
        k, sep, v = line.partition(b":")
        if not sep:
            raise ValueError(f"malformed {what} header line")
        out[k.decode("ascii", "replace").strip().lower()] = v.decode(
            "ascii", "replace"
        ).strip()
    return out


@_parse_guard
def parse_warc(data: bytes) -> list[dict]:
    """WARC bytes (gzip-per-record, or bare) → list of record dicts:
    (target_uri, warc_type, status, content_type, charset, body bytes).

    Only ``response`` records with an embedded HTTP message yield a
    body; other record types (warcinfo, request, metadata) are
    surfaced with body=None so callers can count/skip them."""
    gzipped = data[:2] == b"\x1f\x8b"
    records: list[dict] = []
    pos = 0
    while pos < len(data):
        if len(records) >= _MAX_RECORDS:
            raise ValueError(f"WARC record count exceeds cap {_MAX_RECORDS}")
        if gzipped:
            raw, pos = _inflate_member(data, pos)
        else:
            raw, pos = data[pos:], len(data)
        rpos = 0
        while rpos < len(raw):
            if len(records) >= _MAX_RECORDS:
                raise ValueError(f"WARC record count exceeds cap {_MAX_RECORDS}")
            if raw[rpos : rpos + 5] != b"WARC/":
                raise ValueError("WARC record missing version line")
            hdr_end = raw.find(_CRLF + _CRLF, rpos)
            if hdr_end < 0:
                raise ValueError("WARC header block unterminated")
            head = _parse_headers(raw[rpos:hdr_end], "WARC")
            try:
                length = int(head["content-length"])
            except KeyError:
                raise ValueError("WARC record missing Content-Length") from None
            if length < 0 or hdr_end + 4 + length > len(raw):
                raise ValueError("WARC Content-Length overruns record")
            content = raw[hdr_end + 4 : hdr_end + 4 + length]
            rec = {
                "target_uri": head.get("warc-target-uri"),
                "warc_type": head.get("warc-type", ""),
                "status": None,
                "content_type": None,
                "charset": None,
                "body": None,
            }
            if rec["warc_type"] == "response" and content[:5] == b"HTTP/":
                http_end = content.find(_CRLF + _CRLF)
                if http_end < 0:
                    raise ValueError("HTTP header block unterminated")
                status_line = content.split(_CRLF, 1)[0].split(b" ")
                if len(status_line) < 2 or not status_line[1].isdigit():
                    raise ValueError("malformed HTTP status line")
                hh = _parse_headers(content[:http_end], "HTTP")
                ctype = hh.get("content-type", "")
                charset = "utf-8"
                for part in ctype.split(";")[1:]:
                    k, _, v = part.strip().partition("=")
                    if k.lower() == "charset" and v:
                        charset = v.strip("\"' ").lower()
                body = content[http_end + 4 :]
                # A byte-order mark OUTRANKS the header charset (WHATWG
                # Encoding sniffing order) — real servers mislabel
                # UTF-16 pages as utf-8/latin-1 constantly, and the
                # BOM is the page telling the truth about itself. The
                # utf-8 BOM also pins charset so a stray latin-1 label
                # can't double-decode the mark into 'ï»¿' mojibake.
                if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
                    charset = "utf-16"  # stdlib codec sniffs LE/BE and eats the BOM
                elif body[:3] == b"\xef\xbb\xbf":
                    charset = "utf-8-sig"
                rec.update(
                    status=int(status_line[1]),
                    content_type=ctype.split(";")[0].strip(),
                    charset=charset,
                    body=body,
                )
            records.append(rec)
            # records end with CRLF CRLF per spec; tolerate their absence
            rpos = hdr_end + 4 + length
            while raw[rpos : rpos + 2] == _CRLF:
                rpos += 2
    return records


def read_warc(df: DataFrame, col: str = "warc") -> DataFrame:
    """(…, warc binary) → one row per HTTP response record:
    (target_uri, status, content_type, html string). The charset from
    the HTTP header selects the decoder; undecodable bodies and corrupt
    blobs quarantine. Distributed: one blob parses within one task,
    Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"target_uri": [], "status": [], "content_type": [], "html": []}
            for blob in pdf[col]:
                try:
                    recs = parse_warc(bytes(blob))
                except ValueError:
                    continue
                for r in recs:
                    if r["body"] is None:
                        continue
                    try:
                        text = r["body"].decode(r["charset"])
                    except (UnicodeDecodeError, LookupError):
                        continue
                    out["target_uri"].append(r["target_uri"])
                    out["status"].append(r["status"])
                    out["content_type"].append(r["content_type"])
                    out["html"].append(text)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema="target_uri string, status int, content_type string, html string"
    )


def read_warc_html_text(df: DataFrame, col: str = "warc") -> DataFrame:
    """(…, warc binary) → one row per HTTP response record with the
    boilerplate-stripped text already extracted: (target_uri, status,
    content_type, extracted). Fusion of :func:`read_warc` +
    ``htmltext.extract_html_text`` into ONE mapInPandas (round 12,
    guide §4.1 — the q_pdf_extract fusion applied to the WARC→HTML
    route): the decoded HTML used to cross JVM↔Python twice (once out
    of the WARC parser, once into the extraction UDF); fused, the page
    text never leaves the Python worker between parse and extraction.
    Same quarantine semantics as the two stages run separately:
    corrupt blobs and undecodable bodies drop, extraction errors
    propagate (extract_text is total on decoded text)."""
    from novlake_spark.operators.htmltext import extract_text

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"target_uri": [], "status": [], "content_type": [], "extracted": []}
            for blob in pdf[col]:
                try:
                    recs = parse_warc(bytes(blob))
                except ValueError:
                    continue
                for r in recs:
                    if r["body"] is None:
                        continue
                    try:
                        text = r["body"].decode(r["charset"])
                    except (UnicodeDecodeError, LookupError):
                        continue
                    out["target_uri"].append(r["target_uri"])
                    out["status"].append(r["status"])
                    out["content_type"].append(r["content_type"])
                    out["extracted"].append(extract_text(text))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run,
        schema="target_uri string, status int, content_type string, extracted string",
    )


def read_warc_pdf_text(df: DataFrame, col: str = "warc") -> DataFrame:
    """(…, warc binary) → one row per ``application/pdf`` response
    record: (target_uri, status, content_type, extracted string) —
    the PDF route of a multi-format crawl: real archives carry papers
    and reports alongside HTML, and a text-only reader silently drops
    them. Bodies go through the tolerant PDF text-layer reader
    (operators/pdftext.extract_pdf_text — xref-less scan, bounded
    inflate, /ToUnicode CMaps) with pages joined by newline; corrupt
    PDFs and blobs quarantine. Same scale shape as :func:`read_warc`:
    one blob = one task, Arrow-batched, zero shuffle."""
    from novlake_spark.operators.pdftext import extract_pdf_text

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"target_uri": [], "status": [], "content_type": [], "extracted": []}
            for blob in pdf[col]:
                try:
                    recs = parse_warc(bytes(blob))
                except ValueError:
                    continue
                for r in recs:
                    if r["body"] is None or r["content_type"] != "application/pdf":
                        continue
                    try:
                        pages = extract_pdf_text(r["body"])
                    except ValueError:
                        continue
                    out["target_uri"].append(r["target_uri"])
                    out["status"].append(r["status"])
                    out["content_type"].append(r["content_type"])
                    out["extracted"].append("\n".join(pages))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run,
        schema="target_uri string, status int, content_type string, extracted string",
    )


# --- tar archives: the other container corpora ship in ----------------
#
# Model dumps, academic corpora and dataset releases arrive as tar
# archives of files. Reader/writer below use the stdlib tarfile module
# in ustar format with zeroed metadata (deterministic bytes), with the
# same guards as the WARC path: member-count cap, per-member size cap
# enforced on the DECLARED size before reading, non-regular members
# (links, devices, directories) skipped, every tarfile error
# quarantined as ValueError.

_MAX_TAR_MEMBERS = 65536


def encode_tar(members: list[tuple[str, bytes]]) -> bytes:
    """(name, payload) pairs → deterministic ustar bytes (mtime=0,
    uid/gid=0, no user/group names)."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


@_parse_guard
def parse_tar(data: bytes) -> list[tuple[str, bytes]]:
    """tar bytes → [(member name, payload)] for regular files only.
    DECLARED member sizes are bounded BEFORE reading (a 1 KB archive
    declaring a 100 GB member quarantines, never allocates)."""
    import io
    import tarfile

    out: list[tuple[str, bytes]] = []
    try:
        with tarfile.open(fileobj=io.BytesIO(data), mode="r:") as tf:
            while True:
                info = tf.next()
                if info is None:
                    break
                if len(out) >= _MAX_TAR_MEMBERS:
                    raise ValueError(f"tar member count exceeds cap {_MAX_TAR_MEMBERS}")
                if not info.isreg():
                    continue
                if info.size > _MAX_RECORD_BYTES:
                    raise ValueError("tar member declares size past cap")
                f = tf.extractfile(info)
                if f is None:
                    continue
                payload = f.read(info.size + 1)
                if len(payload) != info.size:
                    raise ValueError("tar member truncated")
                out.append((info.name, payload))
    except tarfile.TarError as e:
        raise ValueError(f"corrupt tar: {e}") from e
    if not out:
        raise ValueError("tar has no regular members")
    return out


def read_tar(df: DataFrame, col: str = "tar") -> DataFrame:
    """(…, tar binary) → one row per regular member: (name, size,
    data). Corrupt archives quarantine; one archive = one task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"name": [], "size": [], "data": []}
            for blob in pdf[col]:
                try:
                    members = parse_tar(bytes(blob))
                except ValueError:
                    continue
                for name, payload in members:
                    out["name"].append(name)
                    out["size"].append(len(payload))
                    out["data"].append(payload)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema="name string, size long, data binary")


def encode_zip(members: list[tuple[str, bytes]]) -> bytes:
    """(name, payload) pairs → deterministic ZIP bytes (DEFLATE, fixed
    DOS timestamp) — the random-access sibling of :func:`encode_tar`:
    zip carries a central directory, so a reader can list and fetch
    one member without touching the rest."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0
            zf.writestr(info, data)
    return buf.getvalue()


@_parse_guard
def parse_zip(data: bytes) -> list[tuple[str, bytes]]:
    """ZIP bytes → [(member name, payload)] for file members.

    Guards: member-count cap, DECLARED sizes bounded before reading,
    reads capped at the declared size + 1 so a lying header cannot
    balloon (zipfile verifies each member's CRC on read — corruption
    surfaces as BadZipFile → ValueError quarantine)."""
    import io
    import zipfile

    out: list[tuple[str, bytes]] = []
    try:
        with zipfile.ZipFile(io.BytesIO(data), "r") as zf:
            infos = zf.infolist()
            if len(infos) > _MAX_TAR_MEMBERS:
                raise ValueError(f"zip member count exceeds cap {_MAX_TAR_MEMBERS}")
            for info in infos:
                if info.is_dir():
                    continue
                if info.file_size > _MAX_RECORD_BYTES:
                    raise ValueError("zip member declares size past cap")
                with zf.open(info) as f:
                    payload = f.read(info.file_size + 1)
                if len(payload) != info.file_size:
                    raise ValueError("zip member size mismatch")
                out.append((info.filename, payload))
    except zipfile.BadZipFile as e:
        raise ValueError(f"corrupt zip: {e}") from e
    if not out:
        raise ValueError("zip has no file members")
    return out


def read_zip(df: DataFrame, col: str = "zip") -> DataFrame:
    """(…, zip binary) → one row per file member: (name, size, data).
    Corrupt archives quarantine; one archive = one task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"name": [], "size": [], "data": []}
            for blob in pdf[col]:
                try:
                    members = parse_zip(bytes(blob))
                except ValueError:
                    continue
                for name, payload in members:
                    out["name"].append(name)
                    out["size"].append(len(payload))
                    out["data"].append(payload)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema="name string, size long, data binary")
