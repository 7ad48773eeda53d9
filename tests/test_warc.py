"""WARC ingestion (L43): record framing, gzip-per-record, HTTP +
charset handling, bomb guards, and the distributed reader."""

import gzip
import io
import struct
import zlib

import pytest

from novlake_spark.operators import warc as W


def _two_record_blob():
    b1 = "<p>hello café</p>".encode("utf-8")
    b2 = "<p>hola café</p>".encode("latin-1")
    return W.encode_warc_record(
        "http://a.com/1", 200, "text/html; charset=utf-8", b1, record_id="urn:x:1"
    ) + W.encode_warc_record(
        "http://a.com/2", 200, "text/html; charset=iso-8859-1", b2, record_id="urn:x:2"
    )


def test_roundtrip_and_charsets():
    recs = W.parse_warc(_two_record_blob())
    assert [r["target_uri"] for r in recs] == ["http://a.com/1", "http://a.com/2"]
    assert all(r["status"] == 200 and r["content_type"] == "text/html" for r in recs)
    assert recs[0]["charset"] == "utf-8" and recs[1]["charset"] == "iso-8859-1"
    assert recs[0]["body"].decode(recs[0]["charset"]) == "<p>hello café</p>"
    assert recs[1]["body"].decode(recs[1]["charset"]) == "<p>hola café</p>"


def test_bare_uncompressed_warc_parses():
    blob = _two_record_blob()
    raw = b""
    pos = 0
    while pos < len(blob):
        dec = zlib.decompressobj(wbits=31)
        raw += dec.decompress(blob[pos:])
        pos = len(blob) - len(dec.unused_data)
    recs = W.parse_warc(raw)
    assert len(recs) == 2 and recs[1]["charset"] == "iso-8859-1"


def test_non_response_records_have_no_body():
    head = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    recs = W.parse_warc(head)
    assert len(recs) == 1
    assert recs[0]["warc_type"] == "warcinfo" and recs[0]["body"] is None


def test_framing_lies_quarantine():
    blob = _two_record_blob()
    # content-length overrunning the record
    raw = gzip.decompress(blob[: blob.index(b"\x1f\x8b", 2)])
    lied = raw.replace(b"Content-Length: ", b"Content-Length: 9", 1)
    with pytest.raises(ValueError):
        W.parse_warc(lied)
    # missing version line
    with pytest.raises(ValueError, match="version"):
        W.parse_warc(b"NOPE/1.0\r\n\r\n")
    # truncated gzip member
    with pytest.raises(ValueError):
        W.parse_warc(blob[:-6])
    # truncations never escape as struct/Index errors
    for cut in range(1, len(blob), 97):
        try:
            W.parse_warc(blob[:cut])
        except ValueError:
            pass


def test_inflate_bomb_capped(monkeypatch):
    """A tiny gzip member declaring a huge payload must quarantine at
    the cap, never allocate it."""
    monkeypatch.setattr(W, "_MAX_RECORD_BYTES", 1024)
    bomb = gzip.compress(b"\x00" * 10_000)
    with pytest.raises(ValueError, match="cap"):
        W.parse_warc(b"\x1f\x8b" + bomb[2:])


def test_record_count_capped(monkeypatch):
    monkeypatch.setattr(W, "_MAX_RECORDS", 3)
    rec = b"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    with pytest.raises(ValueError, match="count"):
        W.parse_warc(rec * 5)


def test_read_warc_distributed_quarantines(spark):
    """The Spark reader: good blobs explode into one row per response;
    corrupt blobs and undecodable charsets drop, the job survives."""
    bad_charset = W.encode_warc_record(
        "http://a.com/3", 200, "text/html; charset=no-such-codec", b"<p>x</p>"
    )
    rows = [
        (0, bytearray(_two_record_blob())),
        (1, bytearray(b"corrupt")),
        (2, bytearray(bad_charset)),
    ]
    df = spark.createDataFrame(rows, "blob_id long, warc binary")
    got = W.read_warc(df).collect()
    assert sorted(r["target_uri"] for r in got) == ["http://a.com/1", "http://a.com/2"]
    assert all(r["status"] == 200 for r in got)


def test_tar_roundtrip_and_guards(monkeypatch):
    """tar codec: deterministic bytes, regular-file filtering, declared
    size bounds, member-count cap, corrupt archives quarantine."""
    import io
    import tarfile

    two = W.encode_tar([("a/x.txt", b"hello"), ("y.bin", b"\x00\x01")])
    assert two == W.encode_tar([("a/x.txt", b"hello"), ("y.bin", b"\x00\x01")])
    assert W.parse_tar(two) == [("a/x.txt", b"hello"), ("y.bin", b"\x00\x01")]

    # non-regular members (dir, symlink) are skipped
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo("dir"); d.type = tarfile.DIRTYPE
        tf.addfile(d)
        ln = tarfile.TarInfo("link"); ln.type = tarfile.SYMTYPE; ln.linkname = "a/x.txt"
        tf.addfile(ln)
        f = tarfile.TarInfo("real.txt"); f.size = 2
        tf.addfile(f, io.BytesIO(b"ok"))
    assert W.parse_tar(buf.getvalue()) == [("real.txt", b"ok")]

    # declared-size bomb quarantines before reading
    monkeypatch.setattr(W, "_MAX_RECORD_BYTES", 16)
    big = W.encode_tar([("big.bin", b"z" * 64)])
    with pytest.raises(ValueError, match="cap"):
        W.parse_tar(big)
    monkeypatch.setattr(W, "_MAX_RECORD_BYTES", 64 * 1024 * 1024)

    # member-count cap
    monkeypatch.setattr(W, "_MAX_TAR_MEMBERS", 2)
    many = W.encode_tar([(f"f{i}", b"x") for i in range(4)])
    with pytest.raises(ValueError, match="cap"):
        W.parse_tar(many)
    monkeypatch.setattr(W, "_MAX_TAR_MEMBERS", 65536)

    # garbage + empty quarantine
    with pytest.raises(ValueError):
        W.parse_tar(b"junk" * 40)
    with pytest.raises(ValueError, match="no regular"):
        W.parse_tar(b"\x00" * 1024)


def test_read_tar_distributed(spark):
    good = W.encode_tar([("d/doc_0.txt", b"alpha"), ("d/doc_1.txt", b"beta")])
    rows = [(0, bytearray(good)), (1, bytearray(b"corrupt"))]
    df = spark.createDataFrame(rows, "blob_id long, tar binary")
    got = sorted((r["name"], bytes(r["data"])) for r in W.read_tar(df).collect())
    assert got == [("d/doc_0.txt", b"alpha"), ("d/doc_1.txt", b"beta")]


def test_zip_roundtrip_and_guards(monkeypatch):
    """zip codec: deterministic bytes, CRC verification, declared-size
    bounds, member caps, directory skipping, corruption quarantine."""
    import io
    import zipfile

    two = W.encode_zip([("a/x.txt", b"hello"), ("y.bin", b"\x00\x01" * 50)])
    assert two == W.encode_zip([("a/x.txt", b"hello"), ("y.bin", b"\x00\x01" * 50)])
    assert W.parse_zip(two) == [("a/x.txt", b"hello"), ("y.bin", b"\x00\x01" * 50)]

    # CRC corruption quarantines (zipfile verifies on read)
    bad = bytearray(two)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt zip|CRC"):
        W.parse_zip(bytes(bad))

    # directories skipped
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(zipfile.ZipInfo("d/", date_time=(1980, 1, 1, 0, 0, 0)), b"")
        zf.writestr(zipfile.ZipInfo("d/f.txt", date_time=(1980, 1, 1, 0, 0, 0)), b"ok")
    assert W.parse_zip(buf.getvalue()) == [("d/f.txt", b"ok")]

    # declared-size bomb quarantines before reading
    monkeypatch.setattr(W, "_MAX_RECORD_BYTES", 16)
    with pytest.raises(ValueError, match="cap"):
        W.parse_zip(W.encode_zip([("big.bin", b"z" * 64)]))
    monkeypatch.setattr(W, "_MAX_RECORD_BYTES", 64 * 1024 * 1024)

    # member-count cap
    monkeypatch.setattr(W, "_MAX_TAR_MEMBERS", 2)
    with pytest.raises(ValueError, match="cap"):
        W.parse_zip(W.encode_zip([(f"f{i}", b"x") for i in range(4)]))
    monkeypatch.setattr(W, "_MAX_TAR_MEMBERS", 65536)

    # garbage / truncation quarantine
    with pytest.raises(ValueError):
        W.parse_zip(b"junk" * 40)
    for cut in range(4, len(two), 31):
        try:
            W.parse_zip(two[:cut])
        except ValueError:
            pass


def test_read_zip_distributed(spark):
    good = W.encode_zip([("d/doc_0.txt", b"alpha"), ("d/doc_1.txt", b"beta")])
    rows = [(0, bytearray(good)), (1, bytearray(b"corrupt"))]
    df = spark.createDataFrame(rows, "blob_id long, zip binary")
    got = sorted((r["name"], bytes(r["data"])) for r in W.read_zip(df).collect())
    assert got == [("d/doc_0.txt", b"alpha"), ("d/doc_1.txt", b"beta")]


def test_bom_outranks_header_charset(spark):
    """WHATWG sniffing order: a byte-order mark wins over the header's
    charset label — mislabeled UTF-16 pages decode instead of being
    quarantined, and a utf-8 BOM never surfaces as 'ï»¿' mojibake."""
    page = "<html><body>ünïcode page — verified</body></html>"
    recs = (
        # UTF-16LE body labeled utf-8 (the classic server lie)
        W.encode_warc_record("http://a.com/16le", 200,
                             "text/html; charset=utf-8",
                             page.encode("utf-16-le"), record_id="urn:b:0")
        # UTF-16 with explicit BOM, labeled latin-1
        + W.encode_warc_record("http://a.com/16bom", 200,
                               "text/html; charset=iso-8859-1",
                               "﻿".encode("utf-16-be") + page.encode("utf-16-be"),
                               record_id="urn:b:1")
        # utf-8 with BOM, labeled latin-1 (double-decode trap)
        + W.encode_warc_record("http://a.com/8bom", 200,
                               "text/html; charset=iso-8859-1",
                               b"\xef\xbb\xbf" + page.encode("utf-8"),
                               record_id="urn:b:2")
        # honest plain utf-8, no BOM: unchanged behavior
        + W.encode_warc_record("http://a.com/plain", 200,
                               "text/html; charset=utf-8",
                               page.encode("utf-8"), record_id="urn:b:3")
    )
    df = spark.createDataFrame([(0, bytearray(recs))], "blob_id long, warc binary")
    got = {r["target_uri"]: r["html"] for r in W.read_warc(df).collect()}
    # the LE body has no BOM: utf-16-le bytes of ASCII-ish text decode
    # as utf-8 only by luck of NULs — it must NOT round-trip to `page`
    # silently wrong; with no BOM the header wins (documented), so the
    # labeled-utf-8 NUL-ridden decode fails and the row is dropped.
    assert "http://a.com/16le" not in got
    assert got["http://a.com/16bom"] == page
    assert got["http://a.com/8bom"] == page
    assert got["http://a.com/plain"] == page
