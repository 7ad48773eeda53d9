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
