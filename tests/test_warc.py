"""WARC source parsing tests (sources/warc.py)."""

from __future__ import annotations

import pytest

from topn_spark.sources.warc import (
    encode_warc,
    parse_warc,
    parse_warc_records,
)


def _recs():
    return [
        ("response", "http://a.example/1", "hello world".encode()),
        ("response", "http://a.example/2", "κόσμε multi-byte".encode()),
        ("metadata", "http://a.example/3", b""),
    ]


def test_roundtrip_plain():
    buf = encode_warc(_recs())
    out = parse_warc_records(buf)
    assert [r["rec_idx"] for r in out] == [0, 1, 2]
    assert [r["warc_type"] for r in out] == [
        "response",
        "response",
        "metadata",
    ]
    assert out[1]["payload"].decode() == "κόσμε multi-byte"
    # Content-Length counts BYTES, not characters
    assert out[1]["content_length"] == len("κόσμε multi-byte".encode())
    assert out[2]["content_length"] == 0


def test_roundtrip_gzip_members():
    buf = encode_warc(_recs(), gzip_members=True)
    assert buf[:2] == b"\x1f\x8b"
    out = parse_warc_records(buf)
    assert len(out) == 3
    assert out[0]["payload"] == b"hello world"


def test_payload_with_crlfcrlf_does_not_desync():
    tricky = b"line1\r\n\r\nWARC/1.0\r\n\r\nfake"
    buf = encode_warc([("response", "http://x/", tricky)] * 2)
    out = parse_warc_records(buf)
    assert len(out) == 2
    assert out[0]["payload"] == tricky
    assert out[1]["target_uri"] == "http://x/"


def test_strict_raises_on_truncation_tolerant_returns_prefix():
    buf = encode_warc(_recs())
    cut = buf[:-30]  # truncate inside the last record's payload/frame
    with pytest.raises(ValueError):
        parse_warc_records(cut)
    out = parse_warc_records(cut, strict=False)
    assert 0 < len(out) < 3
    assert out[0]["payload"] == b"hello world"


def test_strict_raises_on_bad_magic():
    with pytest.raises(ValueError, match="bad magic"):
        parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n")


def test_missing_content_length_is_structural():
    buf = b"WARC/1.0\r\nWARC-Type: response\r\n\r\npayload\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_records(buf)
    assert parse_warc_records(buf, strict=False) == []


def test_parse_warc_dataframe_explodes_records(spark):
    b0 = encode_warc(_recs())
    b1 = encode_warc(
        [("response", "http://b.example/9", b"solo")], gzip_members=True
    )
    df = spark.createDataFrame(
        [(0, b0), (1, b1), (2, None)],
        "blob_id long, content binary",
    )
    out = parse_warc(df).collect()
    assert len(out) == 4  # 3 + 1; null blob contributes nothing
    by_key = {(r.blob_id, r.rec_idx): r for r in out}
    assert by_key[(0, 1)].payload.decode() == "κόσμε multi-byte"
    assert by_key[(1, 0)].target_uri == "http://b.example/9"
    assert by_key[(1, 0)].record_id == "<urn:test:0>"


def test_tolerant_mode_on_truncated_gzip_member():
    """strict=False must honor the tolerant contract on COMPRESSED
    input too: a truncated final gzip member yields the records
    inflated before the cut, not a ValueError."""
    buf = encode_warc(_recs(), gzip_members=True)
    cut = buf[:-20]  # truncate inside the final gzip member
    with pytest.raises(ValueError, match="truncated gzip"):
        parse_warc_records(cut)
    out = parse_warc_records(cut, strict=False)
    assert 0 < len(out) < 3
    assert out[0]["payload"] == b"hello world"


def test_tolerant_mode_on_corrupt_gzip_member():
    """A flipped byte inside a later member: strict raises, tolerant
    returns the members inflated before the corruption."""
    import zlib

    first = encode_warc(_recs()[:1], gzip_members=True)
    # second member corrupted mid-deflate-stream
    second = bytearray(encode_warc(_recs()[1:2], gzip_members=True))
    second[len(second) // 2] ^= 0xFF
    buf = first + bytes(second)
    with pytest.raises((ValueError, zlib.error)):
        parse_warc_records(buf)
    out = parse_warc_records(buf, strict=False)
    assert len(out) == 1
    assert out[0]["payload"] == b"hello world"
