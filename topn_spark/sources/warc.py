"""WARC (Web ARChive, ISO 28500) record parsing — the ingestion front
end of every web-corpus pipeline (CommonCrawl ships WARC/WET/WAT).

Format (public spec): a WARC file is a sequence of records, each

    WARC/1.0<CRLF>
    <Header-Name>: <value><CRLF> ...
    <CRLF>
    <Content-Length bytes of payload>
    <CRLF><CRLF>

``Content-Length`` counts payload BYTES (not characters), so the
parser slices the raw buffer — headers are the only part decoded
eagerly. CommonCrawl ``.warc.gz`` files are CONCATENATED gzip members
(one per record, so HTTP range readers can seek); ``parse_warc``
transparently inflates that framing with a ``zlib.decompressobj``
loop over members.

Scale shape: input is ``(id, content binary)`` rows (from
``spark.read.format("binaryFile")`` or any blob store scan); parsing
is Arrow-batched ``mapInPandas`` — per-blob independent, map-only, no
shuffle, no driver state. At 100 TB the parallelism unit is the WARC
file (CommonCrawl segments are ~1 GB — thousands of files per dump),
which is exactly Spark's file-split unit; record explosion happens
inside the task. The pure-Python record walk is the sanctioned UDF
case: no JVM builtin parses WARC framing, and header parsing is a few
hundred bytes per multi-KB record (payload bytes are sliced, never
scanned).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["parse_warc", "parse_warc_records", "encode_warc"]

_CRLF = b"\r\n"


def _gunzip_members(buf: bytes, strict: bool = True) -> bytes:
    """Inflate a stream of CONCATENATED gzip members (the .warc.gz
    framing: one member per record). ``strict=False`` returns the
    successfully inflated prefix on a corrupt or truncated member
    (matching :func:`parse_warc_records`'s tolerant contract: the
    records parsed before the malformation, not an exception) —
    a truncated final member contributes its partial inflate, which
    the record walk then drops at its payload-truncation check."""
    out = []
    while buf:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(buf))
            out.append(d.flush())
        except zlib.error:
            if strict:
                raise ValueError(
                    "corrupt gzip member in WARC stream"
                ) from None
            break
        if not d.eof:
            if strict:
                raise ValueError("truncated gzip member in WARC stream")
            break
        buf = d.unused_data
    return b"".join(out)


def parse_warc_records(
    buf: bytes, strict: bool = True
) -> list[dict]:
    """Walk one WARC buffer into a list of record dicts (pure
    function — unit-testable without Spark). Keys: ``rec_idx``,
    ``warc_type``, ``record_id``, ``target_uri``, ``warc_date``,
    ``content_length``, ``payload``.

    ``strict=True`` raises ``ValueError`` on structural malformation
    (bad magic, missing Content-Length, truncated payload, missing
    record terminator); ``strict=False`` returns the records parsed
    before the malformation (tolerant tail-garbage mode).
    """
    if buf[:2] == b"\x1f\x8b":
        buf = _gunzip_members(bytes(buf), strict=strict)
    recs: list[dict] = []
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record CRLFs (the record terminator is CRLFCRLF;
        # tolerate extra blank lines between records)
        while buf[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        try:
            hdr_end = buf.index(b"\r\n\r\n", pos)
        except ValueError:
            if strict:
                raise ValueError(
                    f"record {len(recs)}: no header terminator"
                ) from None
            break
        head = buf[pos:hdr_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            if strict:
                raise ValueError(
                    f"record {len(recs)}: bad magic {lines[0][:20]!r}"
                )
            break
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        cl = headers.get("content-length")
        if cl is None or not cl.isdigit():
            if strict:
                raise ValueError(
                    f"record {len(recs)}: missing Content-Length"
                )
            break
        clen = int(cl)
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end > n:
            if strict:
                raise ValueError(
                    f"record {len(recs)}: payload truncated "
                    f"({body_end - n} bytes short)"
                )
            break
        if buf[body_end : body_end + 4] != b"\r\n\r\n" and not (
            body_end == n
        ):
            if strict:
                raise ValueError(
                    f"record {len(recs)}: missing record terminator"
                )
            break
        recs.append(
            {
                "rec_idx": len(recs),
                "warc_type": headers.get("warc-type"),
                "record_id": headers.get("warc-record-id"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_length": clen,
                "payload": bytes(buf[body_start:body_end]),
            }
        )
        pos = body_end + 4
    return recs


def parse_warc(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "blob_id",
    strict: bool = True,
) -> DataFrame:
    """Explode ``(id, warc-file bytes)`` rows into WARC records:
    ``(id, rec_idx, warc_type, record_id, target_uri, warc_date,
    content_length, payload)``. Gzipped (.warc.gz member-framed)
    blobs are inflated transparently. See module docstring for the
    scale shape; see :func:`parse_warc_records` for strictness
    semantics (a strict malformation fails the task — corrupt
    archives should be quarantined upstream, not silently dropped)."""
    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("rec_idx", T.IntegerType(), False),
            T.StructField("warc_type", T.StringType(), True),
            T.StructField("record_id", T.StringType(), True),
            T.StructField("target_uri", T.StringType(), True),
            T.StructField("warc_date", T.StringType(), True),
            T.StructField("content_length", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    cols = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[content_col]):
                if blob is None:
                    continue
                for r in parse_warc_records(blob, strict=strict):
                    rows.append(
                        (
                            bid,
                            r["rec_idx"],
                            r["warc_type"],
                            r["record_id"],
                            r["target_uri"],
                            r["warc_date"],
                            r["content_length"],
                            r["payload"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=out_schema)


def encode_warc(
    records: list[tuple[str, str, bytes]], gzip_members: bool = False
) -> bytes:
    """Build a WARC buffer from ``(warc_type, target_uri, payload)``
    triples — the test/fixture writer (also demonstrates the sink
    direction). ``gzip_members=True`` emits the CommonCrawl
    one-gzip-member-per-record framing."""
    out = []
    for i, (wtype, uri, payload) in enumerate(records):
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: <urn:test:{i}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("utf-8")
        rec = head + payload + b"\r\n\r\n"
        out.append(
            zlib.compress(rec, 6, wbits=31) if gzip_members else rec
        )
    return b"".join(out)
