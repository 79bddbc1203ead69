"""WARC segment ingest: Common-Crawl's container format -> pages rows.

The pipeline's page table (BASELINE.json input_hint: url/warc_ts/html)
is BORN from WARC files: a crawl delivers segments of concatenated
WARC/1.x records, each a block of WARC headers + (for ``response``
records) an HTTP message whose body is the page payload.  This module
turns a DataFrame of (segment_id, binary blob) rows into one row per
record, yielding exactly the input_hint page shape for response
records (ISO 8601 WARC-Date -> warc_ts, WARC-Target-URI -> url,
HTTP body -> html) with charset decode deferred to
`sources/charset.py`.

Format subset (WARC ISO 28500 + HTTP/1.1 framing as Common Crawl
emits it): records are walked by exact byte arithmetic - read the
header block up to the first CRLFCRLF, take ``Content-Length`` as the
block length, skip the two record-boundary CRLFs - NEVER by regex
over payloads (payloads may contain anything, including "WARC/1.0").
Malformed framing stops the walk for that segment and reports the
tail as one ``truncated`` audit row instead of emitting garbage rows.
GZIP member-per-record segments (.warc.gz) are transparently inflated
when the blob starts with the gzip magic (each record is its own
member per the WARC spec, so one streamed decompress yields the same
byte walk).

Scale shape: segments are the natural Spark partition unit (CC names
~1 GB files); the walk is one Arrow-batched mapInPandas - imperative
per-byte work is the one place Python is warranted, and it is
amortized per ~1 GB blob, not per row.  Everything downstream
(status/content-type filters, charset decode, text extraction) stays
JVM-side on the emitted columns.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARC_RECORDS_SCHEMA = (
    "segment_id string, rec_ix int, warc_type string, url string, "
    "warc_ts timestamp, http_status int, content_type string, "
    "location string, payload binary, error string")

_CRLF2 = b"\r\n\r\n"


def _headers(block: bytes) -> dict:
    """Case-insensitive header dict of one CRLF-joined header block
    (first line skipped by the caller when it is a version line)."""
    out = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
    return out


def parse_warc_bytes(segment_id: str, blob: bytes) -> list[tuple]:
    """All records of one WARC segment as WARC_RECORDS_SCHEMA tuples.
    Exact Content-Length walk; one trailing audit tuple (warc_type
    'truncated', error set) if framing breaks mid-segment."""
    if blob[:2] == b"\x1f\x8b":
        # member-per-record gzip: one streamed inflate of all members
        blob = gzip.GzipFile(fileobj=io.BytesIO(blob)).read()
    out: list[tuple] = []
    pos, ix, n = 0, 0, len(blob)
    while pos < n:
        if blob[pos:pos + 5] != b"WARC/":
            out.append((segment_id, ix, "truncated", None, None, None,
                        None, None, None,
                        f"bad magic at byte {pos}"))
            break
        hdr_end = blob.find(_CRLF2, pos)
        if hdr_end < 0:
            out.append((segment_id, ix, "truncated", None, None, None,
                        None, None, None, "unterminated WARC header"))
            break
        hdrs = _headers(blob[pos:hdr_end])
        try:
            clen = int(hdrs.get("content-length", ""))
        except ValueError:
            out.append((segment_id, ix, "truncated", None, None, None,
                        None, None, None, "missing Content-Length"))
            break
        body_start = hdr_end + 4
        body = blob[body_start:body_start + clen]
        if len(body) < clen:
            out.append((segment_id, ix, "truncated", None, None, None,
                        None, None, None, "body past end of segment"))
            break
        wtype = hdrs.get("warc-type", "unknown")
        url = hdrs.get("warc-target-uri")
        ts = hdrs.get("warc-date")
        status = ctype = location = None
        payload = None
        if wtype == "response" and body[:5] == b"HTTP/":
            http_end = body.find(_CRLF2)
            if http_end >= 0:
                status_line = body[:body.find(b"\r\n")]
                parts = status_line.split(b" ")
                try:
                    status = int(parts[1])
                except (IndexError, ValueError):
                    status = None
                hh = _headers(body[:http_end])
                ctype = hh.get("content-type")
                location = hh.get("location")
                payload = body[http_end + 4:]
        elif wtype == "response":
            payload = body
        out.append((segment_id, ix, wtype, url, ts, status, ctype,
                    location, payload, None))
        # record boundary: exactly two CRLFs after the block
        pos = body_start + clen + 4
        ix += 1
    return out


def parse_warc(segments: DataFrame, id_col: str = "segment_id",
               blob_col: str = "blob") -> DataFrame:
    """(segment_id, blob) -> one row per WARC record (see
    WARC_RECORDS_SCHEMA).  warc_ts is parsed from the ISO 8601
    WARC-Date JVM-side after the byte walk."""
    src = segments.select(F.col(id_col).cast("string").alias("_sid"),
                          F.col(blob_col).alias("_blob"))

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["segment_id", "rec_ix", "warc_type", "url", "_ts",
                "http_status", "content_type", "location", "payload",
                "error"]
        for pdf in batches:
            rows: list[tuple] = []
            for sid, blob in zip(pdf["_sid"], pdf["_blob"]):
                if blob is not None:
                    rows.extend(parse_warc_bytes(sid, bytes(blob)))
            yield pd.DataFrame(rows, columns=cols)

    raw_schema = WARC_RECORDS_SCHEMA.replace(
        "warc_ts timestamp", "_ts string")
    raw = src.mapInPandas(walk, raw_schema)
    ts = F.coalesce(
        F.try_to_timestamp(F.col("_ts"),
                           F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        F.try_to_timestamp(F.col("_ts"),
                           F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")))
    return raw.select("segment_id", "rec_ix", "warc_type", "url",
                      ts.alias("warc_ts"), "http_status",
                      "content_type", "location", "payload", "error")


def warc_pages(segments: DataFrame, id_col: str = "segment_id",
               blob_col: str = "blob", ok_only: bool = True,
               content_type_prefix: str = "text/html") -> DataFrame:
    """The input_hint page shape straight from WARC segments:
    (url, warc_ts, html:binary) for response records - HTTP 200 +
    `content_type_prefix` only by default (the crawl also archives
    robots fetches, redirects and images; a KG build wants renderable
    pages - pass 'text/csv' for tabular-payload crawls, or
    ok_only=False for everything).  Compose `charset.decode_pages`
    downstream for text."""
    recs = parse_warc(segments, id_col, blob_col) \
        .where(F.col("warc_type") == "response")
    if ok_only:
        recs = recs.where(
            (F.col("http_status") == 200)
            & F.col("content_type").startswith(content_type_prefix))
    return recs.select("url", "warc_ts",
                       F.col("payload").alias("html"))
