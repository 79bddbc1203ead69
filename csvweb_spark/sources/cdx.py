"""CDX indexing of WARC segments + SURT keys - the crawl's lookup index.

Common Crawl publishes a CDX(J) index beside its WARC archives: one row
per record giving the SURT-transformed URL key, timestamp, and the
(segment, byte offset, compressed length) needed to fetch exactly that
record with a ranged read. The reference resolves URLs by live HTTP
(DataDock.CsvWeb/Metadata/MetadataLocator.cs); a web-scale KG build
resolves them against this index instead - random access into 10^12
archived records without scanning segments.

SURT (Sort-friendly URI Reordering Transform, the IA/pywb convention):
lowercase, scheme dropped, leading ``www.`` dropped, host labels
reversed and comma-joined, ``)`` before the path, query parameters
sorted - so all URLs of a host (and of its subdomains' parents) sort
together, which is what makes the index range-scannable.

Scale shape: the offset walk is one Arrow-batched mapInPandas per
segment blob (same placement as the ingest byte walk - per-record
imperative work amortized over ~1 GB segments); the SURT key is a pure
JVM projection above it. Producing the globally-sorted CDX file layout
is repartitionByRange(surt) + sortWithinPartitions - range partitioning
is the ONLY shuffle and writes are already in key order.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .warc import _CRLF2, _headers, parse_warc_bytes

CDX_SCHEMA = ("segment_id string, offset long, length long, url string, "
              "warc_ts timestamp, warc_type string, http_status int, "
              "mime string, digest string, error string")


def _gzip_member_spans(blob: bytes):
    """(offset, length, inflated bytes) per gzip member - the WARC spec
    writes one member per record, so member spans ARE record spans.
    Stops at the first broken member (the caller audits the tail).

    Round-6 optimization (guide SS1/SS4.2): the previous walk sliced a
    fresh 1 MB chunk per member, so a segment of small members (a few
    hundred bytes each, the CDX bench shape) paid a ~1 MB copy + scan
    per RECORD - quadratic in practice (~150 GB of memcpy for 150k
    members). Now the decompressor's `unused_data` tail (the bytes it
    already holds past the member end) carries over as the next
    member's first feed, so each input byte is sliced out of the blob
    exactly once regardless of member size. Same offsets, same spans,
    same break behavior on a broken member."""
    spans, pos, n = [], 0, len(blob)
    mv = memoryview(blob)
    chunk_size = 1 << 20
    carry = b""  # unconsumed input already sliced; starts at `pos`
    while pos < n and blob[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(31)
        out = bytearray()
        fed = pos + len(carry)
        try:
            if carry:
                out += d.decompress(carry)
            while not d.eof and fed < n:
                piece = mv[fed:fed + chunk_size]
                out += d.decompress(bytes(piece))
                fed += len(piece)
        except zlib.error:
            break
        if not d.eof:
            break
        consumed = (fed - pos) - len(d.unused_data)
        spans.append((pos, consumed, bytes(out)))
        carry = d.unused_data
        pos += consumed
    return spans, pos


def _plain_spans(blob: bytes):
    """(offset, length, record bytes) per record of an uncompressed
    segment - the ingest byte walk's arithmetic, kept span-aware."""
    spans, pos, n = [], 0, len(blob)
    while pos < n:
        if blob[pos:pos + 5] != b"WARC/":
            break
        hdr_end = blob.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        try:
            clen = int(_headers(blob[pos:hdr_end]).get("content-length", ""))
        except ValueError:
            break
        end = hdr_end + 4 + clen + 4
        if end > n:
            break
        spans.append((pos, end - pos, blob[pos:end]))
        pos = end
    return spans, pos


def cdx_entries_bytes(segment_id: str, blob: bytes) -> list[tuple]:
    """CDX rows (CDX_SCHEMA order, warc_ts still a string) for one
    segment: per record the ORIGINAL byte span (gzip members for
    .warc.gz - the span a ranged fetch needs), the record identity
    fields, and the sha-256 payload digest. A broken tail yields one
    'truncated' audit row at its offset."""
    if blob[:2] == b"\x1f\x8b":
        spans, end = _gzip_member_spans(blob)
    else:
        spans, end = _plain_spans(blob)
    out = []
    for off, ln, rec in spans:
        rows = parse_warc_bytes(segment_id, rec)
        if not rows:
            continue
        (_, _, wtype, url, ts, status, ctype, _loc, payload,
         err) = rows[0]
        mime = ctype.split(";")[0].strip().lower() if ctype else None
        digest = (hashlib.sha256(payload).hexdigest()
                  if payload is not None else None)
        out.append((segment_id, off, ln, url, ts, wtype, status, mime,
                    digest, err))
    if end < len(blob):
        out.append((segment_id, end, len(blob) - end, None, None,
                    "truncated", None, None, None,
                    f"bad record framing at byte {end}"))
    return out


def surt_key(url: Column) -> Column:
    """SURT form of an absolute http(s) URL (see module docstring);
    NULL for non-URLs. Default ports dropped with the scheme; fragment
    dropped; query parameters sorted byte-wise."""
    scheme = F.lower(F.regexp_extract(
        url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    auth = F.regexp_extract(url, r"^[^:]+://([^/?#]+)", 1)
    hostport = F.lower(F.regexp_replace(auth, r"^.*@", ""))
    host = F.regexp_replace(hostport, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(url, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(F.lower(path))
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_sort(F.filter(F.split(F.lower(query), "&"),
                                   lambda p: p != ""))
    qs = F.concat_ws("&", params)
    key = F.concat(rev, F.lit(")"), path,
                   F.when(qs != "", F.concat(F.lit("?"), qs))
                   .otherwise(F.lit("")))
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(key)


def cdx_index(segments: DataFrame, id_col: str = "segment_id",
              blob_col: str = "blob",
              responses_only: bool = True) -> DataFrame:
    """WARC segments -> CDX index rows: (surt, url, warc_ts, warc_type,
    http_status, mime, digest, segment_id, offset, length). One
    mapInPandas per segment + a JVM SURT projection; order with
    `sorted_cdx` when writing the file layout."""
    src = segments.select(F.col(id_col).cast("string").alias("_sid"),
                          F.col(blob_col).alias("_blob"))

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["segment_id", "offset", "length", "url", "_ts",
                "warc_type", "http_status", "mime", "digest", "error"]
        for pdf in batches:
            rows: list[tuple] = []
            for sid, blob in zip(pdf["_sid"], pdf["_blob"]):
                if blob is not None:
                    rows.extend(cdx_entries_bytes(sid, bytes(blob)))
            yield pd.DataFrame(rows, columns=cols)

    raw = src.mapInPandas(
        walk, CDX_SCHEMA.replace("warc_ts timestamp", "_ts string"))
    ts = F.coalesce(
        F.try_to_timestamp(F.col("_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        F.try_to_timestamp(F.col("_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")))
    recs = raw.select(surt_key(F.col("url")).alias("surt"), "url",
                      ts.alias("warc_ts"), "warc_type", "http_status",
                      "mime", "digest", "segment_id", "offset", "length")
    if responses_only:
        recs = recs.where(F.col("warc_type") == "response")
    return recs


def sorted_cdx(index: DataFrame, n_partitions: int = 0) -> DataFrame:
    """The CDX FILE layout: globally ordered by (surt, warc_ts) via
    range partitioning + in-partition sort - one shuffle, and each
    output partition is a contiguous, internally-sorted key range (the
    property binary-searchable CDX shards need)."""
    parts = [F.col("surt"), F.col("warc_ts")]
    ranged = (index.repartitionByRange(n_partitions, *parts)
              if n_partitions else index.repartitionByRange(*parts))
    return ranged.sortWithinPartitions(*parts)


def fetch_records(index: DataFrame, segments: DataFrame,
                  id_col: str = "segment_id",
                  blob_col: str = "blob") -> DataFrame:
    """Resolve CDX rows back to records: each (segment_id, offset,
    length) span is sliced out of its segment, inflated if it is a gzip
    member, and parsed - the random-access read path the index exists
    for. Returns WARC_RECORDS_SCHEMA rows (minus rec_ix, offsets are
    the identity here) plus the span columns.

    Scale shape: spans group per segment (one small shuffle of offset
    pairs - never of blobs), the segment table joins ONCE on its key,
    and slicing happens inside one mapInPandas per segment batch. On a
    real object store the slice becomes a ranged GET per span and the
    segment blob never loads at all - this operator models that access
    pattern with the bytes available in-sandbox."""
    import gzip as _gzip
    import io as _io

    spans = (index.select(F.col("segment_id").alias("_sid"),
                          "offset", "length")
             .groupBy("_sid")
             .agg(F.sort_array(F.collect_list(
                 F.struct("offset", "length"))).alias("_spans")))
    src = (segments.select(F.col(id_col).cast("string").alias("_sid"),
                           F.col(blob_col).alias("_blob"))
           .join(spans, "_sid"))

    out_schema = ("segment_id string, offset long, length long, "
                  "url string, warc_ts timestamp, warc_type string, "
                  "http_status int, content_type string, "
                  "payload binary")

    def slice_parse(batches: Iterator[pd.DataFrame]
                    ) -> Iterator[pd.DataFrame]:
        cols = ["segment_id", "offset", "length", "url", "_ts",
                "warc_type", "http_status", "content_type", "payload"]
        for pdf in batches:
            rows: list[tuple] = []
            for sid, blob, sp in zip(pdf["_sid"], pdf["_blob"],
                                     pdf["_spans"]):
                blob = bytes(blob)
                for span in sp:
                    off, ln = int(span["offset"]), int(span["length"])
                    rec = blob[off:off + ln]
                    if rec[:2] == b"\x1f\x8b":
                        rec = _gzip.GzipFile(
                            fileobj=_io.BytesIO(rec)).read()
                    parsed = parse_warc_bytes(sid, rec)
                    if not parsed:
                        continue
                    (_, _, wtype, url, ts, status, ctype, _loc,
                     payload, _err) = parsed[0]
                    rows.append((sid, off, ln, url, ts, wtype, status,
                                 ctype, payload))
            yield pd.DataFrame(rows, columns=cols)

    raw = src.mapInPandas(
        slice_parse, out_schema.replace("warc_ts timestamp",
                                        "_ts string"))
    ts = F.coalesce(
        F.try_to_timestamp(F.col("_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        F.try_to_timestamp(F.col("_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")))
    return raw.select("segment_id", "offset", "length", "url",
                      ts.alias("warc_ts"), "warc_type", "http_status",
                      "content_type", "payload")
