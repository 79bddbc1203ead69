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
        elif wtype in ("response", "conversion", "metadata"):
            # conversion (WET) and metadata (WAT) records carry the
            # raw block as payload
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


# ---------------------------------------------------------------------------
# WARC sink (render pages back into segments - the archival twin of the
# ingest above; `parse_warc(render_warc(pages))` round-trips byte-exactly)
# ---------------------------------------------------------------------------

def _render_record(url: str, ts: str, body: bytes, status: int,
                   ctype: str) -> bytes:
    """One WARC/1.0 response record: WARC headers + HTTP/1.1 message,
    Content-Length exact, record terminated by the spec's two CRLFs.
    WARC-Record-ID is a deterministic content address (sha-256 of
    url + date + body) so re-rendering a segment is byte-identical -
    resumable sinks must not invent fresh UUIDs per attempt."""
    import hashlib
    http = (f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body
    rid = hashlib.sha256(
        url.encode() + b"\x1f" + ts.encode() + b"\x1f" + body).hexdigest()
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: response\r\n"
           f"WARC-Record-ID: <urn:sha256:{rid}>\r\n"
           f"WARC-Date: {ts}\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"Content-Type: application/http; msgtype=response\r\n"
           f"Content-Length: {len(http)}\r\n\r\n").encode()
    return hdr + http + b"\r\n\r\n"


def _render_conversion_record(url: str, ts: str, body: bytes) -> bytes:
    """One WARC/1.0 conversion record (the WET layout Common Crawl
    derives: extracted text as the raw block, no HTTP message).
    Deterministic content-address record ID like _render_record."""
    import hashlib
    rid = hashlib.sha256(
        url.encode() + b"\x1f" + ts.encode() + b"\x1f" + body).hexdigest()
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: conversion\r\n"
           f"WARC-Record-ID: <urn:sha256:{rid}>\r\n"
           f"WARC-Date: {ts}\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"Content-Type: text/plain\r\n"
           f"Content-Length: {len(body)}\r\n\r\n").encode()
    return hdr + body + b"\r\n\r\n"


def render_wet(pages: DataFrame, url_col: str = "url",
               ts_col: str = "warc_ts", text_col: str = "text",
               segment_col: str | None = None) -> DataFrame:
    """Pages -> WET segments (segment_id, blob, n_records): one WARC
    *conversion* record per page whose block is the UTF-8 extracted
    text - the text-only sidecar format Common Crawl publishes next to
    its response archives. Same segmenting contract as `render_warc`
    (partition mode = shuffle-free). Round-trips through `parse_warc`
    (conversion payloads are the raw block) / `wet_pages`."""
    with_bytes = pages.withColumn(
        "_wet_body", F.col(text_col).cast("binary"))
    return _render_segments(
        with_bytes, url_col, ts_col, "_wet_body", segment_col,
        _render_conversion_record)


def wet_pages(segments: DataFrame, id_col: str = "segment_id",
              blob_col: str = "blob") -> DataFrame:
    """(url, warc_ts, text) back out of WET segments: conversion
    records' blocks decoded as UTF-8."""
    recs = parse_warc(segments, id_col, blob_col) \
        .where(F.col("warc_type") == "conversion")
    return recs.select("url", "warc_ts",
                       F.col("payload").cast("string").alias("text"))


def _render_segments(pages: DataFrame, url_col: str, ts_col: str,
                     body_col: str, segment_col: str | None,
                     make_record) -> DataFrame:
    """Shared segment assembly for render_warc / render_wet: partition
    mode (shuffle-free, segment id = partition ordinal) or explicit
    `segment_col` grouping (url-sorted deterministic blobs)."""

    def _blob(sid: str, rows) -> tuple:
        parts, n = [], 0
        for url, ts, body in rows:
            if url is None or ts is None:
                continue
            parts.append(make_record(
                url, ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                b"" if body is None else bytes(body)))
            n += 1
        return sid, b"".join(parts), n

    out_schema = "segment_id string, blob binary, n_records long"
    if segment_col is None:
        # Round-6 scale-adaptive sink parallelism (guide SS2): partition
        # mode inherits the upstream partition count, so a small input
        # (e.g. one parquet split) would render - and every downstream
        # byte walk would parse - on ONE core while the rest idle. When
        # the optimizer's size ESTIMATE (driver-side, no job) says the
        # whole input is below `spark.csvweb.render.smallInputBytesPerCore`
        # (default 8 MB) per core, spread it round-robin first; at real
        # segment scale (GB-class inputs, thousands of splits) the
        # estimate exceeds the bound and the sink stays shuffle-free.
        # Round-robin repartition is deterministic (Spark sorts before
        # round-robin), so re-rendering stays byte-identical.
        # A lower WORK floor (`minSpreadBytesPerCore`, default 128 KB)
        # keeps truly tiny inputs on their existing partitioning: below
        # ~128 KB of payload per core the spread's exchange + extra task
        # scheduling costs more than the serial render saves (measured
        # +1 s at bench sf0.1 vs -7 s at sf1.0 without the floor).
        spark = pages.sparkSession
        par = spark.sparkContext.defaultParallelism
        try:
            per_core = int(spark.conf.get(
                "spark.csvweb.render.smallInputBytesPerCore",
                str(8 << 20)))
            min_core = int(spark.conf.get(
                "spark.csvweb.render.minSpreadBytesPerCore",
                str(128 << 10)))
            est = int(pages._jdf.queryExecution().optimizedPlan()
                      .stats().sizeInBytes())
        except Exception:
            per_core, est = 0, 0
        if per_core > 0 and par * min_core <= est < par * per_core:
            pages = pages.repartition(par)
        src = pages.select(
            F.spark_partition_id().cast("string").alias("_sid"),
            F.col(url_col).alias("_url"), F.col(ts_col).alias("_ts"),
            F.col(body_col).alias("_body"))

        def per_partition(batches: Iterator[pd.DataFrame]
                          ) -> Iterator[pd.DataFrame]:
            acc: list[tuple] = []
            sid = None
            for pdf in batches:
                if len(pdf) and sid is None:
                    sid = str(pdf["_sid"].iloc[0])
                acc.extend(zip(pdf["_url"], pdf["_ts"], pdf["_body"]))
            if sid is None:
                return
            yield pd.DataFrame([_blob(sid, acc)],
                               columns=["segment_id", "blob", "n_records"])

        return src.mapInPandas(per_partition, out_schema)

    src = pages.select(
        F.col(segment_col).cast("string").alias("_sid"),
        F.col(url_col).alias("_url"), F.col(ts_col).alias("_ts"),
        F.col(body_col).alias("_body"))

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_url")
        row = _blob(str(pdf["_sid"].iloc[0]),
                    zip(pdf["_url"], pdf["_ts"], pdf["_body"]))
        return pd.DataFrame([row],
                            columns=["segment_id", "blob", "n_records"])

    return src.groupBy("_sid").applyInPandas(per_group, out_schema)


def render_warc(pages: DataFrame, url_col: str = "url",
                ts_col: str = "warc_ts", html_col: str = "html",
                segment_col: str | None = None,
                status: int = 200,
                content_type: str = "text/html; charset=UTF-8",
                gzip_members: bool = False) -> DataFrame:
    """Pages -> WARC segments (segment_id, blob:binary, n_records).

    Default segmenting is ONE SEGMENT PER INPUT PARTITION (segment id =
    the partition ordinal): the sink is then completely shuffle-free -
    each executor renders the pages it already holds, the 10^12-row
    write plan being scan -> mapInPandas -> sink. Pass `segment_col`
    for semantic segments (e.g. per host); that groups (one shuffle) and
    orders records by url inside each segment for deterministic blobs.
    `gzip_members=True` emits the .warc.gz layout the parser ingests:
    one gzip member per record (mtime pinned to 0 so blobs are
    deterministic), concatenated."""
    import gzip as _gzip

    def make_record(url: str, ts: str, body: bytes) -> bytes:
        rec = _render_record(url, ts, body, status, content_type)
        if gzip_members:
            buf = io.BytesIO()
            with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            rec = buf.getvalue()
        return rec

    return _render_segments(pages, url_col, ts_col, html_col,
                            segment_col, make_record)


def _render_metadata_record(url: str, ts: str, body: bytes) -> bytes:
    """One WARC/1.0 metadata record (the WAT layout: a JSON envelope
    as the block). Deterministic content-address ID like the other
    renderers - re-rendering is byte-identical."""
    import hashlib
    rid = hashlib.sha256(
        url.encode() + b"\x1f" + ts.encode() + b"\x1f" + body).hexdigest()
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: metadata\r\n"
           f"WARC-Record-ID: <urn:sha256:{rid}>\r\n"
           f"WARC-Date: {ts}\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"Content-Type: application/json\r\n"
           f"Content-Length: {len(body)}\r\n\r\n").encode()
    return hdr + body + b"\r\n\r\n"


WAT_ENVELOPE_SCHEMA = ("title string, description string, "
                       "links array<string>")


def render_wat(pages: DataFrame, url_col: str = "url",
               ts_col: str = "warc_ts", html_col: str = "html",
               segment_col: str | None = None) -> DataFrame:
    """Pages -> WAT segments: one WARC *metadata* record per page
    whose block is a JSON envelope (title, meta description, raw
    anchor hrefs in document order per attribute quoting) - the third
    Common-Crawl sidecar next to WARC (render_warc) and WET
    (render_wet), completing the triad: link-graph and head-metadata
    consumers read WAT without touching page bytes.

    The envelope derives ENTIRELY JVM-side before segment assembly
    (title regex + meta-content regex + href regexp_extract_all +
    to_json - the pandas stage only frames bytes, exactly like the
    other sinks); hrefs are kept RAW (unresolved), matching CC's WAT
    which records both - resolution is `weblinks.resolve_url`
    downstream. Deterministic: to_json field order is the struct
    order, so re-rendering is byte-identical (resumable-sink
    contract). Round-trips through `wat_pages`."""
    from .weblinks import _HREF_DQ, _HREF_SQ
    from .webtext import _TITLE_RE, _meta_content, _nullify

    h = F.col(html_col).cast("string")
    title = F.trim(F.regexp_replace(
        F.regexp_extract(h, _TITLE_RE, 1), r"\s+", " "))
    links = F.concat(F.regexp_extract_all(h, F.lit(_HREF_DQ), 1),
                     F.regexp_extract_all(h, F.lit(_HREF_SQ), 1))
    envelope = F.to_json(F.struct(
        _nullify(title).alias("title"),
        _nullify(_meta_content(h, "name", "description"))
        .alias("description"),
        links.alias("links")))
    with_bytes = pages.withColumn("_wat_body", envelope.cast("binary"))
    return _render_segments(with_bytes, url_col, ts_col, "_wat_body",
                            segment_col, _render_metadata_record)


def wat_pages(segments: DataFrame, id_col: str = "segment_id",
              blob_col: str = "blob") -> DataFrame:
    """(url, warc_ts, title, description, links) back out of WAT
    segments: metadata records' JSON envelopes via from_json (the
    record's WARC-Target-URI is the authoritative url)."""
    recs = parse_warc(segments, id_col, blob_col) \
        .where(F.col("warc_type") == "metadata")
    env = F.from_json(F.col("payload").cast("string"),
                      WAT_ENVELOPE_SCHEMA)
    return recs.select("url", "warc_ts",
                       env["title"].alias("title"),
                       env["description"].alias("description"),
                       env["links"].alias("links"))
