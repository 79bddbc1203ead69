"""WARC segment ingest (sources/warc.py): exact Content-Length walk,
payloads that contain record-magic bytes, gzip member-per-record,
truncation audit rows, response filtering, and composition with the
charset decoder."""

import datetime as dt
import gzip

import pytest
from pyspark.sql import functions as F

from csvweb_spark.sources.warc import parse_warc, parse_warc_bytes, \
    warc_pages


def _record(wtype, url, date, body, extra=b""):
    hdr = (f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
           f"WARC-Date: {date}\r\n").encode()
    if url:
        hdr += f"WARC-Target-URI: {url}\r\n".encode()
    hdr += extra + f"Content-Length: {len(body)}\r\n".encode()
    return hdr + b"\r\n" + body + b"\r\n\r\n"


def _http(body: bytes, status=b"200 OK",
          ctype=b"text/html; charset=UTF-8", extra=b"") -> bytes:
    return (b"HTTP/1.1 " + status + b"\r\nContent-Type: " + ctype +
            b"\r\n" + extra + b"\r\n" + body)


def _segment():
    info = _record("warcinfo", None, "2026-02-01T00:00:00Z",
                   b"software: test\r\n")
    req = _record("request", "http://a.org/", "2026-02-01T00:00:01Z",
                  b"GET / HTTP/1.1\r\nHost: a.org\r\n\r\n")
    # payload embedding the record magic - must not confuse the walk
    page = _http(b"<html>WARC/1.0 is mentioned\r\n\r\nhere</html>")
    resp = _record("response", "http://a.org/",
                   "2026-02-01T00:00:02Z", page)
    redirect = _record("response", "http://a.org/old",
                       "2026-02-01T00:00:03Z",
                       _http(b"gone", status=b"301 Moved",
                             extra=b"Location: http://a.org/new\r\n"))
    img = _record("response", "http://a.org/i.png",
                  "2026-02-01T00:00:04Z",
                  _http(b"\x89PNG...", ctype=b"image/png"))
    return info + req + resp + redirect + img


def test_byte_walk_and_fields():
    rows = parse_warc_bytes("s1", _segment())
    assert [r[2] for r in rows] == ["warcinfo", "request", "response",
                                    "response", "response"]
    resp = rows[2]
    assert resp[3] == "http://a.org/" and resp[5] == 200
    assert resp[6].startswith("text/html")
    assert resp[8] == b"<html>WARC/1.0 is mentioned\r\n\r\nhere</html>"
    assert rows[3][5] == 301 and rows[4][6] == "image/png"
    assert rows[3][7] == "http://a.org/new"  # Location captured
    assert all(r[9] is None for r in rows)


def test_gzip_member_per_record_equivalent():
    plain = _segment()
    # one gzip member per record, concatenated (the .warc.gz layout)
    recs, pos = [], 0
    while pos < len(plain):
        hdr_end = plain.find(b"\r\n\r\n", pos)
        clen = int(dict(
            line.split(b": ", 1) for line in
            plain[pos:hdr_end].split(b"\r\n")[1:])[b"Content-Length"])
        end = hdr_end + 4 + clen + 4
        recs.append(gzip.compress(plain[pos:end]))
        pos = end
    assert parse_warc_bytes("s", b"".join(recs)) == \
        parse_warc_bytes("s", plain)


def test_truncation_audit_not_garbage():
    seg = _segment() + b"WARC/1.0\r\nWARC-Type: response\r\n"
    rows = parse_warc_bytes("s", seg)
    assert rows[-1][2] == "truncated"
    assert "unterminated" in rows[-1][9]
    assert len(rows) == 6  # 5 good + 1 audit
    bad = _segment() + b"garbage tail"
    assert parse_warc_bytes("s", bad)[-1][9].startswith("bad magic")


def test_parse_warc_dataframe_and_ts(spark):
    df = spark.createDataFrame([("s1", _segment())],
                               "segment_id string, blob binary")
    rows = parse_warc(df).orderBy("rec_ix").collect()
    assert rows[2]["warc_ts"] == dt.datetime(2026, 2, 1, 0, 0, 2)
    assert rows[2]["http_status"] == 200


def test_warc_pages_filters_to_renderable(spark):
    df = spark.createDataFrame([("s1", _segment())],
                               "segment_id string, blob binary")
    pages = warc_pages(df).collect()
    assert len(pages) == 1
    assert pages[0]["url"] == "http://a.org/"
    assert bytes(pages[0]["html"]).startswith(b"<html>")
    # ok_only=False keeps the redirect and the image too
    assert warc_pages(df, ok_only=False).count() == 3


def test_compose_with_charset_decode(spark):
    body = _http("<p>café</p>".encode("cp1252"),
                 ctype=b"text/html; charset=windows-1252")
    seg = _record("response", "http://l.org/", "2026-02-01T00:00:00Z",
                  body)
    df = spark.createDataFrame([("s", seg)],
                               "segment_id string, blob binary")
    from csvweb_spark.sources.charset import decode_pages
    out = decode_pages(warc_pages(df)).collect()[0]
    # no meta in the body: validity sniff -> cp1252 fallback
    assert out["charset"] == "windows-1252"
    assert out["html_str"] == "<p>café</p>"


# ------------------------------------------------------------- WARC sink

def _sink_pages(spark):
    import datetime as dt
    rows = [("http://a.example.org/1",
             dt.datetime(2026, 2, 1, 0, 0, 1),
             "<html><body>one</body></html>".encode(), "a"),
            ("http://a.example.org/2",
             dt.datetime(2026, 2, 1, 0, 0, 2),
             "page mentioning WARC/1.0 inline".encode(), "a"),
            ("http://b.example.org/3",
             dt.datetime(2026, 2, 1, 0, 0, 3),
             b"\x00\x01binary-ish \xff payload", "b")]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, host string")


def test_render_warc_roundtrip(spark):
    from csvweb_spark.sources.warc import render_warc
    pages = _sink_pages(spark)
    segs = render_warc(pages, segment_col="host")
    got = {r.segment_id: r.n_records for r in segs.collect()}
    assert got == {"a": 2, "b": 1}
    back = warc_pages(segs, ok_only=False).collect()
    orig = {(r.url, r.warc_ts, bytes(r.html)) for r in pages.collect()}
    assert {(r.url, r.warc_ts, bytes(r.html)) for r in back} == orig


def test_render_warc_gzip_members_roundtrip_and_determinism(spark):
    from csvweb_spark.sources.warc import render_warc
    pages = _sink_pages(spark)
    segs = render_warc(pages, segment_col="host", gzip_members=True)
    blobs1 = {r.segment_id: bytes(r.blob) for r in segs.collect()}
    assert all(b[:2] == b"\x1f\x8b" for b in blobs1.values())
    blobs2 = {r.segment_id: bytes(r.blob)
              for r in render_warc(pages, segment_col="host",
                                   gzip_members=True).collect()}
    assert blobs1 == blobs2  # deterministic re-render (resumable sink)
    back = warc_pages(segs, ok_only=False).collect()
    assert {(r.url, bytes(r.html)) for r in back} == \
        {(r.url, bytes(r.html)) for r in _sink_pages(spark).collect()}


def test_render_warc_partition_mode_shuffle_free(spark):
    from csvweb_spark.sources.warc import render_warc
    pages = _sink_pages(spark).repartition(2)
    # disable the small-input spread so the scale-path plan shape is
    # what gets pinned: at real segment scale the size estimate exceeds
    # the bound and the sink adds no exchange of its own
    spark.conf.set("spark.csvweb.render.smallInputBytesPerCore", "0")
    try:
        segs = render_warc(pages)
        plan = segs._jdf.queryExecution().executedPlan().toString()
        # partition-mode sink: scan -> project -> mapInPandas, no shuffle
        # past the explicit repartition of the fixture
        assert plan.count("Exchange") == 1  # only the fixture repartition
        rows = segs.collect()
        assert sum(r.n_records for r in rows) == 3
        back = warc_pages(segs, ok_only=False)
        assert back.count() == 3
    finally:
        spark.conf.unset("spark.csvweb.render.smallInputBytesPerCore")


def test_render_warc_small_input_spreads_to_cores(spark, tmp_path):
    # round-6 guard: a tiny single-split FILE input (the only shape with
    # a real optimizer size estimate - in-memory fixtures default to
    # "unknown = huge" and correctly never spread) goes round-robin so
    # the render (and any downstream byte walk) parallelizes; the round
    # trip is unchanged and re-rendering is still deterministic
    from csvweb_spark.sources.warc import render_warc
    pq = str(tmp_path / "pages.parquet")
    _sink_pages(spark).coalesce(1).write.parquet(pq)
    pages = spark.read.parquet(pq)
    # drop the work floor so the 3-row fixture clears it; the floor's
    # default keeps byte-trivial inputs on their existing partitioning
    spark.conf.set("spark.csvweb.render.minSpreadBytesPerCore", "0")
    try:
        segs = render_warc(pages)
        plan = segs._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan  # the adaptive spread fired
        back = warc_pages(segs, ok_only=False).collect()
        orig = {(r.url, r.warc_ts, bytes(r.html)) for r in pages.collect()}
        assert {(r.url, r.warc_ts, bytes(r.html)) for r in back} == orig
        b1 = {r.segment_id: bytes(r.blob) for r in segs.collect()}
        b2 = {r.segment_id: bytes(r.blob)
              for r in render_warc(pages).collect()}
        assert b1 == b2
    finally:
        spark.conf.unset("spark.csvweb.render.minSpreadBytesPerCore")


def test_render_wet_roundtrip(spark):
    import datetime as dt
    from csvweb_spark.sources.warc import render_wet, wet_pages
    rows = [("http://a.example.org/1", dt.datetime(2026, 2, 1), "héllo", "a"),
            ("http://a.example.org/2", dt.datetime(2026, 2, 1),
             "text with WARC/1.0 inline\nand a newline", "a")]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, host string")
    segs = render_wet(pages, segment_col="host")
    s = segs.collect()
    assert len(s) == 1 and s[0].n_records == 2
    assert b"WARC-Type: conversion" in bytes(s[0].blob)
    back = {(r.url, r.text) for r in wet_pages(segs).collect()}
    assert back == {(u, t) for u, t, in
                    ((r[0], r[2]) for r in rows)}
    # partition mode is shuffle-free here too (guard conf-disabled so
    # the scale-path plan shape is what gets pinned)
    spark.conf.set("spark.csvweb.render.smallInputBytesPerCore", "0")
    try:
        plan = render_wet(pages)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.conf.unset("spark.csvweb.render.smallInputBytesPerCore")


# ----------------------------------------------------------------- WAT


def test_wat_roundtrip_and_determinism(spark):
    from csvweb_spark.sources.warc import render_wat, wat_pages
    import datetime as dt
    ts = dt.datetime(2026, 3, 1, 12, 0, 0)
    html = ('<html><head><title> T1  x </title>'
            '<meta name="description" content="D1"></head>'
            "<body><a href=\"/a\">A</a><a href='/b'>B</a></body></html>")
    pages = spark.createDataFrame(
        [("http://h/p1", ts, html),
         ("http://h/p2", ts, "<html><body>no head</body></html>")],
        "url string, warc_ts timestamp, html string")
    segs = render_wat(pages)
    out = {r.url: (r.title, r.description, list(r.links or []))
           for r in wat_pages(segs).collect()}
    assert out["http://h/p1"] == ("T1 x", "D1", ["/a", "/b"])
    assert out["http://h/p2"] == (None, None, [])
    # byte-identical re-render (resumable-sink contract)
    b1 = {r.segment_id: bytes(r.blob) for r in segs.collect()}
    b2 = {r.segment_id: bytes(r.blob) for r in render_wat(pages).collect()}
    assert b1 == b2
