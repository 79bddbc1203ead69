"""CDX indexing + SURT keys (sources/cdx.py)."""

import gzip
import hashlib
import io

from pyspark.sql import functions as F

from csvweb_spark.sources.cdx import (cdx_entries_bytes, cdx_index,
                                      sorted_cdx, surt_key)
from csvweb_spark.sources.warc import parse_warc_bytes, render_warc


def _pages(spark):
    import datetime as dt
    rows = [("http://www.B.example.org/x?b=2&a=1",
             dt.datetime(2026, 2, 1, 0, 0, 2), b"body-two", "s1"),
            ("http://a.example.org/",
             dt.datetime(2026, 2, 1, 0, 0, 1), b"body-one", "s1"),
            ("https://a.example.org:443/z",
             dt.datetime(2026, 2, 1, 0, 0, 3), b"body-three", "s2")]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, seg string")


def test_surt_key_rules(spark):
    urls = ["http://www.Example.COM/Path?b=2&a=1#frag",
            "https://sub.example.com:443/",
            "http://example.com", "not a url"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.s for r in df.select(surt_key(F.col("url")).alias("s"))
           .collect()]
    assert got[0] == "com,example)/path?a=1&b=2"
    assert got[1] == "com,example,sub)/"
    assert got[2] == "com,example)/"
    assert got[3] is None


def test_cdx_offsets_are_ranged_fetchable_gzip_and_plain(spark):
    for gz in (False, True):
        segs = render_warc(_pages(spark), segment_col="seg",
                           gzip_members=gz)
        blobs = {r.segment_id: bytes(r.blob) for r in segs.collect()}
        idx = cdx_index(segs).collect()
        assert len(idx) == 3
        for r in idx:
            span = blobs[r.segment_id][r.offset:r.offset + r.length]
            rec = gzip.GzipFile(fileobj=io.BytesIO(span)).read() \
                if gz else span
            rows = parse_warc_bytes("probe", rec)
            assert len(rows) == 1 and rows[0][3] == r.url
            payload = rows[0][8]
            assert hashlib.sha256(payload).hexdigest() == r.digest
            assert r.mime == "text/html"


def test_cdx_truncated_tail_audited(spark):
    good = render_warc(_pages(spark), segment_col="seg") \
        .where(F.col("segment_id") == "s1").collect()[0]
    rows = cdx_entries_bytes("t", bytes(good.blob) + b"garbage tail")
    assert [r[6] for r in rows[:2]] == [200, 200]
    assert rows[-1][2] == "truncated" or rows[-1][5] == "truncated"


def test_sorted_cdx_layout(spark):
    segs = render_warc(_pages(spark), segment_col="seg",
                       gzip_members=True)
    out = sorted_cdx(cdx_index(segs), n_partitions=2)
    # globally ordered by surt when partitions are read in order
    keys = [r.surt for r in out.collect()]
    assert keys == sorted(keys)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()


def test_fetch_records_resolves_index_spans(spark):
    segs = render_warc(_pages(spark), segment_col="seg",
                       gzip_members=True)
    from csvweb_spark.sources.cdx import fetch_records
    idx = cdx_index(segs)
    # resolve only one surt key - the point of the index is selective
    hit = idx.where(F.col("surt").startswith("org,example,b)"))
    got = fetch_records(hit, segs).collect()
    assert len(got) == 1
    r = got[0]
    assert r.url == "http://www.B.example.org/x?b=2&a=1"
    assert bytes(r.payload) == b"body-two"
    assert r.http_status == 200
    # the blob never shuffles: the spans aggregate (the only exchange)
    # must not reference _blob
    plan = fetch_records(hit, segs)._jdf.queryExecution() \
        .optimizedPlan().toString()
    # the aggregate's OUTPUT (what the exchange ships) is sid + span
    # structs only - the blob column never enters the shuffled row
    agg_line = plan[plan.find("Aggregate"):].splitlines()[0]
    assert "_spans" in agg_line and "_blob" not in agg_line
