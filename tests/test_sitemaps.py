"""Sitemap discovery (sources/sitemaps.py): robots Sitemap: lines,
urlset/sitemapindex parsing, entity unescape, lastmod leniency, and
the recrawl join's new/stale/fresh facts."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from csvweb_spark.sources.sitemaps import (recrawl_candidates,
                                           robots_sitemap_urls,
                                           sitemap_entries)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://a.org/p?x=1&amp;y=2</loc>
    <lastmod>2026-03-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc> http://a.org/q </loc><lastmod>junk-date</lastmod></url>
  <url><lastmod>2026-01-01</lastmod></url>
  <url><loc>http://a.org/r</loc>
       <lastmod>2026-03-05T10:30:00Z</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>http://a.org/sitemap-1.xml</loc>
           <lastmod>2026-02-02T01:02:03</lastmod></sitemap>
  <sitemap><loc>http://a.org/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def test_robots_sitemap_lines(spark):
    body = ("User-agent: *\nDisallow: /x\n"
            "Sitemap: http://a.org/sm.xml\n"
            "  sitemap:http://a.org/sm2.xml  \n"
            "# Sitemap: http://a.org/commented-out.xml is still a line\n")
    df = spark.createDataFrame([("a.org", body)], "host string, body string")
    got = {r["sitemap_url"]
           for r in robots_sitemap_urls(df).collect()}
    # the '#'-led line still matches the regex subset? No: '^[ \t]*'
    # requires the field at line start, '#' breaks it.
    assert got == {"http://a.org/sm.xml", "http://a.org/sm2.xml"}


def test_urlset_entries_fields_and_leniency(spark):
    df = spark.createDataFrame(
        [("http://a.org/sm.xml", URLSET)], "url string, body string")
    rows = {r["loc"]: r for r in sitemap_entries(df).collect()}
    # loc-less <url> dropped; whitespace-trimmed loc kept
    assert set(rows) == {"http://a.org/p?x=1&y=2", "http://a.org/q",
                         "http://a.org/r"}
    p = rows["http://a.org/p?x=1&y=2"]
    assert p["kind"] == "url" and p["changefreq"] == "daily"
    assert p["priority"] == pytest.approx(0.8)
    assert p["lastmod_ts"] == dt.datetime(2026, 3, 5)
    assert rows["http://a.org/q"]["lastmod_ts"] is None  # junk date
    assert rows["http://a.org/r"]["lastmod_ts"] is not None  # Z form


def test_sitemapindex_children(spark):
    df = spark.createDataFrame(
        [("http://a.org/sm.xml", INDEX)], "url string, body string")
    rows = sitemap_entries(df).collect()
    assert {r["kind"] for r in rows} == {"sitemap"}
    assert {r["loc"] for r in rows} == {"http://a.org/sitemap-1.xml",
                                        "http://a.org/sitemap-2.xml"}
    ts = {r["loc"]: r["lastmod_ts"] for r in rows}
    assert ts["http://a.org/sitemap-1.xml"] == dt.datetime(
        2026, 2, 2, 1, 2, 3)
    assert ts["http://a.org/sitemap-2.xml"] is None


def test_recrawl_new_stale_fresh(spark):
    body = ("<urlset>"
            "<url><loc>u:new</loc><lastmod>2026-01-10</lastmod></url>"
            "<url><loc>u:stale</loc><lastmod>2026-01-10</lastmod></url>"
            "<url><loc>u:fresh</loc><lastmod>2026-01-10</lastmod></url>"
            "<url><loc>u:nolm</loc></url>"
            "</urlset>")
    entries = sitemap_entries(spark.createDataFrame(
        [("s", body)], "url string, body string"))
    pages = spark.createDataFrame(
        [("u:stale", dt.datetime(2026, 1, 5)),
         ("u:stale", dt.datetime(2026, 1, 1)),   # older snapshot
         ("u:fresh", dt.datetime(2026, 1, 10)),  # at lastmod = fresh
         ("u:nolm", dt.datetime(2025, 1, 1))],
        "url string, warc_ts timestamp")
    got = {r["url"]: r["status"]
           for r in recrawl_candidates(entries, pages).collect()}
    assert got == {"u:new": "new", "u:stale": "stale",
                   "u:fresh": "fresh", "u:nolm": "fresh"}


def test_recrawl_join_is_key_unique(spark):
    # 3 snapshots x 1 listing -> exactly one output row
    body = "<urlset><url><loc>u</loc></url></urlset>"
    entries = sitemap_entries(spark.createDataFrame(
        [("s", body), ("s2", body)], "url string, body string"))
    pages = spark.createDataFrame(
        [("u", dt.datetime(2026, 1, i)) for i in (1, 2, 3)],
        "url string, warc_ts timestamp")
    out = recrawl_candidates(entries, pages).collect()
    assert len(out) == 1 and out[0]["last_crawl_ts"] == dt.datetime(
        2026, 1, 3)


def test_crawl_frontier_caps_per_host(spark):
    import datetime as dt
    rows = [(f"http://big.org/p{i}",
             dt.datetime(2026, 1, 1 + i), None, "stale")
            for i in range(9)]
    rows += [("http://small.org/x", dt.datetime(2026, 1, 2), None,
              "new"),
             ("http://small.org/nolm", None, None, "new"),
             ("http://small.org/skip", None, None, "fresh")]
    cands = spark.createDataFrame(
        rows, "url string, lastmod_ts timestamp, "
              "last_crawl_ts timestamp, status string")
    from csvweb_spark.sources.sitemaps import crawl_frontier
    got = crawl_frontier(cands, per_host_cap=3).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], []).append((r["rank"], r["url"]))
    # the hub host is capped at 3, freshest lastmod first
    assert sorted(by_host["big.org"]) == [
        (1, "http://big.org/p8"), (2, "http://big.org/p7"),
        (3, "http://big.org/p6")]
    # NULL lastmod sorts last; 'fresh' is not actionable
    assert sorted(by_host["small.org"]) == [
        (1, "http://small.org/x"), (2, "http://small.org/nolm")]


def test_crawl_frontier_plan_has_window_group_limit(spark):
    import datetime as dt
    cands = spark.createDataFrame(
        [(f"http://h{i % 5}.org/p{i}", dt.datetime(2026, 1, 1), None,
          "new") for i in range(50)],
        "url string, lastmod_ts timestamp, "
        "last_crawl_ts timestamp, status string")
    from csvweb_spark.sources.sitemaps import crawl_frontier
    plan = crawl_frontier(cands, per_host_cap=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
