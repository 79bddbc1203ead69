"""RSS/Atom feed parsing (sources/feeds.py): field extraction, CDATA,
entity unescape, RFC 822 / ISO dates, Atom link preference, and the
recrawl adapter."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from csvweb_spark.sources.feeds import as_recrawl_entries, feed_entries

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Chan</title><link>http://a.org/</link>
  <item>
    <title><![CDATA[Hello <World>]]></title>
    <link>http://a.org/p?a=1&amp;b=2</link>
    <guid>urn:g:1</guid>
    <pubDate>Tue, 17 Feb 2026 10:00:05 +0000</pubDate>
    <description>first &amp; foremost</description>
  </item>
  <item><title>No weekday</title><link>http://a.org/q</link>
        <pubDate>18 Feb 2026 11:30:00 GMT</pubDate></item>
  <item><title>Junk date</title><link>http://a.org/r</link>
        <pubDate>yesterday-ish</pubDate></item>
  <item><title>linkless, dropped</title></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
  <title>F</title>
  <entry>
    <title>A1</title>
    <link rel="self" href="http://a.org/self1"/>
    <link rel="alternate" href="http://a.org/e1"/>
    <id>urn:e:1</id>
    <updated>2026-02-19T08:00:00Z</updated>
    <summary>sum one</summary>
  </entry>
  <entry>
    <title>A2</title>
    <link href="http://a.org/e2"/>
    <id>urn:e:2</id>
    <published>2026-02-20</published>
  </entry>
</feed>"""


def _entries(spark, body):
    df = spark.createDataFrame([("http://a.org/feed", body)],
                               "url string, body string")
    return feed_entries(df).collect()


def test_rss_fields_cdata_entities_dates(spark):
    rows = {r["link"]: r for r in _entries(spark, RSS)}
    assert set(rows) == {"http://a.org/p?a=1&b=2", "http://a.org/q",
                         "http://a.org/r"}
    p = rows["http://a.org/p?a=1&b=2"]
    assert p["kind"] == "rss"
    assert p["title"] == "Hello <World>"
    assert p["entry_id"] == "urn:g:1"
    assert p["summary"] == "first & foremost"
    assert p["published_ts"] == dt.datetime(2026, 2, 17, 10, 0, 5)
    assert rows["http://a.org/q"]["published_ts"] == dt.datetime(
        2026, 2, 18, 11, 30)
    assert rows["http://a.org/q"]["entry_id"] == "http://a.org/q"
    assert rows["http://a.org/r"]["published_ts"] is None


def test_atom_link_preference_and_dates(spark):
    rows = {r["entry_id"]: r for r in _entries(spark, ATOM)}
    assert rows["urn:e:1"]["link"] == "http://a.org/e1"  # alternate wins
    assert rows["urn:e:1"]["kind"] == "atom"
    assert rows["urn:e:1"]["summary"] == "sum one"
    assert rows["urn:e:1"]["published_ts"] == dt.datetime(
        2026, 2, 19, 8, 0)
    assert rows["urn:e:2"]["link"] == "http://a.org/e2"
    assert rows["urn:e:2"]["published_ts"] == dt.datetime(2026, 2, 20)


def test_recrawl_adapter_composes(spark):
    from csvweb_spark.sources.sitemaps import recrawl_candidates
    df = spark.createDataFrame([("f", ATOM)], "url string, body string")
    pages = spark.createDataFrame(
        [("http://a.org/e1", dt.datetime(2026, 2, 19, 9))],
        "url string, warc_ts timestamp")
    got = {r["url"]: r["status"] for r in recrawl_candidates(
        as_recrawl_entries(feed_entries(df)), pages).collect()}
    assert got == {"http://a.org/e1": "fresh", "http://a.org/e2": "new"}
