"""RSS 2.0 / Atom feed parsing: the third URL-discovery channel.

Alongside robots.txt (`sources/robots.py`) and sitemaps
(`sources/sitemaps.py`), syndication feeds announce NEW content with
richer metadata (title, summary, publish time) - a crawl that wants
fresh pages first polls feeds.  Both formats flatten to one unified
entry row: (feed_url, kind, title, link, entry_id, published,
published_ts, summary).

Format subset (conforming-file regex parse, like sitemaps): RSS
``<item>`` blocks with title/link/guid/pubDate (RFC 822 dates, with or
without the weekday) and description; Atom ``<entry>`` blocks with
title/id/updated|published (ISO 8601) and ``<link href=".."/>``
(rel="alternate" preferred over the first link) and summary.  CDATA
sections unwrap; the XML five entities decode; unparseable dates ->
NULL, never a job kill.

Scale shape: feeds are per-HOST inputs parsed by JVM
``regexp_extract_all`` + ``explode`` - no Python; the page-corpus-side
consumer is `sitemaps.recrawl_candidates`, which accepts these rows
via `as_recrawl_entries` (same key-unique url join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sitemaps import _lastmod_ts, _xml_unescape

_ITEM_RE = r"(?is)<item[\s>](.*?)</item>"
_ENTRY_RE = r"(?is)<entry[\s>](.*?)</entry>"
_CDATA_RE = r"(?is)<!\[CDATA\[(.*?)\]\]>"

# Atom links are attributes; prefer rel="alternate", fall back to the
# first <link href=..> without caring about rel
_ATOM_ALT_LINK_RE = (r"(?is)<link\b[^>]*rel\s*=\s*[\"']alternate[\"']"
                     r"[^>]*href\s*=\s*[\"']([^\"']*)[\"']")
_ATOM_ANY_LINK_RE = r"(?is)<link\b[^>]*href\s*=\s*[\"']([^\"']*)[\"']"


def _tag(block: Column, tag: str) -> Column:
    got = F.regexp_extract(block,
                           rf"(?is)<{tag}[^>]*>\s*(.*?)\s*</{tag}>", 1)
    got = F.regexp_replace(got, _CDATA_RE, r"$1")
    got = _xml_unescape(got)
    return F.when(got == "", F.lit(None).cast("string")).otherwise(got)


def _rfc822_ts(s: Column) -> Column:
    """RFC 822 pubDate -> timestamp: with/without weekday, numeric
    offset or GMT/UT zone names; NULL on junk.  Spark's post-3.0
    parser refuses day-of-week patterns, so the optional weekday
    prefix is stripped instead of matched."""
    s = F.regexp_replace(s, r"^[A-Za-z]{3},\s*", "")
    return F.coalesce(
        F.try_to_timestamp(s, F.lit("d MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(s, F.lit("d MMM yyyy HH:mm:ss zzz")))


def feed_entries(feeds: DataFrame, url_col: str = "url",
                 body_col: str = "body") -> DataFrame:
    """Flatten (feed url, xml body) rows to unified entry rows.  A
    body yields rss rows for its <item> blocks and atom rows for its
    <entry> blocks (a well-formed feed has only one kind)."""
    src = feeds.select(F.col(url_col).cast("string").alias("feed_url"),
                       F.col(body_col).cast("string").alias("_body"))

    item = F.col("_block")
    rss = (src.select(
        "feed_url",
        F.explode(F.regexp_extract_all("_body", F.lit(_ITEM_RE), 1))
         .alias("_block"))
        .select(
            "feed_url", F.lit("rss").alias("kind"),
            _tag(item, "title").alias("title"),
            _tag(item, "link").alias("link"),
            F.coalesce(_tag(item, "guid"), _tag(item, "link"))
            .alias("entry_id"),
            _tag(item, "pubDate").alias("published"),
            _tag(item, "description").alias("summary"))
        .withColumn("published_ts", _rfc822_ts(F.col("published"))))

    alt = F.regexp_extract(item, _ATOM_ALT_LINK_RE, 1)
    any_link = F.regexp_extract(item, _ATOM_ANY_LINK_RE, 1)
    link = F.when(alt != "", alt).otherwise(
        F.when(any_link != "", any_link))
    atom_pub = F.coalesce(_tag(item, "updated"),
                          _tag(item, "published"))
    atom = (src.select(
        "feed_url",
        F.explode(F.regexp_extract_all("_body", F.lit(_ENTRY_RE), 1))
         .alias("_block"))
        .select(
            "feed_url", F.lit("atom").alias("kind"),
            _tag(item, "title").alias("title"),
            _xml_unescape(link).alias("link"),
            _tag(item, "id").alias("entry_id"),
            atom_pub.alias("published"),
            _tag(item, "summary").alias("summary"))
        .withColumn("published_ts", _lastmod_ts(F.col("published"))))

    cols = ["feed_url", "kind", "title", "link", "entry_id",
            "published", "published_ts", "summary"]
    return (rss.select(cols).unionByName(atom.select(cols))
            .where(F.col("link").isNotNull()))


def as_recrawl_entries(entries: DataFrame) -> DataFrame:
    """Adapt feed entries to the shape `sitemaps.recrawl_candidates`
    consumes (kind='url', loc, lastmod_ts) - feeds and sitemaps then
    schedule through ONE code path."""
    return entries.select(
        F.lit("url").alias("kind"),
        F.col("link").alias("loc"),
        F.col("published_ts").alias("lastmod_ts"))
