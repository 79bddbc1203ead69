"""Sitemap discovery + recrawl scheduling (sitemaps.org protocol).

The crawl-side companion to `sources/robots.py`: robots.txt declares
the host's sitemaps (``Sitemap:`` lines, RFC 9309 §2.3 / sitemaps.org),
the sitemaps enumerate URLs with ``<lastmod>`` freshness hints, and a
KG-construction pipeline schedules recrawls by comparing lastmod
against the latest crawled ``warc_ts`` per URL.  The reference has no
crawler surface; the sitemaps.org XML schema is small enough that a
bounded regex parse is exact for conforming files (documented subset:
no XML namespaces-prefix variance, no CDATA).

Scale shape: sitemap bodies are per-HOST inputs (millions of times
smaller than the page corpus) parsed by JVM ``regexp_extract_all`` +
``explode`` - no Python anywhere.  The one page-corpus-sized step is
`recrawl_candidates`: a map-side-combinable max(warc_ts) groupBy per
URL, then one equi-join on url between the sitemap entries and the
crawl state - both sides hash-partitioned on the join key, no
broadcast assumption (both CAN be 10^10 rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Sitemap: lines in robots.txt (field name case-insensitive; the line
# may appear outside any user-agent group)
_ROBOTS_SITEMAP_RE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"

_URL_BLOCK_RE = r"(?is)<url>(.*?)</url>"
_INDEX_BLOCK_RE = r"(?is)<sitemap>(.*?)</sitemap>"

# sitemaps.org requires entity-escaped URLs; decode the XML five
# (&amp; last, exactly inverting one escape pass)
_XML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&apos;", "'"), ("&amp;", "&")]


def _xml_unescape(col: Column) -> Column:
    for ent, ch in _XML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _tag_text(block: Column, tag: str) -> Column:
    got = F.regexp_extract(block, rf"(?is)<{tag}>\s*(.*?)\s*</{tag}>", 1)
    return F.when(got == "", F.lit(None).cast("string")).otherwise(got)


def _lastmod_ts(lastmod: Column) -> Column:
    """W3C datetime subset -> timestamp: full ISO with offset/Z,
    naive ISO, or date-only; unparseable -> NULL (never a job kill -
    crawl inputs are dirty)."""
    return F.coalesce(
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd")))


def robots_sitemap_urls(robots: DataFrame, host_col: str = "host",
                        body_col: str = "body") -> DataFrame:
    """(host, sitemap_url) for every Sitemap: declaration in the
    host's robots.txt - the discovery seed `sitemap_entries` consumes.
    Pure JVM regexp_extract_all + explode over the per-host table."""
    return (robots
            .select(F.col(host_col).cast("string").alias("host"),
                    F.explode(F.regexp_extract_all(
                        F.col(body_col).cast("string"),
                        F.lit(_ROBOTS_SITEMAP_RE), 1))
                    .alias("sitemap_url")))


def sitemap_entries(sitemaps: DataFrame, url_col: str = "url",
                    body_col: str = "body") -> DataFrame:
    """Flatten (sitemap url, xml body) rows to one row per entry:
    (sitemap_url, kind, loc, lastmod, lastmod_ts, changefreq,
    priority).  kind='url' rows come from <urlset> files; kind=
    'sitemap' rows are <sitemapindex> children (the caller feeds their
    fetched bodies back through this same function - the index
    recursion is I/O, not plan shape).  Conforming-subset regex parse,
    entity-unescaped locs, lenient lastmod -> NULL on junk."""
    src = sitemaps.select(
        F.col(url_col).cast("string").alias("sitemap_url"),
        F.col(body_col).cast("string").alias("_body"))

    def blocks(kind: str, rx: str) -> DataFrame:
        b = (src.select(
            "sitemap_url",
            F.explode(F.regexp_extract_all("_body", F.lit(rx), 1))
             .alias("_block"))
            .select(
                "sitemap_url",
                F.lit(kind).alias("kind"),
                _xml_unescape(_tag_text(F.col("_block"), "loc"))
                .alias("loc"),
                _tag_text(F.col("_block"), "lastmod").alias("lastmod"),
                _tag_text(F.col("_block"), "changefreq")
                .alias("changefreq"),
                _tag_text(F.col("_block"), "priority")
                .cast("double").alias("priority")))
        return b.withColumn("lastmod_ts", _lastmod_ts(F.col("lastmod")))

    out = (blocks("url", _URL_BLOCK_RE)
           .unionByName(blocks("sitemap", _INDEX_BLOCK_RE)))
    return out.where(F.col("loc").isNotNull()).select(
        "sitemap_url", "kind", "loc", "lastmod", "lastmod_ts",
        "changefreq", "priority")


def crawl_frontier(candidates: DataFrame, per_host_cap: int,
                   statuses: tuple = ("new", "stale"),
                   url_col: str = "url") -> DataFrame:
    """Politeness-capped fetch frontier from `recrawl_candidates`
    output: keep only actionable statuses, then at most
    `per_host_cap` URLs per host, freshest-lastmod first (NULL
    lastmod last, URL as the deterministic tiebreak).  Returns
    (host, url, lastmod_ts, status, rank).

    The per-host cap is the crawl's politeness budget AND the skew
    guard: one 10^8-page host cannot occupy a scheduling round.  The
    rank filter compiles to Spark's WindowGroupLimit, so each map
    task forwards at most cap rows per host BEFORE the exchange -
    same plan family as the exact-k stratified sampler (plan-pinned
    there)."""
    from pyspark.sql import Window
    host = F.regexp_extract(F.col(url_col),
                            r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1)
    w = (Window.partitionBy("host")
         .orderBy(F.desc_nulls_last("lastmod_ts"), F.col(url_col)))
    return (candidates
            .where(F.col("status").isin(*statuses))
            .withColumn("host", host)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= per_host_cap)
            .select("host", F.col(url_col).alias("url"),
                    "lastmod_ts", "status", "rank"))


def recrawl_candidates(entries: DataFrame, pages: DataFrame,
                       url_col: str = "url",
                       ts_col: str = "warc_ts") -> DataFrame:
    """Schedule decision per sitemap-listed URL vs the crawl state:

    * ``new``   - listed, never crawled
    * ``stale`` - lastmod is KNOWN newer than the latest crawl
    * ``fresh`` - crawled at/after lastmod, or no usable lastmod
                  (re-fetch cadence is then changefreq policy, not a
                  freshness fact - this operator only asserts facts)

    Returns (url, lastmod_ts, last_crawl_ts, status).  The page side
    collapses to one row per URL FIRST (map-side-combinable max), so
    the join is key-unique on both sides - no row explosion on
    many-snapshot URLs."""
    listed = (entries.where(F.col("kind") == "url")
              .select(F.col("loc").alias("url"), "lastmod_ts")
              .groupBy("url")
              .agg(F.max("lastmod_ts").alias("lastmod_ts")))
    crawled = (pages
               .select(F.col(url_col).alias("url"),
                       F.col(ts_col).alias("_ts"))
               .groupBy("url")
               .agg(F.max("_ts").alias("last_crawl_ts")))
    j = listed.join(crawled, "url", "left")
    status = (F.when(F.col("last_crawl_ts").isNull(), F.lit("new"))
               .when(F.col("lastmod_ts").isNotNull()
                     & (F.col("lastmod_ts") > F.col("last_crawl_ts")),
                     F.lit("stale"))
               .otherwise(F.lit("fresh")))
    return j.select("url", "lastmod_ts", "last_crawl_ts",
                    status.alias("status"))
