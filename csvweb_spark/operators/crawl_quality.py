"""Crawl-health operators: crawler-trap detection, link-farm
(reciprocal-link) signals, and soft-404 classification.

A production crawl burns budget on three failure classes csvweb never
sees (single-document conversion, ``Rdf/Converter.cs:88``):

* **spider traps** — infinite URL spaces (calendars, faceted search,
  session ids) where one host generates unbounded URLs from a handful
  of templates;
* **link farms** — host cliques trading reciprocal links to inflate
  connectivity-based ranking;
* **soft 404s** — servers answering HTTP 200 with an error page, so
  status-code filters pass garbage into the corpus.

All three are SURVEY §2.8 [new] crawl-curation surface, pure JVM
column expressions end to end.

Scale shape (10^12-URL frontier)
--------------------------------
* Trap census: URL -> template key is one narrow regexp projection;
  the census is a two-level map-side-combinable aggregate
  ((host, template) then host), identical cost class to the dedup
  digest censuses.  URL strings only; no page payloads.
* Reciprocity: the host graph self-joins on the REVERSED edge key —
  both sides are the same aggregated edge table (tiny vs the page
  corpus), shuffle-partitioned on (src,dst) with no broadcast
  assumption.
* Soft-404: one regexp/length projection per page over title+text —
  whole-stage codegen, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .urls import host_of


def url_template_key(url: Column) -> Column:
    """Collapse a URL to its generator template: scheme dropped, host
    kept, every decimal run -> 'N', every long (>=8) hex run -> 'H'.
    'http://a.com/item/123?page=7' and 'http://a.com/item/999?page=8'
    share one key — counting distinct URLs per key exposes the
    template's fan-out."""
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    rest = F.regexp_replace(rest, r"[0-9a-fA-F]{8,}", "H")
    return F.regexp_replace(rest, r"[0-9]+", "N")


def spider_trap_candidates(urls: DataFrame, url_col: str = "url",
                           max_urls_per_template: int = 1000,
                           max_path_depth: int = 12) -> DataFrame:
    """Per-(host, template) census with trap flags.

    ``is_trap`` when either (a) one template generated more than
    `max_urls_per_template` distinct URLs, or (b) the template's path
    nests deeper than `max_path_depth` segments (the
    /a/b/a/b/a/b/... recursion signature).  Returns every template
    with its fan-out so the threshold is auditable, flags included."""
    t = urls.select(
        host_of(F.col(url_col)).alias("host"),
        url_template_key(F.col(url_col)).alias("template"),
        F.col(url_col).alias("url"))
    census = (t.groupBy("host", "template")
              .agg(F.countDistinct("url").alias("n_urls")))
    depth = F.size(F.split(F.split(F.col("template"), r"\?")[0], "/")) - 1
    return census.select(
        "host", "template", "n_urls", depth.alias("path_depth"),
        ((F.col("n_urls") > max_urls_per_template)
         | (depth > max_path_depth)).alias("is_trap"))


def reciprocal_link_stats(host_edges: DataFrame) -> DataFrame:
    """Link-farm signal per host: of the distinct hosts it links out
    to, how many link back?  ``reciprocity`` near 1.0 with a non-
    trivial out-neighborhood is the classic link-exchange signature.

    Input: the aggregated (src_host, dst_host, n_links) graph; self
    edges ignored.  Both join sides are the edge table itself — no
    broadcast assumption, plain hash join on the reversed key."""
    e = (host_edges.filter(F.col("src_host") != F.col("dst_host"))
         .select("src_host", "dst_host").distinct())
    rev = e.select(F.col("dst_host").alias("src_host"),
                   F.col("src_host").alias("dst_host"))
    mutual = e.intersect(rev)
    out_deg = e.groupBy("src_host").agg(
        F.count(F.lit(1)).alias("out_hosts"))
    mut_deg = mutual.groupBy("src_host").agg(
        F.count(F.lit(1)).alias("mutual_hosts"))
    return (out_deg.join(mut_deg, "src_host", "left")
            .select(F.col("src_host").alias("host"), "out_hosts",
                    F.coalesce("mutual_hosts", F.lit(0))
                     .alias("mutual_hosts"))
            .withColumn("reciprocity",
                        F.col("mutual_hosts")
                        / F.col("out_hosts").cast("double")))


#: lowercase substrings that mark an error page masquerading as 200
_SOFT404_MARKERS = (
    "page not found", "404 not found", "no longer available",
    "page you requested could not be found", "error 404")


def soft404_signals(pages: DataFrame, url_col: str = "url",
                    title_col: str = "title", text_col: str = "text",
                    min_content_chars: int = 120) -> DataFrame:
    """Per-page soft-404 classification: a 200-status capture is a
    soft 404 when its BODY carries a not-found marker, or when its
    TITLE does (incl. a bare '404') and the body is thinner than
    `min_content_chars` (a long article *about* 404 pages is not an
    error page).  Pure codegen projection — marker match via one
    case-insensitive regex, no shuffle."""
    marker_re = "(?i)(" + "|".join(_SOFT404_MARKERS) + ")"
    title_hit = F.coalesce(F.col(title_col), F.lit("")) \
        .rlike(marker_re) | F.coalesce(F.col(title_col), F.lit("")) \
        .rlike(r"(?i)\b404\b")
    body_hit = F.coalesce(F.col(text_col), F.lit("")).rlike(marker_re)
    thin = F.length(F.coalesce(F.col(text_col), F.lit(""))) \
        < min_content_chars
    return pages.withColumn("soft404_title", title_hit) \
                .withColumn("soft404_body", body_hit) \
                .withColumn("is_soft404", body_hit | (title_hit & thin))
