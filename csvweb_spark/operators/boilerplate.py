"""Host-scoped template/boilerplate removal: lines that repeat across
a large fraction of a HOST's pages (nav menus, cookie banners,
copyright footers) are site template, not content — the CCNet /
RefinedWeb curation rule, scoped per host so one site's footer never
censors another site's prose.

Complements the two existing text-dedup families: `dedup.dedup_lines`
removes GLOBAL cross-document duplicate lines keep-first;
`webtext.main_content` classifies blocks by local shape (length/link
density).  This operator is the corpus-statistical middle ground: a
line is boilerplate iff it appears on >= max(min_pages,
min_frac_pct% ) of the host's pages, and it is removed from EVERY
page of that host (no keep-first survivor — template text is noise
everywhere).

No reference counterpart (csvweb never sees two pages of one site);
SURVEY §2.8 [new] curation surface.

Scale shape (10^12-page crawl)
------------------------------
* Census pass: pages explode to (host, url, 16-hex md5 line digest)
  with per-page `array_distinct` applied LOCALLY first, then one
  map-side-combinable groupBy (host, digest) counts distinct-by-
  construction pages; host page totals are a second tiny aggregate of
  the same shuffle key prefix.  Only digests travel — never line text.
* The boilerplate set folds to ONE array row per host, capped at
  `max_lines_per_host` frequent digests (top-k by count rides the
  partial WindowGroupLimit prune; overflow is an audited count, not a
  silent truncation).
* Strip pass: pages equi-join the per-host digest array (hosts are
  the small side by construction — same shape as the robots verdict
  join; `broadcast_rules` is an explicit opt-in, never an
  unconditional hint) and a JVM higher-order `filter` drops matching
  lines — page text is never shuffled and never leaves the JVM.
* md5 is used (not xxhash) so an external engine can replay the rule
  byte-for-byte — the digest is 64 bits of md5, plenty against
  accidental collision inside one host's line census.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .urls import host_of


def _line_digest(line: Column) -> Column:
    return F.substring(F.md5(line), 1, 16)


def host_boilerplate_lines(pages: DataFrame, url_col: str = "url",
                           text_col: str = "text",
                           min_pages: int = 2,
                           min_frac_pct: int = 50,
                           max_lines_per_host: int = 10000) -> DataFrame:
    """Per-host census of template lines.

    Returns one row per (host, line_digest) classified boilerplate:
    ``host, digest, n_pages (pages of the host carrying the line),
    host_pages (total), rank`` — capped at `max_lines_per_host` most
    frequent per host (ties broken by digest for determinism).
    Integer-exact threshold: ``n_pages >= min_pages AND
    n_pages * 100 >= min_frac_pct * host_pages``."""
    host = host_of(F.col(url_col)).alias("host")
    per_page = pages.select(
        host, F.col(url_col).alias("url"),
        F.array_distinct(
            F.transform(F.split(F.col(text_col), "\n"),
                        _line_digest)).alias("digests"))
    counts = (per_page
              .select("host", "url", F.explode("digests").alias("digest"))
              .groupBy("host", "digest")
              .agg(F.count(F.lit(1)).alias("n_pages")))
    totals = per_page.groupBy("host").agg(
        F.count(F.lit(1)).alias("host_pages"))
    flagged = (counts.join(totals, "host")
               .filter((F.col("n_pages") >= min_pages)
                       & (F.col("n_pages") * 100
                          >= min_frac_pct * F.col("host_pages"))))
    w = Window.partitionBy("host").orderBy(F.desc("n_pages"), "digest")
    return (flagged.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= max_lines_per_host))


def boilerplate_census_audit(boilerplate: DataFrame,
                             max_lines_per_host: int = 10000) -> DataFrame:
    """Hosts whose template set hit the cap — the audited-drop ledger
    (a capped host keeps its top-k template lines; the audit row is
    the signal to raise the cap or inspect the host)."""
    return (boilerplate.groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_boilerplate"))
            .filter(F.col("n_boilerplate") >= max_lines_per_host))


def strip_host_boilerplate(pages: DataFrame, url_col: str = "url",
                           text_col: str = "text",
                           min_pages: int = 2,
                           min_frac_pct: int = 50,
                           max_lines_per_host: int = 10000,
                           broadcast_rules: bool = False) -> DataFrame:
    """Remove each host's template lines from every page of that host.

    Adds ``text_clean`` (remaining lines re-joined with \\n) and
    ``n_removed``; all other page columns pass through.  The page side
    is never aggregated or shuffled: hosts join in (optionally
    broadcast — explicit opt-in only) and a JVM higher-order filter
    drops lines whose 64-bit md5 digest is in the host's set."""
    bl = host_boilerplate_lines(pages, url_col, text_col, min_pages,
                                min_frac_pct, max_lines_per_host)
    sets = bl.groupBy("host").agg(
        F.array_sort(F.collect_set("digest")).alias("_bl"))
    if broadcast_rules:
        sets = F.broadcast(sets)
    host = host_of(F.col(url_col)).alias("_host")
    lines = F.split(F.col(text_col), "\n")
    keep = F.filter(lines, lambda l: ~F.coalesce(
        F.array_contains(F.col("_bl"), _line_digest(l)), F.lit(False)))
    return (pages.withColumn("_host", host)
            .join(sets, F.col("_host") == sets.host, "left")
            .withColumn("text_clean", F.array_join(keep, "\n"))
            .withColumn("n_removed", F.size(lines) - F.size(keep))
            .drop("_host", "host", "_bl"))
