"""Crawl revisit analysis: per-fetch change detection over the
multi-snapshot pages table, and the per-URL change statistics that
drive adaptive recrawl scheduling.

Common Crawl's WARC writers emit a *revisit* record (instead of a full
response payload) when a re-fetch's content digest matches an earlier
capture of the same URL — the single biggest storage saver in a
recurring crawl, and the signal a scheduler uses to slow down on
static pages and speed up on churning ones.  csvweb has no notion of
re-fetch (single-shot conversion, ``Rdf/Converter.cs:88``); this is
SURVEY §2.8 [new] surface over the ``(url, warc_ts, …)`` input shape.

Scale shape (10^12-row pages table)
-----------------------------------
* The content digest is projected JVM-side (``sha2``) BEFORE the
  per-URL window, so the shuffle that lines up a URL's fetch history
  carries (url, ts, 32-byte digest) — never the page text/bytes.
* The window partitions by url: keys are as fine as the table itself
  (a URL has a handful of snapshots), so there is no skew hot-spot,
  and the downstream per-URL aggregate reuses the same hash
  partitioning (no second exchange).
* Everything is built-in expressions — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: classification of one fetch vs the previous capture of the same URL
STATUS_NEW = "new"            # first capture of this URL
STATUS_CHANGED = "changed"    # digest differs from the previous capture
STATUS_UNCHANGED = "unchanged"  # digest matches -> CC-style revisit record


def fetch_deltas(pages: DataFrame, url_col: str = "url",
                 ts_col: str = "warc_ts",
                 content_col: str = "text") -> DataFrame:
    """One row per fetch: (url, ts, digest, status, payload_stored).

    ``status`` compares this fetch's content digest with the
    IMMEDIATELY PREVIOUS fetch of the same URL (warc_ts order) —
    exactly the WARC revisit rule with a lookback of the latest
    capture.  ``payload_stored`` is the storage decision: revisits
    (unchanged) reference the earlier record instead of re-storing
    the payload."""
    digest = F.sha2(F.coalesce(F.col(content_col).cast("string"),
                               F.lit("")), 256)
    slim = pages.select(F.col(url_col).alias("url"),
                        F.col(ts_col).alias("warc_ts"),
                        digest.alias("digest"))
    w = Window.partitionBy("url").orderBy("warc_ts")
    prev = F.lag("digest").over(w)
    status = (F.when(prev.isNull(), F.lit(STATUS_NEW))
              .when(prev == F.col("digest"), F.lit(STATUS_UNCHANGED))
              .otherwise(F.lit(STATUS_CHANGED)))
    return slim.select(
        "url", "warc_ts", "digest", status.alias("status"),
        (status != STATUS_UNCHANGED).alias("payload_stored"))


def revisit_stats(pages: DataFrame, url_col: str = "url",
                  ts_col: str = "warc_ts",
                  content_col: str = "text") -> DataFrame:
    """Per-URL change history: fetch/change counts, observation span,
    last time the content actually changed, and the change rate
    (changes per re-fetch — 0.0 for a static page, 1.0 for one that
    churned on every revisit)."""
    d = fetch_deltas(pages, url_col, ts_col, content_col)
    changed = (F.col("status") == STATUS_CHANGED).cast("long")
    fresh = F.col("status").isin(STATUS_NEW, STATUS_CHANGED)
    return d.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(changed).alias("n_changes"),
        F.min("warc_ts").alias("first_ts"),
        F.max("warc_ts").alias("last_ts"),
        F.max(F.when(fresh, F.col("warc_ts"))).alias("last_change_ts"),
        (F.sum(changed)
         / F.greatest(F.count(F.lit(1)) - 1, F.lit(1)).cast("double")
         ).alias("change_rate"))


def recrawl_interval_days(stats: DataFrame,
                          min_days: int = 1,
                          max_days: int = 90) -> DataFrame:
    """Adaptive revisit interval from the observed history: the mean
    inter-change gap (observation span / changes seen), clamped to
    [min_days, max_days]; a page never seen to change gets max_days.
    Integer-exact (whole days via datediff, integer division) so the
    schedule is reproducible across engines."""
    span_days = F.datediff(F.col("last_ts"), F.col("first_ts"))
    est = F.when(F.col("n_changes") > 0,
                 F.floor(span_days / F.col("n_changes")).cast("long")) \
           .otherwise(F.lit(max_days))
    clamped = F.least(F.greatest(est, F.lit(min_days)
                                 .cast("long")),
                      F.lit(max_days).cast("long"))
    return stats.withColumn("interval_days", clamped)
