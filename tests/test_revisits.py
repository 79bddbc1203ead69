"""Crawl revisit analysis (operators/revisits.py)."""

import datetime

from pyspark.sql import functions as F

from csvweb_spark.operators.revisits import (fetch_deltas,
                                             recrawl_interval_days,
                                             revisit_stats)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, datetime.datetime(2026, 1, d), t) for u, d, t in rows],
        "url string, warc_ts timestamp, text string")


def test_fetch_deltas_statuses(spark):
    pages = _pages(spark, [
        ("http://a/", 1, "x"), ("http://a/", 5, "x"),
        ("http://a/", 9, "y"),
        ("http://b/", 2, "z"),
    ])
    rows = {(r.url, r.warc_ts.day): (r.status, r.payload_stored)
            for r in fetch_deltas(pages).collect()}
    assert rows[("http://a/", 1)] == ("new", True)
    assert rows[("http://a/", 5)] == ("unchanged", False)  # revisit
    assert rows[("http://a/", 9)] == ("changed", True)
    assert rows[("http://b/", 2)] == ("new", True)


def test_fetch_deltas_null_text_is_a_value(spark):
    # a fetch that produced no text twice in a row is an unchanged
    # revisit, not a crash or a spurious change
    pages = _pages(spark, [("http://a/", 1, None), ("http://a/", 2, None),
                           ("http://a/", 3, "now")])
    statuses = [r.status for r in
                fetch_deltas(pages).orderBy("warc_ts").collect()]
    assert statuses == ["new", "unchanged", "changed"]


def test_revisit_stats_and_interval_clamps(spark):
    pages = _pages(spark, [
        # churns every fetch over 2 days -> est floor(2/2)=1 (min clamp
        # boundary); static page -> max_days; one change over 8 days
        ("http://hot/", 1, "a"), ("http://hot/", 2, "b"),
        ("http://hot/", 3, "c"),
        ("http://cold/", 1, "s"), ("http://cold/", 9, "s"),
        ("http://warm/", 1, "p"), ("http://warm/", 9, "q"),
    ])
    out = {r.url: r for r in recrawl_interval_days(
        revisit_stats(pages), min_days=2, max_days=5).collect()}
    hot = out["http://hot/"]
    assert (hot.n_fetches, hot.n_changes, hot.change_rate) == (3, 2, 1.0)
    assert hot.interval_days == 2            # floor(2/2)=1 -> min clamp
    cold = out["http://cold/"]
    assert (cold.n_changes, cold.change_rate) == (0, 0.0)
    assert cold.interval_days == 5           # never changed -> max
    assert cold.last_change_ts.day == 1      # only the first capture
    warm = out["http://warm/"]
    assert warm.interval_days == 5           # floor(8/1)=8 -> max clamp
    assert warm.last_change_ts.day == 9


def test_window_shuffle_never_carries_text(spark):
    # the digest is projected before the per-url window, so the
    # Exchange lines up (url, ts, digest) rows - page text must be
    # pruned ahead of the shuffle at 100 TB
    pages = _pages(spark, [("http://a/", 1, "x" * 100)])
    plan = fetch_deltas(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    # tree order: Window consumes the Exchange whose CHILD is the
    # sha2 projection -> digest computed before the shuffle
    assert plan.index("Window") < plan.index("Exchange") < \
        plan.index("sha2"), plan
    # and the window itself lags the digest, never the text column
    window_line = next(ln for ln in plan.splitlines() if "lag(" in ln)
    assert "text" not in window_line, window_line
