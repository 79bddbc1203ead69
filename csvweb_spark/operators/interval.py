"""Interval (range/containment) join - the remaining member of the joins
family SURVEY.md §2.8 calls out (hash/broadcast/as-of covered elsewhere;
reference has none - its only join-like logic is metadata discovery,
`Rdf/Converter.cs:141-207`).

Spark-first shape: a naive `ON t BETWEEN start AND end` theta-join is
executed by Catalyst as BroadcastNestedLoopJoin - O(|events| x
|intervals|) and memory-bound at corpus scale. Instead the standard
time-bucketing rewrite turns containment into an EQUI-join:

  1. each interval explodes into the fixed-width time buckets it overlaps
     (fan-out = interval_length / bucket + 1, bounded and chosen by the
     caller to match typical interval length);
  2. each event maps to exactly ONE bucket (so no output dedup is needed);
  3. hash equi-join on (keys..., bucket), then the exact containment
     filter.

The join key (keys, bucket) is as uniform as event time itself; skew
behaves like any keyed join (AQE skew splitting applies), and either side
can be broadcast when small. This is the plan you want at 100 TB: one
shuffle (or zero with a broadcast side), never a nested loop.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(events: DataFrame, intervals: DataFrame,
                  time_col: str = "ts",
                  by_cols: Sequence[str] = ("user_id",),
                  start_col: str = "start_ts", end_col: str = "end_ts",
                  bucket_minutes: int = 60) -> DataFrame:
    """Rows of `events` joined to every row of `intervals` with equal
    `by_cols` and start <= t <= end (inclusive both ends).

    Bucket safety: buckets are floor(epoch_seconds / width); t in
    [start, end] implies bucket(t) in [bucket(start), bucket(end)], so the
    equi-join on the exploded interval buckets loses no matches and the
    exact filter removes bucket-granularity false positives."""
    width = F.lit(bucket_minutes * 60)
    iv = intervals.withColumn("_bucket", F.explode(F.sequence(
        F.floor(F.unix_timestamp(F.col(start_col)) / width).cast("long"),
        F.floor(F.unix_timestamp(F.col(end_col)) / width).cast("long"))))
    ev = events.withColumn(
        "_bucket",
        F.floor(F.unix_timestamp(F.col(time_col)) / width).cast("long"))
    joined = ev.join(iv, [*by_cols, "_bucket"])
    return (joined
            .filter((F.col(time_col) >= F.col(start_col))
                    & (F.col(time_col) <= F.col(end_col)))
            .drop("_bucket"))


def coalesce_intervals(df: DataFrame, key_cols: Sequence[str],
                       start_col: str = "start", end_col: str = "end",
                       max_gap=None) -> DataFrame:
    """Gaps-and-islands interval coalescing: per key, merge every run
    of overlapping-or-adjacent [start, end] intervals into one row
    (key..., start, end, n_merged) - the temporal-KG compaction that
    turns per-crawl assertion validity snapshots into minimal validity
    ranges (revisits re-assert a fact crawl after crawl; storage wants
    ONE row saying 'true from t1 to t9').

    `max_gap` additionally bridges gaps up to that size (same type as
    the columns' difference: an INTERVAL for timestamps, a number for
    numerics; None/0 merges only touching-or-overlapping rows).
    Half-open vs closed reading is the caller's convention - adjacency
    here means next.start <= running_max(end) (+ gap).

    Scale shape: ONE shuffle on the key columns feeding two Window
    passes over the same sorted partition (running max(end) via rows
    unbounded-preceding..1-preceding, then a running sum of
    island-break flags) and a final partial-aggregated groupBy on
    (key, island) - no self-join, no explode. Keys are fact-grained
    (triple ids, urls), so partitions stay small; a single key's
    history never needs to fit anywhere special beyond its sorted
    partition."""
    from pyspark.sql.window import Window

    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(start_col),
                                          F.col(end_col))
    prev_max_end = F.max(F.col(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    threshold = (prev_max_end + max_gap) if max_gap is not None \
        else prev_max_end
    is_break = F.when(prev_max_end.isNull()
                      | (F.col(start_col) > threshold), 1).otherwise(0)
    island = F.sum(is_break).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return (df.withColumn("_island", island)
            .groupBy(*key_cols, "_island")
            .agg(F.min(start_col).alias(start_col),
                 F.max(end_col).alias(end_col),
                 F.count(F.lit(1)).alias("n_merged"))
            .drop("_island"))


def validity_intervals(df: DataFrame, key_cols: Sequence[str],
                       ts_col: str = "warc_ts",
                       val_cols: Sequence[str] = ("obj",)) -> DataFrame:
    """Build the SCD2-style temporal table from a versioned assertion
    log: per key, collapse CONSECUTIVE re-assertions of the same value
    and emit one row per value run - (key..., val..., valid_from,
    valid_to, n_assertions), `valid_to` = the next run's start (NULL
    for the currently-valid run, the half-open [from, to) convention).
    The inverse of `snapshot_asof`: asof answers 'what held at t',
    this materializes 'when did each value hold' - the shape a
    temporal SPARQL layer or a fact-history export wants, and the
    input `coalesce_intervals` compacts further when sources disagree.

    Re-assertions at the SAME timestamp deduplicate first (a crawl
    epoch asserting a fact from 10^6 pages is one version); ordering
    within a key is then strictly by ts, with ties impossible
    post-dedup unless two DIFFERENT values share a timestamp - that
    conflict is resolved deterministically by value order (greatest
    last, matching snapshot_asof's ts-tie break where the greatest
    value tuple wins the snapshot).

    Scale shape: ONE shuffle on the key columns; run detection (lag
    compare), run numbering (running sum) and valid_to (lead over run
    starts) are window passes sharing that sorted partition; the
    per-run fold is a partial-aggregated groupBy. Keys are
    fact-grained so partitions stay bounded."""
    from pyspark.sql.window import Window

    keys = [F.col(k) for k in key_cols]
    vals = [F.col(v) for v in val_cols]
    base = (df.select(*key_cols, ts_col, *val_cols)
            .dropDuplicates([*key_cols, ts_col, *val_cols]))
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), *vals)
    same = F.lit(True)
    for v in val_cols:
        prev = F.lag(F.col(v)).over(w)
        same = same & F.coalesce(F.col(v) == prev, F.lit(False))
    run = F.sum(F.when(same, 0).otherwise(1)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)).alias("_run")
    runs = base.withColumn("_run", run)
    folded = (runs.groupBy(*key_cols, "_run")
              .agg(*[F.first(v).alias(c) for c, v in
                     zip(val_cols, vals)],
                   F.min(ts_col).alias("valid_from"),
                   F.count(F.lit(1)).cast("long")
                   .alias("n_assertions")))
    w2 = Window.partitionBy(*keys).orderBy(F.col("_run"))
    return (folded
            .withColumn("valid_to", F.lead("valid_from").over(w2))
            .select(*key_cols, *val_cols, "valid_from", "valid_to",
                    "n_assertions"))
