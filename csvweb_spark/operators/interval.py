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
