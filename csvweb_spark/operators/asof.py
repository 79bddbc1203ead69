"""As-of (nearest-prior) join — the time-series join the reference lacks
(SURVEY.md §2.8 joins category; standard in event/market-data pipelines).

Spark-first shape: NOT an inequality theta-join (which Catalyst executes
as a broadcast-nested-loop or a range-exploded sort-merge — quadratic or
memory-bound at corpus scale). Instead the classic union + carry-forward:

  1. tag left rows (probe) and right rows (reference points), union them;
  2. one shuffle on the `by` key, sort by (time, side) within partitions;
  3. running `last(payload, ignorenulls=True)` carries the most recent
     right-side payload forward onto each left row.

One exchange total, map-side free, O(n log n_partition) sort — the same
cost as a window aggregation over the union. Ties (left.time ==
right.time) match the right row (inclusive backward as-of, DuckDB
`ASOF JOIN ... ON l.t >= r.t` semantics). Skewed `by` keys behave like
any window over that key; salt upstream if one key dominates.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, time_col: str,
              by_cols: list[str], payload_cols: list[str],
              right_time_alias: str = "asof_ts",
              tolerance_seconds: Optional[int] = None) -> DataFrame:
    """For every left row, attach `payload_cols` from the most recent right
    row with right.time <= left.time and equal `by_cols` (inclusive).

    Returns left's columns + payload_cols + `right_time_alias` (the matched
    right row's time; NULL when no prior right row exists or the match is
    older than `tolerance_seconds`)."""
    left_cols = left.columns
    l = left.select(*left_cols,
                    *[F.lit(None).cast(right.schema[c].dataType).alias(c)
                      for c in payload_cols],
                    F.lit(None).cast(right.schema[time_col].dataType)
                     .alias("_rt"),
                    F.lit(1).alias("_side"))
    r = right.select(*[F.col(c) for c in by_cols],
                     F.col(time_col),
                     *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                       for c in left_cols
                       if c not in by_cols and c != time_col],
                     *[F.col(c) for c in payload_cols],
                     F.col(time_col).alias("_rt"),
                     F.lit(0).alias("_side"))
    u = l.unionByName(r.select(*l.columns))
    w = (Window.partitionBy(*by_cols)
         .orderBy(F.col(time_col).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        *left_cols, "_side",
        *[F.last(c, ignorenulls=True).over(w).alias(c)
          for c in payload_cols],
        F.last("_rt", ignorenulls=True).over(w).alias(right_time_alias))
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if tolerance_seconds is not None:
        stale = (F.col(time_col).cast("long")
                 - F.col(right_time_alias).cast("long")
                 > F.lit(tolerance_seconds))
        out = out.select(
            *left_cols,
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
              for c in payload_cols],
            F.when(stale, F.lit(None)).otherwise(F.col(right_time_alias))
             .alias(right_time_alias))
    return out
