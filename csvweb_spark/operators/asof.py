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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, time_col: str,
              by_cols: list[str], payload_cols: list[str],
              right_time_alias: str = "asof_ts",
              tolerance_seconds: Optional[int] = None) -> DataFrame:
    """For every left row, attach `payload_cols` from the most recent right
    row with right.time <= left.time and equal `by_cols` (inclusive).

    Returns left's columns + payload_cols + `right_time_alias` (the matched
    right row's time; NULL when no prior right row exists or the match is
    older than `tolerance_seconds`).

    The right row's payload and time travel as ONE struct through the
    carry-forward, so a NULL payload value in the matched right row stays
    NULL (review fix: per-column last(ignorenulls) could stitch payload
    and timestamp from DIFFERENT right rows when payloads contain
    NULLs - DuckDB ASOF JOIN matches a row, not per-column values).

    Ties among RIGHT rows sharing (by_cols, time): the window order ends
    on the carried struct itself, so the match is deterministically the
    greatest (time, *payload) struct - run-to-run and plan-to-plan stable
    (review fix: the order previously ended at (time, _side), leaving the
    picked row to partitioning luck). Payload columns must therefore be
    orderable types (atomics/arrays/structs); pre-aggregate the right side
    to unique (by, time) rows if a payload is a map."""
    left_cols = left.columns
    payload_struct = F.struct(
        F.col(time_col).alias("_rt"),
        *[F.col(c) for c in payload_cols])
    null_struct = F.lit(None).cast(
        right.select(payload_struct).schema[0].dataType)
    l = left.select(*left_cols,
                    null_struct.alias("_pl"),
                    F.lit(1).alias("_side"))
    r = right.select(*[F.col(c) for c in by_cols],
                     F.col(time_col),
                     *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                       for c in left_cols
                       if c not in by_cols and c != time_col],
                     payload_struct.alias("_pl"),
                     F.lit(0).alias("_side"))
    u = l.unionByName(r.select(*l.columns))
    w = (Window.partitionBy(*by_cols)
         .orderBy(F.col(time_col).asc(), F.col("_side").asc(),
                  F.col("_pl").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (u.withColumn("_m", F.last("_pl", ignorenulls=True).over(w))
               .filter(F.col("_side") == 1))
    if tolerance_seconds is not None:
        # microsecond-exact staleness: cast('long') floors to seconds,
        # letting matches up to ~1s past the tolerance through (review fix)
        stale = (F.unix_micros(F.col(time_col))
                 - F.unix_micros(F.col("_m._rt"))
                 > F.lit(int(tolerance_seconds) * 1_000_000))
        carried = carried.withColumn(
            "_m", F.when(stale, null_struct).otherwise(F.col("_m")))
    return carried.select(
        *left_cols,
        *[F.col(f"_m.{c}").alias(c) for c in payload_cols],
        F.col("_m._rt").alias(right_time_alias))


def snapshot_asof(df: DataFrame, at, ts_col: str = "warc_ts",
                  key_cols: tuple = ("subj", "pred"),
                  val_cols: tuple = ("obj",)) -> DataFrame:
    """Point-in-time snapshot of a versioned assertion table: for every
    key, the `val_cols` of the LATEST row with ts <= `at`. This is the
    temporal-KG read - a crawl re-asserts (subj, pred) with changing
    objects over time (the input table's warc_ts is exactly this
    version axis), and a consumer wants the graph as of a date, not
    the union of all versions.

    Spark-first shape: a struct-max aggregate, NOT a row_number window.
    max(struct(ts, vals...)) partial-aggregates map-side (each map task
    forwards ONE candidate row per key it sees), so a key re-asserted
    on 10^6 pages shuffles 10^6-fold less than a window sort; the
    window plan would sort whole partitions on the reducer. Ties on
    the timestamp break by the greatest value tuple (struct comparison
    is lexicographic) - deterministic, and a SQL row_number oracle
    (ORDER BY ts DESC, vals DESC) replays it exactly.

    `at` is anything Spark casts to timestamp (ISO string / datetime /
    Column)."""
    at_ts = at if isinstance(at, Column) else F.lit(at).cast("timestamp")
    fields = [F.col(ts_col).alias("_ts")] + \
        [F.col(c).alias(f"_v{i}") for i, c in enumerate(val_cols)]
    m = (df.filter(F.col(ts_col) <= at_ts)
         .groupBy(*key_cols)
         .agg(F.max(F.struct(*fields)).alias("_m")))
    return m.select(*key_cols,
                    *[F.col(f"_m._v{i}").alias(c)
                      for i, c in enumerate(val_cols)],
                    F.col("_m._ts").alias(ts_col))


def snapshot_bitemporal(df: DataFrame, valid_at, known_at,
                        ts_col: str = "warc_ts", tx_col: str = "tx_ts",
                        key_cols: tuple = ("subj", "pred"),
                        val_cols: tuple = ("obj",)) -> DataFrame:
    """BITEMPORAL point read: the state as of VALID time `valid_at`,
    as it was KNOWN at transaction time `known_at` - the audit/
    reproducibility query snapshot_asof cannot answer once facts
    arrive late (a crawl recorded on tx day T+2 about content valid at
    T must not appear in a report generated on T+1, but must appear
    when the same report is re-generated later). `ts_col` is the valid
    axis, `tx_col` the ingest/assertion axis.

    Per key: among rows with tx <= known_at and ts <= valid_at, the
    greatest (ts, tx, vals) - latest valid version wins; same valid
    timestamp re-stated later (a correction) is superseded by its
    latest transaction. Same struct-max shape as snapshot_asof (ONE
    map-side-combinable aggregate, one candidate row per key per map
    task - never a window sort); deterministic, and a SQL row_number
    oracle (ORDER BY ts DESC, tx DESC, vals DESC) replays it
    exactly."""
    valid_ts = (valid_at if isinstance(valid_at, Column)
                else F.lit(valid_at).cast("timestamp"))
    known_ts = (known_at if isinstance(known_at, Column)
                else F.lit(known_at).cast("timestamp"))
    fields = [F.col(ts_col).alias("_ts"), F.col(tx_col).alias("_tx")] + \
        [F.col(c).alias(f"_v{i}") for i, c in enumerate(val_cols)]
    m = (df.filter((F.col(tx_col) <= known_ts)
                   & (F.col(ts_col) <= valid_ts))
         .groupBy(*key_cols)
         .agg(F.max(F.struct(*fields)).alias("_m")))
    return m.select(*key_cols,
                    *[F.col(f"_m._v{i}").alias(c)
                      for i, c in enumerate(val_cols)],
                    F.col("_m._ts").alias(ts_col),
                    F.col("_m._tx").alias(tx_col))


def kg_diff(old: DataFrame, new: DataFrame,
            key_cols: tuple = ("subj", "pred", "obj", "obj_kind",
                               "obj_datatype", "obj_lang")) -> DataFrame:
    """Triple-level diff of two KG snapshots under RDF SET semantics:
    one row per triple in the symmetric difference, tagged
    `change` = 'added' (in `new` only) | 'removed' (in `old` only).
    The publish-layer companion to `snapshot_asof`: a recurring crawl
    re-materializes the graph per epoch, and downstream consumers
    (incremental entailment, SHACL revalidation, delta exports) want
    the DELTA, not a full re-read - `rdfs_closure_incremental` /
    `validate_shapes_incremental` take exactly the 'added' slice.

    Scale shape: two hash LEFT ANTI joins on the full triple key -
    the minimal movement for an exact diff (each side shuffles once on
    the key). Over stores written with `plans.bucketed.write_bucketed`
    (subj-bucketed) both anti-joins compile with ZERO Exchange once
    `spark.sql.requireAllClusterKeysForCoPartition=false` lets the
    planner accept bucket keys as a prefix of the join keys - plan-
    pinned, with the default conf as the re-shuffling negative
    control, in test_plans.py::
    test_kg_diff_zero_exchange_over_bucketed_stores.
    `dropDuplicates` on each side first makes the diff
    honest under provenance-duplicated assertions (a triple asserted
    by 10^6 pages is ONE graph fact; without the dedup a count change
    would silently vanish from the diff).
    """
    cols = list(key_cols)
    o = old.select(*cols).dropDuplicates(cols)
    n = new.select(*cols).dropDuplicates(cols)
    added = n.join(o, cols, "left_anti").withColumn("change",
                                                    F.lit("added"))
    removed = o.join(n, cols, "left_anti").withColumn("change",
                                                      F.lit("removed"))
    return added.unionByName(removed)


def kg_diff_stats(diff: DataFrame,
                  group_col: str = "pred") -> DataFrame:
    """Per-predicate roll-up of a `kg_diff` output: (pred, n_added,
    n_removed) - the change summary a dataset description (VoID) or a
    crawl-health dashboard tracks per epoch. One map-side-combinable
    aggregation over the (already slim) diff rows."""
    return (diff.groupBy(group_col)
            .agg(F.sum(F.when(F.col("change") == "added", 1)
                       .otherwise(0)).cast("long").alias("n_added"),
                 F.sum(F.when(F.col("change") == "removed", 1)
                       .otherwise(0)).cast("long").alias("n_removed")))
