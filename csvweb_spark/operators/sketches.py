"""K-minimum-values (KMV) distinct-count sketches.

The cardinality primitive a 100 TB curation pipeline needs everywhere
(distinct tokens per language, distinct hosts per shard, vocabulary
growth curves) without a full distinct: keep the k smallest 60-bit
hashes of the values per group; the k-th smallest estimates the
cardinality as (k-1) * HASH_SPACE / kth (Bar-Yossef et al. 2002, the
KMV/bottom-k estimator HyperLogLog descends from).

Why KMV and not HLL here: the sketch is a plain sorted array<long>, so
it is (a) DETERMINISTIC - same input set, same sketch, regardless of
partitioning or merge order, (b) exactly mergeable (union, re-take k
smallest), and (c) replayable by a DuckDB window query, which makes it
the one cardinality sketch this repo can put behind its value-hash
oracle gate (`approx_count_distinct`'s HLL++ has neither property).
Round 5 adds an own-rolled HyperLogLog alongside (hll_sketch below):
its REGISTERS have both properties too (max is order-invariant and
SQL-replayable; only the float harmonic-mean finish sits outside the
gate), giving the fixed-size form for groups where even k hashes per
group is too much state.

Estimates are integer-exact on both engines: hashes are the md5-prefix
60-bit family shared with simhash/duplicate_spans, the estimator is
(k-1)*2^60 div kth in decimal(38,0)/HUGEINT arithmetic, and groups with
fewer than k distinct hashes report their EXACT count.

Scale shape: one distinct on (group, hash) - map-side-combinable, the
only full shuffle - then a row_number top-k window that Catalyst's
InferWindowGroupLimit prunes map-side (partial WindowGroupLimit below
the exchange), so no group ever concentrates more than k rows past the
exchange. Sketch width is k longs (~512 B at k=64): millions of groups
fit in a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from csvweb_spark.operators.dedup import md5_hash60

HASH_SPACE = 1 << 60


def _topk_hashes(df: DataFrame, value_col: str, group_cols: list[str],
                 k: int) -> DataFrame:
    """(group..., h) - the k smallest distinct 60-bit value hashes per
    group (all of them when a group has < k)."""
    hashed = (df.select(*group_cols,
                        md5_hash60(F.col(value_col)).alias("h"))
              .distinct())
    win = Window.partitionBy(*group_cols).orderBy("h")
    return (hashed.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") <= k).drop("_rn"))


def kmv_sketch(df: DataFrame, value_col: str, group_cols: list[str],
               k: int = 64) -> DataFrame:
    """(group..., sketch: sorted array<long>) - the mergeable sketch."""
    return (_topk_hashes(df, value_col, group_cols, k)
            .groupBy(*group_cols)
            .agg(F.array_sort(F.collect_list("h")).alias("sketch")))


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: list[str],
              k: int = 64) -> DataFrame:
    """Union two sketch tables: per group, union the hash sets and
    re-take the k smallest - exactly the sketch of the combined input
    (the property that lets shards/micro-batches sketch independently)."""
    merged = (a.unionByName(b)
              .select(*group_cols, F.explode("sketch").alias("h"))
              .distinct())
    win = Window.partitionBy(*group_cols).orderBy("h")
    return (merged.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") <= k).drop("_rn")
            .groupBy(*group_cols)
            .agg(F.array_sort(F.collect_list("h")).alias("sketch")))


def kmv_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Add (n_kept, kth_min, distinct_est) to a sketch table. Exact when
    the group kept fewer than k hashes; otherwise the bottom-k estimator
    in exact integer arithmetic (decimal(38,0) div)."""
    n = F.size("sketch").cast("long")
    kth = F.element_at("sketch", k).cast("long")
    est = F.expr(
        f"CAST((CAST({k - 1} AS DECIMAL(38,0)) "
        f"* CAST({HASH_SPACE} AS DECIMAL(38,0))) "
        f"DIV CAST(greatest(element_at(sketch, {k}), 1L) AS DECIMAL(38,0)) "
        f"AS BIGINT)")
    return sketches.select(
        *[c for c in sketches.columns if c != "sketch"],
        n.alias("n_kept"),
        F.when(n >= k, kth).alias("kth_min"),
        F.when(n < k, n).otherwise(est).alias("distinct_est"))


def kmv_distinct(df: DataFrame, value_col: str, group_cols: list[str],
                 k: int = 64) -> DataFrame:
    """One-call per-group distinct estimate:
    (group..., n_kept, kth_min, distinct_est)."""
    return kmv_estimate(kmv_sketch(df, value_col, group_cols, k), k)


def exact_quantiles(df: DataFrame, value_col: str,
                    group_cols: list[str],
                    quantile_bps: tuple = (5000, 9000, 9900),
                    pre_aggregate: bool = True) -> DataFrame:
    """Exact per-group order statistics for integer-valued metrics:
    one row per group with the count and, per requested quantile q (in
    basis points), the value at sorted position ceil(q/10^4 * n) - the
    discrete (type-1) quantile, which is a VALUE FROM THE DATA, so the
    result is integer-exact and engine-independent (no interpolation,
    no float drift - `percentile_cont`-style interpolation would break
    the oracle gate). Output columns: group_cols, n_rows, q<bps> per
    quantile (e.g. q5000 = the median).

    The profile-table counterpart of `kmv_distinct`: doc-length / token
    -count / score distributions per language or host feed curation
    thresholds, and thresholds derived from EXACT quantiles are
    reproducible across cluster sizes by construction.

    Scale shape: by default (`pre_aggregate=True`) the input is first
    reduced to (group, value) -> frequency - map-side-combinable - so
    the per-group sort window ranks DISTINCT values, bounded by value
    cardinality, not row count: a billion-row stratum whose metric has
    10^5 distinct values windows 10^5 rows, not 10^9. The two plans
    are output-identical (the type-1 quantile is the smallest value
    whose cumulative frequency reaches the position); pass
    `pre_aggregate=False` only for the raw row_number plan, which
    skips the reduction but sorts every row of a mega-stratum on one
    reducer - the same caveat as `stratified_sample_topk`."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    for q in quantile_bps:
        if not 0 < q <= 10000:
            raise ValueError(f"quantile {q} not in (0, 10000]")
    if pre_aggregate:
        return exact_quantiles_preagg(df, value_col, group_cols,
                                      quantile_bps)
    v = F.col(value_col).cast("long")
    w = Window.partitionBy(*group_cols).orderBy("_v")
    cw = Window.partitionBy(*group_cols)
    staged = (df.select(*group_cols, v.alias("_v"))
              .withColumn("_rn", F.row_number().over(w))
              .withColumn("_n", F.count(F.lit(1)).over(cw)))
    aggs = [F.max("_n").alias("n_rows")]
    for q in quantile_bps:
        # ceil(q/10^4 * n) in pure integer arithmetic
        pos = F.expr(f"CAST((_n * {q} + 9999) div 10000 AS BIGINT)")
        aggs.append(F.max(F.when(F.col("_rn") == pos, F.col("_v")))
                    .alias(f"q{q}"))
    return staged.groupBy(*group_cols).agg(*aggs)


def exact_quantiles_preagg(df: DataFrame, value_col: str,
                           group_cols: list[str],
                           quantile_bps: tuple = (5000, 9000, 9900)
                           ) -> DataFrame:
    """`exact_quantiles` through a (group, value) -> frequency
    reduction first: the window then ranks DISTINCT values with their
    cumulative counts, so a billion-row stratum whose metric has (say)
    10^5 distinct values windows 10^5 rows, not 10^9. Identical output
    (the type-1 quantile is the smallest value whose cumulative
    frequency reaches the position)."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    v = F.col(value_col).cast("long")
    freq = (df.select(*group_cols, v.alias("_v"))
            .groupBy(*group_cols, "_v")
            .agg(F.count(F.lit(1)).alias("_f")))
    w = Window.partitionBy(*group_cols).orderBy("_v")
    cw = Window.partitionBy(*group_cols)
    staged = (freq
              .withColumn("_cum", F.sum("_f").over(
                  w.rowsBetween(Window.unboundedPreceding, 0)))
              .withColumn("_n", F.sum("_f").over(cw)))
    aggs = [F.max("_n").alias("n_rows")]
    for q in quantile_bps:
        pos = F.expr(f"CAST((_n * {q} + 9999) div 10000 AS BIGINT)")
        # smallest value whose cumulative frequency covers the position
        aggs.append(F.min(F.when(
            (F.col("_cum") >= pos) & (F.col("_cum") - F.col("_f") < pos),
            F.col("_v"))).alias(f"q{q}"))
    return staged.groupBy(*group_cols).agg(*aggs)


def table_fingerprint(df: DataFrame, cols: list | None = None,
                      n_buckets: int = 64) -> DataFrame:
    """Order-invariant, MERGEABLE content checksum of a table:
    (bucket, n_rows, hash_sum) over `n_buckets` hash buckets, where
    hash_sum = sum of the 60-bit md5 row hashes (decimal(38,0) -
    integer sums are partition-order-independent, so two tables are
    content-equal as MULTISETS iff their fingerprints match row for
    row). The verification tool the resumable-sink story needs at
    100 TB: after a crash/resume or a replicated re-run, comparing
    64 fingerprint rows replaces comparing 10^12 data rows; per-bucket
    granularity localizes a mismatch to 1/n_buckets of the hash space.

    Row hash: md5_hash60 over the selected columns cast to string,
    joined by the \\x1f unit separator with NULL encoded as \\x01 (so
    ('a', NULL) != (NULL, 'a') and NULL != '') - the shared
    cross-engine hash family, SQL-replayable.

    Scale shape: one narrow projection + one map-side-combinable
    groupBy on `n_buckets` uniform keys - effectively shuffle-free
    (n_buckets rows move per map task). Duplicate-sensitive by design
    (sum counts multiplicity); fold buckets for a 1-row table
    checksum - mergeability is literal column addition."""
    from .dedup import md5_hash60

    use = list(cols) if cols else list(df.columns)
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x01"))
             for c in use]
    h = md5_hash60(F.concat_ws("\x1f", *parts))
    return (df.select(F.pmod(h, F.lit(int(n_buckets))).cast("long")
                      .alias("bucket"), h.alias("_h"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.sum(F.col("_h").cast("decimal(38,0)"))
                 .alias("hash_sum")))


# ---------------------------------------------------------------------------
# Bloom filter (deterministic, mergeable, SQL-replayable)
# ---------------------------------------------------------------------------

def bloom_build(df: DataFrame, value_col: str,
                m_bits: int = 1 << 20, k: int = 4) -> DataFrame:
    """Mergeable Bloom-filter bitmap over a key column: (word_ix, word)
    rows, word = OR of bit (pos mod 63) for every set position in that
    word.  Words carry 63 bits, not 64: bit 63 would need 1<<63, which
    overflows DuckDB's checked shift and flips the sign bit in Spark -
    63-bit words keep every mask positive in BOTH engines, for the cost
    of ~1.6% more rows.  At most ceil(m_bits/63) rows - a 1M-bit filter
    is ~16.6k rows (~130 KB), broadcastable no matter how many keys
    went in.

    This is the runtime-filter pattern for 100 TB joins: build the
    filter over the SMALL side's keys, broadcast it, and pre-filter the
    big side before the shuffle - `bloom_probe` has NO false negatives,
    so dropping probe-misses before a semi-join (or before the exact
    recheck of an anti-join) is sound; false positives only cost a
    recheck row.  Spark's own BloomFilterAggregate does this opaquely
    in the JVM; this one is deterministic (shared md5 base hash) and
    bit-for-bit replayable by the SQL oracle.

    Positions: h_i(x) = md5_hash60(i || ':' || x) mod m_bits for
    i in 0..k-1 - k independent draws from the shared cross-engine
    hash family (DuckDB: ('0x'||substr(md5(i||':'||x),1,15))::bigint).

    Scale shape: one narrow projection (k positions per key via an
    inline array + explode), then ONE map-side-combinable groupBy on
    <= m_bits/64 uniform word keys: each map task forwards at most
    m_bits/64 partially-OR'd words regardless of input size.  Merging
    two filters (same m_bits, k) = union + groupBy bit_or - the
    sketch-of-union property holds exactly (OR is idempotent,
    commutative, associative)."""
    from .dedup import md5_hash60

    if m_bits < 63:
        raise ValueError("m_bits must be >= 63")
    if k < 1:
        raise ValueError("k must be >= 1")
    v = F.col(value_col).cast("string")
    pos = F.array(*[
        F.pmod(md5_hash60(F.concat(F.lit(f"{i}:"), v)), F.lit(m_bits))
        for i in range(k)])
    return (df.select(F.explode(pos).alias("_p"))
            .select(F.expr("_p div 63").cast("long").alias("word_ix"),
                    F.expr("shiftleft(1L, CAST(_p % 63 AS INT))")
                    .alias("_w"))
            .groupBy("word_ix")
            .agg(F.bit_or("_w").alias("word")))


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two bitmaps built with the SAME (m_bits, k): OR per word.
    merge(build(X), build(Y)) == build(X union Y), exactly."""
    return (a.unionByName(b).groupBy("word_ix")
            .agg(F.bit_or("word").alias("word")))


def bloom_probe(df: DataFrame, bloom: DataFrame, value_col: str,
                m_bits: int = 1 << 20, k: int = 4) -> DataFrame:
    """Membership test: input rows + a `might_contain` boolean.  False
    => definitely absent (the soundness the anti-join prefilter rides);
    true => present or a false positive (~(1-e^{-kn/m})^k rate).

    Plan: k chained left equi-joins of the input against the bitmap
    (one per hash, each on a different derived word index) - the probe
    stays ONE ROW PER INPUT ROW throughout (duplicates keep their
    multiplicity; no explode + wide re-group shuffling every column),
    and each join's build side is the <= m_bits/64-row bitmap, which
    AQE broadcasts from its visible size (no explicit hint - the
    round-4 rule: sizes Catalyst can see decide).  A missing word row
    means the bit was never set (coalesce -> False)."""
    from functools import reduce

    from .dedup import md5_hash60

    if m_bits < 63:
        raise ValueError("m_bits must be >= 63")
    if k < 1:
        raise ValueError("k must be >= 1")
    for c in df.columns:
        if c.startswith("_wx") or c.startswith("_w") or c == "word_ix":
            raise ValueError(f"column {c!r} collides with probe internals")
    v = F.col(value_col).cast("string")
    out = df
    tests = []
    for i in range(k):
        p = F.pmod(md5_hash60(F.concat(F.lit(f"{i}:"), v)), F.lit(m_bits))
        out = (out.withColumn(f"_p{i}", p)
               .withColumn(f"_wx{i}",
                           F.expr(f"_p{i} div 63").cast("long"))
               .withColumn(f"_m{i}", F.expr(
                   f"shiftleft(1L, CAST(_p{i} % 63 AS INT))")))
        side = bloom.select(F.col("word_ix").alias(f"_wx{i}"),
                            F.col("word").alias(f"_w{i}"))
        out = out.join(side, f"_wx{i}", "left")
        tests.append(F.coalesce(
            F.expr(f"(_w{i} & _m{i}) = _m{i}"), F.lit(False)))
    might = reduce(lambda a, b: a & b, tests)
    return out.select(*df.columns, might.alias("might_contain"))


# --------------------------------------------------------------------------
# Count-Min sketch (frequency estimation / heavy hitters)
# --------------------------------------------------------------------------

def cm_build(df: DataFrame, value_col: str, d: int = 4, w: int = 1024,
             weight_col: str | None = None) -> DataFrame:
    """Count-Min sketch over a key column: (row_ix, col_ix, cnt)
    counters, row_ix in 0..d-1, col_ix = md5_hash60(row_ix || ':' || x)
    mod w - the frequency member of the mergeable-sketch family (KMV =
    distinct, Bloom = membership, CM = counts). At most d*w rows
    (4x1024 = ~4k rows, ~100 KB) no matter how many keys went in, so
    the summary of a 10^12-row column broadcasts.

    Scale shape: one narrow projection (d (row, col) pairs per key via
    an inline array + explode) then ONE map-side-combinable groupBy on
    <= d*w uniform counter keys - each map task forwards at most d*w
    partially-summed counters regardless of input size. Deterministic
    (shared md5 base hash), all-integer, replayed bit-for-bit by the
    SQL oracle.

    `weight_col` counts each input row that many times (e.g. token
    frequencies already partially aggregated upstream); default 1.

    Guarantees (tested): estimates NEVER undercount; overcounts are
    collision mass bounded by 2*N/w per row with prob 1-(1/2)^d under
    the standard CM analysis; cm_merge(build(X), build(Y)) ==
    build(X ++ Y) exactly (counter addition is commutative/associative).
    """
    from .dedup import md5_hash60

    if d < 1 or w < 1:
        raise ValueError("d and w must be >= 1")
    v = F.col(value_col).cast("string")
    n = (F.col(weight_col).cast("long") if weight_col is not None
         else F.lit(1).cast("long"))
    pairs = F.array(*[
        F.struct(F.lit(i).cast("int").alias("row_ix"),
                 F.pmod(md5_hash60(F.concat(F.lit(f"{i}:"), v)),
                        F.lit(w)).cast("int").alias("col_ix"))
        for i in range(d)])
    # NULL values are no observation (COUNT semantics) - unfiltered
    # they would produce col_ix=NULL counter rows that no probe can
    # ever match (review fix)
    return (df.filter(F.col(value_col).isNotNull())
            .select(F.explode(pairs).alias("_p"), n.alias("_n"))
            .groupBy(F.col("_p.row_ix").alias("row_ix"),
                     F.col("_p.col_ix").alias("col_ix"))
            .agg(F.sum("_n").alias("cnt")))


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two sketches built with the SAME (d, w): add per counter.
    merge(build(X), build(Y)) == build(X ++ Y) (bag union), exactly."""
    return (a.unionByName(b).groupBy("row_ix", "col_ix")
            .agg(F.sum("cnt").alias("cnt")))


def cm_estimate(df: DataFrame, sketch: DataFrame, value_col: str,
                d: int = 4, w: int = 1024,
                out_col: str = "est_cnt") -> DataFrame:
    """Point-frequency estimates: input rows + est_cnt = min over the d
    counters the value hashes to (0 if a counter row is absent - the
    counter was never touched). est_cnt >= true count, always.

    Plan: d chained left equi-joins against the <= d*w-row counter
    table (AQE broadcasts from visible size, no hint - one derived
    (row, col) key per hash), keeping ONE ROW PER INPUT ROW throughout:
    duplicates keep their multiplicity and no explode + wide re-group
    shuffles every payload column."""
    from .dedup import md5_hash60

    if d < 1 or w < 1:
        raise ValueError("d and w must be >= 1")
    for c in df.columns:
        if c.startswith("_cm") or c == out_col:
            raise ValueError(f"column {c!r} collides with probe internals")
    v = F.col(value_col).cast("string")
    out = df
    ests = []
    for i in range(d):
        col_i = F.pmod(md5_hash60(F.concat(F.lit(f"{i}:"), v)), F.lit(w)) \
                 .cast("int")
        out = out.withColumn(f"_cmc{i}", col_i)
        side = sketch.filter(F.col("row_ix") == i).select(
            F.col("col_ix").alias(f"_cmc{i}"), F.col("cnt").alias(f"_cme{i}"))
        out = out.join(side, f"_cmc{i}", "left")
        ests.append(F.coalesce(F.col(f"_cme{i}"), F.lit(0).cast("long")))
    est = F.least(*ests) if d > 1 else ests[0]
    # a NULL probe value was never counted (cm_build ignores NULLs):
    # report NULL, not a fake 0 that would read as 'definitely absent'
    est = (F.when(F.col(value_col).isNull(), F.lit(None).cast("long"))
           .otherwise(est))
    return out.select(*df.columns, est.alias(out_col))


# --------------------------------------------------------------------------
# HyperLogLog (fixed-size cardinality registers)
# --------------------------------------------------------------------------

def hll_sketch(df: DataFrame, value_col: str, group_cols: list[str],
               p: int = 8) -> DataFrame:
    """HyperLogLog registers per group (Flajolet et al. 2007):
    (group..., reg_ix, rho) rows, reg_ix = low p bits of the shared
    60-bit md5 hash, rho = leading-zero count of the remaining
    (60-p)-bit word + 1 (exact integer bit-length arithmetic, the
    degree_histogram idiom - FP log drifts at powers of two). Absent
    register rows mean register value 0.

    Where KMV (above) trades size for exactness, HLL is the
    FIXED-SIZE form: <= 2^p register rows per group however large the
    group, and - unlike Spark's built-in approx_count_distinct HLL++,
    which is neither deterministic nor SQL-replayable - these
    registers ARE both: max() is partitioning/merge-order-invariant
    and duplicate-insensitive (so the build needs NO distinct
    pre-shuffle at all - the map-side max absorbs duplicates, one
    full shuffle of <= 2^p rows per group), and the register table +
    the exact-integer inverse-power sum sit behind the value-hash
    oracle gate; only the final harmonic-mean ESTIMATE is float, and
    it rides outside the gate (the BM25 ln-score precedent).
    hll_merge(sketch(X), sketch(Y)) == sketch(X union Y), exactly."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    for c in group_cols:
        if c in ("_h", "reg_ix", "rho"):
            raise ValueError(
                f"group column {c!r} collides with sketch internals")
    m = 1 << p
    w_bits = 60 - p
    # cast like cm_build so integer key columns work directly; NULL
    # values are no observation (review fix: a NULL would otherwise
    # produce a reg_ix=NULL row that corrupts the estimate columns)
    h = md5_hash60(F.col(value_col).cast("string"))
    hashed = (df.filter(F.col(value_col).isNotNull())
              .select(*group_cols, h.alias("_h")))
    rest = F.expr(f"_h div {m}")
    bitlen = F.length(F.conv(rest.cast("string"), 10, 2))
    rho = (F.when(rest == 0, F.lit(w_bits + 1))
           .otherwise(F.lit(w_bits + 1) - bitlen)).cast("int")
    return (hashed.select(*group_cols,
                          F.pmod(F.col("_h"), F.lit(m)).cast("int")
                          .alias("reg_ix"),
                          rho.alias("rho"))
            .groupBy(*group_cols, "reg_ix")
            .agg(F.max("rho").alias("rho")))


def hll_merge(a: DataFrame, b: DataFrame,
              group_cols: list[str]) -> DataFrame:
    """Fold two register tables built with the SAME p: max per
    register. merge(sketch(X), sketch(Y)) == sketch(X union Y)."""
    return (a.unionByName(b).groupBy(*group_cols, "reg_ix")
            .agg(F.max("rho").alias("rho")))


def hll_estimate(sketches: DataFrame, group_cols: list[str],
                 p: int = 8) -> DataFrame:
    """Per-group cardinality estimate from a register table:
    (group..., n_regs_set, n_zero_regs, inv_sum_scaled, distinct_est).

    inv_sum_scaled = sum over all 2^p registers of 2^(w+1 - rho)
    (w = 60-p; zero registers contribute 2^(w+1)) - the harmonic-mean
    denominator scaled by the common power 2^(w+1), EXACT in int64
    (rho >= 1 keeps every term <= 2^w; 2^16 registers x 2^w fits).
    distinct_est is the classical float finish: alpha_m * m^2 *
    2^(w+1) / inv_sum_scaled, with the small-range linear-counting
    correction m * ln(m / n_zero) when est <= 2.5m and zero registers
    remain. Gate on the integer columns; the float rides alongside."""
    m = 1 << p
    w1 = 60 - p + 1
    # Flajolet et al. give exact constants for small m; the asymptotic
    # formula only applies from m = 128 (review fix: it biased p=4..6)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m))
    n_set = F.count(F.lit(1)).cast("long")
    present = F.sum(F.expr(f"shiftleft(1L, {w1} - rho)")).cast("long")
    agg = (sketches.groupBy(*group_cols)
           .agg(n_set.alias("n_regs_set"), present.alias("_present"),
                F.max("reg_ix").alias("_max_ix")))
    n_zero = (F.lit(m) - F.col("n_regs_set")).cast("long")
    # round-6 (r5 ADVICE): an estimate-p below the sketch-p silently
    # corrupts every output column (negative n_zero_regs, wrong
    # inv_sum_scaled). The violation is detectable in-plan - register
    # indexes and the per-group register count must fit in 2^p - so
    # fail loudly instead of emitting garbage. The guard adds exactly
    # 0 to inv_sum_scaled when the table is consistent.
    _guard = F.coalesce(
        F.assert_true(
            (F.col("_max_ix") < F.lit(m))
            & (F.col("n_regs_set") <= F.lit(m)),
            F.lit(f"hll_estimate: register table does not fit p={p} "
                  f"(reg_ix or per-group register count >= {m}); the "
                  "estimate p must match the p the sketch was built "
                  "with")).cast("long"),
        F.lit(0).cast("long"))
    inv = (F.col("_present") + _guard
           + n_zero * F.lit(1 << w1).cast("long")).cast("long")
    raw = (F.lit(alpha * m * m * float(1 << w1))
           / F.col("inv_sum_scaled").cast("double"))
    out = agg.select(*group_cols, "n_regs_set",
                     n_zero.alias("n_zero_regs"),
                     inv.alias("inv_sum_scaled"))
    est = (F.when((raw <= 2.5 * m) & (F.col("n_zero_regs") > 0),
                  F.lit(float(m)) * F.log(F.lit(float(m))
                                          / F.col("n_zero_regs")
                                          .cast("double")))
           .otherwise(raw))
    return out.withColumn("distinct_est", est)


def hll_distinct(df: DataFrame, value_col: str, group_cols: list[str],
                 p: int = 8) -> DataFrame:
    """One-call per-group HLL estimate: (group..., n_regs_set,
    n_zero_regs, inv_sum_scaled, distinct_est)."""
    return hll_estimate(hll_sketch(df, value_col, group_cols, p),
                        group_cols, p)
