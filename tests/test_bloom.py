"""Deterministic mergeable Bloom filter (sketches.py)."""
import pytest
from pyspark.sql import functions as F

from csvweb_spark.operators.sketches import (bloom_build, bloom_merge,
                                             bloom_probe)

M, K = 1 << 14, 4


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k string")


def test_bloom_no_false_negatives(spark):
    members = [f"key-{i}" for i in range(200)]
    bl = bloom_build(_keys(spark, members), "k", m_bits=M, k=K)
    out = bloom_probe(_keys(spark, members), bl, "k", m_bits=M, k=K)
    assert out.filter(~F.col("might_contain")).count() == 0
    assert out.count() == 200


def test_bloom_rejects_most_non_members(spark):
    members = [f"key-{i}" for i in range(200)]
    bl = bloom_build(_keys(spark, members), "k", m_bits=M, k=K)
    probes = _keys(spark, [f"other-{i}" for i in range(500)])
    fp = (bloom_probe(probes, bl, "k", m_bits=M, k=K)
          .filter(F.col("might_contain")).count())
    # 200 keys in 16384 bits, k=4: FP rate ~ (1-e^-800/16384)^4 ~ 5e-6;
    # deterministic hashes make this a fixed outcome, not a flake
    assert fp == 0


def test_bloom_merge_equals_union_build(spark):
    xs = [f"a-{i}" for i in range(80)]
    ys = [f"b-{i}" for i in range(80)]
    merged = bloom_merge(bloom_build(_keys(spark, xs), "k", M, K),
                         bloom_build(_keys(spark, ys), "k", M, K))
    direct = bloom_build(_keys(spark, xs + ys), "k", M, K)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b


def test_bloom_probe_keeps_duplicates_and_columns(spark):
    bl = bloom_build(_keys(spark, ["x"]), "k", m_bits=M, k=K)
    df = spark.createDataFrame([("x", 1), ("x", 2), ("y", 3)],
                               "k string, payload long")
    rows = sorted((r.k, r.payload, r.might_contain)
                  for r in bloom_probe(df, bl, "k", m_bits=M, k=K)
                  .collect())
    assert rows == [("x", 1, True), ("x", 2, True), ("y", 3, False)]


def test_bloom_validates_params(spark):
    df = _keys(spark, ["x"])
    with pytest.raises(ValueError):
        bloom_build(df, "k", m_bits=10)
    with pytest.raises(ValueError):
        bloom_build(df, "k", k=0)
    with pytest.raises(ValueError):
        bloom_probe(df.withColumnRenamed("k", "_wx0"),
                    bloom_build(df, "k"), "_wx0")


def test_bloom_anti_join_prefilter_sound(spark):
    """The 100 TB pattern: pre-filter the big side of an anti-join with
    the small side's bloom - probe-misses are DEFINITELY absent, so
    anti-join(prefilter-misses) UNION anti-join-recheck(hits) equals
    the exact anti-join."""
    small = _keys(spark, [f"key-{i}" for i in range(0, 100, 2)])
    big = _keys(spark, [f"key-{i}" for i in range(100)])
    bl = bloom_build(small, "k", m_bits=M, k=K)
    probed = bloom_probe(big, bl, "k", m_bits=M, k=K)
    misses = probed.filter(~F.col("might_contain")).select("k")
    hits = probed.filter(F.col("might_contain")).select("k")
    recheck = hits.join(small, "k", "left_anti")
    exact = big.join(small, "k", "left_anti")
    got = sorted(r.k for r in misses.unionByName(recheck).collect())
    assert got == sorted(r.k for r in exact.collect())
    # and the prefilter actually dropped the even keys before the join
    assert misses.count() == 50


def test_bloom_probe_plan_no_python(spark):
    bl = bloom_build(_keys(spark, ["x", "y"]), "k")
    out = bloom_probe(_keys(spark, ["x", "z"]), bl, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- Count-Min


def _bag(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k string")


def test_cm_never_undercounts_and_small_config_collides_upward(spark):
    from collections import Counter

    from csvweb_spark.operators.sketches import cm_build, cm_estimate
    vals = ([f"tok-{i}" for i in range(60)] * 2
            + ["hot"] * 25 + ["warm"] * 7)
    truth = Counter(vals)
    # deliberately tight width so collisions exist: estimates may only
    # move UP, never down
    sk = cm_build(_bag(spark, vals), "k", d=3, w=32)
    probes = _bag(spark, sorted(truth))
    out = cm_estimate(probes, sk, "k", d=3, w=32)
    got = {r["k"]: r["est_cnt"] for r in out.collect()}
    assert all(got[v] >= c for v, c in truth.items())
    # the heavy key's estimate is still dominated by its own mass
    assert got["hot"] >= 25


def test_cm_exact_when_width_ample(spark):
    from collections import Counter

    from csvweb_spark.operators.sketches import cm_build, cm_estimate
    vals = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]
    truth = Counter(vals)
    sk = cm_build(_bag(spark, vals), "k", d=4, w=4096)
    out = cm_estimate(_bag(spark, sorted(truth)), sk, "k", d=4, w=4096)
    got = {r["k"]: r["est_cnt"] for r in out.collect()}
    assert got == dict(truth)  # 4 keys in 4096 cols: no collisions


def test_cm_merge_equals_build_of_bag_union(spark):
    from csvweb_spark.operators.sketches import cm_build, cm_merge
    xs = [f"a-{i % 13}" for i in range(70)]
    ys = [f"b-{i % 7}" for i in range(50)] + ["a-1"] * 4
    merged = cm_merge(cm_build(_bag(spark, xs), "k", d=3, w=64),
                      cm_build(_bag(spark, ys), "k", d=3, w=64))
    direct = cm_build(_bag(spark, xs + ys), "k", d=3, w=64)
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, direct.collect()))


def test_cm_weight_col_equals_repeated_rows(spark):
    from csvweb_spark.operators.sketches import cm_build
    rows = [("x", 3), ("y", 2), ("z", 1)]
    weighted = cm_build(
        spark.createDataFrame(rows, "k string, n long"), "k",
        d=3, w=64, weight_col="n")
    repeated = cm_build(
        _bag(spark, [k for k, n in rows for _ in range(n)]), "k",
        d=3, w=64)
    assert sorted(map(tuple, weighted.collect())) \
        == sorted(map(tuple, repeated.collect()))


def test_cm_size_bounded_and_probe_keeps_duplicates(spark):
    from csvweb_spark.operators.sketches import cm_build, cm_estimate
    vals = [f"v-{i}" for i in range(500)]
    sk = cm_build(_bag(spark, vals), "k", d=2, w=16)
    assert sk.count() <= 2 * 16
    probes = _bag(spark, ["v-1", "v-1", "nope"])
    out = cm_estimate(probes, sk, "k", d=2, w=16)
    assert out.count() == 3  # one row per input row, duplicates kept
    assert out.columns == ["k", "est_cnt"]
