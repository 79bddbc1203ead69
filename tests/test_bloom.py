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
