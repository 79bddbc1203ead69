"""Redirect-chain resolution (operators/redirects.py): chain
composition, hop counts, cycle flagging, over-long chains, relative
Location resolution, and the WARC edge extractor."""

import pytest
from pyspark.sql import functions as F

from csvweb_spark.operators.redirects import (redirect_edges_from_warc,
                                              resolve_redirects)


def _resolve(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {r["src"]: (r["final_url"], r["hops"], r["resolved"])
            for r in resolve_redirects(df, **kw).collect()}


def test_chains_and_hops(spark):
    got = _resolve(spark, [
        ("a", "b"), ("b", "c"), ("c", "d"),   # 3-chain into d
        ("x", "d"),                           # 1 hop
    ])
    assert got["a"] == ("d", 3, True)
    assert got["b"] == ("d", 2, True)
    assert got["c"] == ("d", 1, True)
    assert got["x"] == ("d", 1, True)


def test_cycle_and_tail_into_cycle_unresolved(spark):
    got = _resolve(spark, [("p", "q"), ("q", "p"), ("t", "p")])
    for k in ("p", "q", "t"):
        assert got[k] == (None, None, False)


def test_chain_longer_than_max_hops_unresolved(spark):
    pairs = [(f"n{i}", f"n{i+1}") for i in range(20)]  # 20-chain
    got = _resolve(spark, pairs, max_hops=16)
    assert got["n19"] == ("n20", 1, True)
    assert got["n0"] == (None, None, False)  # 20 > 16
    got32 = _resolve(spark, pairs, max_hops=32)
    assert got32["n0"] == ("n20", 20, True)


def test_multi_target_src_deterministic(spark):
    got = _resolve(spark, [("a", "z"), ("a", "b"), ("b", "c")])
    assert got["a"] == ("c", 2, True)  # min dst 'b' wins, then chain


def test_warc_edge_extraction_relative_location(spark):
    rows = [
        ("s", 0, "response", "http://a.org/x/old", None, 301,
         "text/html", "/new", None, None),
        ("s", 1, "response", "http://a.org/y", None, 302,
         "text/html", "http://b.org/t", None, None),
        ("s", 2, "response", "http://a.org/ok", None, 200,
         "text/html", None, None, None),
        ("s", 3, "response", "http://a.org/self", None, 301,
         "text/html", "http://a.org/self", None, None),
    ]
    from csvweb_spark.sources.warc import WARC_RECORDS_SCHEMA
    df = spark.createDataFrame(rows, WARC_RECORDS_SCHEMA)
    got = {r["src"]: r["dst"]
           for r in redirect_edges_from_warc(df).collect()}
    assert got == {"http://a.org/x/old": "http://a.org/new",
                   "http://a.org/y": "http://b.org/t"}
