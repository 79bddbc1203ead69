"""Redirect-chain resolution over crawl-scale (src, dst) edges.

A Common-Crawl-style archive is ~1/5 redirect responses; the KG wants
every link, alias and sameAs edge expressed against the FINAL target
URL, so the (url, Location) pairs the WARC ingest surfaces
(`sources/warc.py`, 3xx records) must resolve to chain ends before
canonicalization consumes them.

`resolve_redirects` uses pointer doubling: each round joins the
current mapping with itself (m.dst = m.src), so a chain of length L
resolves in ceil(log2(L)) rounds - 16-hop chains (the browser/crawler
follow limit) need 4 self-joins, NOT 16.  Each round is one hash
equi-join on the url key plus a localCheckpoint to truncate lineage;
nothing wider than (src, dst, hops) ever shuffles.  Cycles and
chains longer than `max_hops` never leave the source set, so they are
flagged `resolved = false` with NULL hops (doubling makes an exact
hop count for unterminated walks meaningless) rather than looping
forever or silently emitting a mid-cycle URL as "final".

Scale notes: the mapping is the REDIRECT set (10^10-row class), far
smaller than the page corpus, but both join sides are that set - no
broadcast assumption anywhere.  Skewed dst fan-in (everything
redirecting to one login page) lands on the build side of round
joins as plain hash-join keys; AQE skew splitting applies.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(edges: DataFrame, src_col: str = "src",
                      dst_col: str = "dst",
                      max_hops: int = 16) -> DataFrame:
    """(src, final_url, hops, resolved) for every redirect source.

    `edges` holds one (src, dst) row per redirect; a src with several
    observed targets (re-crawled page whose Location changed) resolves
    through the lexicographically smallest dst - deterministic under
    any partitioning.  A walk terminates when it reaches a URL that is
    not itself a redirect source; walks still inside the source set
    after ceil(log2(max_hops)) doubling rounds (cycles, over-long
    chains) come back resolved=false with NULL hops/final."""
    m = (edges
         .groupBy(F.col(src_col).alias("src"))
         .agg(F.min(F.col(dst_col)).alias("dst"))
         .withColumn("hops", F.lit(1).cast("long")))
    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(rounds):
        nxt = m.select(F.col("src").alias("_s2"),
                       F.col("dst").alias("_d2"),
                       F.col("hops").alias("_h2"))
        m = (m.join(nxt, m["dst"] == nxt["_s2"], "left")
             .select("src",
                     F.coalesce("_d2", "dst").alias("dst"),
                     (F.col("hops") + F.coalesce("_h2", F.lit(0)))
                     .alias("hops"))
             .localCheckpoint())
    srcs = m.select(F.col("src").alias("_src_probe"))
    out = m.join(srcs, m["dst"] == srcs["_src_probe"], "left")
    unresolved = F.col("_src_probe").isNotNull()
    return out.select(
        "src",
        F.when(unresolved, F.lit(None).cast("string"))
         .otherwise(F.col("dst")).alias("final_url"),
        F.when(unresolved, F.lit(None).cast("long"))
         .otherwise(F.col("hops")).alias("hops"),
        (~unresolved).alias("resolved"))


def redirect_edges_from_warc(records: DataFrame) -> DataFrame:
    """(src, dst) redirect edges from `sources.warc.parse_warc`
    output: 3xx responses with a Location header, resolved against
    the record URL when relative (RFC 9110 allows relative
    Location)."""
    from ..sources.weblinks import resolve_url
    recs = records.where(
        (F.col("warc_type") == "response")
        & F.col("http_status").between(300, 399)
        & F.col("location").isNotNull()
        & F.col("url").isNotNull())
    return recs.select(
        F.col("url").alias("src"),
        resolve_url(F.col("url"), F.col("location")).alias("dst")) \
        .where(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
