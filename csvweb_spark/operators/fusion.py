"""Knowledge fusion: resolve conflicting triple objects by weighted
source voting (Knowledge-Vault-style truth discovery, simplified to a
deterministic, oracle-replayable vote).

The reference emits every extracted triple verbatim
(/root/reference/src/DataDock.CsvWeb/Rdf/Converter.cs appends each cell
triple to the output graph with no cross-source reconciliation) - at
single-table scale there is nothing to reconcile. A web-scale KG built
from 10^12 pages asserts the same (subj, pred) from thousands of
sources that DISAGREE on the object (different crawl dates, vandalism,
scraper echoes, stale mirrors); publishing all of them makes the graph
self-contradictory for functional predicates. Fusion elects one object
per (subj, pred) by source-weighted support - the knowledge-fusion
stage between extraction and materialization.

Vote semantics (deterministic, integer-exact):
  * each DISTINCT (subj, pred, obj, source) counts once - a source
    repeating itself (the same page extracted twice, boilerplate echo)
    gains no extra weight;
  * support(s,p,o) = sum of the source's integer weight (e.g. host
    PageRank ppm from `graph.pagerank`, crawl-authority score, or 1);
    sources missing from the weight table default to `default_weight`;
  * winner per (s,p) = max support, ties broken by MIN object
    lexicographically - reproducible on any cluster shape.

Scale shape: two slim map-side-combinable hash aggregations
((s,p,o) support sum, then (s,p) min-struct election) plus one hash
join against the weight table. The weight table's size is
DATA-DEPENDENT (one row per source/host - 10^8+ at crawl scale), so it
is joined WITHOUT a broadcast hint (round-4 verdict: an explicit
broadcast of a data-dependent map does not fall back, it OOMs); AQE
still promotes it to a broadcast join at runtime when it measures
small. Text (obj literals) rides only the first aggregate; the
election shuffles one row per distinct (s,p,o).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuse_triples(triples: DataFrame,
                 source_weights: DataFrame | None = None,
                 subj: str = "subj", pred: str = "pred", obj: str = "obj",
                 source: str = "source",
                 weight_col: str = "weight",
                 default_weight: int = 1) -> DataFrame:
    """Elect one object per (subj, pred) by weighted distinct-source
    support.

    `triples`: (subj, pred, obj, source) assertions - duplicates per
    source are deduplicated before voting (RDF set semantics per
    source). `source_weights`: optional (source, weight) with integer
    weights >= 0; absent sources weigh `default_weight`.

    Returns one row per (subj, pred):
      (subj, pred, obj,        -- the elected object
       support,                -- winner's summed source weight
       n_sources,              -- distinct sources asserting the winner
       n_objects,              -- distinct objects in contention
       total_support,          -- summed weight over ALL objects
       conflict)               -- n_objects > 1
    """
    s, p, o = F.col(subj), F.col(pred), F.col(obj)
    asserted = (triples
                .select(s.alias("subj"), p.alias("pred"), o.alias("obj"),
                        F.col(source).alias("source"))
                .distinct())
    if source_weights is not None:
        w = source_weights.select(
            F.col(source).alias("source"),
            F.col(weight_col).cast("long").alias("_w"))
        asserted = (asserted.join(w, "source", "left")
                    .withColumn("_w", F.coalesce(
                        F.col("_w"), F.lit(int(default_weight)).cast("long"))))
    else:
        asserted = asserted.withColumn(
            "_w", F.lit(int(default_weight)).cast("long"))
    per_obj = (asserted.groupBy("subj", "pred", "obj")
               .agg(F.sum("_w").alias("support"),
                    F.count(F.lit(1)).alias("n_sources")))
    # min(struct(-support, obj, ...)) = highest support, then smallest
    # object lexicographically; support/n_sources of the winner ride
    # inside the struct so the election is ONE map-side-combinable agg
    elected = (per_obj.groupBy("subj", "pred")
               .agg(F.min(F.struct((-F.col("support")).alias("neg"),
                                   F.col("obj").alias("obj"),
                                   F.col("support").alias("support"),
                                   F.col("n_sources").alias("n_sources"))
                          ).alias("_win"),
                    F.count(F.lit(1)).alias("n_objects"),
                    F.sum("support").alias("total_support")))
    return elected.select(
        "subj", "pred",
        F.col("_win.obj").alias("obj"),
        F.col("_win.support").alias("support"),
        F.col("_win.n_sources").alias("n_sources"),
        "n_objects", "total_support",
        (F.col("n_objects") > 1).alias("conflict"))


def fuse_triples_incremental(new_triples: DataFrame,
                             committed_assertions: DataFrame,
                             source_weights: DataFrame | None = None,
                             subj: str = "subj", pred: str = "pred",
                             obj: str = "obj", source: str = "source",
                             weight_col: str = "weight",
                             default_weight: int = 1) -> DataFrame:
    """Incremental fusion: when a new batch of assertions arrives,
    re-elect ONLY the (subj, pred) groups the batch touches - never
    re-vote the whole KG (the batch-twin shape of every incremental
    here: rdfs_closure_incremental, dedup_minhash_incremental, ...).

    `committed_assertions` is the already-ingested (subj, pred, obj,
    source) assertion set (maintain it as a SET for size; duplicates
    are tolerated - fuse_triples deduplicates before voting).
    Semantics are EXACTLY fuse_triples over (committed UNION new)
    restricted to touched groups, by construction:

      fresh   = distinct new assertions not already committed
                (a source repeating itself across batches gains no
                weight - the cross-batch half of the RDF-set rule)
      touched = distinct (subj, pred) of fresh
      output  = fuse_triples(committed <semi-join touched> UNION fresh)

    Groups the batch does not touch cannot change their election (the
    vote is a pure function of the group's assertion set), so omitting
    them is exact, and an empty or all-duplicate batch returns 0 rows.
    Callers append `fresh` (= the same anti-join they can recompute,
    or just the distinct batch) to the assertion store afterwards.

    Scale shape: the committed store is only PROBED - one left-anti
    join (batch-sized output) and one left-semi join (touched-group-
    sized output), both zero-Exchange over a (subj, pred)-bucketed
    store (`plans/bucketed.py`); per-batch cost is bounded by the
    batch and its groups' assertion counts, never |KG|.
    """
    cols = [subj, pred, obj, source]
    fresh = (new_triples.select(*[F.col(c) for c in cols]).distinct()
             .join(committed_assertions.select(*[F.col(c) for c in cols]),
                   cols, "left_anti"))
    touched = fresh.select(subj, pred).distinct()
    base = (committed_assertions.select(*[F.col(c) for c in cols])
            .join(touched, [subj, pred], "left_semi"))
    return fuse_triples(base.unionByName(fresh), source_weights,
                        subj=subj, pred=pred, obj=obj, source=source,
                        weight_col=weight_col,
                        default_weight=default_weight)
