"""VoID dataset statistics for the constructed KG (W3C VoID, 2011).

The reference counts triples as a single conversion metric
(/root/reference/src/DataDock.CsvWeb/Rdf/Converter.cs emits the graph
and leaves description to the consumer); a published web-scale KG needs
the W3C VoID statistical description alongside the data: void:triples,
void:distinctSubjects/Objects, void:properties, void:classes, plus the
per-predicate void:propertyPartition and per-class void:classPartition
blocks that let a query planner or a downstream consumer size its joins
before reading the graph.

Scale shape: each function is ONE aggregation over the triple scan.
`exact=True` (the oracle-checkable default) uses COUNT(DISTINCT ...),
which Spark executes as an Expand + two-phase hash aggregate - partial
aggregation still runs map-side, but the expanded rows multiply the
shuffle by the number of distinct clauses. `exact=False` switches every
distinct to approx_count_distinct (HyperLogLog++, relativeSD 0.01): the
partial state becomes a fixed-size sketch per group, making the shuffle
O(groups), independent of the 10^12-row instance count - the right
default at full corpus scale where VoID numbers are descriptive, not
contractual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _distinct_fn(exact: bool):
    if exact:
        return F.count_distinct
    return lambda c: F.approx_count_distinct(c, 0.01)


def void_summary(triples: DataFrame, exact: bool = True,
                 type_pred: str = RDF_TYPE) -> DataFrame:
    """Dataset-level VoID numbers as one row: void:triples,
    void:distinctSubjects, void:properties, void:distinctObjects,
    void:classes (distinct objects of rdf:type)."""
    d = _distinct_fn(exact)
    return triples.agg(
        F.count(F.lit(1)).alias("n_triples"),
        d(F.col("subj")).alias("n_subjects"),
        d(F.col("pred")).alias("n_properties"),
        d(F.col("obj")).alias("n_objects"),
        d(F.when(F.col("pred") == type_pred, F.col("obj")))
        .alias("n_classes"))


def predicate_partitions(triples: DataFrame,
                         exact: bool = True) -> DataFrame:
    """void:propertyPartition - per predicate: triple count, distinct
    subjects, distinct objects. One groupBy over the scan."""
    d = _distinct_fn(exact)
    return triples.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_triples"),
        d(F.col("subj")).alias("n_subjects"),
        d(F.col("obj")).alias("n_objects"))


def predicate_partitions_sketched(triples: DataFrame,
                                  k: int = 64) -> DataFrame:
    """The MERGEABLE per-shard VoID partial: (pred, n_triples,
    subj_sketch, obj_sketch) with KMV bottom-k sketches
    (operators/sketches.py - deterministic md5 60-bit hashes, exactly
    mergeable and order-invariant). Shards / micro-batches compute this
    independently; `merge_sketched_partitions` folds them and
    `estimate_sketched_partitions` finishes - the incremental VoID
    maintenance a daily-delta KG needs without rescanning history."""
    from .sketches import kmv_sketch
    counts = triples.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_triples"))
    s = kmv_sketch(triples, "subj", ["pred"], k) \
        .withColumnRenamed("sketch", "subj_sketch")
    o = kmv_sketch(triples, "obj", ["pred"], k) \
        .withColumnRenamed("sketch", "obj_sketch")
    return counts.join(s, "pred").join(o, "pred")


def merge_sketched_partitions(a: DataFrame, b: DataFrame,
                              k: int = 64) -> DataFrame:
    """Fold two sketched-partition tables: triple counts add, sketches
    union-and-retake-k - by the KMV merge property the result EQUALS
    the sketched partial of the combined input (the driver query's
    oracle checks exactly that equality)."""
    from .sketches import kmv_merge
    cols = ["pred", "n_triples"]
    counts = (a.select(*cols).unionByName(b.select(*cols))
              .groupBy("pred").agg(F.sum("n_triples").alias("n_triples")))
    s = kmv_merge(a.select("pred", F.col("subj_sketch").alias("sketch")),
                  b.select("pred", F.col("subj_sketch").alias("sketch")),
                  ["pred"], k) \
        .withColumnRenamed("sketch", "subj_sketch")
    o = kmv_merge(a.select("pred", F.col("obj_sketch").alias("sketch")),
                  b.select("pred", F.col("obj_sketch").alias("sketch")),
                  ["pred"], k) \
        .withColumnRenamed("sketch", "obj_sketch")
    return counts.join(s, "pred").join(o, "pred")


def estimate_sketched_partitions(parts: DataFrame,
                                 k: int = 64) -> DataFrame:
    """Finish sketched partials into VoID numbers: (pred, n_triples,
    n_subjects_est, n_objects_est) - exact below k distinct values,
    the deterministic integer bottom-k estimator above."""
    from .sketches import kmv_estimate
    s = kmv_estimate(
        parts.select("pred", F.col("subj_sketch").alias("sketch")), k) \
        .select("pred", F.col("distinct_est").alias("n_subjects_est"))
    o = kmv_estimate(
        parts.select("pred", F.col("obj_sketch").alias("sketch")), k) \
        .select("pred", F.col("distinct_est").alias("n_objects_est"))
    return (parts.select("pred", "n_triples")
            .join(s, "pred").join(o, "pred"))


def class_partitions(triples: DataFrame, exact: bool = True,
                     type_pred: str = RDF_TYPE) -> DataFrame:
    """void:classPartition - per class: void:entities (distinct typed
    subjects). The rdf:type filter prunes the scan before the shuffle."""
    d = _distinct_fn(exact)
    return (triples.where(F.col("pred") == type_pred)
            .groupBy(F.col("obj").alias("class"))
            .agg(d(F.col("subj")).alias("n_entities")))


def class_linkage(triples: DataFrame, exact: bool = True,
                  type_pred: str = RDF_TYPE,
                  min_count: int = 1) -> DataFrame:
    """The VoID linkset / SCHEMA GRAPH of an induced KG: one row per
    (subj_class, pred, obj_class) with void:triples plus distinct
    subject/object entity counts - the dataset diagram ("Customer
    -ex:inNation-> Nation, 1.5M triples") ops teams read before
    writing a single SPARQL query, and the class-to-class complement
    of `class_partitions` (entities per class) and
    `predicate_partitions` (triples per predicate).

    Counting matches `ontology.induce_domain_range`: multi-typed
    endpoints contribute one row per class pair (multi-typing is
    evidence for every signature), assertions with an untyped endpoint
    are excluded (no class evidence), and rdf:type triples themselves
    are not linked over. `exact=False` swaps the distinct counts for
    approx_count_distinct when the class pair cardinality is huge.

    Scale shape: ONE filtered (entity, class) projection of the triple
    scan joined onto each endpoint of the slim (subj, pred, obj)
    relation rows - entity-keyed hash joins (co-partitioned over a
    subj-bucketed store), then one grouped aggregate whose cardinality
    is schema-sized (class x predicate x class), never instance-sized.
    """
    d = _distinct_fn(exact)
    types = (triples.where(F.col("pred") == type_pred)
             .select(F.col("subj").alias("entity"),
                     F.col("obj").alias("cls"))
             .distinct())
    rel = (triples.where(F.col("pred") != type_pred)
           .select("subj", "pred", "obj"))
    s_t = types.select(F.col("entity").alias("subj"),
                       F.col("cls").alias("subj_class"))
    o_t = types.select(F.col("entity").alias("obj"),
                       F.col("cls").alias("obj_class"))
    return (rel.join(s_t, "subj").join(o_t, "obj")
            .groupBy("subj_class", "pred", "obj_class")
            .agg(F.count(F.lit(1)).alias("n_triples"),
                 d(F.col("subj")).alias("n_subjects"),
                 d(F.col("obj")).alias("n_objects"))
            .filter(F.col("n_triples") >= int(min_count)))
