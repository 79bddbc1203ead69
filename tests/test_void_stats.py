"""VoID dataset statistics (operators/void_stats.py)."""

from csvweb_spark.operators.void_stats import (RDF_TYPE, class_partitions,
                                               predicate_partitions,
                                               void_summary)


def _kg(spark):
    rows = [
        ("ex:A", RDF_TYPE, "ex:Person"),
        ("ex:B", RDF_TYPE, "ex:Person"),
        ("ex:C", RDF_TYPE, "ex:Org"),
        ("ex:A", "ex:knows", "ex:B"),
        ("ex:A", "ex:knows", "ex:C"),
        ("ex:B", "ex:knows", "ex:C"),
        ("ex:A", "ex:name", "alice"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_void_summary(spark):
    row = void_summary(_kg(spark)).collect()[0]
    assert (row.n_triples, row.n_subjects, row.n_properties,
            row.n_objects, row.n_classes) == (7, 3, 3, 5, 2)


def test_predicate_partitions(spark):
    got = {r.pred: (r.n_triples, r.n_subjects, r.n_objects)
           for r in predicate_partitions(_kg(spark)).collect()}
    assert got == {RDF_TYPE: (3, 3, 2),
                   "ex:knows": (3, 2, 2),
                   "ex:name": (1, 1, 1)}


def test_class_partitions(spark):
    got = {getattr(r, "class"): r.n_entities
           for r in class_partitions(_kg(spark)).collect()}
    assert got == {"ex:Person": 2, "ex:Org": 1}


def test_approx_mode_close_and_sketch_plan(spark):
    kg = _kg(spark)
    exact = void_summary(kg).collect()[0]
    approx = void_summary(kg, exact=False).collect()[0]
    # HLL at 1% relativeSD is exact at this cardinality
    assert (approx.n_subjects, approx.n_properties) == (
        exact.n_subjects, exact.n_properties)
    plan = predicate_partitions(kg, exact=False) \
        ._jdf.queryExecution().executedPlan().toString()
    # sketch aggregation must not Expand the scan (the exact path does)
    assert "approx_count_distinct" in plan and "Expand" not in plan
    exact_plan = predicate_partitions(kg, exact=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan


def test_sketched_partitions_merge_property(spark):
    from pyspark.sql import functions as F
    from csvweb_spark.operators.void_stats import (
        estimate_sketched_partitions, merge_sketched_partitions,
        predicate_partitions_sketched)
    rows = [(f"ex:S{i % 37}", "ex:p" if i % 3 else "ex:q",
             f"ex:O{i % 11}") for i in range(300)]
    kg = spark.createDataFrame(rows, "subj string, pred string, obj string")
    a = kg.where(F.length("subj") % 2 == 0)
    b = kg.where(F.length("subj") % 2 == 1)
    merged = merge_sketched_partitions(
        predicate_partitions_sketched(a, k=8),
        predicate_partitions_sketched(b, k=8), k=8)
    direct = predicate_partitions_sketched(kg, k=8)
    m = {r.pred: (r.n_triples, list(r.subj_sketch), list(r.obj_sketch))
         for r in merged.collect()}
    d = {r.pred: (r.n_triples, list(r.subj_sketch), list(r.obj_sketch))
         for r in direct.collect()}
    assert m == d  # exact merge property, sketch-for-sketch
    est = {r.pred: (r.n_triples, r.n_subjects_est, r.n_objects_est)
           for r in estimate_sketched_partitions(merged, k=8).collect()}
    # 11 distinct objects > k=8 -> estimator engages; subjects 37 > 8
    for pred in ("ex:p", "ex:q"):
        assert est[pred][2] > 0 and est[pred][1] > 0
    # below-k groups are exact: restrict to 3 subjects
    tiny = predicate_partitions_sketched(
        kg.where(F.col("subj").isin("ex:S1", "ex:S2", "ex:S3")), k=8)
    t = {r.pred: r.n_subjects_est
         for r in estimate_sketched_partitions(tiny, k=8).collect()}
    assert t["ex:p"] == 3


def test_class_linkage_schema_graph(spark):
    """Schema-graph rows: multi-typed endpoints fan out one row per
    class pair, untyped endpoints are excluded, rdf:type triples are
    never linked over, and the distinct entity counts are exact."""
    from csvweb_spark.operators.void_stats import RDF_TYPE, class_linkage
    T = RDF_TYPE
    rows = [
        ("c1", T, "Customer"), ("c2", T, "Customer"),
        ("s1", T, "Supplier"), ("s1", T, "Preferred"),  # multi-typed
        ("n1", T, "Nation"),
        ("c1", "in", "n1"), ("c2", "in", "n1"), ("s1", "in", "n1"),
        ("u1", "in", "n1"),          # untyped subject: excluded
        ("c1", "knows", "u2"),       # untyped object: excluded
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {(r.subj_class, r.pred, r.obj_class):
           (r.n_triples, r.n_subjects, r.n_objects)
           for r in class_linkage(df).collect()}
    assert got == {
        ("Customer", "in", "Nation"): (2, 2, 1),
        ("Supplier", "in", "Nation"): (1, 1, 1),
        ("Preferred", "in", "Nation"): (1, 1, 1),
    }
    # min_count gate
    from csvweb_spark.operators.void_stats import class_linkage as cl
    assert cl(df, min_count=2).count() == 1
