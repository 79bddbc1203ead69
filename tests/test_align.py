"""Round-5 KG-alignment operators: predicate functionality,
transitive reduction, cross-KG entity alignment. Every expected value
is hand-computed in the comments."""

import pytest
from pyspark.sql import functions as F


def _t(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _e(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


# -------------------------------------------------- predicate_functionality


def test_functionality_profiles(spark):
    from csvweb_spark.operators.ontology import predicate_functionality
    rows = [
        ("s1", "p", "A"), ("s1", "p", "B"),
        ("s2", "p", "A"), ("s2", "p", "A"),   # provenance dup: one pair
        ("s1", "q", "X"), ("s2", "q", "Y"),
    ]
    out = {r.pred: r for r in
           predicate_functionality(_t(spark, rows)).collect()}
    p = out["p"]
    # distinct pairs: (s1,A),(s1,B),(s2,A) -> 3 pairs, 2 subjects, 2 objs
    assert (p.n_pairs, p.n_subjects, p.n_objects) == (3, 2, 2)
    assert p.fun_ppm == 666666 and p.inv_fun_ppm == 666666
    q = out["q"]
    # one object per subject AND one subject per object: fully functional
    assert q.fun_ppm == 1000000 and q.inv_fun_ppm == 1000000


# ---------------------------------------------------- transitive_reduction


def test_reduction_drops_shortcut_keeps_chain(spark):
    from csvweb_spark.operators.entail import transitive_reduction
    e = [("a", "b"), ("b", "c"), ("a", "c")]
    out = {(r.src, r.dst)
           for r in transitive_reduction(_e(spark, e)).collect()}
    assert out == {("a", "b"), ("b", "c")}


def test_reduction_diamond_keeps_both_branches(spark):
    from csvweb_spark.operators.entail import transitive_reduction
    e = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")]
    out = {(r.src, r.dst)
           for r in transitive_reduction(_e(spark, e)).collect()}
    # only the a->d shortcut is implied; both 2-step branches stay
    assert out == {("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")}


def test_reduction_rejects_cycles(spark):
    from csvweb_spark.operators.entail import transitive_reduction
    with pytest.raises(ValueError):
        transitive_reduction(_e(spark, [("a", "b"), ("b", "a")])).collect()


# --------------------------------------------------------- align_entities


def _kg1(spark):
    return _t(spark, [
        ("P1", "name", "alice"), ("P1", "name", "alice"),  # dup: no boost
        ("P1", "city", "nyc"),
        ("P2", "name", "bob"), ("P2", "city", "nyc"),
    ])


def _kg2(spark):
    return _t(spark, [
        ("Q1", "name", "alice"), ("Q1", "city", "nyc"),
        ("Q2", "name", "bob"),
        ("Q3", "city", "nyc"),
    ])


def test_align_weighted_election_and_mutual(spark):
    from csvweb_spark.operators.align import align_entities
    out = {r.e1: r for r in
           align_entities(_kg1(spark), _kg2(spark)).collect()}
    # weights: (name,alice) 10^6/(1*1), (name,bob) 10^6, (city,nyc)
    # 10^6/(2*2) = 250000
    p1 = out["P1"]
    assert p1.e2 == "Q1" and p1.n_shared == 2
    assert p1.score_ppm == 1250000 and p1.mutual is True
    p2 = out["P2"]
    assert p2.e2 == "Q2" and p2.score_ppm == 1000000 and p2.mutual is True


def test_align_tie_breaks_smallest_e2(spark):
    from csvweb_spark.operators.align import align_entities
    kg1 = _t(spark, [("P", "t", "x")])
    kg2 = _t(spark, [("A", "t", "x"), ("B", "t", "x")])
    rows = align_entities(kg1, kg2).collect()
    assert len(rows) == 1
    r = rows[0]
    # (t,x): n1=1, n2=2 -> weight 500000; tie between A and B -> A
    assert (r.e1, r.e2, r.score_ppm, r.mutual) == ("P", "A", 500000, True)


def test_align_census_cap_drops_busy_keys(spark):
    from csvweb_spark.operators.align import align_entities
    kg1 = _t(spark, [("P", "t", "x")])
    kg2 = _t(spark, [("A", "t", "x"), ("B", "t", "x")])
    assert align_entities(kg1, kg2, max_key_pairs=1).count() == 0


def test_align_min_shared_and_mutual_only(spark):
    from csvweb_spark.operators.align import align_entities
    out = align_entities(_kg1(spark), _kg2(spark), min_shared=2).collect()
    assert [(r.e1, r.e2) for r in out] == [("P1", "Q1")]
    both = align_entities(_kg1(spark), _kg2(spark), mutual_only=True)
    assert {(r.e1, r.e2) for r in both.collect()} == \
        {("P1", "Q1"), ("P2", "Q2")}
