"""Round-4 KG consumer/reasoning operators: triangle counting, RDFS
entailment, BGP matching, cross-corpus line dedup, KMV sketches."""

import pytest
from pyspark.sql import functions as F

from csvweb_spark.operators.bgp import match_bgp, match_path
from csvweb_spark.operators.dedup import (dedup_lines_global,
                                          dedup_lines_incremental)
from csvweb_spark.operators.entail import (
    RDF_TYPE, RDFS_DOMAIN, RDFS_RANGE, RDFS_SUBCLASS, RDFS_SUBPROP,
    rdfs_closure, transitive_closure)
from csvweb_spark.operators.graph import triangle_count
from csvweb_spark.operators.sketches import (
    kmv_distinct, kmv_estimate, kmv_merge, kmv_sketch)


# ----------------------------------------------------------------- triangles


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_count_basic(spark):
    # K4 on {1..4}: every node is in C(3,2)=3 triangles
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    out = {r.node: r.triangles
           for r in triangle_count(_edges(spark, k4)).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_ignores_loops_parallel_direction(spark):
    # one triangle asserted with reversed/duplicate/self edges
    e = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    out = {r.node: r.triangles
           for r in triangle_count(_edges(spark, e)).collect()}
    assert out == {1: 1, 2: 1, 3: 1}
    # a path has no triangles -> empty result
    assert triangle_count(_edges(spark, [(1, 2), (2, 3)])).count() == 0


def test_triangle_count_degree_orientation_same_result(spark):
    # star hub 0 + one rim edge: exactly one triangle (0,1,2); degree
    # orientation must agree with id orientation
    e = [(0, i) for i in range(1, 8)] + [(1, 2)]
    a = {r.node: r.triangles
         for r in triangle_count(_edges(spark, e)).collect()}
    b = {r.node: r.triangles
         for r in triangle_count(_edges(spark, e),
                                 orient_by_degree=True).collect()}
    assert a == b == {0: 1, 1: 1, 2: 1}


# ---------------------------------------------------------------- entailment


def test_transitive_closure_chain_and_diamond(spark):
    pairs = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4)])
    got = {(r.src, r.dst) for r in transitive_closure(pairs).collect()}
    assert got == {(1, 2), (2, 3), (3, 4), (1, 5), (5, 4),
                   (1, 3), (1, 4), (2, 4)}


def _t(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_rdfs_closure_rules(spark):
    EX = "http://ex.org/"
    triples = _t(spark, [
        (EX + "Dog", RDFS_SUBCLASS, EX + "Mammal"),
        (EX + "Mammal", RDFS_SUBCLASS, EX + "Animal"),
        (EX + "hasPet", RDFS_SUBPROP, EX + "knows"),
        (EX + "hasPet", RDFS_DOMAIN, EX + "Person"),
        (EX + "knows", RDFS_RANGE, EX + "Agent"),
        (EX + "alice", EX + "hasPet", EX + "rex"),
        (EX + "rex", RDF_TYPE, EX + "Dog"),
    ])
    got = {(r.subj, r.pred, r.obj)
           for r in rdfs_closure(triples, derived_only=True).collect()}
    assert (EX + "Dog", RDFS_SUBCLASS, EX + "Animal") in got      # rdfs11
    assert (EX + "alice", EX + "knows", EX + "rex") in got        # rdfs7
    assert (EX + "alice", RDF_TYPE, EX + "Person") in got         # rdfs2
    # rdfs3 fires on the DERIVED knows triple too (stratification)
    assert (EX + "rex", RDF_TYPE, EX + "Agent") in got
    # rdfs9 through the closed subclass chain
    assert (EX + "rex", RDF_TYPE, EX + "Mammal") in got
    assert (EX + "rex", RDF_TYPE, EX + "Animal") in got
    # derived_only excludes every asserted triple
    asserted = {tuple(r) for r in triples.collect()}
    assert not (got & asserted)
    # full closure = asserted + derived, deduplicated
    full = rdfs_closure(triples)
    assert full.count() == full.distinct().count() == len(got | asserted)


# ----------------------------------------------------------------------- bgp


def _kg(spark):
    EX = "http://ex.org/"
    return _t(spark, [
        (EX + "alice", EX + "in", EX + "paris"),
        (EX + "bob", EX + "in", EX + "paris"),
        (EX + "carol", EX + "in", EX + "lyon"),
        (EX + "paris", EX + "country", EX + "fr"),
        (EX + "lyon", EX + "country", EX + "fr"),
        (EX + "alice", EX + "knows", EX + "bob"),
    ]), EX


def test_bgp_two_hop_join(spark):
    kg, EX = _kg(spark)
    out = match_bgp(kg, [("?p", EX + "in", "?city"),
                         ("?city", EX + "country", EX + "fr")])
    got = {(r.p, r.city) for r in out.collect()}
    assert got == {(EX + "alice", EX + "paris"), (EX + "bob", EX + "paris"),
                   (EX + "carol", EX + "lyon")}
    assert sorted(out.columns) == ["city", "p"]


def test_bgp_shared_subject_and_repeated_var(spark):
    kg, EX = _kg(spark)
    out = match_bgp(kg, [("?a", EX + "knows", "?b"),
                         ("?a", EX + "in", "?c"),
                         ("?b", EX + "in", "?c")])
    assert {(r.a, r.b) for r in out.collect()} == {(EX + "alice",
                                                    EX + "bob")}
    # repeated variable inside one pattern = equality filter
    loop = match_bgp(kg, [("?x", EX + "knows", "?x")])
    assert loop.count() == 0


def test_bgp_existence_probe_and_cartesian_guard(spark):
    kg, EX = _kg(spark)
    # all-constant probe contributes one empty mapping
    out = match_bgp(kg, [(EX + "alice", EX + "knows", EX + "bob"),
                         ("?c", EX + "country", EX + "fr")])
    assert out.count() == 2
    absent = match_bgp(kg, [(EX + "bob", EX + "knows", EX + "alice"),
                            ("?c", EX + "country", EX + "fr")])
    assert absent.count() == 0
    with pytest.raises(ValueError, match="cartesian"):
        match_bgp(kg, [("?a", EX + "in", "?x"), ("?b", EX + "country", "?y")])
    assert match_bgp(kg, [("?a", EX + "in", "?x"),
                          ("?b", EX + "country", "?y")],
                     allow_cartesian=True).count() == 3 * 2


def test_bgp_optional_left_join(spark):
    kg, EX = _kg(spark)
    out = match_bgp(kg, [("?p", EX + "in", "?city")],
                    optional=[[("?p", EX + "knows", "?f")]])
    got = {(r.p, r.city, r.f) for r in out.collect()}
    # alice binds the optional friend; bob/carol keep NULL
    assert got == {(EX + "alice", EX + "paris", EX + "bob"),
                   (EX + "bob", EX + "paris", None),
                   (EX + "carol", EX + "lyon", None)}
    # second optional chains on a variable the FIRST optional bound.
    # SPARQL left-join COMPATIBILITY (round-4 review fix): a solution
    # whose ?f is unbound is compatible with EVERY G2 solution, so it
    # extends once per (f, fcity) pair - the spec's famous OPTIONAL
    # gotcha - while alice's bound ?f=bob matches only bob's city.
    out2 = match_bgp(kg, [("?p", EX + "in", "?city")],
                     optional=[[("?p", EX + "knows", "?f")],
                               [("?f", EX + "in", "?fcity")]])
    rows2 = {(r.p, r.f, r.fcity) for r in out2.collect()}
    residents = {(EX + "alice", EX + "paris"), (EX + "bob", EX + "paris"),
                 (EX + "carol", EX + "lyon")}
    expect = {(EX + "alice", EX + "bob", EX + "paris")}
    for p in (EX + "bob", EX + "carol"):  # unbound ?f rows fan out
        expect |= {(p, f, fc) for f, fc in residents}
    assert rows2 == expect
    with pytest.raises(ValueError, match="OPTIONAL"):
        match_bgp(kg, [("?p", EX + "in", "?city")],
                  optional=[[("?x", EX + "country", "?y")]])


def test_match_path_plus_closure(spark):
    EX = "http://ex.org/"
    kg = _t(spark, [
        (EX + "a", EX + "broader", EX + "b"),
        (EX + "b", EX + "broader", EX + "c"),
        (EX + "c", EX + "broader", EX + "d"),
        (EX + "x", EX + "other", EX + "y"),
    ])
    got = {(r.s, r.o) for r in match_path(kg, EX + "broader").collect()}
    assert got == {(EX + "a", EX + "b"), (EX + "b", EX + "c"),
                   (EX + "c", EX + "d"), (EX + "a", EX + "c"),
                   (EX + "b", EX + "d"), (EX + "a", EX + "d")}
    # custom variable names compose with match_bgp results by join
    named = match_path(kg, EX + "broader", "?narrow", "?broad")
    assert sorted(named.columns) == ["broad", "narrow"]


# ---------------------------------------------------------------- line dedup


def test_dedup_lines_global(spark):
    docs = spark.createDataFrame(
        [(1, "the same banner\nalpha body text\n"),
         (2, "the same banner\nbeta body text"),
         (3, "the same banner")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           dedup_lines_global(docs).collect()}
    # doc 1 keeps everything (first occurrence), incl. exempt blank line
    assert out[1].text == "the same banner\nalpha body text\n"
    assert out[1].n_lines_removed == 0 and out[1].n_lines == 3
    # later copies lose the banner but keep their own body
    assert out[2].text == "beta body text"
    assert out[2].n_lines_removed == 1
    # doc 3 loses its only line
    assert out[3].text == "" and out[3].n_lines_removed == 1


def test_dedup_lines_exemption_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "a\n\nxy\n\na"), (2, "xy")], "doc_id long, text string")
    out = {r.doc_id: r.text
           for r in dedup_lines_global(docs, min_line_chars=2).collect()}
    # min_line_chars=2 exempts 'a'/'' (kept verbatim, duplicates and
    # all) -> only 'xy' is dedup-eligible; within-doc order is
    # preserved exactly
    assert out[1] == "a\n\nxy\n\na"
    assert out[2] == ""


def test_dedup_lines_incremental(spark):
    import hashlib
    committed = spark.createDataFrame(
        [(1, "banner\nold body")], "doc_id long, text string")
    seen = (committed
            .select(F.explode(F.split(F.col("text"), "\n")).alias("line"))
            .select(F.md5(F.col("line")).alias("line_dg")).distinct())
    new = spark.createDataFrame(
        [(10, "banner\nnew body"), (11, "new body\nunique")],
        "doc_id long, text string")
    out, fresh = dedup_lines_incremental(new, seen)
    rows = {r.doc_id: r for r in out.collect()}
    # committed banner strips even from its batch-first occurrence
    assert rows[10].text == "new body" and rows[10].n_lines_removed == 1
    # 'new body' won inside the batch in doc 10
    assert rows[11].text == "unique" and rows[11].n_lines_removed == 1
    exp = {hashlib.md5(s.encode()).hexdigest()
           for s in ("new body", "unique")}
    assert {r.line_dg for r in fresh.collect()} == exp
    # committing `fresh` and replaying the same batch strips everything:
    # the idempotence that makes the op foreachBatch-safe
    out2, fresh2 = dedup_lines_incremental(new, seen.unionByName(fresh))
    assert {r.text for r in out2.collect()} == {""}
    assert fresh2.count() == 0


# ------------------------------------------------------------------ sketches


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([("g", f"v{i}") for i in range(10)],
                               "g string, v string")
    row = kmv_distinct(df, "v", ["g"], k=64).collect()[0]
    assert row.distinct_est == 10 and row.n_kept == 10
    assert row.kth_min is None


def test_kmv_estimate_accuracy_and_determinism(spark):
    n = 5000
    df = spark.createDataFrame([(f"v{i % n}",) for i in range(2 * n)],
                               "v string").withColumn("g", F.lit("g"))
    est1 = kmv_distinct(df, "v", ["g"], k=256).collect()[0].distinct_est
    est2 = kmv_distinct(df.repartition(13), "v", ["g"],
                        k=256).collect()[0].distinct_est
    assert est1 == est2                       # partition-invariant
    assert abs(est1 - n) / n < 0.15           # within ~1/sqrt(k) * 2


def test_kmv_merge_equals_union_sketch(spark):
    a = spark.createDataFrame([(f"v{i}",) for i in range(400)], "v string") \
        .withColumn("g", F.lit("g"))
    b = spark.createDataFrame([(f"v{i}",) for i in range(200, 600)],
                              "v string").withColumn("g", F.lit("g"))
    merged = kmv_merge(kmv_sketch(a, "v", ["g"], k=64),
                       kmv_sketch(b, "v", ["g"], k=64), ["g"], k=64)
    direct = kmv_sketch(a.unionByName(b), "v", ["g"], k=64)
    assert merged.collect()[0].sketch == direct.collect()[0].sketch
    est = kmv_estimate(merged, k=64).collect()[0]
    assert est.n_kept == 64 and est.distinct_est > 0


def _hll_replay(vals, p=8):
    """Independent pure-Python replay of hll_sketch's register contract."""
    import hashlib
    m, w = 1 << p, 60 - p
    regs = {}
    for v in vals:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        ix, rest = h % m, h // m
        rho = (w + 1) if rest == 0 else (w + 1 - rest.bit_length())
        regs[ix] = max(regs.get(ix, 0), rho)
    return regs


def test_hll_registers_match_python_replay(spark):
    from csvweb_spark.operators.sketches import hll_sketch
    vals = [f"v{i}" for i in range(300)] + ["v1", "v2"]  # dups absorbed
    df = spark.createDataFrame([(v,) for v in vals], "v string") \
        .withColumn("g", F.lit("g"))
    got = {r.reg_ix: r.rho
           for r in hll_sketch(df, "v", ["g"], p=8).collect()}
    assert got == _hll_replay(vals, p=8)


def test_hll_merge_equals_union_sketch_and_is_partition_invariant(spark):
    from csvweb_spark.operators.sketches import hll_merge, hll_sketch
    a = spark.createDataFrame([(f"v{i}",) for i in range(400)], "v string") \
        .withColumn("g", F.lit("g"))
    b = spark.createDataFrame([(f"v{i}",) for i in range(200, 600)],
                              "v string").withColumn("g", F.lit("g"))
    merged = hll_merge(hll_sketch(a, "v", ["g"]),
                       hll_sketch(b, "v", ["g"]), ["g"])
    direct = hll_sketch(a.unionByName(b).repartition(13), "v", ["g"])
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, direct.collect()))


def test_hll_estimate_accuracy_and_small_range(spark):
    from csvweb_spark.operators.sketches import hll_distinct
    n = 5000
    df = spark.createDataFrame([(f"v{i % n}",) for i in range(2 * n)],
                               "v string").withColumn("g", F.lit("g"))
    row = hll_distinct(df, "v", ["g"], p=8).collect()[0]
    # deterministic fixed outcome, ~1.04/sqrt(256) relative error class
    assert abs(row.distinct_est - n) / n < 0.15
    assert row.n_regs_set + row.n_zero_regs == 256
    # small range: linear counting keeps tiny sets near-exact
    small = spark.createDataFrame([(f"s{i}",) for i in range(10)],
                                  "v string").withColumn("g", F.lit("g"))
    srow = hll_distinct(small, "v", ["g"], p=8).collect()[0]
    assert abs(srow.distinct_est - 10) < 1.0
    # s3/s7 share a register under the deterministic md5 family, so 9
    # registers set; linear counting reads 256*ln(256/247) = 9.16
    assert srow.n_regs_set == 9


# -------------------------------------------------- node similarity (round 4)


def test_node_similarity_shared_neighbors(spark):
    from csvweb_spark.operators.graph import node_similarity
    # 1 and 2 share neighbors {3, 4}; 1 also has private neighbor 5
    e = [(1, 3), (1, 4), (1, 5), (2, 3), (2, 4)]
    rows = {(r.node_a, r.node_b): r
            for r in node_similarity(_edges(spark, e)).collect()}
    r12 = rows[(1, 2)]
    assert (r12.common, r12.degree_a, r12.degree_b) == (2, 3, 2)
    # jaccard = 2 / (3 + 2 - 2) = 2/3 -> 6666 bp
    assert r12.jaccard_bp == 6666
    # 3 and 4 share neighbors {1, 2} and both have degree 2 -> 10000 bp
    assert rows[(3, 4)].jaccard_bp == 10000
    # every reported pair shares at least one neighbor
    assert all(r.common >= 1 for r in rows.values())


def test_node_similarity_center_cap(spark):
    from csvweb_spark.operators.graph import node_similarity
    # hub 0 connects 1..9 (degree 9); rim edge (1,2) gives 1-2 a second
    # shared path only through the hub
    e = [(0, i) for i in range(1, 10)] + [(1, 2)]
    full = {(r.node_a, r.node_b): r.common
            for r in node_similarity(_edges(spark, e)).collect()}
    assert full[(1, 2)] == 1  # via hub 0
    capped = node_similarity(_edges(spark, e), max_center_degree=5)
    got = {(r.node_a, r.node_b) for r in capped.collect()}
    # hub-mediated pairs vanish; no center of degree <= 5 joins 1 and 2
    assert (1, 2) not in got
    # degrees in surviving rows still count every edge (cap only prunes
    # wedge centers)
    rows = node_similarity(_edges(spark, e + [(1, 9), (2, 9)]),
                           max_center_degree=5).collect()
    for r in rows:
        if (r.node_a, r.node_b) == (1, 2):
            assert r.degree_a == 3 and r.degree_b == 3


# --------------------------------------------- SPARQL UNION/VALUES/CONSTRUCT


def test_bgp_union_pads_private_vars(spark):
    from csvweb_spark.operators.bgp import match_union
    t = _t(spark, [("a", "p", "b"), ("c", "q", "d")])
    out = match_union(t, [[("?x", "p", "?y")], [("?x", "q", "?z")]])
    assert sorted(out.columns) == ["x", "y", "z"]
    rows = {(r.x, r.y, r.z) for r in out.collect()}
    assert rows == {("a", "b", None), ("c", None, "d")}


def test_bgp_values_constrains_and_extends(spark):
    from csvweb_spark.operators.bgp import match_bgp
    t = _t(spark, [("a", "p", "b"), ("c", "p", "d"), ("e", "p", "f")])
    # constrain: only listed ?x rows survive
    out = match_bgp(t, [("?x", "p", "?y")],
                    values=(["?x"], [("a",), ("e",)]))
    assert {(r.x, r.y) for r in out.collect()} == {("a", "b"), ("e", "f")}
    # extend: an unbound VALUES var multiplies solutions
    out2 = match_bgp(t, [("?x", "p", "?y")],
                     values=(["?x", "?tag"], [("a", "t1"), ("a", "t2")]))
    assert {(r.x, r.y, r.tag) for r in out2.collect()} == {
        ("a", "b", "t1"), ("a", "b", "t2")}
    # UNDEF (None) cells are wildcards in shared variables (round-5):
    # the UNDEF row matches EVERY solution, the bound row adds one more
    # for its match - bag semantics, duplicates preserved
    out3 = match_bgp(t, [("?x", "p", "?y")],
                     values=(["?x"], [(None,), ("a",)]))
    got = sorted((r.x, r.y) for r in out3.collect())
    assert got == sorted([("a", "b"), ("c", "d"), ("e", "f"), ("a", "b")])
    # UNDEF in an extending variable leaves that column unbound (NULL)
    out4 = match_bgp(t, [("?x", "p", "?y")],
                     values=(["?x", "?t"], [("a", "t1"), ("c", None)]))
    assert {(r.x, r.t) for r in out4.collect()} == {("a", "t1"), ("c", None)}


def test_sparql_construct(spark):
    from csvweb_spark.operators.bgp import construct
    t = _t(spark, [("c1", "in", "n1"), ("c2", "in", "n1"),
                   ("n1", "of", "r1")])
    out = construct(t, [("?c", "in", "?n"), ("?n", "of", "?r")],
                    [("?c", "inRegion", "?r"), ("?r", "hasMember", "?c")])
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert rows == {("c1", "inRegion", "r1"), ("c2", "inRegion", "r1"),
                    ("r1", "hasMember", "c1"), ("r1", "hasMember", "c2")}
    # unbound OPTIONAL var -> that template triple is skipped per solution
    t2 = _t(spark, [("c1", "in", "n1"), ("c1", "vip", "gold"),
                    ("c2", "in", "n1")])
    out2 = construct(t2, [("?c", "in", "?n")],
                     [("?c", "status", "?v"), ("?c", "seen", "yes")],
                     optional=[[("?c", "vip", "?v")]])
    rows2 = {(r.subj, r.pred, r.obj) for r in out2.collect()}
    assert rows2 == {("c1", "status", "gold"), ("c1", "seen", "yes"),
                     ("c2", "seen", "yes")}
    with pytest.raises(ValueError, match="not bound"):
        construct(t, [("?c", "in", "?n")], [("?c", "x", "?zzz")])


# ------------------------------------------------------- OWL property rules


def test_owl_symmetric_and_inverse(spark):
    from csvweb_spark.operators.entail import owl_property_closure
    t = _t(spark, [("a", "adj", "b"), ("x", "contains", "y")])
    out = owl_property_closure(t, symmetric=["adj"],
                               inverse={"contains": "within"},
                               derived_only=True)
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert rows == {("b", "adj", "a"), ("y", "within", "x")}
    # inverseOf applies in both directions
    t2 = _t(spark, [("y", "within", "x")])
    out2 = owl_property_closure(t2, inverse={"contains": "within"},
                                derived_only=True)
    assert {(r.subj, r.pred, r.obj) for r in out2.collect()} == {
        ("x", "contains", "y")}


def test_owl_rule_chaining_through_states(spark):
    from csvweb_spark.operators.entail import owl_property_closure
    # p inverseOf q, q symmetric: (a p b) must entail q both ways AND
    # the symmetric flip back through inverse onto p itself
    t = _t(spark, [("a", "p", "b")])
    out = owl_property_closure(t, symmetric=["q"], inverse={"p": "q"})
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert rows == {("a", "p", "b"), ("b", "p", "a"),
                    ("b", "q", "a"), ("a", "q", "b")}


def test_owl_transitive_after_inverse(spark):
    from csvweb_spark.operators.entail import owl_property_closure
    t = _t(spark, [("a", "part", "b"), ("b", "part", "c"),
                   ("d", "whole", "c")])  # whole is inverse: c part d? no -
    # (d whole c) => (c part d), then closure chains a->b->c->d
    out = owl_property_closure(
        t, inverse={"part": "whole"}, transitive=["part", "whole"])
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert ("a", "part", "c") in rows
    assert ("c", "part", "d") in rows
    assert ("a", "part", "d") in rows
    # the whole-side closure mirrors it exactly
    assert ("d", "whole", "a") in rows
    with pytest.raises(ValueError, match="transitive"):
        owl_property_closure(t, inverse={"part": "whole"},
                             transitive=["part"])


# ------------------------------------------------ SPARQL 1.1 path algebra


def test_path_expr_atoms_and_inverse(spark):
    from csvweb_spark.operators.bgp import path_pairs
    t = _t(spark, [("a", "p", "b"), ("b", "q", "c"), ("a", "r", "d")])
    assert {(r.src, r.dst) for r in path_pairs(t, "p").collect()} == {
        ("a", "b")}
    assert {(r.src, r.dst)
            for r in path_pairs(t, ("inv", "p")).collect()} == {("b", "a")}
    # negated property set: every edge NOT labelled p
    assert {(r.src, r.dst)
            for r in path_pairs(t, ("nps", ["p"])).collect()} == {
        ("b", "c"), ("a", "d")}


def test_path_expr_seq_alt(spark):
    from csvweb_spark.operators.bgp import path_pairs
    t = _t(spark, [("a", "p", "b"), ("b", "q", "c"), ("x", "p", "b")])
    # p/q: a -p-> b -q-> c and x -p-> b -q-> c
    assert {(r.src, r.dst)
            for r in path_pairs(t, ("seq", "p", "q")).collect()} == {
        ("a", "c"), ("x", "c")}
    # p|q is the distinct edge union
    assert {(r.src, r.dst)
            for r in path_pairs(t, ("alt", "p", "q")).collect()} == {
        ("a", "b"), ("x", "b"), ("b", "c")}


def test_path_expr_closures(spark):
    from csvweb_spark.operators.bgp import path_pairs
    t = _t(spark, [("a", "p", "b"), ("b", "p", "c"), ("c", "q", "d")])
    plus = {(r.src, r.dst)
            for r in path_pairs(t, ("plus", "p")).collect()}
    assert plus == {("a", "b"), ("b", "c"), ("a", "c")}
    # star adds the identity over EVERY graph term (d included)
    star = {(r.src, r.dst) for r in path_pairs(t, ("star", "p")).collect()}
    assert star == plus | {(x, x) for x in "abcd"}
    # opt = identity union single step
    opt = {(r.src, r.dst) for r in path_pairs(t, ("opt", "q")).collect()}
    assert opt == {("c", "d")} | {(x, x) for x in "abcd"}


def test_path_expr_composed(spark):
    from csvweb_spark.operators.bgp import match_path_expr
    # within / partOf* : c reaches its nation, region and the root
    t = _t(spark, [("c1", "within", "n1"), ("n1", "partOf", "r1"),
                   ("r1", "partOf", "world")])
    out = match_path_expr(
        t, ("seq", "within", ("star", "partOf")), "?c", "?place")
    got = {(r.c, r.place) for r in out.collect()}
    assert got == {("c1", "n1"), ("c1", "r1"), ("c1", "world")}


# ------------------------------------------------------- exact quantiles


def test_exact_quantiles_known_values(spark):
    from csvweb_spark.operators.sketches import (exact_quantiles,
                                                 exact_quantiles_preagg)
    rows = [("a", v) for v in range(1, 101)] + [("b", 7), ("b", 9)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.g: r for r in exact_quantiles(
        df, "v", ["g"], (5000, 9000, 9900, 10000)).collect()}
    # group a = 1..100: type-1 quantiles are exact positions
    assert (out["a"].n_rows, out["a"].q5000, out["a"].q9000,
            out["a"].q9900, out["a"].q10000) == (100, 50, 90, 99, 100)
    # group b = {7, 9}: median position ceil(0.5*2)=1 -> 7, p99 -> 9
    assert (out["b"].n_rows, out["b"].q5000, out["b"].q9900) == (2, 7, 9)
    # the raw row_number variant is value-identical (duplicates force
    # the cumulative-frequency walk to matter)
    dup = spark.createDataFrame(
        [("a", v // 10) for v in range(100)], "g string, v long")
    a = exact_quantiles(dup, "v", ["g"], pre_aggregate=False).collect()[0]
    b = exact_quantiles_preagg(dup, "v", ["g"]).collect()[0]
    assert (a.n_rows, a.q5000, a.q9000, a.q9900) == \
        (b.n_rows, b.q5000, b.q9000, b.q9900)
    # default = preagg: a frequency Aggregate sits BELOW the Window
    # (the window input is (value, freq) rows, bounded by value
    # cardinality); the raw plan windows the bare scan, so it has only
    # the final Aggregate. Optimized-plan strings print top-down.
    plan_default = exact_quantiles(
        dup, "v", ["g"])._jdf.queryExecution().optimizedPlan().toString()
    plan_raw = exact_quantiles(
        dup, "v", ["g"],
        pre_aggregate=False)._jdf.queryExecution().optimizedPlan().toString()
    assert plan_default.count("Aggregate") == 2 and "Window" in plan_default
    assert plan_default.rindex("Aggregate") > plan_default.index("Window")
    assert plan_raw.count("Aggregate") == 1
    with pytest.raises(ValueError, match="group_cols"):
        exact_quantiles(df, "v", [])
    with pytest.raises(ValueError, match="quantile"):
        exact_quantiles(df, "v", ["g"], (0,))


def test_bgp_path_pattern_predicate(spark):
    from csvweb_spark.operators.bgp import match_bgp
    t = _t(spark, [("c1", "in", "n1"), ("c2", "in", "n2"),
                   ("n1", "partOf", "r1"), ("r1", "partOf", "world"),
                   ("n2", "partOf", "r2")])
    # second pattern's predicate is a path expression (partOf+)
    out = match_bgp(t, [("?c", "in", "?n"),
                        ("?n", ("plus", "partOf"), "?p")])
    got = {(r.c, r.n, r.p) for r in out.collect()}
    assert got == {("c1", "n1", "r1"), ("c1", "n1", "world"),
                   ("c2", "n2", "r2")}
    # constant object end filters the pair set
    out2 = match_bgp(t, [("?c", "in", "?n"),
                         ("?n", ("plus", "partOf"), "world")])
    assert {(r.c, r.n) for r in out2.collect()} == {("c1", "n1")}


def test_filter_exists_and_not_exists(spark):
    from csvweb_spark.operators.bgp import filter_exists, match_bgp
    t = _t(spark, [("c1", "in", "n1"), ("c2", "in", "n1"),
                   ("c1", "vip", "gold")])
    sol = match_bgp(t, [("?c", "in", "?n")])
    kept = filter_exists(t, sol, [("?c", "vip", "?g")])
    assert {(r.c, r.n) for r in kept.collect()} == {("c1", "n1")}
    dropped = filter_exists(t, sol, [("?c", "vip", "?g")], negate=True)
    assert {(r.c, r.n) for r in dropped.collect()} == {("c2", "n1")}
    # EXISTS filters, never multiplies: two vip triples, still one row
    t2 = _t(spark, [("c1", "in", "n1"), ("c1", "vip", "gold"),
                    ("c1", "vip", "silver")])
    sol2 = match_bgp(t2, [("?c", "in", "?n")])
    assert filter_exists(t2, sol2, [("?c", "vip", "?g")]).count() == 1
    with pytest.raises(ValueError, match="shares no variable"):
        filter_exists(t, sol, [("?x", "vip", "?g")])


# ------------------------------------------------------- round-4 additions


def test_match_minus_removes_compatible(spark):
    from csvweb_spark.operators.bgp import match_bgp, match_minus
    t = _t(spark, [("c1", "in", "n1"), ("c2", "in", "n1"),
                   ("c3", "in", "n2"), ("c1", "vip", "gold"),
                   ("x", "other", "y")])
    sol = match_bgp(t, [("?c", "in", "?n")])
    out = match_minus(t, sol, [("?c", "vip", "?v")])
    assert {(r.c, r.n) for r in out.collect()} == {("c2", "n1"),
                                                   ("c3", "n2")}
    # spec corner: disjoint domains remove NOTHING (unlike NOT EXISTS)
    out2 = match_minus(t, sol, [("?a", "other", "?b")])
    assert out2.count() == sol.count()
    # the exact (unbound-aware) path agrees on NULL-free solutions
    out3 = match_minus(t, sol, [("?c", "vip", "?v")],
                       unbound_possible=True)
    assert {(r.c, r.n) for r in out3.collect()} == {("c2", "n1"),
                                                    ("c3", "n2")}


def test_match_minus_unbound_left(spark):
    # after OPTIONAL, a shared var can be NULL on the left: SPARQL drops
    # it from the compatibility domain, so a row with ?v unbound but ?c
    # matching IS removed by MINUS {?c vip ?v} - the equality fast path
    # would keep it (NULL != anything), hence unbound_possible=True
    from csvweb_spark.operators.bgp import match_bgp, match_minus
    t = _t(spark, [("c1", "in", "n1"), ("c2", "in", "n2"),
                   ("c1", "vip", "gold")])
    sol = match_bgp(t, [("?c", "in", "?n")],
                    optional=[[("?c", "vip", "?v")]])
    out = match_minus(t, sol, [("?c", "vip", "?v")],
                      unbound_possible=True)
    cs = {r.c for r in out.collect()}
    assert cs == {"c2"}


def test_smush_sameas_rewrites_and_drops(spark):
    from csvweb_spark.operators.entail import OWL_SAMEAS, smush_sameas
    rows = [
        ("e:a", OWL_SAMEAS, "e:b", "iri"),
        ("e:b", OWL_SAMEAS, "e:c", "iri"),
        ("e:c", "p:name", "alpha", "literal"),
        ("e:b", "p:knows", "e:z", "iri"),
        ("e:z", "p:knows", "e:a", "iri"),
        ("e:z", "p:label", "e:a-looking literal", "literal"),
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string")
    got = {tuple(r) for r in smush_sameas(t).collect()}
    assert got == {
        ("e:a", "p:name", "alpha", "literal"),       # subj c -> min(a,b,c)
        ("e:a", "p:knows", "e:z", "iri"),            # subj b -> a
        ("e:z", "p:knows", "e:a", "iri"),            # obj a -> a (already)
        ("e:z", "p:label", "e:a-looking literal", "literal"),  # literal kept
    }
    # keep_sameas retains rewritten assertions; dedupe collapses them
    kept = smush_sameas(t, keep_sameas=True)
    sameas = {tuple(r) for r in
              kept.filter(F.col("pred") == OWL_SAMEAS).collect()}
    assert sameas == {("e:a", OWL_SAMEAS, "e:a", "iri")}


def test_smush_sameas_merges_duplicate_facts(spark):
    from csvweb_spark.operators.entail import OWL_SAMEAS, smush_sameas
    rows = [("e:a", OWL_SAMEAS, "e:b", "iri"),
            ("e:a", "p:t", "v", "literal"),
            ("e:b", "p:t", "v", "literal")]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string")
    assert smush_sameas(t).count() == 1
    assert smush_sameas(t, dedupe=False).count() == 2


def test_shortest_paths_weighted_and_hops(spark):
    from csvweb_spark.operators.graph import shortest_paths
    er = [(k, k + 1, 1) for k in range(1, 30)] + \
         [(k, k + 10, 5) for k in (1, 11, 21)]
    e = spark.createDataFrame(er, "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,)], "node long")
    d = {r.node: r.dist
         for r in shortest_paths(e, seeds, weight="w").collect()}
    # chain nodes 1..30 plus node 31 (tip of the 21->31 shortcut)
    assert len(d) == 31
    for n in range(1, 32):
        assert d[n] == 5 * ((n - 1) // 10) + ((n - 1) % 10), n
    # hop counting (weight=None): shortcuts 1->11->21 (2 hops) then the
    # chain 21..30 (9 hops)
    d2 = {r.node: r.dist for r in shortest_paths(e, seeds).collect()}
    assert d2[30] == 11


def test_shortest_paths_multi_seed_and_unreachable(spark):
    from csvweb_spark.operators.graph import shortest_paths
    e = spark.createDataFrame([(1, 2, 7), (2, 3, 7), (10, 11, 1)],
                              "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,), (10,)], "node long")
    d = {r.node: r.dist
         for r in shortest_paths(e, seeds, weight="w").collect()}
    # directed: node 3 via 1, node 11 via 10; unreachable nodes absent
    assert d == {1: 0, 2: 7, 3: 14, 10: 0, 11: 1}
    # negative weights rejected when validation is on
    bad = spark.createDataFrame([(1, 2, -1)], "src long, dst long, w long")
    with pytest.raises(ValueError, match="negative"):
        shortest_paths(bad, seeds, weight="w")


def test_chunk_documents_windows(spark):
    from csvweb_spark.operators.text import chunk_documents
    rows = [(1, "a b c d e f g"),     # 7 tokens, window 3 stride 2
            (2, "  x   y\n z  "),     # messy whitespace -> 3 tokens
            (3, ""), (4, "   "),      # no tokens -> no chunks
            (5, "t1 t2 t3")]          # exactly one window
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 chunk_documents(df, window=3, stride=2).collect())
    assert got == sorted([
        (1, 0, 3, "a b c"), (1, 1, 3, "c d e"), (1, 2, 3, "e f g"),
        (2, 0, 3, "x y z"), (5, 0, 3, "t1 t2 t3")])
    # default stride = window (no overlap), short tail window kept
    got2 = sorted(tuple(r) for r in chunk_documents(
        df.filter(F.col("doc_id") == 1), window=4).collect())
    assert got2 == [(1, 0, 4, "a b c d"), (1, 1, 3, "e f g")]
    with pytest.raises(ValueError, match=">= 1"):
        chunk_documents(df, window=0)
    # stride > window would leave tokens uncovered (and used to emit a
    # bogus empty trailing chunk - round-4 advice): refuse it
    with pytest.raises(ValueError, match="uncovered"):
        chunk_documents(df, window=2, stride=100)


def test_describe_nodes_bounded(spark):
    from csvweb_spark.operators.bgp import describe_nodes
    t = spark.createDataFrame(
        [("e:a", "p:x", "e:b", "iri"),
         ("e:b", "p:y", "lit e:a", "literal"),  # literal mention: no link
         ("e:c", "p:z", "e:a", "iri"),
         ("e:d", "p:w", "e:e", "iri")],
        "subj string, pred string, obj string, obj_kind string")
    nodes = spark.createDataFrame([("e:a",)], "node string")
    got = sorted(tuple(r) for r in describe_nodes(t, nodes).collect())
    assert got == sorted([("e:a", "p:x", "e:b", "iri"),
                          ("e:c", "p:z", "e:a", "iri")])
    assert describe_nodes(t, nodes, include_inbound=False).count() == 1


def test_incremental_components_merges_and_relabels(spark):
    from csvweb_spark.operators.canonicalize import (
        connected_components, incremental_components)
    batch1 = _edges(spark, [(1, 2), (5, 6), (10, 11)])
    labels1 = connected_components(batch1)
    got1 = {r.node: r.component for r in labels1.collect()}
    assert got1 == {1: 1, 2: 1, 5: 5, 6: 5, 10: 10, 11: 10}
    # batch 2: merge {1,2} with {5,6} via 2-5; fresh pair {8,9};
    # component {10,11} untouched -> absent from the delta
    batch2 = _edges(spark, [(2, 5), (8, 9)])
    delta = incremental_components(batch2, labels1)
    got2 = {r.node: r.component for r in delta.collect()}
    assert got2 == {1: 1, 2: 1, 5: 1, 6: 1, 8: 8, 9: 8}
    # relabeled audit: rows whose label changed vs the committed table
    relabeled = {r.node for r in
                 delta.join(labels1, ["node", "component"],
                            "left_anti").collect()}
    assert relabeled == {5, 6, 8, 9}
    # equivalence: committed-minus-touched + delta == full-graph CC
    full = {r.node: r.component for r in connected_components(
        batch1.unionByName(batch2)).collect()}
    merged = dict(got1)
    merged.update(got2)
    assert merged == full


def test_incremental_components_new_smaller_id_wins(spark):
    from csvweb_spark.operators.canonicalize import (
        connected_components, incremental_components)
    labels1 = connected_components(_edges(spark, [(7, 8)]))
    # a NEW node with a smaller id joins: the whole component relabels
    delta = incremental_components(_edges(spark, [(3, 8)]), labels1)
    assert {r.node: r.component for r in delta.collect()} == \
        {3: 3, 7: 3, 8: 3}
    # an intra-component edge is a no-op relabel (delta keeps the label)
    delta2 = incremental_components(_edges(spark, [(7, 8)]), labels1)
    assert {r.node: r.component for r in delta2.collect()} == {7: 7, 8: 7}


def test_label_propagation_two_triangles(spark):
    """Two triangles bridged by one edge: LPA (deterministic variant -
    mode with min-label ties) separates them into two communities by
    round 2, hand-traced: l2 = {1,2,3 -> 1; 10 -> 10; 11,12 -> 3}."""
    from csvweb_spark.operators.graph import label_propagation
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        "src long, dst long")
    got = {r.node: r.label
           for r in label_propagation(edges, rounds=2).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 3, 12: 3}
    # rounds=0 is the identity labeling over the node set
    got0 = {r.node: r.label
            for r in label_propagation(edges, rounds=0).collect()}
    assert got0 == {n: n for n in (1, 2, 3, 10, 11, 12)}


def test_cooccurrence_projection_cap_and_audit(spark):
    from csvweb_spark.operators.graph import cooccurrence_projection
    edges = spark.createDataFrame(
        [(1, "o1"), (2, "o1"), (3, "o1"), (1, "o2"), (2, "o2"),
         (2, "o2")]  # duplicate edge: set semantics
        + [(k, "hub") for k in range(1, 11)],
        "src long, dst string")
    pairs, dropped = cooccurrence_projection(
        edges, max_fanout=5, return_dropped=True)
    got = {(r.node_a, r.node_b): r.n_shared for r in pairs.collect()}
    # hub (fanout 10) is census-capped out; o1/o2 pairs survive
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    assert [(r.d, r.fanout) for r in dropped.collect()] == [("hub", 10)]
    # min_shared prunes the weak pairs
    strong = cooccurrence_projection(edges, max_fanout=5, min_shared=2)
    assert [(r.node_a, r.node_b, r.n_shared)
            for r in strong.collect()] == [(1, 2, 2)]
    # no cap: audit side is an EMPTY DataFrame, never None (the
    # dedup_simhash ADVICE contract)
    _, nodrop = cooccurrence_projection(edges, return_dropped=True)
    assert nodrop.count() == 0 and "fanout" in nodrop.columns


def test_snapshot_asof_latest_per_key(spark):
    from datetime import datetime

    from csvweb_spark.operators.asof import snapshot_asof
    rows = [
        ("s1", "p", 10, datetime(2024, 1, 1)),
        ("s1", "p", 20, datetime(2024, 1, 10)),
        ("s1", "p", 99, datetime(2024, 2, 1)),   # after the cutoff
        ("s2", "p", 1, datetime(2024, 1, 5)),
        ("s2", "p", 7, datetime(2024, 1, 5)),    # ts tie -> max obj
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj long, warc_ts timestamp")
    got = {(r.subj, r.pred): (r.obj, r.warc_ts)
           for r in snapshot_asof(df, "2024-01-15 00:00:00").collect()}
    assert got == {
        ("s1", "p"): (20, datetime(2024, 1, 10)),
        ("s2", "p"): (7, datetime(2024, 1, 5)),
    }


def test_rdfs_closure_incremental_equals_batch(spark):
    """Linearity of the instance rules: per-batch incremental closure
    plus anti-join reproduces the batch closure of the full store, and
    schema axioms in a delta are rejected."""
    from csvweb_spark.operators.entail import (
        RDF_TYPE, RDFS_DOMAIN, RDFS_SUBCLASS, RDFS_SUBPROP,
        rdfs_closure, rdfs_closure_incremental)
    EX = "http://ex.org/"
    schema = spark.createDataFrame([
        (EX + "hasPet", RDFS_SUBPROP, EX + "keeps"),
        (EX + "keeps", RDFS_DOMAIN, EX + "Keeper"),
        (EX + "Keeper", RDFS_SUBCLASS, EX + "Agent"),
    ], "subj string, pred string, obj string")
    b1 = spark.createDataFrame([
        (EX + "a", EX + "hasPet", EX + "cat"),
    ], "subj string, pred string, obj string")
    b2 = spark.createDataFrame([
        (EX + "b", EX + "keeps", EX + "dog"),
        (EX + "a", EX + "hasPet", EX + "cat"),   # redelivered duplicate
    ], "subj string, pred string, obj string")

    state = rdfs_closure(schema.unionByName(b1))
    inc = rdfs_closure_incremental(b2, state, schema)
    merged = {tuple(r) for r in state.collect()} | \
        {tuple(r) for r in inc.collect()}
    batch = {tuple(r) for r in
             rdfs_closure(schema.unionByName(b1).unionByName(b2))
             .collect()}
    assert merged == batch
    # the duplicate contributed nothing; b's facts did
    assert (EX + "b", RDF_TYPE, EX + "Agent") in {
        tuple(r) for r in inc.collect()}
    got = {tuple(r) for r in inc.collect()}
    assert (EX + "a", EX + "hasPet", EX + "cat") not in got

    import pytest as _pytest
    with _pytest.raises(ValueError, match="schema triple"):
        rdfs_closure_incremental(
            spark.createDataFrame(
                [(EX + "X", RDFS_SUBCLASS, EX + "Y")],
                "subj string, pred string, obj string"),
            state, schema)


def test_transitive_closure_incremental(spark):
    """Semi-naive incremental reachability: new edges must compose with
    the CLOSED history on both sides and with each other (a path
    alternating old and new edges), and the result must equal
    closure(all) minus closure(old)."""
    from csvweb_spark.operators.entail import (
        transitive_closure, transitive_closure_incremental)

    def pairs(rows):
        return spark.createDataFrame(rows, "src long, dst long")

    # history: chain 1 -> 2 (closed); batch: 0 -> 1 and 2 -> 3, so the
    # path 0 -> 3 uses new, old, new edges in alternation
    closed = transitive_closure(pairs([(1, 2)]))
    delta = pairs([(0, 1), (2, 3)])
    inc = {(r.src, r.dst) for r in
           transitive_closure_incremental(delta, closed).collect()}
    full = {(r.src, r.dst) for r in
            transitive_closure(pairs([(1, 2), (0, 1), (2, 3)])).collect()}
    old = {(r.src, r.dst) for r in closed.collect()}
    assert inc == full - old
    assert (0, 3) in inc and (0, 2) in inc and (1, 3) in inc
    # empty delta adds nothing
    assert transitive_closure_incremental(
        pairs([]), closed).count() == 0
    # randomized cross-check: split a small random edge set in two
    import random
    rnd = random.Random(7)
    edges = list({(rnd.randrange(8), rnd.randrange(8)) for _ in range(14)})
    half = len(edges) // 2
    closed2 = transitive_closure(pairs(edges[:half]))
    inc2 = {(r.src, r.dst) for r in transitive_closure_incremental(
        pairs(edges[half:]), closed2).collect()}
    full2 = {(r.src, r.dst) for r in
             transitive_closure(pairs(edges)).collect()}
    old2 = {(r.src, r.dst) for r in closed2.collect()}
    assert inc2 == full2 - old2


def test_owl_property_closure_incremental(spark):
    """Incremental OWL property closure == batch closure difference,
    across symmetric + inverse + transitive interaction and old/new
    edge alternation in the transitive chain."""
    from csvweb_spark.operators.entail import (
        owl_property_closure, owl_property_closure_incremental)
    EX = "http://ex.org/"
    anc, desc, knows = EX + "anc", EX + "desc", EX + "knows"
    cfg = dict(symmetric=(knows,), inverse={anc: desc},
               transitive=(anc, desc))

    def t(rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string")

    b1 = t([("a", anc, "b"), ("x", knows, "y")])
    b2 = t([("b", anc, "c"),           # extends the committed chain
            ("p", desc, "a"),          # inverse: a anc p, alternates
            ("y", knows, "z")])
    committed = owl_property_closure(b1, **cfg)
    inc = owl_property_closure_incremental(b2, committed, **cfg)
    merged = {tuple(r) for r in committed.collect()} | \
        {tuple(r) for r in inc.collect()}
    full = {tuple(r) for r in
            owl_property_closure(b1.unionByName(b2), **cfg).collect()}
    assert merged == full
    got = {tuple(r) for r in inc.collect()}
    # the alternating path a->b (old) ->c (new) and its inverse
    assert ("a", anc, "c") in got and ("c", desc, "a") in got
    # inverse emission: the new (p desc a) asserts (a anc p) both ways
    assert ("a", anc, "p") in got and ("p", desc, "a") in got
    assert ("z", knows, "y") in got
    # nothing already committed reappears
    assert not (got & {tuple(r) for r in committed.collect()})


def test_match_bgp_graph_scoping(spark):
    from csvweb_spark.operators.bgp import match_bgp_graph
    quads = spark.createDataFrame([
        ("g1", "a", "p", "x"), ("g1", "a", "q", "y"),
        ("g2", "a", "p", "x2"), ("g2", "b", "q", "y2"),
        ("g2", "b", "p", "x3"),
    ], "graph string, subj string, pred string, obj string")
    pats = [("?s", "p", "?v"), ("?s", "q", "?w")]
    # variable graph: both patterns co-scope per graph and ?g binds
    got = {(r.g, r.s, r.v, r.w)
           for r in match_bgp_graph(quads, "?g", pats).collect()}
    assert got == {("g1", "a", "x", "y"), ("g2", "b", "x3", "y2")}
    # constant graph: plain scoped BGP, no graph column
    got1 = {(r.s, r.v, r.w)
            for r in match_bgp_graph(quads, "g1", pats).collect()}
    assert got1 == {("a", "x", "y")}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="property paths"):
        match_bgp_graph(quads, "?g", [("?s", ("plus", "p"), "?v")])


def test_rdfs_subproperty_of_type_feeds_rdfs9(spark):
    """REGRESSION (round-4 review): a property declared subPropertyOf
    rdf:type emits type triples through rdfs7; those must feed rdfs9
    (the subclass lift) - the one-pass stratification is complete only
    with the rdfs7 output in the type base."""
    from csvweb_spark.operators.entail import rdfs_closure
    EX = "http://ex.org/"
    triples = _t(spark, [
        (EX + "isA", RDFS_SUBPROP, RDF_TYPE),
        (EX + "A", RDFS_SUBCLASS, EX + "B"),
        (EX + "x", EX + "isA", EX + "A"),
    ])
    got = {tuple(r) for r in
           rdfs_closure(triples, derived_only=True).collect()}
    assert (EX + "x", RDF_TYPE, EX + "A") in got   # rdfs7
    assert (EX + "x", RDF_TYPE, EX + "B") in got   # rdfs9 on derived


# ------------------------------------------------------------------- HITS

def test_hits_hub_authority_ordering(spark):
    from csvweb_spark.operators.graph import hits
    S = 1_000_000
    edges = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (1, 8)], "src long, dst long")
    out = {r.node: (r.hub, r.authority)
           for r in hits(edges, iterations=1).collect()}
    # node 9: pointed at by all three hubs -> top authority (== scale)
    assert out[9] == (0, S)
    # node 8: one in-edge of three -> a third of the max, integer div
    assert out[8] == (0, S // 3)
    # node 1 points at BOTH authorities -> top hub (== scale)
    assert out[1][0] == S and out[1][1] == 0
    # nodes 2 and 3 tie below node 1: raw S*S vs max (S + S//3)
    expect = S * S // (S + S // 3)
    assert out[2][0] == out[3][0] == expect < S


def test_hits_deterministic_and_integer(spark):
    from csvweb_spark.operators.graph import hits
    edges = spark.createDataFrame(
        [(i % 7, (i * 3) % 11) for i in range(40)], "src long, dst long")
    a = sorted(map(tuple, hits(edges, iterations=3).collect()))
    b = sorted(map(tuple, hits(edges, iterations=3).collect()))
    assert a == b
    assert all(isinstance(h, int) and isinstance(au, int)
               for _, h, au in a)


def test_hits_round_plan_partial_aggregates(spark):
    # the per-round sums must map-side combine; checkpointing hides the
    # round plan from the final DF, so pin the round's own shape (the
    # exact pattern hits() builds: edge join -> groupBy sum)
    from pyspark.sql import functions as F
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    hubs = edges.select(F.col("src").alias("s")).distinct() \
        .withColumn("hub", F.lit(1_000_000).cast("long"))
    a_raw = (edges.withColumnRenamed("src", "s").join(hubs, "s")
             .groupBy(F.col("dst").alias("node"))
             .agg(F.sum("hub").alias("raw")))
    plan = a_raw._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
    from csvweb_spark.operators.graph import hits
    final = hits(edges, iterations=1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final


# ----------------------------------------- personalized pagerank

def test_personalized_pagerank_teleports_to_seeds(spark):
    from csvweb_spark.operators.graph import pagerank, personalized_pagerank
    S = 1_000_000
    # two disconnected chains: 1->2->3 and 10->11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.rank for r in
           personalized_pagerank(edges, seeds, iterations=2).collect()}
    # the other component gets exactly zero mass -> pruned
    assert 10 not in out and 11 not in out
    base = (S * 1500) // 10_000
    # hand-replay: r0 = (S,0,0); r1 = (base + .85*S? no: damping on sums)
    r1 = {1: base, 2: (8500 * S) // 10_000, 3: 0}
    r2 = {1: base, 2: (8500 * base) // 10_000,
          3: (8500 * r1[2]) // 10_000}
    assert out == {n: v for n, v in r2.items() if v > 0}
    # global pagerank by contrast gives every node base mass
    g = {r.node: r.rank for r in pagerank(edges, iterations=2).collect()}
    assert g[10] >= base and g[11] >= base


def test_personalized_pagerank_deterministic(spark):
    from csvweb_spark.operators.graph import personalized_pagerank
    edges = spark.createDataFrame(
        [(i % 9, (i * 5) % 11) for i in range(50)], "src long, dst long")
    seeds = spark.createDataFrame([(0,), (3,)], "node long")
    a = sorted(map(tuple, personalized_pagerank(
        edges, seeds, iterations=3).collect()))
    b = sorted(map(tuple, personalized_pagerank(
        edges, seeds, iterations=3).collect()))
    assert a == b and all(isinstance(r, int) for _, r in a)


# ------------------------------------------------------------ k-core

def test_kcore_peels_to_the_clique(spark):
    from csvweb_spark.operators.graph import kcore
    # K4 on {1..4} + a pendant chain 4-10-11 that peels away
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = spark.createDataFrame(k4 + [(4, 10), (10, 11)],
                                  "src long, dst long")
    core3 = {r.node: r.deg for r in kcore(edges, k=3).collect()}
    assert core3 == {1: 3, 2: 3, 3: 3, 4: 3}  # within-core degrees
    core2 = {r.node for r in kcore(edges, k=2).collect()}
    assert core2 == {1, 2, 3, 4}  # the chain is degree-1 after peeling
    assert kcore(edges, k=4).count() == 0
    # k=1 keeps everything with an edge
    assert {r.node for r in kcore(edges, k=1).collect()} == \
        {1, 2, 3, 4, 10, 11}


def test_kcore_cascading_peel(spark):
    from csvweb_spark.operators.graph import kcore
    # path 1-2-3-4-5: every round peels the current endpoints; the
    # 2-core is empty but only after CASCADED rounds (not one pass)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long")
    assert kcore(edges, k=2).count() == 0
    # cycle 1-2-3-1 is its own 2-core
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)],
                                "src long, dst long")
    assert {r.node: r.deg for r in kcore(cyc, k=2).collect()} == \
        {1: 2, 2: 2, 3: 2}


# ----------------------------------------------------------------- SCC


def _brute_scc(pairs):
    """Reference SCC labels by brute-force transitive closure."""
    nodes = {n for e in pairs for n in e}
    reach = {n: {n} for n in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in pairs:
            new = reach[b] - reach[a]
            if new:
                reach[a] |= new
                changed = True
    return {n: min(m for m in nodes if n in reach[m] and m in reach[n])
            for n in nodes}


def _scc(spark, pairs, **kw):
    from csvweb_spark.operators.graph import strongly_connected_components
    out = strongly_connected_components(
        spark.createDataFrame(pairs, "src long, dst long"), **kw)
    return {r.node: r.scc for r in out.collect()}


def test_scc_cycles_and_dag(spark):
    # two 3-cycles bridged by a DAG edge + a tail; a 2-cycle island
    e = [(1, 2), (2, 3), (3, 1),           # SCC {1,2,3}
         (3, 10), (10, 11), (11, 12), (12, 10),  # SCC {10,11,12}
         (12, 20), (20, 21),               # tail singletons
         (30, 31), (31, 30)]               # SCC {30,31}
    assert _scc(spark, e) == _brute_scc(e)


def test_scc_chained_minimal_components_need_outer_rounds(spark):
    # cycle {1,2} -> cycle {5,6} -> cycle {8,9}: every component's color
    # collapses to 1, so one component harvests per outer pass
    e = [(1, 2), (2, 1), (2, 5), (5, 6), (6, 5), (6, 8), (8, 9), (9, 8)]
    assert _scc(spark, e, max_outer=3) == _brute_scc(e)
    with pytest.raises(ValueError, match="max_outer"):
        _scc(spark, e, max_outer=2, trim_rounds=0)


def test_scc_self_loops_and_duplicates(spark):
    e = [(1, 1), (1, 2), (1, 2), (2, 3), (3, 2)]
    assert _scc(spark, e) == _brute_scc(e)


def test_scc_trim_only_graph(spark):
    # pure DAG: everything trims to singletons, no fixpoint work needed
    e = [(1, 2), (2, 3), (2, 4), (4, 5)]
    assert _scc(spark, e, trim_rounds=5) == _brute_scc(e)


# ----------------------------------------------------------------- kg_diff


def test_kg_diff_set_semantics_and_stats(spark):
    from csvweb_spark.operators.asof import kg_diff, kg_diff_stats
    cols = "subj string, pred string, obj string"
    old = spark.createDataFrame(
        [("s1", "p", "a"), ("s1", "p", "a"),   # provenance duplicate
         ("s2", "p", "b"), ("s3", "q", "c")], cols)
    new = spark.createDataFrame(
        [("s1", "p", "a"), ("s2", "p", "B2"), ("s4", "q", "d")], cols)
    d = kg_diff(old, new, key_cols=("subj", "pred", "obj"))
    got = {(r.subj, r.pred, r.obj, r.change) for r in d.collect()}
    assert got == {("s2", "p", "B2", "added"), ("s4", "q", "d", "added"),
                   ("s2", "p", "b", "removed"),
                   ("s3", "q", "c", "removed")}
    # the duplicated (s1,p,a) must not appear on either side
    stats = {r.pred: (r.n_added, r.n_removed)
             for r in kg_diff_stats(d).collect()}
    assert stats == {"p": (1, 1), "q": (1, 1)}


# ----------------------------------------------------------------- walks


def test_random_walks_deterministic_replay(spark):
    import hashlib
    from csvweb_spark.operators.graph import random_walks
    pairs = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1), (5, 9)]  # 9 = sink
    e = spark.createDataFrame(pairs, "src long, dst long")
    out = random_walks(e, walks_per_node=2, length=3)
    got = {(r.start, r.walk, r.step): r.node for r in out.collect()}

    # python replay with the identical hash rule
    adj = {}
    for a, b in sorted(set(pairs)):
        adj.setdefault(a, []).append(b)
    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    nodes = {n for p in pairs for n in p}
    want = {}
    for s in nodes:
        for w in range(2):
            cur = s
            want[(s, w, 0)] = s
            for t in range(1, 4):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[h60(f"{s}|{w}|{t}|{cur}") % len(nbrs)]
                want[(s, w, t)] = cur
    assert got == want
    # sink 9: both walks stop at step 1
    assert (9, 0, 1) not in got and (9, 1, 1) not in got
    assert got[(5, 0, 1)] == 9 and (5, 0, 2) not in got


# --------------------------------------------------------------- harmonic


def test_multi_source_distances_and_harmonic(spark):
    from csvweb_spark.operators.graph import (harmonic_centrality,
                                              multi_source_distances)
    # directed path 1->2->3->4 plus shortcut 1->3; island 9
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 3), (9, 8)])
    seeds = spark.createDataFrame([(1,), (2,)], "node long")
    d = {(r.seed, r.node): r.hops
         for r in multi_source_distances(e, seeds, k=3).collect()}
    assert d == {(1, 1): 0, (1, 2): 1, (1, 3): 1, (1, 4): 2,
                 (2, 2): 0, (2, 3): 1, (2, 4): 2}
    h = {r.node: (r.harmonic_ppm, r.n_reached)
         for r in harmonic_centrality(e, seeds, k=3).collect()}
    assert h == {2: (1_000_000, 1),
                 3: (2_000_000, 2),            # 1/1 from both seeds
                 4: (1_000_000, 2)}            # 1/2 + 1/2


# ------------------------------------------------------- table fingerprint


def test_table_fingerprint_invariance_and_sensitivity(spark):
    from csvweb_spark.operators.sketches import table_fingerprint

    def fp(rows, cols=None, n=4):
        df = spark.createDataFrame(rows, "a string, b string")
        return {r.bucket: (r.n_rows, str(r.hash_sum))
                for r in table_fingerprint(df, cols, n_buckets=n)
                .collect()}

    base = [("x", "1"), ("y", None), (None, "y"), ("z", "")]
    assert fp(base) == fp(list(reversed(base)))          # order-invariant
    assert fp(base) != fp(base + [("x", "1")])           # multiplicity
    assert fp([("a", None)]) != fp([(None, "a")])        # null position
    assert fp([("a", None)]) != fp([("a", "")])          # null vs empty
    # mergeability: fingerprint(A u B) = column-wise sum of parts
    a, b = base[:2], base[2:]
    merged = {}
    for part in (fp(a), fp(b)):
        for k, (n, s) in part.items():
            n0, s0 = merged.get(k, (0, 0))
            merged[k] = (n0 + n, int(s0) + int(s))
    assert {k: (n, str(s)) for k, (n, s) in merged.items()} == fp(base)


# ----------------------------------------------------------- neg sampling


def test_negative_triple_samples_replay_and_uniform_machinery(spark):
    import hashlib
    from csvweb_spark.operators.graph import negative_triple_samples
    trips = [(f"e{i}", "p", f"e{(i + 1) % 6}") for i in range(6)]
    t = spark.createDataFrame(
        [(s, p, o, "iri") for s, p, o in trips],
        "subj string, pred string, obj string, obj_kind string")
    out = negative_triple_samples(t, n_per=2, n_buckets=4, seed=7)
    got = {(r.subj, r.pred, r.obj, r.sample_ix, r.corrupted)
           for r in out.collect()}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    pool = sorted({s for s, _, _ in trips} | {o for _, _, o in trips})
    byb = {}
    for n in sorted(pool):
        byb.setdefault(h60(n) % 4, []).append(n)
    flat = []
    for b in sorted(byb):
        flat.extend(sorted(byb[b]))
    want = set()
    for s, p, o in trips:
        for i in range(2):
            key = f"7|{s}|{p}|{o}|{i}"
            repl = flat[h60(key + "|r") % len(flat)]
            corrupt_s = h60(key + "|side") % 2 == 0
            if corrupt_s and repl != s:
                want.add((repl, p, o, i, "s"))
            elif not corrupt_s and repl != o:
                want.add((s, p, repl, i, "o"))
    assert got == want and len(got) > 6


# -------------------------------------------------- condensation/histogram


def test_condensation_dag(spark):
    from csvweb_spark.operators.graph import (
        condensation, strongly_connected_components)
    e = _edges(spark, [(1, 2), (2, 1), (2, 5), (5, 6), (6, 5),
                       (5, 2), (6, 8), (8, 9), (9, 8), (6, 9)])
    # {1,2,5,6} one SCC? 2->5,5->2 merges them: {1,2,5,6}; {8,9}
    scc = strongly_connected_components(e)
    out = {(r.scc_src, r.scc_dst): r.n_edges
           for r in condensation(e, scc).collect()}
    assert out == {(1, 8): 2}          # 6->8 and 6->9 both cross


def test_degree_histogram_buckets(spark):
    from csvweb_spark.operators.graph import degree_histogram
    # star 0-(1..5): center degree 5 (bucket 2), leaves degree 1 (0)
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    out = {r.bucket: (r.n_nodes, r.min_degree, r.max_degree)
           for r in degree_histogram(e).collect()}
    assert out == {0: (5, 1, 1), 2: (1, 5, 5)}


# ----------------------------------------------------------- canonical bnodes


def _quads(spark, url, rows):
    return spark.createDataFrame(
        [(url, s, p, o,
          "iri" if (o.startswith("http") or o.startswith("_:"))
          else "literal", None, None) for s, p, o in rows],
        "url string, subj string, pred string, obj string, "
        "obj_kind string, obj_datatype string, obj_lang string")


def test_canonical_labels_isomorphism_invariant(spark):
    from csvweb_spark.operators.serialize import (
        canonicalize_blank_labels, graph_fingerprints)
    g1 = [("_:x", "ex:name", "alice"), ("_:x", "ex:knows", "_:y"),
          ("_:y", "ex:name", "bob"), ("http://s", "ex:root", "_:x")]
    # same graph, permuted/renamed bnodes, different row order
    g2 = [("_:q9", "ex:name", "bob"), ("http://s", "ex:root", "_:p1"),
          ("_:p1", "ex:knows", "_:q9"), ("_:p1", "ex:name", "alice")]
    f1 = graph_fingerprints(_quads(spark, "u", g1)).collect()[0]
    f2 = graph_fingerprints(_quads(spark, "u", g2)).collect()[0]
    assert f1.graph_md5 == f2.graph_md5 and f1.n_quads == 4
    # a fact change flips the hash
    g3 = [r if r[2] != "bob" else (r[0], r[1], "carol") for r in g2]
    f3 = graph_fingerprints(_quads(spark, "u", g3)).collect()[0]
    assert f3.graph_md5 != f1.graph_md5
    # canonical rows are IDENTICAL, not just same hash
    c1 = {tuple(r) for r in canonicalize_blank_labels(
        _quads(spark, "u", g1)).collect()}
    c2 = {tuple(r) for r in canonicalize_blank_labels(
        _quads(spark, "u", g2)).collect()}
    assert c1 == c2


def test_canonical_labels_automorphic_cycle_and_refinement(spark):
    from csvweb_spark.operators.serialize import graph_fingerprints
    # 4-cycle of indistinguishable bnodes (automorphism orbit):
    # any rotation/renaming fingerprints identically
    def cyc(names):
        return [(names[i], "ex:n", names[(i + 1) % 4])
                for i in range(4)]
    f1 = graph_fingerprints(
        _quads(spark, "u", cyc(["_:a", "_:b", "_:c", "_:d"]))) \
        .collect()[0]
    f2 = graph_fingerprints(
        _quads(spark, "u", cyc(["_:m3", "_:m0", "_:m2", "_:m1"]))) \
        .collect()[0]
    assert f1.graph_md5 == f2.graph_md5
    # refinement case: two bnodes share first-degree shape, differ at
    # distance 2 - the WL round separates them deterministically
    g = [("_:u", "ex:n", "_:m1"), ("_:v", "ex:n", "_:m2"),
         ("_:m1", "ex:name", "one"), ("_:m2", "ex:name", "two")]
    h1 = graph_fingerprints(_quads(spark, "u", g)).collect()[0]
    g_ren = [(s.replace("u", "w"), p, o) for s, p, o in g]
    h2 = graph_fingerprints(_quads(spark, "u", g_ren)).collect()[0]
    assert h1.graph_md5 == h2.graph_md5


# ----------------------------------------------------------------- k-truss


def test_ktruss_clique_survives_triangle_chain_cascades(spark):
    from csvweb_spark.operators.graph import ktruss
    clique = [(a, b) for a in range(1, 6) for b in range(1, 6) if a < b]
    chain = [(10, 11), (10, 12), (11, 12),     # T1
             (11, 13), (12, 13)]               # T2 shares (11,12)
    out = {(r.u, r.v): r.support
           for r in ktruss(spark.createDataFrame(
               clique + chain, "src long, dst long"), k=4).collect()}
    # 5-clique edges all have support 3; the triangle chain cascades
    # away entirely (round 1 peels support-1 edges, round 2 the rest)
    assert out == {(a, b): 3 for a, b in clique}
    # k=3 keeps both triangles of the chain
    out3 = {(r.u, r.v) for r in ktruss(spark.createDataFrame(
        clique + chain, "src long, dst long"), k=3).collect()}
    assert out3 == set(clique) | set(chain)


def test_pagerank_warm_start_continues_iteration(spark):
    """pagerank(G, 2, init_ranks=pagerank(G, 4)) is EXACTLY
    pagerank(G, 6): warm start continues the same integer iteration -
    and nodes absent from the carried table start at scale."""
    from csvweb_spark.operators.graph import pagerank
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)])

    def d(df):
        return {r.node: r.rank for r in df.collect()}

    full = d(pagerank(e, iterations=6))
    warm = d(pagerank(e, iterations=2,
                      init_ranks=pagerank(e, iterations=4)))
    assert warm == full
    # a delta introduces node 5: it seeds at scale, old nodes carry
    e2 = _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (5, 1)])
    out = pagerank(e2, iterations=0, init_ranks=pagerank(e, iterations=4))
    got = d(out)
    assert got[5] == 1_000_000
    assert got[1] == d(pagerank(e, iterations=4))[1]


def test_snapshot_bitemporal_late_arrivals_and_corrections(spark):
    """As-of/as-at semantics: late facts are invisible before their
    transaction lands; a correction (same valid ts, later tx)
    supersedes; snapshot_asof-equivalent once everything is known."""
    from datetime import datetime

    from csvweb_spark.operators.asof import snapshot_bitemporal
    d = lambda n: datetime(2024, 1, n)
    rows = [("A", d(1), d(1), 10),   # on-time fact
            ("A", d(2), d(4), 20),   # arrives 2 days late
            ("A", d(2), d(5), 21)]   # correction of the same valid ts
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, tx_ts timestamp, v long")

    def read(valid, known):
        out = snapshot_bitemporal(df, d(valid), d(known), ts_col="ts",
                                  key_cols=("k",), val_cols=("v",))
        return {r.k: r.v for r in out.collect()}

    assert read(3, 2) == {"A": 10}   # late fact not yet known
    assert read(3, 4) == {"A": 20}   # now known, latest valid wins
    assert read(3, 5) == {"A": 21}   # correction supersedes by tx
    assert read(1, 5) == {"A": 10}   # valid axis still cuts at day 1
