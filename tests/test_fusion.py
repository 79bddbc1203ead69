"""Round-5 closing operators: knowledge fusion, ontology induction,
RA link prediction, modularity. Every expected value below is
hand-computed in the comments."""

from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ------------------------------------------------------------- fuse_triples


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, source string")


def test_fuse_weighted_vote_and_distinct_sources(spark):
    from csvweb_spark.operators.fusion import fuse_triples
    rows = [
        ("s1", "p", "A", "x"),
        ("s1", "p", "A", "x"),   # same source repeating: counts once
        ("s1", "p", "A", "y"),
        ("s1", "p", "B", "z"),
    ]
    weights = spark.createDataFrame(
        [("x", 5), ("y", 1), ("z", 10)], "source string, weight long")
    out = {(r.subj, r.pred): r
           for r in fuse_triples(_triples(spark, rows), weights).collect()}
    r = out[("s1", "p")]
    # support(A) = 5 + 1 = 6 (x dedup'd), support(B) = 10 -> B wins
    assert r.obj == "B"
    assert r.support == 10 and r.n_sources == 1
    assert r.n_objects == 2 and r.total_support == 16
    assert r.conflict is True


def test_fuse_tie_breaks_min_object_and_default_weight(spark):
    from csvweb_spark.operators.fusion import fuse_triples
    rows = [
        ("s2", "p", "B", "x"),   # weight 5
        ("s2", "p", "A", "u"),   # u absent from weights -> default 5
        ("s3", "q", "C", "u"),   # unweighted, unconflicted
    ]
    weights = spark.createDataFrame([("x", 5)], "source string, weight long")
    out = {(r.subj, r.pred): r
           for r in fuse_triples(_triples(spark, rows), weights,
                                 default_weight=5).collect()}
    tie = out[("s2", "p")]
    # equal support 5 vs 5 -> lexicographically smaller object wins
    assert tie.obj == "A" and tie.support == 5 and tie.conflict is True
    solo = out[("s3", "q")]
    assert (solo.obj, solo.support, solo.n_objects, solo.conflict) == \
        ("C", 5, 1, False)


def test_fuse_no_weight_table_counts_sources(spark):
    from csvweb_spark.operators.fusion import fuse_triples
    rows = [("s", "p", "A", f"src{i}") for i in range(3)] + \
        [("s", "p", "B", "src9")]
    out = fuse_triples(_triples(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.obj == "A" and r.support == 3 and r.n_sources == 3
    assert r.total_support == 4


# ----------------------------------------------------- induce_domain_range


def test_domain_range_induction(spark):
    from csvweb_spark.operators.ontology import induce_domain_range
    T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [
        ("c1", T, "Customer", "w"), ("c2", T, "Customer", "w"),
        ("s1", T, "Supplier", "w"), ("s1", T, "Preferred", "w"),
        ("n1", T, "Nation", "w"),
        ("c1", "in", "n1", "w"), ("c2", "in", "n1", "w"),
        ("s1", "in", "n1", "w"),
        ("u1", "in", "n1", "w"),  # untyped subject: excluded from domain
    ]
    out = induce_domain_range(_triples(spark, rows).drop("source")
                              .withColumnRenamed("subj", "subj"))
    got = {(r.pred, r.position, r.type): r for r in out.collect()}
    # domain pairs: c1/c2 -> Customer (2), s1 -> Supplier + Preferred
    # (multi-type: one pair each); u1 contributes nothing. total = 4
    d_cust = got[("in", "domain", "Customer")]
    assert (d_cust.support, d_cust.typed_total, d_cust.coverage_ppm) == \
        (2, 4, 500000)
    assert got[("in", "domain", "Supplier")].coverage_ppm == 250000
    assert got[("in", "domain", "Preferred")].coverage_ppm == 250000
    # range: all 4 'in' assertions point at typed n1 -> Nation 4/4
    r_nat = got[("in", "range", "Nation")]
    assert (r_nat.support, r_nat.typed_total, r_nat.coverage_ppm) == \
        (4, 4, 1000000)
    # rdf:type rows themselves are not induced over
    assert not any(p == T for (p, _, _) in got)


def test_domain_range_min_support_keeps_denominator(spark):
    from csvweb_spark.operators.ontology import induce_domain_range
    T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [
        ("c1", T, "Customer", "w"), ("c2", T, "Customer", "w"),
        ("s1", T, "Supplier", "w"), ("n1", T, "Nation", "w"),
        ("c1", "in", "n1", "w"), ("c2", "in", "n1", "w"),
        ("s1", "in", "n1", "w"),
    ]
    out = induce_domain_range(_triples(spark, rows).drop("source"),
                              min_support=2)
    dom = {r.type: r for r in out.collect() if r.position == "domain"}
    # Supplier (support 1) filtered, but the denominator still counts it
    assert list(dom) == ["Customer"]
    assert dom["Customer"].typed_total == 3
    assert dom["Customer"].coverage_ppm == 666666


# ---------------------------------------------------- link_prediction_ra


def test_ra_scores_and_excludes_existing_edges(spark):
    from csvweb_spark.operators.graph import link_prediction_ra
    # degrees: 1:3  2:2  3:3  4:3  5:1
    e = [(1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (3, 4)]
    rows = {(r.node_a, r.node_b): r
            for r in link_prediction_ra(_edges(spark, e)).collect()}
    # (1,2) via centers 3 and 4 (deg 3 each): 2 * (10^6 div 3) = 666666
    assert rows[(1, 2)].common == 2
    assert rows[(1, 2)].score_ppm == 666666
    # (3,5) and (4,5) via center 1 (deg 3)
    assert rows[(3, 5)].score_ppm == 333333
    assert rows[(4, 5)].score_ppm == 333333
    # (3,4) shares {1,2} but IS an edge -> never predicted
    assert set(rows) == {(1, 2), (3, 5), (4, 5)}


def test_ra_top_k_tie_breaks_smaller_node(spark):
    from csvweb_spark.operators.graph import link_prediction_ra
    # star: hub 0 degree 4; every rim pair scores 10^6 div 4 = 250000
    e = [(0, i) for i in range(1, 5)]
    out = link_prediction_ra(_edges(spark, e), top_k=2).collect()
    by_a = {}
    for r in out:
        by_a.setdefault(r.node_a, []).append(r.node_b)
    assert sorted(by_a[1]) == [2, 3]  # tie -> smaller node_b kept
    assert all(len(v) <= 2 for v in by_a.values())


def test_ra_center_cap_drops_hub_wedges(spark):
    from csvweb_spark.operators.graph import link_prediction_ra
    e = [(0, i) for i in range(1, 10)]  # hub degree 9
    full = link_prediction_ra(_edges(spark, e)).count()
    assert full == 36  # C(9,2) rim pairs
    capped = link_prediction_ra(_edges(spark, e), max_center_degree=5)
    assert capped.count() == 0


# ------------------------------------------------------------- modularity


def test_modularity_two_triangles_bridge(spark):
    from csvweb_spark.operators.graph import modularity
    e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    labels = spark.createDataFrame(
        [(0, "A"), (1, "A"), (2, "A"), (3, "B"), (4, "B"), (5, "B")],
        "node long, community string")
    out = {r.community: r
           for r in modularity(_edges(spark, e), labels).collect()}
    # m=7; A: e_c=3, d_c=2+2+3=7 -> 4*7*3 - 49 = 35 over 4*49=196
    for c in ("A", "B"):
        assert out[c].n_nodes == 3
        assert out[c].intra_edges == 3 and out[c].degree_sum == 7
        assert int(out[c].q_num_4m2) == 35
        assert int(out[c].q_den_4m2) == 196
    q = sum(float(r.q_float) for r in out.values())
    assert abs(q - 70 / 196) < 1e-12


def test_modularity_unlabeled_nodes_excluded(spark):
    from csvweb_spark.operators.graph import modularity
    e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    labels = spark.createDataFrame(
        [(0, "A"), (1, "A"), (2, "A"), (3, "B"), (4, "B")],
        "node long, community string")  # node 5 unlabeled
    out = {r.community: r
           for r in modularity(_edges(spark, e), labels).collect()}
    b = out["B"]
    # B keeps only edge (3,4); degrees still from the FULL graph (3,2)
    assert b.n_nodes == 2 and b.intra_edges == 1 and b.degree_sum == 5
    assert int(b.q_num_4m2) == 4 * 7 * 1 - 25
    assert set(out) == {"A", "B"}  # no NULL community row


def test_modularity_empty_graph_raises(spark):
    import pytest
    from csvweb_spark.operators.graph import modularity
    labels = spark.createDataFrame([(0, "A")], "node long, community string")
    with pytest.raises(ValueError):
        modularity(_edges(spark, [(7, 7)]), labels)  # self-loop only


# -------------------------------------------------- fuse_triples_incremental


def test_fuse_incremental_touched_groups_only(spark):
    from csvweb_spark.operators.fusion import (fuse_triples,
                                               fuse_triples_incremental)
    committed = _triples(spark, [
        ("s1", "p", "A", "x"), ("s1", "p", "A", "y"),   # A: support 2
        ("s2", "p", "C", "x"),                           # untouched group
    ])
    batch = _triples(spark, [
        ("s1", "p", "A", "x"),   # cross-batch duplicate: no extra weight
        ("s1", "p", "B", "z"), ("s1", "p", "B", "w"),
        ("s1", "p", "B", "v"),   # B: support 3 -> flips the election
    ])
    out = fuse_triples_incremental(batch, committed).collect()
    # only the touched group (s1, p) is re-elected; (s2, p) is absent
    assert len(out) == 1
    r = out[0]
    assert (r.subj, r.obj, r.support, r.n_objects, r.total_support) == \
        ("s1", "B", 3, 2, 5)
    # exactness: equals the full re-vote restricted to the touched group
    full = {(x.subj, x.pred): x for x in fuse_triples(
        committed.unionByName(batch)).collect()}
    f = full[("s1", "p")]
    assert (f.obj, f.support, f.n_objects, f.total_support) == \
        ("B", 3, 2, 5)


def test_fuse_incremental_all_duplicate_batch_is_empty(spark):
    from csvweb_spark.operators.fusion import fuse_triples_incremental
    committed = _triples(spark, [("s1", "p", "A", "x")])
    batch = _triples(spark, [("s1", "p", "A", "x"),
                             ("s1", "p", "A", "x")])
    assert fuse_triples_incremental(batch, committed).count() == 0


# ------------------------------------------------- neighborhood_function


def _exact_ball_sketch(spark, balls, p):
    """hll_estimate(hll_sketch(exact membership pairs)) - the ground
    truth HyperANF's round-t registers must equal exactly."""
    from csvweb_spark.operators.sketches import hll_estimate, hll_sketch
    pairs = [(node, member) for node, ms in balls.items() for member in ms]
    df = spark.createDataFrame(pairs, "node string, member string")
    return {r.node: (r.n_regs_set, r.n_zero_regs, r.inv_sum_scaled)
            for r in hll_estimate(hll_sketch(df, "member", ["node"], p),
                                  ["node"], p).collect()}


def test_anf_equals_sketch_of_exact_balls(spark):
    from csvweb_spark.operators.graph import neighborhood_function
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")],
        "src string, dst string")
    out = neighborhood_function(e, k=2, p=6)
    rows = {(r.node, r.t): (r.n_regs_set, r.n_zero_regs, r.inv_sum_scaled)
            for r in out.collect()}
    # t=0: every ball is the singleton -> exactly one register set
    for n in "abcdef":
        assert rows[(n, 0)][0] == 1
    balls2 = {"a": "abc", "b": "abcd", "c": "abcd", "d": "bcd",
              "e": "ef", "f": "ef"}
    want = _exact_ball_sketch(spark, {n: list(m) for n, m in balls2.items()},
                              p=6)
    for n in "abcdef":
        assert rows[(n, 2)] == want[n], n


def test_anf_directed_follows_out_edges(spark):
    from csvweb_spark.operators.graph import neighborhood_function
    e = spark.createDataFrame([("a", "b"), ("b", "c")],
                              "src string, dst string")
    out = neighborhood_function(e, k=2, p=6, directed=True)
    rows = {(r.node, r.t): r.n_regs_set for r in out.collect()}
    balls2 = {"a": "abc", "b": "bc", "c": "c"}
    want = _exact_ball_sketch(spark, {n: list(m) for n, m in balls2.items()},
                              p=6)
    for n in "abc":
        assert rows[(n, 2)] == want[n][0], n


# ---------------------------------------------------- bowtie_decomposition


def test_bowtie_all_six_classes(spark):
    from csvweb_spark.operators.graph import (bowtie_decomposition,
                                              strongly_connected_components)
    e = _edges(spark, [
        (0, 1), (1, 2), (2, 0),      # core 3-cycle
        (3, 0), (4, 3),              # IN chain
        (2, 5), (5, 6),              # OUT chain
        (4, 7), (7, 5),              # TUBE: IN -> 7 -> OUT, core bypassed
        (3, 8),                      # tendril hanging off IN
        (9, 5),                      # tendril feeding OUT
        (10, 11),                    # separate weak component
    ])
    scc = strongly_connected_components(e)
    out = {r.node: r.cls for r in bowtie_decomposition(e, scc).collect()}
    want = {0: "core", 1: "core", 2: "core",
            3: "in", 4: "in", 5: "out", 6: "out",
            7: "tube", 8: "tendril", 9: "tendril",
            10: "disconnected", 11: "disconnected"}
    assert out == want


def test_bowtie_no_in_out(spark):
    from csvweb_spark.operators.graph import bowtie_decomposition
    # pure 2-cycle plus an unrelated edge: no IN/OUT/tube/tendril
    e = _edges(spark, [(0, 1), (1, 0), (5, 6)])
    scc = spark.createDataFrame(
        [(0, 0), (1, 0), (5, 5), (6, 6)], "node long, scc long")
    out = {r.node: r.cls for r in bowtie_decomposition(e, scc).collect()}
    assert out == {0: "core", 1: "core",
                   5: "disconnected", 6: "disconnected"}


def test_fuse_matches_pure_python_brute_force(spark):
    """Randomized (fixed-seed) brute-force check: 400 assertions over
    ~40 contended groups, duplicate-heavy, weighted - the Spark
    election must equal an independent pure-Python implementation of
    the documented vote semantics on every group."""
    import random

    from csvweb_spark.operators.fusion import fuse_triples
    rng = random.Random(20260819)
    rows = [(f"s{rng.randrange(40)}", "p", f"o{rng.randrange(5)}",
             f"src{rng.randrange(10)}") for _ in range(400)]
    wt = {f"src{i}": (i % 4) + 1 for i in range(10)}
    weights = spark.createDataFrame(
        sorted(wt.items()), "source string, weight long")

    # pure-Python replay of the documented semantics
    asserted = sorted(set(rows))
    sup, srcs = {}, {}
    for s, p, o, src in asserted:
        sup[(s, p, o)] = sup.get((s, p, o), 0) + wt[src]
        srcs[(s, p, o)] = srcs.get((s, p, o), 0) + 1
    want = {}
    for (s, p, o), w in sup.items():
        g = want.setdefault((s, p), [])
        g.append((-w, o, w, srcs[(s, p, o)]))
    expected = {}
    for (s, p), cands in want.items():
        cands.sort()
        neg, o, w, ns = cands[0]
        expected[(s, p)] = (o, w, ns, len(cands),
                            sum(c[2] for c in cands), len(cands) > 1)

    out = fuse_triples(_triples(spark, rows), weights)
    got = {(r.subj, r.pred): (r.obj, r.support, r.n_sources, r.n_objects,
                              r.total_support, r.conflict)
           for r in out.collect()}
    assert got == expected


def test_graph_ops_match_pure_python_brute_force(spark):
    """Randomized (fixed-seed) brute-force check of the round-5 graph
    trio on one 60-node random graph: RA link prediction, modularity
    and assortativity must match independent pure-Python
    implementations of their documented semantics exactly (integer
    arithmetic everywhere, so equality is exact, not approximate)."""
    import random
    from collections import defaultdict

    from csvweb_spark.operators.graph import (assortativity,
                                              link_prediction_ra,
                                              modularity)
    rng = random.Random(20260819)
    raw = {(rng.randrange(60), rng.randrange(60)) for _ in range(150)}
    edges = [(a, b) for a, b in raw if a != b]
    e_df = spark.createDataFrame(edges, "src long, dst long")
    und = {(min(a, b), max(a, b)) for a, b in edges}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)

    # --- RA link prediction
    want_ra = {}
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) in und:
                continue
            common = nbrs[a] & nbrs[b]
            if common:
                want_ra[(a, b)] = (len(common),
                                   sum(1_000_000 // len(nbrs[z])
                                       for z in common))
    got_ra = {(r.node_a, r.node_b): (r.common, r.score_ppm)
              for r in link_prediction_ra(e_df).collect()}
    assert got_ra == want_ra

    # --- modularity of a blocks-of-20 labeling
    labels = {n: n // 20 for n in nbrs}
    lab_df = spark.createDataFrame(
        [(n, f"c{c}") for n, c in labels.items()],
        "node long, community string")
    m = len(und)
    want_mod = {}
    for c in sorted(set(labels.values())):
        members = [n for n in nbrs if labels[n] == c]
        e_c = sum(1 for a, b in und
                  if labels[a] == c and labels[b] == c)
        d_c = sum(len(nbrs[n]) for n in members)
        want_mod[f"c{c}"] = (len(members), e_c, d_c,
                             4 * m * e_c - d_c * d_c, 4 * m * m)
    got_mod = {r.community: (r.n_nodes, r.intra_edges, r.degree_sum,
                             int(r.q_num_4m2), int(r.q_den_4m2))
               for r in modularity(e_df, lab_df).collect()}
    assert got_mod == want_mod

    # --- assortativity
    s_j = s_jk = s_jj = 0
    for a, b in und:
        for j, k in ((len(nbrs[a]), len(nbrs[b])),
                     (len(nbrs[b]), len(nbrs[a]))):
            s_j += j
            s_jk += j * k
            s_jj += j * j
    m2 = 2 * m
    r = assortativity(e_df).collect()[0]
    assert (r.m, int(r.s_j), int(r.s_jk), int(r.s_jj)) == \
        (m, s_j, s_jk, s_jj)
    assert int(r.r_num) == m2 * s_jk - s_j * s_j
    assert int(r.r_den) == m2 * s_jj - s_j * s_j
