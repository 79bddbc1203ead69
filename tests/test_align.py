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
    out, dropped = align_entities(kg1, kg2, max_key_pairs=1,
                                  return_dropped=True)
    assert out.count() == 0
    # the cut is audited, not silent: the excluded key with its census
    assert [(r.p, r.o, r.n1, r.n2) for r in dropped.collect()] == \
        [("t", "x", 1, 2)]


def test_align_min_shared_and_mutual_only(spark):
    from csvweb_spark.operators.align import align_entities
    out = align_entities(_kg1(spark), _kg2(spark), min_shared=2).collect()
    assert [(r.e1, r.e2) for r in out] == [("P1", "Q1")]
    both = align_entities(_kg1(spark), _kg2(spark), mutual_only=True)
    assert {(r.e1, r.e2) for r in both.collect()} == \
        {("P1", "Q1"), ("P2", "Q2")}


# ------------------------------------------------------- align_predicates


def test_pred_align_equiv_and_partial(spark):
    from csvweb_spark.operators.align import align_predicates
    kg1 = _t(spark, [
        ("P1", "n1", "alice"), ("P1", "c1", "nyc"),
        ("P2", "n1", "bob"), ("P2", "c1", "la"),
    ])
    kg2 = _t(spark, [
        ("Q1", "n2", "alice"), ("Q1", "c2", "nyc"),
        ("Q2", "n2", "bob"), ("Q2", "c2", "sf"),
    ])
    matches = spark.createDataFrame(
        [("P1", "Q1"), ("P2", "Q2")], "e1 string, e2 string")
    out = {(r.p1, r.p2): r
           for r in align_predicates(kg1, kg2, matches).collect()}
    n = out[("n1", "n2")]
    # both names agree: 2/2 each direction, Jaccard 2/(2+2-2) = 1
    assert (n.n_agree, n.n1, n.n2) == (2, 2, 2)
    assert n.sub12_ppm == 1000000 and n.equiv_ppm == 1000000
    c = out[("c1", "c2")]
    # nyc agrees, la/sf don't: 1/2, Jaccard 1/3
    assert (c.n_agree, c.sub12_ppm, c.sub21_ppm, c.equiv_ppm) == \
        (1, 500000, 500000, 333333)
    assert set(out) == {("n1", "n2"), ("c1", "c2")}


def test_pred_align_asymmetric_subsumption(spark):
    from csvweb_spark.operators.align import align_predicates
    kg1 = _t(spark, [("P1", "capital", "paris")])
    kg2 = _t(spark, [("Q1", "city", "paris"), ("Q1", "city", "lyon"),
                     ("Q1", "city", "lyon")])  # dup: RDF set semantics
    matches = spark.createDataFrame([("P1", "Q1")], "e1 string, e2 string")
    r = align_predicates(kg1, kg2, matches).collect()[0]
    # capital => city is total (1/1) but city => capital is half (1/2)
    assert (r.sub12_ppm, r.sub21_ppm, r.equiv_ppm) == \
        (1000000, 500000, 500000)


def test_pred_align_ignores_unmatched_entities(spark):
    from csvweb_spark.operators.align import align_predicates
    kg1 = _t(spark, [("P1", "p", "v"), ("PX", "p", "w")])
    kg2 = _t(spark, [("Q1", "q", "v"), ("QX", "q", "w")])
    matches = spark.createDataFrame([("P1", "Q1")], "e1 string, e2 string")
    r = align_predicates(kg1, kg2, matches).collect()[0]
    # PX/QX agree on w but are unmatched: excluded from counts entirely
    assert (r.n_agree, r.n1, r.n2) == (1, 1, 1)


# ----------------------------------------------------------- assortativity


def test_assortativity_path_is_minus_one(spark):
    from csvweb_spark.operators.graph import assortativity
    r = assortativity(_e(spark, [("a", "b"), ("b", "c")])).collect()[0]
    # path of 3: S_j=6 S_jk=8 S_jj=10 over 4 incidences -> -4/4 = -1
    assert r.m == 2
    assert (int(r.r_num), int(r.r_den)) == (-4, 4)
    assert r.r_float == -1.0


def test_assortativity_triangle_plus_pendant(spark):
    from csvweb_spark.operators.graph import assortativity
    e = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("c", "d")]
    r = assortativity(_e(spark, e)).collect()[0]
    # degrees a=2 b=2 c=3 d=1: S_j=18 S_jk=38 S_jj=44, m2=8
    # r_num = 8*38-324 = -20, r_den = 8*44-324 = 28 -> r = -5/7
    assert r.m == 4
    assert (int(r.r_num), int(r.r_den)) == (-20, 28)
    assert abs(r.r_float - (-5 / 7)) < 1e-12


def test_assortativity_regular_graph_undefined(spark):
    from csvweb_spark.operators.graph import assortativity
    e = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]  # 4-cycle
    r = assortativity(_e(spark, e)).collect()[0]
    assert (int(r.r_num), int(r.r_den)) == (0, 0)
    assert r.r_float is None


# ------------------------------------------------- mine_predicate_rules


def test_rule_mining_implies_inverse_symmetric(spark):
    from csvweb_spark.operators.ontology import mine_predicate_rules
    rows = [
        ("a", "cap", "x"), ("b", "cap", "y"),
        ("a", "loc", "x"), ("b", "loc", "y"), ("c", "loc", "y"),
        ("a", "sp", "b"), ("b", "sp", "a"), ("c", "sp", "d"),
        ("x", "in", "a"),
        ("e", "sp", "e"),   # self-loop: counts in n_body, never as evidence
    ]
    out = {(r.rule_type, r.p1, r.p2): r
           for r in mine_predicate_rules(_t(spark, rows)).collect()}
    # cap(x,y) => loc(x,y) on both cap pairs: 2/2; reverse 2/3
    assert out[("implies", "cap", "loc")].conf_ppm == 1000000
    assert out[("implies", "loc", "cap")].conf_ppm == 666666
    # cap(a,x) & in(x,a): inverse 1/2 and 1/1
    assert out[("inverse", "cap", "in")].support == 1
    assert out[("inverse", "cap", "in")].conf_ppm == 500000
    assert out[("inverse", "in", "cap")].conf_ppm == 1000000
    # sp symmetric on the (a,b) pair only: support 2 of n_body 4
    sym = out[("symmetric", "sp", "sp")]
    assert (sym.support, sym.n_body, sym.conf_ppm) == (2, 4, 500000)
    # the self-loop never fabricates a symmetric witness
    assert all(k != ("symmetric", "in", "in") for k in out)


def test_rule_mining_thresholds(spark):
    from csvweb_spark.operators.ontology import mine_predicate_rules
    rows = [
        ("a", "cap", "x"), ("b", "cap", "y"),
        ("a", "loc", "x"), ("b", "loc", "y"), ("c", "loc", "y"),
    ]
    out = mine_predicate_rules(_t(spark, rows), min_support=2,
                               min_conf_ppm=700000).collect()
    # only cap => loc (support 2, conf 10^6) clears both gates
    assert [(r.rule_type, r.p1, r.p2) for r in out] == \
        [("implies", "cap", "loc")]


# -------------------------------------------------------------- entity_cards


def test_entity_cards_rank_by_rarity(spark):
    from csvweb_spark.operators.retrieval import entity_cards
    rows = [
        ("e1", "type", "T"), ("e2", "type", "T"), ("e3", "type", "T"),
        ("e4", "type", "T"),                       # census(type) = 4
        ("e1", "name", "alice"), ("e2", "name", "bob"),  # census(name) = 2
        ("e1", "ssn", "123"),                      # census(ssn) = 1
        ("e1", "ssn", "123"),                      # dup: RDF set
    ]
    out = {(r.subj, r.rank): r for r in entity_cards(
        spark.createDataFrame(rows, "subj string, pred string, obj string"),
        k=2).collect()}
    # e1: ssn (10^6) beats name (500000) beats type (250000, cut by k)
    assert (out[("e1", 1)].pred, out[("e1", 1)].weight_ppm) == \
        ("ssn", 1000000)
    assert (out[("e1", 2)].pred, out[("e1", 2)].weight_ppm) == \
        ("name", 500000)
    assert ("e1", 3) not in out
    # e3 has only its type fact
    assert (out[("e3", 1)].pred, out[("e3", 1)].weight_ppm) == \
        ("type", 250000)


def test_entity_cards_tie_breaks_lexicographic(spark):
    from csvweb_spark.operators.retrieval import entity_cards
    rows = [("e", "b_pred", "z"), ("e", "a_pred", "y"),
            ("x", "b_pred", "w"), ("x", "a_pred", "v")]
    out = [(r.rank, r.pred) for r in entity_cards(
        spark.createDataFrame(rows, "subj string, pred string, obj string"),
        k=2).collect() if r.subj == "e"]
    # equal weights (census 2 each): pred asc decides
    assert sorted(out) == [(1, "a_pred"), (2, "b_pred")]


def test_entity_cards_plan_partial_window_group_limit(spark):
    """The k-cut must compile with a partial WindowGroupLimit below the
    subject exchange (two WindowGroupLimit nodes: partial + final) so
    each map task forwards at most k facts per subject - the same
    plan-pinned shape as sample_stratified's exact-k."""
    from csvweb_spark.operators.retrieval import entity_cards
    df = spark.createDataFrame(
        [("e", "p", "v"), ("e", "q", "w")],
        "subj string, pred string, obj string")
    plan = entity_cards(df, k=1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2


# --------------------------------------------------- mine_subclass_candidates


def test_subclass_mining_containment_confidence(spark):
    from csvweb_spark.operators.ontology import (RDF_TYPE,
                                                 mine_subclass_candidates)
    T = RDF_TYPE
    rows = [("e1", T, "A"), ("e2", T, "A"), ("e3", T, "A"),
            ("e1", T, "B"), ("e2", T, "B"), ("e3", T, "B"), ("e4", T, "B"),
            ("e9", T, "C"),
            ("e1", T, "A"),              # dup typing: RDF set
            ("e1", "other", "B")]        # non-type triple: ignored
    out = {(r.sub, r.sup): r for r in
           mine_subclass_candidates(_t(spark, rows)).collect()}
    # A (3 instances) fully inside B (4): A=>B 10^6, B=>A 750000
    assert (out[("A", "B")].support, out[("A", "B")].n_sub,
            out[("A", "B")].conf_ppm) == (3, 3, 1000000)
    assert out[("B", "A")].conf_ppm == 750000
    # C shares nothing: no row in either direction, no diagonal rows
    assert set(out) == {("A", "B"), ("B", "A")}


def test_subclass_mining_gates(spark):
    from csvweb_spark.operators.ontology import (RDF_TYPE,
                                                 mine_subclass_candidates)
    T = RDF_TYPE
    rows = [("e1", T, "A"), ("e2", T, "A"),
            ("e1", T, "B"), ("e2", T, "B"), ("e3", T, "B")]
    out = mine_subclass_candidates(_t(spark, rows), min_support=2,
                                   min_conf_ppm=900000).collect()
    assert [(r.sub, r.sup) for r in out] == [("A", "B")]


def test_align_ontology_family_pure_python_brute_force(spark):
    """Randomized (fixed-seed) brute-force check of the alignment /
    ontology family against independent pure-Python implementations of
    the documented semantics: align_entities (weights, census cap,
    election, mutual flag), predicate_functionality, and
    mine_subclass_candidates - exact integer equality throughout."""
    import random
    from collections import defaultdict

    from csvweb_spark.operators.align import align_entities
    from csvweb_spark.operators.ontology import (
        RDF_TYPE, mine_subclass_candidates, predicate_functionality)

    rng = random.Random(20260819)
    preds = [f"p{i}" for i in range(4)]
    vals = [f"v{i}" for i in range(12)]

    def kg(prefix, n):
        rows = {(f"{prefix}{rng.randrange(n)}", rng.choice(preds),
                 rng.choice(vals)) for _ in range(120)}
        return sorted(rows)

    k1, k2 = kg("A", 25), kg("B", 25)
    df1 = _t(spark, k1)
    df2 = _t(spark, k2)

    # --- align_entities (cap small enough to actually bite)
    cap = 9
    c1, c2 = defaultdict(int), defaultdict(int)
    for e, p, o in k1:
        c1[(p, o)] += 1
    for e, p, o in k2:
        c2[(p, o)] += 1
    w = {k: 1_000_000 // (c1[k] * c2[k]) for k in c1
         if k in c2 and c1[k] * c2[k] <= cap}
    cand = defaultdict(lambda: [0, 0])
    for e1, p, o in k1:
        if (p, o) not in w:
            continue
        for e2, q, u in k2:
            if (q, u) == (p, o):
                cand[(e1, e2)][0] += 1
                cand[(e1, e2)][1] += w[(p, o)]
    best1, best2 = {}, {}
    for (e1, e2), (ns, sc) in cand.items():
        if e1 not in best1 or (-sc, e2) < best1[e1][0]:
            best1[e1] = ((-sc, e2), ns, sc)
        if e2 not in best2 or (-sc, e1) < best2[e2][0]:
            best2[e2] = ((-sc, e1), ns, sc)
    want = {}
    for e1, ((negsc, e2), ns, sc) in best1.items():
        mutual = best2[e2][0][1] == e1
        want[e1] = (e2, ns, sc, mutual)
    got = {r.e1: (r.e2, r.n_shared, r.score_ppm, r.mutual)
           for r in align_entities(df1, df2, max_key_pairs=cap).collect()}
    assert got == want

    # --- predicate_functionality on side 1
    per_pred = defaultdict(list)
    for e, p, o in k1:
        per_pred[p].append((e, o))
    want_fun = {}
    for p, pairs in per_pred.items():
        n = len(pairs)
        ns = len({e for e, _ in pairs})
        no = len({o for _, o in pairs})
        want_fun[p] = (n, ns, no, 1_000_000 * ns // n, 1_000_000 * no // n)
    got_fun = {r.pred: (r.n_pairs, r.n_subjects, r.n_objects,
                        r.fun_ppm, r.inv_fun_ppm)
               for r in predicate_functionality(df1).collect()}
    assert got_fun == want_fun

    # --- mine_subclass_candidates over random multi-typing
    trows = sorted({(f"E{rng.randrange(30)}", RDF_TYPE,
                     f"K{rng.randrange(5)}") for _ in range(80)})
    inst = defaultdict(set)
    for e, _, c in trows:
        inst[c].add(e)
    want_sub = {}
    for a in inst:
        for b in inst:
            if a == b:
                continue
            s = len(inst[a] & inst[b])
            if s:
                want_sub[(a, b)] = (s, len(inst[a]),
                                    1_000_000 * s // len(inst[a]))
    got_sub = {(r.sub, r.sup): (r.support, r.n_sub, r.conf_ppm)
               for r in mine_subclass_candidates(_t(spark, trows)).collect()}
    assert got_sub == want_sub
