"""SPARQL text front-end (operators/sparql.py): the parser/compiler must
produce exactly what hand-written operator calls produce, reject what it
cannot faithfully run, and round every supported construct through a
real Spark plan."""

import pytest
from pyspark.sql import functions as F

from csvweb_spark.operators.sparql import (SparqlSyntaxError, _parse_query,
                                           sparql_select)

EX = "http://ex.org/"


@pytest.fixture()
def kg(spark):
    rows = []
    for k in range(20):
        rows.append((f"{EX}C{k}", f"{EX}in", f"{EX}N{k % 3}"))
        rows.append((f"{EX}C{k}", f"{EX}age", str(k)))
        if k % 4 == 0:
            rows.append((f"{EX}C{k}", f"{EX}vip", "gold"))
        if k >= 1:
            rows.append((f"{EX}C{k}", f"{EX}next", f"{EX}C{k - 1}"))
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


def test_bgp_filter_order_limit(kg):
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?c ?a WHERE {
        ?c ex:in ex:N0 ; ex:age ?a .
        FILTER (?a >= 6 && ?a < 18)
      } ORDER BY DESC(?a) LIMIT 3
    """)
    # numeric FILTER and (round-5) numeric-aware ORDER: 15 > 12 > 9
    assert [(r.c, r.a) for r in out.collect()] == [
        (f"{EX}C15", "15"), (f"{EX}C12", "12"), (f"{EX}C9", "9")]


def test_optional_bound_not_exists(kg):
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?c WHERE {
        ?c ex:in ?n .
        OPTIONAL { ?c ex:vip ?v }
        FILTER (!BOUND(?v))
        FILTER NOT EXISTS { ?c ex:next ex:C0 }
      }
    """)
    got = sorted(int(r.c.rsplit("C", 1)[1]) for r in out.collect())
    assert got == sorted(k for k in range(20) if k % 4 != 0 and k != 1)


def test_group_by_aggregates(kg):
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?n (COUNT(?c) AS ?cnt) (MAX(?a) AS ?mx) (SUM(?a) AS ?s)
      WHERE { ?c ex:in ?n ; ex:age ?a . }
      GROUP BY ?n ORDER BY ?n
    """)
    rows = [(r.n, r.cnt, r.mx, r.s) for r in out.collect()]
    assert rows[0] == (f"{EX}N0", 7, "9", float(sum(range(0, 20, 3))))
    assert rows[1][1] == 7 and rows[2][1] == 6


def test_union_values_regex(kg):
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?c ?v WHERE {
        { ?c ex:vip ?v } UNION { ?c ex:in ex:N2 . ?c ex:age ?v }
      }
    """)
    assert out.count() == 5 + 6
    out2 = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?c ?grp WHERE {
        ?c ex:in ?n .
        VALUES (?n ?grp) { (ex:N0 "zero") (ex:N1 "one") }
        FILTER REGEX(?c, "C1[0-9]$")
      }
    """)
    got = sorted((r.c, r.grp) for r in out2.collect())
    assert got == sorted((f"{EX}C{k}", "zero" if k % 3 == 0 else "one")
                         for k in range(10, 20) if k % 3 in (0, 1))


def test_property_path_minus_distinct(kg):
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT DISTINCT ?c WHERE {
        ?c ex:next+ ex:C17 .
        MINUS { ?c ex:vip ?v }
      }
    """)
    assert sorted(int(r.c.rsplit("C", 1)[1]) for r in out.collect()) == \
        [18, 19]
    # inverse + sequence path and the 'a' keyword
    out2 = sparql_select(kg.unionByName(kg.sparkSession.createDataFrame(
        [(f"{EX}C1",
          "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
          f"{EX}Person")], "subj string, pred string, obj string")), """
      PREFIX ex: <http://ex.org/>
      SELECT (COUNT(*) AS ?n) WHERE { ?x a ex:Person . ?y ex:next ?x }
    """)
    assert out2.collect()[0].n == 1


def test_matches_programmatic_algebra(kg):
    """The compiled plan's RESULT equals the hand-written operator
    composition - the front-end adds nothing and loses nothing."""
    from csvweb_spark.operators.bgp import filter_exists, match_bgp
    text = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?c ?n WHERE {
        ?c ex:in ?n .
        FILTER EXISTS { ?c ex:vip ?v }
      }
    """)
    prog = filter_exists(
        kg, match_bgp(kg, [("?c", EX + "in", "?n")]),
        [("?c", EX + "vip", "?v")]).select("c", "n")
    assert {tuple(r) for r in text.collect()} == \
        {tuple(r) for r in prog.collect()}


def test_parser_rejections():
    for bad, msg in [
        ("SELECT ?x WHERE { ?x foo:bar ?y }", "undeclared prefix"),
        ("SELECT WHERE { ?x ?p ?y }", "empty SELECT"),
        ("SELECT ?x WHERE { }", "empty group"),
        ("SELECT ?x WHERE { ?a ?p ?b . { ?a ?q ?c } UNION { ?a ?r ?d } }",
         "UNION must be the whole group"),
        ("SELECT ?x WHERE { ?x ?p ?y } FROB", "unexpected trailing"),
        ("SELECT (SUM(*) AS ?s) WHERE { ?x ?p ?y }", "only valid in COUNT"),
        ("SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x ?p ?y } GROUP BY ?z",
         "not in GROUP BY"),
        ('SELECT ?x WHERE { ?x ?p ?y . FILTER ("lonely") }', "dangling"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            _parse_query(bad)


def test_parse_shapes():
    q = _parse_query("""
      PREFIX ex: <http://ex.org/>
      SELECT DISTINCT ?s WHERE {
        ?s (ex:a|^ex:b)/ex:c* ?o ; ex:d "x\\"y" , 42 .
      } LIMIT 7
    """)
    assert q["distinct"] and q["limit"] == 7
    pats = q["patterns"]
    assert pats[0] == ("?s", ("seq", ("alt", EX + "a", ("inv", EX + "b")),
                              ("star", EX + "c")), "?o")
    assert pats[1] == ("?s", EX + "d", 'x"y')
    assert pats[2] == ("?s", EX + "d", "42")


def test_bind_value_exprs(kg):
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?c ?tag ?score WHERE {
        ?c ex:age ?a .
        BIND (CONCAT("age-", ?a) AS ?tag)
        BIND (?a * 10 + 5 AS ?score)
        FILTER (?score <= 45)
      }
    """)
    assert {(r.c, r.tag, r.score) for r in out.collect()} == {
        (f"{EX}C{k}", f"age-{k}", f"{k * 10 + 5}.0") for k in range(5)}


def test_select_expression_offset(kg):
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT (UCASE(SUBSTR(?v, 1, 2)) AS ?u) ?c WHERE {
        ?c ex:vip ?v .
      } ORDER BY ?c LIMIT 2 OFFSET 1
    """)
    # vip holders sorted lexically: C0, C12, C16, C4, C8 -> page [1:3]
    assert [(r.u, r.c) for r in out.collect()] == [
        ("GO", f"{EX}C12"), ("GO", f"{EX}C16")]


def test_having_group_concat_sample(kg):
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?n (GROUP_CONCAT(?a; SEPARATOR=",") AS ?ages)
             (SAMPLE(?c) AS ?one)
      WHERE { ?c ex:in ?n ; ex:age ?a . }
      GROUP BY ?n
      HAVING (COUNT(?c) >= 7)
      ORDER BY ?n
    """)
    rows = [(r.n, r.ages, r.one) for r in out.collect()]
    # N2 has 6 members -> cut by HAVING; GROUP_CONCAT sorts lexically;
    # SAMPLE is the deterministic MIN
    assert rows == [
        (f"{EX}N0", "0,12,15,18,3,6,9", f"{EX}C0"),
        (f"{EX}N1", "1,10,13,16,19,4,7", f"{EX}C1")]


def test_ask_form(kg):
    yes = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      ASK { ?c ex:vip "gold" }
    """).collect()
    no = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      ASK WHERE { ?c ex:vip "platinum" }
    """).collect()
    assert len(yes) == 1 and yes[0].ask is True
    assert len(no) == 1 and no[0].ask is False


def test_count_distinct_and_replace(kg):
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT (COUNT(DISTINCT ?n) AS ?nn) (COUNT(?n) AS ?all)
      WHERE { ?c ex:in ?n . }
    """)
    row = out.collect()[0]
    assert (row.nn, row.all) == (3, 20)
    rep = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT DISTINCT (REPLACE(?v, "o+", "0") AS ?r)
      WHERE { ?c ex:vip ?v . }
    """).collect()
    assert [r.r for r in rep] == ["g0ld"]


def test_new_construct_rejections():
    for bad, msg in [
        ("SELECT ?x WHERE { ?x ?p ?y . BIND (SUBSTR(?y, ?x) AS ?z) }",
         "integer literals"),
        ("ASK { ?x ?p ?y } HAVING (COUNT(?x) > 1)", "HAVING in ASK"),
        ("SELECT (COUNT(DISTINCT *) AS ?n) WHERE { ?x ?p ?y }",
         "COUNT.DISTINCT"),
        ('SELECT ?x WHERE { ?x ?p ?y . BIND (REPLACE(?y, ?x, "z") AS ?r) }',
         "string literals"),
        ("SELECT (GROUP_CONCAT(?y) AS ?g) (?x AS ?e) WHERE { ?x ?p ?y } "
         "GROUP BY ?x", "cannot mix with GROUP BY"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            _parse_query(bad)


def test_minus_exists_with_unbound_optional(kg):
    """REGRESSION (round-4 review): OPTIONAL-produced NULLs in shared
    variables must use the spec's unbound-is-free compatibility, not
    plain (null-rejecting) equality joins."""
    # MINUS: every ?c has an ex:age triple; for non-vip rows ?v is
    # unbound, so the MINUS group { ?c ex:age ?v } is compatible per
    # SPARQL 1.1 8.3.3 (unbound vars are ignored) and removes the row.
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?c WHERE {
        ?c ex:in ?n .
        OPTIONAL { ?c ex:vip ?v }
        MINUS { ?c ex:age ?v }
      }
    """)
    got = sorted(int(r.c.rsplit("C", 1)[1]) for r in out.collect())
    # vip rows bind ?v="gold" which matches no age literal -> kept;
    # non-vip rows have unbound ?v -> removed
    assert got == [0, 4, 8, 12, 16]
    # EXISTS: unbound ?v leaves the sub-pattern variable free, so
    # { ?c ex:age ?v } matches for the 15 non-vip rows; the 5 vip rows
    # substitute ?v="gold", which matches no age literal -> dropped.
    # (The pre-fix equality semi-join returned 0 rows: NULL never
    # equality-matches, so even the unbound rows were dropped.)
    out2 = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?c WHERE {
        ?c ex:in ?n .
        OPTIONAL { ?c ex:vip ?v }
        FILTER EXISTS { ?c ex:age ?v }
      }
    """)
    got2 = sorted(int(r.c.rsplit("C", 1)[1]) for r in out2.collect())
    assert got2 == sorted(k for k in range(20) if k % 4 != 0)


def test_pname_flush_terminator(kg):
    """REGRESSION (round-4 review): an object pname flush against '.'
    must not absorb the terminator into the local name (PN_LOCAL
    cannot end with '.')."""
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?c WHERE { ?c ex:next ex:C0. }
    """)
    assert [r.c for r in out.collect()] == [f"{EX}C1"]


def test_grouped_projection_order(kg):
    """REGRESSION (round-4 review): grouped SELECT must keep the
    textual projection order, not group-keys-first."""
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT (COUNT(?c) AS ?m) ?n WHERE { ?c ex:in ?n } GROUP BY ?n
    """)
    assert out.columns == ["m", "n"]


def test_construct_text_form(kg):
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      CONSTRUCT { ?c ex:tier "vip" . ?c ex:member ?n }
      WHERE { ?c ex:in ?n . ?c ex:vip ?v }
    """)
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert out.columns == ["subj", "pred", "obj"]
    assert len(rows) == 10  # 5 vip customers x 2 template triples
    assert (f"{EX}C0", f"{EX}tier", "vip") in rows
    assert (f"{EX}C4", f"{EX}member", f"{EX}N1") in rows


def test_describe_text_forms(kg):
    # constant-IRI form, no WHERE group
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      DESCRIBE ex:C1
    """)
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert rows == {
        (f"{EX}C1", f"{EX}in", f"{EX}N1"),
        (f"{EX}C1", f"{EX}age", "1"),
        (f"{EX}C1", f"{EX}next", f"{EX}C0"),
        (f"{EX}C2", f"{EX}next", f"{EX}C1")}
    # variable form bound by a group: vip holder pointing at C3 -> C4
    out2 = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      DESCRIBE ?c WHERE { ?c ex:vip "gold" . ?c ex:next ex:C3 }
    """)
    subjects = {r.subj for r in out2.collect()}
    assert subjects == {f"{EX}C4", f"{EX}C5"}  # C5 -next-> C4 inbound
    assert out2.count() == 5


def test_construct_describe_rejections():
    for bad, msg in [
        ("PREFIX e: <ex:> CONSTRUCT { ?a e:p+ ?b } WHERE { ?a e:q ?b }",
         "property path in CONSTRUCT"),
        ("PREFIX e: <ex:> DESCRIBE ?v", "needs a WHERE group"),
        ("PREFIX e: <ex:> CONSTRUCT { ?a e:p ?b } WHERE { ?a e:q ?b } "
         "LIMIT 5", "modifiers are not supported"),
        ("PREFIX e: <ex:> CONSTRUCT { } WHERE { ?a e:q ?b }",
         "empty CONSTRUCT"),
        ("DESCRIBE", "DESCRIBE needs terms"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            _parse_query(bad)


def test_subquery_join_and_only_group(kg):
    # per-nation LEXICAL max age via a sub-SELECT, joined back to the
    # members carrying that age (the classic argmax-by-group shape)
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?c ?n ?mx WHERE {
        ?c ex:in ?n ; ex:age ?mx .
        { SELECT ?n (MAX(?a) AS ?mx)
          WHERE { ?x ex:in ?n ; ex:age ?a } GROUP BY ?n }
      }
    """)
    got = {(r.c, r.n, r.mx) for r in out.collect()}
    assert got == {(f"{EX}C9", f"{EX}N0", "9"),
                   (f"{EX}C7", f"{EX}N1", "7"),
                   (f"{EX}C8", f"{EX}N2", "8")}
    # subquery as the WHOLE group, outer modifiers apply on top
    out2 = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?n ?cnt WHERE {
        { SELECT ?n (COUNT(?c) AS ?cnt)
          WHERE { ?c ex:in ?n } GROUP BY ?n }
      } ORDER BY ?n LIMIT 2
    """)
    assert [(r.n, r.cnt) for r in out2.collect()] == [
        (f"{EX}N0", 7), (f"{EX}N1", 7)]


def test_subquery_rejections(kg):
    with pytest.raises(SparqlSyntaxError, match="cartesian"):
        sparql_select(kg, """
          PREFIX ex: <http://ex.org/>
          SELECT ?c WHERE {
            ?c ex:vip ?v .
            { SELECT (COUNT(?x) AS ?t) WHERE { ?x ex:in ?n } }
          }
        """)
    with pytest.raises(SparqlSyntaxError, match="OPTIONAL/VALUES"):
        _parse_query("""
          SELECT ?n WHERE {
            { SELECT ?n WHERE { ?c <ex:in> ?n } }
            OPTIONAL { ?n <ex:x> ?y }
          }
        """)


def test_nullable_tracking_precise(kg):
    """REGRESSION (round-4 review): (a) EXISTS sharing only REQUIRED
    variables with an OPTIONAL-bearing query keeps the scalable hash
    semi-join (no broadcast nested loop); (b) NULLs minted by a
    subquery's OPTIONAL still get the null-aware path; (c) a subquery
    joining the outer group on a possibly-unbound variable is refused,
    not silently null-dropped."""
    # (a) shared var ?c is always bound -> fast path
    fast = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?c WHERE {
        ?c ex:in ?n .
        OPTIONAL { ?c ex:vip ?v }
        FILTER EXISTS { ?c ex:age ?a }
      }
    """)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert fast.count() == 20
    # (b) ?v is nullable THROUGH the subquery projection: vip rows bind
    # "gold" (matches no age literal -> dropped), unbound rows survive
    out = sparql_select(kg, """
      PREFIX ex: <http://ex.org/>
      SELECT ?c WHERE {
        ?c ex:in ?n .
        { SELECT ?c ?v WHERE { ?c ex:in ?x OPTIONAL { ?c ex:vip ?v } } }
        FILTER EXISTS { ?c ex:age ?v }
      }
    """)
    got = sorted(int(r.c.rsplit("C", 1)[1]) for r in out.collect())
    assert got == sorted(k for k in range(20) if k % 4 != 0)
    # (c) outer OPTIONAL var shared with the subquery -> refuse
    with pytest.raises(SparqlSyntaxError, match="possibly-unbound"):
        sparql_select(kg, """
          PREFIX ex: <http://ex.org/>
          SELECT ?c WHERE {
            ?c ex:in ?n .
            OPTIONAL { ?c ex:vip ?v }
            { SELECT ?v (COUNT(?y) AS ?t)
              WHERE { ?y ex:vip ?v } GROUP BY ?v }
          }
        """)


def test_parser_never_crashes_on_garbage():
    """Fuzz the grammar surface: any token soup must either parse or
    raise SparqlSyntaxError/ValueError-subclasses - never IndexError/
    KeyError/AttributeError (the no-silent-misparse contract's crash
    half). Deterministic seed: failures reproduce."""
    import random
    rnd = random.Random(20260818)
    vocab = ["SELECT", "ASK", "CONSTRUCT", "DESCRIBE", "?x", "?y", "WHERE",
             "{", "}", "(", ")", "FILTER", "ex:a", "<http://x>", '"s"',
             "42", ".", ";", ",", "UNION", "OPTIONAL", "BIND", "AS", "*",
             "+", "-", "/", "a", "PREFIX", "ex:", "||", "&&", "!", "=",
             "<", ">=", "GROUP", "BY", "HAVING", "ORDER", "LIMIT",
             "OFFSET", "DISTINCT", "COUNT", "SUM", "GROUP_CONCAT",
             "SAMPLE", "SEPARATOR", "VALUES", "MINUS", "EXISTS", "NOT",
             "CONCAT", "SUBSTR", "REPLACE", "STRLEN", "^", "|"]
    parsed = 0
    for _ in range(800):
        q = " ".join(rnd.choice(vocab)
                     for _ in range(rnd.randrange(1, 30)))
        try:
            _parse_query(q)
            parsed += 1
        except SparqlSyntaxError:
            pass
    # sanity: the generator isn't degenerate (some inputs do parse is
    # NOT required - garbage rarely forms a full query - but the loop
    # must have executed)
    assert parsed >= 0


# ------------------------------------------------- round-5 additions


def test_binary_subtraction(kg):
    """'-' tokenizes as an operator: spaced binary subtraction works in
    FILTER and BIND (round-4 advice: only the '?x -3' signed-literal
    form used to parse)."""
    out = sparql_select(kg, f"""
      PREFIX ex: <{EX}>
      SELECT ?c WHERE {{ ?c ex:age ?a . FILTER (?a - 10 > 5) }}
    """)
    assert {r.c for r in out.collect()} == {f"{EX}C{k}" for k in (16, 17, 18, 19)}
    out2 = sparql_select(kg, f"""
      PREFIX ex: <{EX}>
      SELECT ?c ?d WHERE {{ ?c ex:age ?a . BIND (?a - ?a AS ?d) }} LIMIT 1
    """)
    assert out2.collect()[0].d == "0.0"
    # STRLEN(?s) - 1 (the documented example)
    out3 = sparql_select(kg, f"""
      PREFIX ex: <{EX}>
      SELECT ?c (STRLEN(?a) - 1 AS ?l) WHERE {{ ?c ex:age ?a }}
    """)
    got = {(r.c, r.l) for r in out3.collect()}
    assert (f"{EX}C5", "0.0") in got and (f"{EX}C15", "1.0") in got
    # the signed-literal form still works
    out4 = sparql_select(kg, f"""
      PREFIX ex: <{EX}>
      SELECT ?c WHERE {{ ?c ex:age ?a . FILTER (?a -3 > 15) }}
    """)
    assert {r.c for r in out4.collect()} == {f"{EX}C{k}" for k in (19,)}


def test_values_undef_wildcard(kg):
    """UNDEF cells are join-compatibility wildcards in shared variables
    and unbound extensions otherwise; bag semantics multiply a solution
    matched by several VALUES rows (round-4 VERDICT item #3)."""
    out = sparql_select(kg, f"""
      PREFIX ex: <{EX}>
      SELECT ?c ?n ?grp WHERE {{
        ?c ex:in ?n .
        VALUES (?n ?grp) {{ (ex:N1 "g1") (UNDEF "all") }}
      }}
    """)
    rows = [(r.c, r.n, r.grp) for r in out.collect()]
    # N1 customers (7) match both rows; N0 (7) + N2 (6) match only UNDEF
    assert len(rows) == 7 * 2 + 7 + 6
    assert (f"{EX}C1", f"{EX}N1", "g1") in rows
    assert (f"{EX}C1", f"{EX}N1", "all") in rows
    assert (f"{EX}C0", f"{EX}N0", "all") in rows
    assert (f"{EX}C0", f"{EX}N0", "g1") not in rows
    # UNDEF in an EXTENDING variable leaves it unbound (NULL)
    out2 = sparql_select(kg, f"""
      PREFIX ex: <{EX}>
      SELECT ?c ?tag WHERE {{
        ?c ex:vip ?v .
        VALUES (?c ?tag) {{ (ex:C0 "zero") (ex:C4 UNDEF) }}
      }}
    """)
    assert {(r.c, r.tag) for r in out2.collect()} == {
        (f"{EX}C0", "zero"), (f"{EX}C4", None)}
    # all-UNDEF row: every solution survives once, nothing bound
    n = sparql_select(kg, f"""
      PREFIX ex: <{EX}>
      SELECT ?c WHERE {{ ?c ex:vip ?v . VALUES ?c {{ UNDEF }} }}
    """).count()
    assert n == 5


def test_order_by_numeric(kg):
    """ORDER BY sorts numerically for values that parse as numbers -
    mixed-width integers need no zero-padding (round-4 VERDICT #4)."""
    out = sparql_select(kg, f"""
      PREFIX ex: <{EX}>
      SELECT ?c ?a WHERE {{ ?c ex:age ?a }} ORDER BY DESC(?a) LIMIT 3
    """)
    assert [r.a for r in out.collect()] == ["19", "18", "17"]
    out2 = sparql_select(kg, f"""
      PREFIX ex: <{EX}>
      SELECT ?a WHERE {{ ?c ex:age ?a }} ORDER BY ?a LIMIT 4
    """)
    assert [r.a for r in out2.collect()] == ["0", "1", "2", "3"]


def test_order_by_unprojected(kg):
    """Any in-scope variable can be a sort key (the sort runs before the
    projection, round-4 advice) - except under DISTINCT, where the spec
    restricts keys to projected expressions."""
    out = sparql_select(kg, f"""
      PREFIX ex: <{EX}>
      SELECT ?c WHERE {{ ?c ex:age ?a }} ORDER BY DESC(?a) LIMIT 2
    """)
    assert [r.c for r in out.collect()] == [f"{EX}C19", f"{EX}C18"]
    with pytest.raises(SparqlSyntaxError, match="must be projected"):
        sparql_select(kg, f"""
          PREFIX ex: <{EX}>
          SELECT DISTINCT ?n WHERE {{ ?c ex:in ?n . ?c ex:age ?a }}
          ORDER BY ?a
        """)
    with pytest.raises(SparqlSyntaxError, match="group keys"):
        sparql_select(kg, f"""
          PREFIX ex: <{EX}>
          SELECT ?n (COUNT(?c) AS ?k) WHERE {{ ?c ex:in ?n . ?c ex:age ?a }}
          GROUP BY ?n ORDER BY ?a
        """)


def test_bind_alias_collision_raises(kg):
    """SPARQL 10.1: the BIND target must be fresh in the group (round-4
    advice: withColumn used to silently overwrite)."""
    for bad in [
        f"SELECT ?x WHERE {{ ?x <{EX}in> ?n . BIND (UCASE(?n) AS ?n) }}",
        f"SELECT ?x WHERE {{ ?x <{EX}in> ?n . BIND (1 AS ?b) . "
        f"BIND (2 AS ?b) }}",
        f"SELECT ?x WHERE {{ ?x <{EX}in> ?n . VALUES ?v {{ \"t\" }} . "
        f"BIND (3 AS ?v) }}",
    ]:
        with pytest.raises(SparqlSyntaxError, match="already bound"):
            sparql_select(kg, bad)


@pytest.fixture()
def quads(spark):
    rows = []
    for k in range(12):
        rows.append((f"g:{k % 3}", f"{EX}C{k}", f"{EX}in", f"{EX}N{k % 4}"))
        rows.append((f"g:{k % 4}", f"{EX}C{k}", f"{EX}seg", f"S{k % 2}"))
    return spark.createDataFrame(
        rows, "graph string, subj string, pred string, obj string")


def test_graph_text_form(quads):
    """GRAPH ?g / GRAPH <iri> parse and compile onto match_bgp_graph
    (round-4 VERDICT #2): the text form is row- and plan-identical to
    the programmatic call."""
    import re as _re
    from csvweb_spark.operators.bgp import match_bgp_graph
    text = sparql_select(quads, f"""
      PREFIX ex: <{EX}>
      SELECT ?g ?c ?n ?s WHERE {{
        GRAPH ?g {{ ?c ex:in ?n . ?c ex:seg ?s }}
      }}
    """)
    prog = match_bgp_graph(
        quads, "?g",
        [("?c", f"{EX}in", "?n"), ("?c", f"{EX}seg", "?s")]
    ).select("g", "c", "n", "s")
    # plan equivalence modulo expression ids - BEFORE execution (AQE
    # finalization after collect() can re-pick build sides per runtime
    # stats; the pre-execution plans are the deterministic compile)
    def norm(df):
        p = df._jdf.queryExecution().executedPlan().toString()
        return _re.sub(r"#\d+|plan_id=\d+", "#", p)
    assert norm(text) == norm(prog)
    assert sorted(map(tuple, text.collect())) == \
        sorted(map(tuple, prog.collect()))
    # both patterns in the SAME graph: k%3 == k%4 only for k in {0,1,2}+12s
    assert {r.c for r in text.collect()} == {f"{EX}C{k}" for k in (0, 1, 2)}
    # constant-graph form
    const = sparql_select(quads, f"""
      PREFIX ex: <{EX}>
      SELECT ?c ?n WHERE {{ GRAPH <g:1> {{ ?c ex:in ?n }} }}
    """)
    assert {r.c for r in const.collect()} == {
        f"{EX}C{k}" for k in range(12) if k % 3 == 1}


def test_graph_joins_rest_of_group(quads):
    """A GRAPH block inner-joins the rest of the group on shared
    variables; the graph variable reaches the output."""
    out = sparql_select(quads, f"""
      PREFIX ex: <{EX}>
      SELECT ?g ?c WHERE {{
        ?c ex:seg "S1" .
        GRAPH ?g {{ ?c ex:in ?n }}
      }}
    """)
    got = {(r.g, r.c) for r in out.collect()}
    assert got == {(f"g:{k % 3}", f"{EX}C{k}") for k in range(12) if k % 2 == 1}


def test_graph_rejections(kg, quads):
    with pytest.raises(SparqlSyntaxError, match="quad table"):
        sparql_select(kg, f"""
          SELECT ?g ?c WHERE {{ GRAPH ?g {{ ?c <{EX}in> ?n }} }}
        """)
    with pytest.raises(SparqlSyntaxError, match="OPTIONAL"):
        sparql_select(quads, f"""
          SELECT ?g ?c WHERE {{
            GRAPH ?g {{ ?c <{EX}in> ?n }}
            OPTIONAL {{ ?c <{EX}seg> ?s }}
          }}
        """)
    with pytest.raises(SparqlSyntaxError, match="shares no variable"):
        sparql_select(quads, f"""
          SELECT ?g ?x WHERE {{
            ?x <{EX}seg> "S0" .
            GRAPH ?g {{ ?c <{EX}in> ?n }}
          }}
        """)


# ---- SPARQL 1.1 UPDATE ----

def test_update_modify_sequence(kg):
    from csvweb_spark.operators.sparql import sparql_update
    out = sparql_update(kg, f"""
      PREFIX e: <{EX}>
      DELETE {{ ?c e:vip ?g }}
      INSERT {{ ?c e:vip "platinum" . ?c e:was ?g }}
      WHERE {{ ?c e:vip ?g . ?c e:in e:N0 }} ;
      INSERT DATA {{ e:C99 e:vip "gold" . e:C99 e:in e:N9 }} ;
      DELETE WHERE {{ ?c e:vip "gold" }}
    """)
    rows = {tuple(r) for r in out.collect()}
    # C0/C12 (vip & in N0) rewritten; C4/C8/C16 (vip, other nations)
    # plus the freshly inserted C99 gold rows are then deleted by op 3
    assert (f"{EX}C0", f"{EX}vip", "platinum") in rows
    assert (f"{EX}C12", f"{EX}was", "gold") in rows
    assert not any(p == f"{EX}vip" and o == "gold" for _, p, o in rows)
    assert (f"{EX}C99", f"{EX}in", f"{EX}N9") in rows  # insert survives
    assert (f"{EX}C4", f"{EX}in", f"{EX}N1") in rows   # untouched triple


def test_update_set_semantics(spark):
    from csvweb_spark.operators.sparql import sparql_update
    t = spark.createDataFrame(
        [("a", "p", "x"), ("a", "p", "x"), ("b", "p", "y")],
        "subj string, pred string, obj string")
    out = sparql_update(t, 'INSERT DATA { <a> <p> "x" . <c> <p> "z" }')
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [("a", "p", "x"), ("b", "p", "y"), ("c", "p", "z")]


def test_update_insert_only_and_where_filter(kg):
    from csvweb_spark.operators.sparql import sparql_update
    before = kg.distinct().count()
    out = sparql_update(kg, f"""
      PREFIX e: <{EX}>
      INSERT {{ ?c e:senior "1" }}
      WHERE {{ ?c e:age ?a FILTER (?a >= 18) }}
    """)
    rows = {tuple(r) for r in out.collect()}
    assert (f"{EX}C18", f"{EX}senior", "1") in rows
    assert (f"{EX}C19", f"{EX}senior", "1") in rows
    assert len(rows) == before + 2  # nothing deleted


def test_update_rejections():
    from csvweb_spark.operators.sparql import _parse_update
    with pytest.raises(SparqlSyntaxError, match="ground"):
        _parse_update('INSERT DATA { ?v <p> "x" }')
    with pytest.raises(SparqlSyntaxError, match="property path"):
        _parse_update('DELETE WHERE { ?s <p>+ ?o }')
    with pytest.raises(SparqlSyntaxError, match="empty"):
        _parse_update("")
    with pytest.raises(SparqlSyntaxError, match="update operation"):
        _parse_update('CLEAR GRAPH <g>')
    with pytest.raises(SparqlSyntaxError, match="';'"):
        _parse_update('INSERT DATA { <a> <p> "x" } garbage')


# ------------------------------------------- round-5 value builtins

def test_numeric_builtins_abs_round_floor_ceil(spark):
    from csvweb_spark.operators.sparql import sparql_select
    t = spark.createDataFrame(
        [("a", "ex:v", "-2.5"), ("b", "ex:v", "2.5"), ("c", "ex:v", "7")],
        "subj string, pred string, obj string")
    out = {r.s: (r.a, r.r, r.f, r.c) for r in sparql_select(t, """
        SELECT ?s (ABS(?v) AS ?a) (ROUND(?v) AS ?r)
               (FLOOR(?v) AS ?f) (CEIL(?v) AS ?c)
        WHERE { ?s <ex:v> ?v }""").collect()}
    assert out["a"] == ("2.5", "-2", "-3", "-2")  # xpath tie: toward +inf
    assert out["b"] == ("2.5", "3", "2", "3")
    assert out["c"] == ("7.0", "7", "7", "7")


def test_if_strbefore_strafter(spark):
    from csvweb_spark.operators.sparql import sparql_select
    t = spark.createDataFrame(
        [("a", "ex:v", "5"), ("b", "ex:v", "-3"),
         ("a", "ex:tag", "lang:en"), ("b", "ex:tag", "plain")],
        "subj string, pred string, obj string")
    out = {r.s: (r.sign, r.pre, r.post) for r in sparql_select(t, """
        SELECT ?s (IF(?v > 0, "pos", "neg") AS ?sign)
               (STRBEFORE(?tag, ":") AS ?pre)
               (STRAFTER(?tag, ":") AS ?post)
        WHERE { ?s <ex:v> ?v . ?s <ex:tag> ?tag }""").collect()}
    assert out["a"] == ("pos", "lang", "en")
    assert out["b"] == ("neg", "", "")  # separator absent -> ''


def test_strbefore_empty_separator_and_errors(spark):
    from csvweb_spark.operators.sparql import (SparqlSyntaxError,
                                               sparql_select)
    t = spark.createDataFrame([("a", "ex:v", "abc")],
                              "subj string, pred string, obj string")
    row = sparql_select(t, """
        SELECT (STRBEFORE(?v, "") AS ?b) (STRAFTER(?v, "") AS ?af)
        WHERE { ?s <ex:v> ?v }""").collect()[0]
    assert (row.b, row.af) == ("", "abc")  # spec: empty-pattern cases
    with pytest.raises(SparqlSyntaxError, match="string literal"):
        sparql_select(t, """SELECT (STRBEFORE(?v, ?v) AS ?b)
                            WHERE { ?s <ex:v> ?v }""").collect()
