"""Basic-graph-pattern matching over the (subj, pred, obj) triple table.

The KG consumer surface the reference delegates to its RDF store
(DataDock loads conversion output into dotNetRDF and queries it with
SPARQL; Rdf/Converter.cs emits the graph, the store matches patterns).
At web scale the store IS the engine, so this module compiles a
conjunctive SPARQL basic graph pattern - a list of triple patterns whose
terms are constants or ?variables - straight to a Catalyst join tree.

Pattern language: each pattern is a (s, p, o) string 3-tuple; a term
starting with '?' is a variable, anything else is a constant matched
exactly against the triple column. The result has one column per
distinct variable.

Plan shape / scale notes:
* Each pattern is one scan of the triple table filtered by its constant
  terms - predicate constants reach the parquet scan as pushed filters,
  so a pattern like (?s, rdf:type, :Person) reads only its stripe of a
  predicate-partitioned triple store.
* Patterns are joined left-to-right on their shared variables (hash
  join, AQE-skew-splittable). The compiler greedily reorders so every
  join has at least one shared variable; a genuinely disconnected
  product raises unless `allow_cartesian=True` (repo rule: no un-gated
  cartesian products).
* Most-constant patterns are moved first (selectivity heuristic at zero
  statistics cost); Catalyst/AQE may still re-plan the physical order.

DuckDB-oracle-checkable: the same pattern list compiles to self-joins of
the triples view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Pattern = tuple[str, str, str]
_POS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _path_pattern_df(triples: DataFrame, pat, idx: int) -> DataFrame:
    """A pattern whose predicate position is a path EXPRESSION (tuple
    AST, see `path_pairs`): the pair set replaces the scan, then the
    subject/object terms bind or filter exactly like a plain pattern."""
    s, path, o = pat
    df = path_pairs(triples, path)
    cols = []
    for pos, term in (("src", s), ("dst", o)):
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"pattern {idx}: bare '?' is not a variable")
            cols.append((pos, name))
        else:
            df = df.filter(F.col(pos) == F.lit(term))
    if len(cols) == 2 and cols[0][1] == cols[1][1]:
        # same variable at both ends: cycle filter
        df = df.filter(F.col("src") == F.col("dst"))
        cols = cols[:1]
    if not cols:
        return df.select(F.lit(1).alias(f"_exists_{idx}")).limit(1)
    return df.select(*[F.col(pos).alias(name) for pos, name in cols])


def _pattern_df(triples, pat: Pattern, idx: int) -> DataFrame:
    """One filtered scan; variable columns renamed to the variable name,
    constant columns filtered then dropped. A tuple in the PREDICATE
    position is a property-path expression (`_path_pattern_df`).

    `triples` may be a CALLABLE `pattern -> DataFrame` (a layout
    router, e.g. plans.bucketed.TripleStore.scan): each pattern then
    reads from the layout that serves it best (pred-bound patterns hit
    the pred-partitioned POS files, the rest the subj-bucketed SPO
    table); the constant filters below still apply, so a routed scan
    only needs to be a SUPERSET of the pattern's triples."""
    if callable(triples):
        full = triples(None)
        if isinstance(pat[1], tuple):
            return _path_pattern_df(full, pat, idx)
        df = triples(pat)
    else:
        if isinstance(pat[1], tuple):
            return _path_pattern_df(triples, pat, idx)
        df = triples
    cols = []
    seen: dict[str, str] = {}
    for pos, term in zip(_POS, pat):
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"pattern {idx}: bare '?' is not a variable")
            if name in seen:
                # repeated variable within one pattern: equality filter
                df = df.filter(F.col(seen[name]) == F.col(pos))
            else:
                seen[name] = pos
                cols.append(F.col(pos).alias(name))
        else:
            df = df.filter(F.col(pos) == F.lit(term))
    if not cols:
        # all-constant pattern: existence probe - one solution (the empty
        # mapping) if any triple matches, per SPARQL semantics
        return df.select(F.lit(1).alias(f"_exists_{idx}")).limit(1)
    return df.select(*cols)


def match_bgp(triples: DataFrame, patterns: list[Pattern],
              allow_cartesian: bool = False,
              optional: list[list[Pattern]] | None = None,
              values: tuple[list[str], list[tuple]] | None = None
              ) -> DataFrame:
    """Match a conjunctive BGP; returns one row per solution mapping with
    one column per distinct variable (module docstring for semantics).
    Duplicate solutions are preserved (SPARQL bag semantics); apply
    .distinct() for set semantics.

    `optional` is a list of OPTIONAL groups (each itself a pattern
    list): every group is matched as its own BGP and LEFT-joined onto
    the solution so far on their shared variables (SPARQL OPTIONAL
    left-to-right evaluation) - unmatched solutions keep NULL in the
    group's private variables. A group sharing no variable with the
    solution raises (it would silently cross-join every solution).
    FILTER needs no operator support: apply `.filter()` to the result,
    it collapses into the same Catalyst plan.

    A pattern's PREDICATE position may be a property-path expression
    tuple (`path_pairs` AST) instead of a constant: the pattern then
    matches the path's (src, dst) pair set - so
    `(?n, ("plus", "ex:partOf"), ?p)` joins like any other pattern.

    `values` is a SPARQL VALUES block as (['?x', '?y'], [(c1, c2), ...]):
    the inline binding table is inner-joined onto the solution on its
    shared variables BEFORE the OPTIONAL groups (SPARQL joins VALUES
    into the group it appears in), constraining them; variables the
    pattern does not bind extend each solution instead. The table is
    literal data, so it broadcasts by construction. UNDEF cells (None)
    are wildcards per SPARQL join compatibility: a row with UNDEF in a
    shared variable matches ANY solution value there (compiled as a
    null-or-equal condition on the broadcast table - same machinery the
    OPTIONAL chain uses for possibly-unbound shared variables); UNDEF in
    an extending variable leaves that solution column unbound (NULL).
    Bag semantics are preserved either way: duplicate VALUES rows
    multiply solutions."""
    if not patterns:
        raise ValueError("empty pattern list")
    scans = [(_pattern_df(triples, p, i),
              {t[1:] for t in p
               if isinstance(t, str) and _is_var(t) and len(t) > 1})
             for i, p in enumerate(patterns)]
    # most-constant first (fewest variables = most selective scan)
    order = sorted(range(len(scans)), key=lambda i: (len(scans[i][1]), i))
    remaining = [scans[i] for i in order]
    out, bound = remaining.pop(0)
    while remaining:
        # greedy: next pattern sharing a variable with what's bound; a
        # variable-free existence probe (<=1 row) is always safe to
        # cross, as is crossing FROM one (bound empty)
        pick = next((i for i, (_, vs) in enumerate(remaining)
                     if (vs & bound) or not vs or not bound), None)
        if pick is None:
            if not allow_cartesian:
                raise ValueError(
                    "disconnected BGP (cartesian product); pass "
                    "allow_cartesian=True to run it anyway")
            pick = 0
        df, vs = remaining.pop(pick)
        shared = sorted(vs & bound)
        out = out.join(df, shared) if shared else out.crossJoin(df)
        bound |= vs
    var_cols = [c for c in out.columns if not c.startswith("_exists_")]
    if not var_cols:
        # variable-free BGP: true/false as a 0- or 1-row marker frame
        return out.select(F.lit(1).alias("matched")).limit(1)
    out = out.select(*var_cols)
    if values is not None:
        vvars, rows = values
        names = [v.lstrip("?") for v in vvars]
        # NO distinct: SPARQL bag semantics - duplicate VALUES rows
        # multiply solutions (round-4 review)
        vdf = (triples(None) if callable(triples)
               else triples).sparkSession.createDataFrame(
            [tuple(row) for row in rows],
            ", ".join(f"`{n}` string" for n in names))
        shared = sorted(set(names) & set(out.columns))
        undef_shared = any(row[names.index(c)] is None
                           for row in rows for c in shared)
        if not shared:
            out = out.crossJoin(F.broadcast(vdf))
        elif not undef_shared:
            out = out.join(F.broadcast(vdf), shared)
        else:
            # UNDEF in a shared variable: join compatibility makes it a
            # per-row wildcard - null-or-equal conjunction against the
            # broadcast table (the OPTIONAL-chain machinery), then keep
            # the solution side's (always-bound) shared columns
            r = vdf
            for c in names:
                r = r.withColumnRenamed(c, f"_val_{c}")
            cond = F.lit(True)
            for c in shared:
                rc = F.col(f"_val_{c}")
                cond = cond & (rc.isNull() | (rc == F.col(c)))
            extend = [c for c in names if c not in shared]
            out = (out.join(F.broadcast(r), cond)
                   .select(*[F.col(c) for c in out.columns],
                           *[F.col(f"_val_{c}").alias(c) for c in extend]))
    # OPTIONAL chaining: a variable introduced by an EARLIER optional
    # group may be NULL; SPARQL left-join compatibility treats unbound
    # as compatible-with-anything, so a later group sharing it must use
    # a null-or-equal condition + coalesce merge, not plain equality
    # (round-4 review). Required-only shared vars keep the plain (hash)
    # left join; the null-aware branch still hash-joins when at least
    # one required var is shared (the equality conjunct drives it).
    maybe_null: set = set()
    for i, group in enumerate(optional or []):
        sub = match_bgp(triples, group, allow_cartesian=allow_cartesian)
        shared = sorted(set(sub.columns) & set(out.columns))
        if not shared:
            raise ValueError(
                f"OPTIONAL group {i} shares no variable with the "
                "required pattern (would cross-join every solution)")
        null_shared = [c for c in shared if c in maybe_null]
        private = [c for c in sub.columns if c not in shared]
        if not null_shared:
            out = out.join(sub, shared, "left")
        else:
            pre_cols = list(out.columns)
            r = sub
            for c in sub.columns:
                r = r.withColumnRenamed(c, f"_opt{i}_{c}")
            cond = F.lit(True)
            for c in shared:
                rc = F.col(f"_opt{i}_{c}")
                cond = cond & ((F.col(c).isNull() | (F.col(c) == rc))
                               if c in maybe_null else (F.col(c) == rc))
            out = (out.join(r, cond, "left")
                   .select(
                       *[(F.coalesce(F.col(c), F.col(f"_opt{i}_{c}"))
                          .alias(c) if c in shared else F.col(c))
                         for c in pre_cols],
                       *[F.col(f"_opt{i}_{c}").alias(c)
                         for c in private]))
        maybe_null |= set(private) | set(null_shared)
    return out


def match_path(triples: DataFrame, pred: str, src_var: str = "?s",
               dst_var: str = "?o", max_rounds: int = 32) -> DataFrame:
    """SPARQL property path `pred+`: all (src, dst) pairs connected by
    ONE OR MORE edges of a single predicate - the closure query behind
    skos:broader+ / rdfs:subClassOf+ hierarchy walks. One column per
    end variable, so the result composes with `match_bgp` output by
    joining on shared variable names.

    Scale shape: the predicate constant prunes the scan to one stripe
    of a predicate-partitioned store, then iterative doubling closes a
    depth-d relation in ceil(log2(d)) self-joins (entail.py's
    transitive_closure, localCheckpoint per round). Path predicates are
    overwhelmingly schema-sized relations (hierarchies, not the
    instance bulk); for an instance-scale relation prefer
    graph.khop_neighbors with an explicit hop bound."""
    from csvweb_spark.operators.entail import transitive_closure
    edges = (triples.filter(F.col("pred") == pred)
             .select(F.col("subj").alias("src"), F.col("obj").alias("dst")))
    closure = transitive_closure(edges, max_rounds=max_rounds)
    return closure.select(F.col("src").alias(src_var.lstrip("?")),
                          F.col("dst").alias(dst_var.lstrip("?")))


def match_union(triples: DataFrame, groups: list[list[Pattern]],
                allow_cartesian: bool = False) -> DataFrame:
    """SPARQL UNION: each group is matched as its own BGP and the
    solution multisets are concatenated (bag semantics, like the UNION
    operator in the algebra - apply .distinct() for set semantics).
    The result schema is the sorted union of every group's variables;
    a group that does not bind a variable contributes NULL there, the
    same shape OPTIONAL produces for unmatched groups.

    Plan shape: one independent join tree per group under a Catalyst
    Union - branches share the triple scan via normal plan reuse and
    parallelize independently; no shuffle is added by the union itself."""
    if not groups:
        raise ValueError("empty UNION group list")
    sols = [match_bgp(triples, g, allow_cartesian=allow_cartesian)
            for g in groups]
    all_vars = sorted({c for s in sols for c in s.columns})
    branches = [
        s.select(*[(F.col(v) if v in s.columns
                    else F.lit(None).cast("string")).alias(v)
                   for v in all_vars])
        for s in sols]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def construct(triples: DataFrame, patterns: list[Pattern],
              template: list[Pattern],
              allow_cartesian: bool = False,
              optional: list[list[Pattern]] | None = None,
              values: tuple[list[str], list[tuple]] | None = None
              ) -> DataFrame:
    """SPARQL CONSTRUCT: match the WHERE block (patterns / optional /
    values, exactly as `match_bgp`) and instantiate each template
    triple once per solution. Returns a (subj, pred, obj) DataFrame -
    the derived-graph primitive behind KG enrichment rules ("every
    ?c -in-> ?n -of-> ?r pair also asserts ?c inRegion ?r").

    Per the spec, a template triple whose terms include an unbound
    variable (NULL from an OPTIONAL miss) is skipped for that solution,
    and the result is a GRAPH, i.e. a set: one distinct at the end
    (the single shuffle this adds over the match itself)."""
    if not template:
        raise ValueError("empty CONSTRUCT template")
    sol = match_bgp(triples, patterns, allow_cartesian=allow_cartesian,
                    optional=optional, values=values)
    return instantiate_template(sol, template)


def instantiate_template(solutions: DataFrame,
                         template: list[Pattern]) -> DataFrame:
    """The CONSTRUCT tail: instantiate each template triple once per
    solution row; unbound-variable instances are skipped per spec and
    the result is a set (one distinct)."""
    if not template:
        raise ValueError("empty CONSTRUCT template")
    bound = set(solutions.columns)
    for i, pat in enumerate(template):
        for term in pat:
            if _is_var(term) and term.lstrip("?") not in bound:
                raise ValueError(
                    f"template triple {i}: variable {term} is not bound "
                    "by the WHERE block")
    outs = []
    for pat in template:
        cols = [(F.col(term[1:]) if _is_var(term)
                 else F.lit(term)).alias(pos)
                for pos, term in zip(_POS, pat)]
        t = solutions.select(*cols).filter(
            F.col("subj").isNotNull() & F.col("pred").isNotNull()
            & F.col("obj").isNotNull())
        outs.append(t)
    out = outs[0]
    for t in outs[1:]:
        out = out.unionByName(t)
    return out.distinct()


def _graph_nodes(triples: DataFrame) -> DataFrame:
    """All RDF terms appearing as subject or object - the domain of the
    zero-length path per SPARQL 1.1 (18.4 ZeroLengthPath)."""
    return (triples.select(F.col("subj").alias("node"))
            .unionByName(triples.select(F.col("obj").alias("node")))
            .distinct())


def path_pairs(triples: DataFrame, expr, max_rounds: int = 32) -> DataFrame:
    """Compile a SPARQL 1.1 property-path expression to the (src, dst)
    pair set it denotes. Expression AST (nested tuples, strings are
    predicate IRIs):

      "p"                 a single predicate edge
      ("inv", e)          ^e       - inverse path (swap ends)
      ("seq", e1, e2...)  e1/e2    - sequence (joins, left to right)
      ("alt", e1, e2...)  e1|e2    - alternative (union)
      ("plus", e)         e+       - one or more (iterative doubling)
      ("star", e)         e*       - zero or more (identity over ALL
                                     graph terms union e+)
      ("opt", e)          e?       - zero or one
      ("nps", [p1, ...])  !(p1|..) - negated property set

    SET semantics throughout (every combinator dedups), which is what
    SPARQL mandates whenever a closure operator appears; a pure
    predicate sequence under bag semantics is `match_bgp`'s job.

    Scale shape: predicate atoms are pushed scan filters; seq is a hash
    join per step; plus/star close via `transitive_closure`
    (ceil(log2(depth)) rounds on the predicate's stripe). The
    zero-length arm of star/opt is the full term set - instance-scale
    by definition - so prefer plus when the query doesn't need the
    reflexive pairs."""
    if isinstance(expr, str):
        return (triples.filter(F.col("pred") == expr)
                .select(F.col("subj").alias("src"),
                        F.col("obj").alias("dst")).distinct())
    op, *args = expr
    if op == "inv":
        inner = path_pairs(triples, args[0], max_rounds)
        return inner.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst"))
    if op == "seq":
        if len(args) < 2:
            raise ValueError("seq needs at least two sub-paths")
        out = path_pairs(triples, args[0], max_rounds)
        for part in args[1:]:
            nxt = path_pairs(triples, part, max_rounds)
            step = nxt.select(F.col("src").alias("dst"),
                              F.col("dst").alias("_d2"))
            out = (out.join(step, "dst")
                   .select("src", F.col("_d2").alias("dst")).distinct())
        return out
    if op == "alt":
        if len(args) < 2:
            raise ValueError("alt needs at least two sub-paths")
        out = path_pairs(triples, args[0], max_rounds)
        for part in args[1:]:
            out = out.unionByName(path_pairs(triples, part, max_rounds))
        return out.distinct()
    if op == "plus":
        from csvweb_spark.operators.entail import transitive_closure
        return transitive_closure(path_pairs(triples, args[0], max_rounds),
                                  max_rounds=max_rounds)
    if op in ("star", "opt"):
        ident = _graph_nodes(triples).select(F.col("node").alias("src"),
                                             F.col("node").alias("dst"))
        arm = (path_pairs(triples, ("plus", args[0]), max_rounds)
               if op == "star"
               else path_pairs(triples, args[0], max_rounds))
        return ident.unionByName(arm).distinct()
    if op == "nps":
        preds = list(args[0])
        if not preds:
            raise ValueError("empty negated property set")
        return (triples.filter(~F.col("pred").isin(preds))
                .select(F.col("subj").alias("src"),
                        F.col("obj").alias("dst")).distinct())
    raise ValueError(f"unknown path operator {op!r}")


def match_path_expr(triples: DataFrame, expr, src_var: str = "?s",
                    dst_var: str = "?o", max_rounds: int = 32) -> DataFrame:
    """`path_pairs` with the ends renamed to SPARQL variables, so the
    result joins with `match_bgp` solutions on shared variable names
    (same contract as `match_path`, which remains the pred+ fast
    path)."""
    return path_pairs(triples, expr, max_rounds).select(
        F.col("src").alias(src_var.lstrip("?")),
        F.col("dst").alias(dst_var.lstrip("?")))


def filter_exists(triples: DataFrame, solutions: DataFrame,
                  patterns: list[Pattern], negate: bool = False,
                  allow_cartesian: bool = False,
                  unbound_possible: bool = False) -> DataFrame:
    """SPARQL FILTER EXISTS { ... } / FILTER NOT EXISTS { ... }:
    keep the solutions for which the sub-BGP has at least one match
    (or none, with `negate`) under the current bindings. Compiled to
    a LEFT SEMI (resp. LEFT ANTI) join on the shared variables - the
    solution multiset is filtered, never multiplied, which is exactly
    the spec's semantics and why this is NOT the same as adding the
    patterns to the group. The sub-BGP must share at least one
    variable with the solutions (a binding-independent EXISTS is a
    constant - evaluate it separately).

    Fast path (default): solutions from plain BGP/VALUES groups never
    carry NULLs in pattern variables, so the shared-variable equality
    join is exact. With `unbound_possible=True` (solutions that went
    through OPTIONAL or variable-padded UNION), the spec's
    substitution semantics leave an UNBOUND variable free in the
    sub-pattern rather than requiring equality - the join condition
    becomes per-variable (NULL-or-equal) conjunctions, a non-equi
    join against the broadcast DISTINCT sub-projection (KB-sized
    right sides only, like match_minus's exact path)."""
    sub = match_bgp(triples, patterns, allow_cartesian=allow_cartesian)
    shared = sorted(set(sub.columns) & set(solutions.columns))
    if not shared:
        raise ValueError(
            "EXISTS group shares no variable with the solutions; its "
            "truth is binding-independent - evaluate it separately")
    how = "left_anti" if negate else "left_semi"
    right = sub.select(*shared).distinct()
    if not unbound_possible:
        return solutions.join(right, shared, how)
    r = right
    for c in shared:
        r = r.withColumnRenamed(c, f"_e_{c}")
    compat = F.lit(True)
    for c in shared:
        compat = compat & (F.col(c).isNull() |
                           (F.col(c) == F.col(f"_e_{c}")))
    return solutions.join(F.broadcast(r), compat, how)


def match_minus(triples: DataFrame, solutions: DataFrame,
                patterns: list[Pattern], allow_cartesian: bool = False,
                unbound_possible: bool = False) -> DataFrame:
    """SPARQL MINUS { ... }: remove each solution that is COMPATIBLE
    with some solution of the sub-group AND shares at least one bound
    variable with it (SPARQL 1.1 §8.3.3). Differs from FILTER NOT
    EXISTS in exactly the corners the spec separates them on:

    * disjoint domains (no shared variable at all): MINUS removes
      NOTHING - returned unchanged here, where `filter_exists(...,
      negate=True)` would raise;
    * a variable unbound (NULL, e.g. from OPTIONAL) on the left is
      simply absent from the compatibility check, not an inequality.

    Fast path (default): solutions from plain BGP/VALUES groups never
    carry NULLs in pattern variables, so compatibility is plain
    equality - one hash LEFT ANTI join on the shared columns, same
    scale shape as `filter_exists`. With `unbound_possible=True` the
    join condition becomes per-variable (NULL-or-equal) conjunctions
    plus an at-least-one-bound guard - exact spec semantics, but a
    non-equi join (broadcast nested loop against the DISTINCT
    projection of the sub-solutions; fine for KB-sized right sides,
    not for corpus-sized ones - restructure the query instead)."""
    sub = match_bgp(triples, patterns, allow_cartesian=allow_cartesian)
    shared = sorted(set(sub.columns) & set(solutions.columns))
    if not shared:
        return solutions
    right = sub.select(*shared).distinct()
    if not unbound_possible:
        return solutions.join(right, shared, "left_anti")
    r = right
    for c in shared:
        r = r.withColumnRenamed(c, f"_m_{c}")
    compat = F.lit(True)
    for c in shared:
        compat = compat & (F.col(c).isNull() |
                           (F.col(c) == F.col(f"_m_{c}")))
    some_bound = F.lit(False)
    for c in shared:
        some_bound = some_bound | F.col(c).isNotNull()
    return solutions.join(F.broadcast(r), compat & some_bound, "left_anti")


def describe_nodes(triples: DataFrame, nodes: DataFrame,
                   node_col: str = "node",
                   include_inbound: bool = True) -> DataFrame:
    """SPARQL DESCRIBE for a resource set: every triple whose SUBJECT is
    a described node, plus (by default) the inbound triples whose IRI
    OBJECT is one - the symmetric concise-bounded description a KG API
    returns for an entity page. Non-IRI objects never match inbound
    (literals that happen to equal a node IRI are data, not links; the
    obj_kind column gates this when present).

    Scale shape: the node set is the retrieval request (tiny) - two
    broadcast LEFT SEMI probes of the corpus-scale triple table, one
    union, no other shuffle. Duplicates (a triple matched both ways)
    are removed by the final distinct."""
    n = F.broadcast(nodes.select(F.col(node_col).alias("_n")).distinct())
    out_edges = triples.join(n, triples["subj"] == F.col("_n"), "left_semi")
    if not include_inbound:
        return out_edges
    obj_is_iri = (F.col("obj_kind") == "iri") if "obj_kind" in triples.columns \
        else F.lit(True)
    in_edges = (triples.filter(obj_is_iri)
                .join(n, triples["obj"] == F.col("_n"), "left_semi"))
    return out_edges.unionByName(in_edges).distinct()


def match_bgp_graph(quads: DataFrame, graph: str,
                    patterns: list[Pattern]) -> DataFrame:
    """SPARQL GRAPH g { BGP } over a (graph, subj, pred, obj) quad
    table (the shape to_nquads exports: page-URL named graphs).

    Constant graph: one pushed filter, then the ordinary match_bgp.
    Variable graph (?g): every pattern's scan carries the graph column
    bound to the variable, so the greedy shared-variable joins
    automatically co-scope all patterns to ONE graph per solution and
    the result binds ?g - provenance-scoped matching ("which PAGE
    asserts this whole pattern"), the KG audit query. Every scan shares
    the graph variable, so the join tree is always connected (no
    cartesian risk by construction). Property-path predicates are not
    supported under a variable graph (paths would need per-graph
    closures - filter to a constant graph first)."""
    if not _is_var(graph):
        t = (quads.filter(F.col("graph") == F.lit(graph))
             .select("subj", "pred", "obj"))
        return match_bgp(t, patterns)
    gname = graph[1:]
    if not gname:
        raise ValueError("bare '?' is not a variable")
    if not patterns:
        raise ValueError("empty pattern list")
    scans = []
    for i, pat in enumerate(patterns):
        if isinstance(pat[1], tuple):
            raise ValueError(
                f"pattern {i}: property paths inside GRAPH {graph} are "
                "not supported - scope to a constant graph first")
        df = quads
        cols = [F.col("graph").alias(gname)]
        seen = {gname: "graph"}
        for pos, term in zip(_POS, pat):
            if _is_var(term):
                name = term[1:]
                if not name:
                    raise ValueError(
                        f"pattern {i}: bare '?' is not a variable")
                if name in seen:
                    df = df.filter(F.col(seen[name]) == F.col(pos))
                else:
                    seen[name] = pos
                    cols.append(F.col(pos).alias(name))
            else:
                df = df.filter(F.col(pos) == F.lit(term))
        scans.append((df.select(*cols), set(seen)))
    # most-constant first; every scan shares the graph variable
    scans.sort(key=lambda s: len(s[1]))
    out, bound = scans[0]
    for df, vs in scans[1:]:
        out = out.join(df, sorted(vs & bound))
        bound |= vs
    return out
