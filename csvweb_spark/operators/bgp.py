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


def _pattern_df(triples: DataFrame, pat: Pattern, idx: int) -> DataFrame:
    """One filtered scan; variable columns renamed to the variable name,
    constant columns filtered then dropped."""
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
              optional: list[list[Pattern]] | None = None) -> DataFrame:
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
    it collapses into the same Catalyst plan."""
    if not patterns:
        raise ValueError("empty pattern list")
    scans = [(_pattern_df(triples, p, i),
              {t[1:] for t in p if _is_var(t) and len(t) > 1})
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
    for i, group in enumerate(optional or []):
        sub = match_bgp(triples, group, allow_cartesian=allow_cartesian)
        shared = sorted(set(sub.columns) & set(out.columns))
        if not shared:
            raise ValueError(
                f"OPTIONAL group {i} shares no variable with the "
                "required pattern (would cross-join every solution)")
        out = out.join(sub, shared, "left")
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
