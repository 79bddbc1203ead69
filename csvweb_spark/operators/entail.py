"""RDFS entailment over the materialized (subj, pred, obj) triple table.

The reference emits the raw CSVW conversion graph and leaves reasoning to
the consuming store (DataDock loads into dotNetRDF, whose stores apply
RDFS closure on demand); at web scale the closure has to be materialized
by the engine itself, so this module implements the finite RDFS rule
subset that covers schema inheritance:

* rdfs11  subClassOf transitivity
* rdfs5   subPropertyOf transitivity
* rdfs7   property inheritance      (x p y), (p subPropertyOf q) => (x q y)
* rdfs2   domain typing             (p domain c), (x p y) => (x type c)
* rdfs3   range typing              (p range c),  (x p y) => (y type c)
* rdfs9   type inheritance          (x type a), (a subClassOf b) => (x type b)

Stratification note: with this rule set the fixpoint is reached in ONE
pass once the two schema closures exist - subPropertyOf inheritance can
create triples that fire domain/range, domain/range create rdf:type
triples, and type triples only feed rdfs9 - so the evaluation below
(sp-closure -> rdfs7 -> rdfs2/3 -> sc-closure -> rdfs9) is complete, not
an approximation. No instance-sized iteration ever runs.

Scale shape: ontologies are tiny (10^3-10^5 schema triples) while the
instance set is the 10^12-row KG - so both closures iterate over
broadcast-sized frames on the driver-visible schema subset only, and
every rule application is a BROADCAST hash join against the instance
scan; the single shuffle in the whole plan is the final distinct (and
`dedupe=False` removes even that when the consumer dedups downstream).

DuckDB-oracle-checkable: the closures are recursive CTEs, the rules are
plain joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDFS_SUBCLASS = RDFS + "subClassOf"
RDFS_SUBPROP = RDFS + "subPropertyOf"
RDFS_DOMAIN = RDFS + "domain"
RDFS_RANGE = RDFS + "range"


def transitive_closure(pairs: DataFrame, src: str = "src",
                       dst: str = "dst", max_rounds: int = 32) -> DataFrame:
    """All (src, dst) pairs reachable through the input relation
    (irreflexive paths included as given; no self-pairs are invented).

    Iterative doubling: closure(2^k) = closure(2^(k-1)) JOIN itself, so a
    depth-d hierarchy closes in ceil(log2(d)) rounds, each a hash join +
    distinct on the (small, schema-sized) closure frame with a
    localCheckpoint to truncate lineage. Deterministic set semantics."""
    from pyspark.sql import Observation
    closure = pairs.select(F.col(src).alias("src"),
                           F.col(dst).alias("dst")).distinct() \
        .localCheckpoint(eager=True)
    for _ in range(max_rounds):
        hop = closure.select(F.col("src").alias("mid"),
                             F.col("dst").alias("dst2"))
        # round-6 optimization: eager-checkpoint `new` with the
        # emptiness probe as an observed metric - the old take(1)
        # probe computed the join once for the probe and the union
        # checkpoint re-computed it in full, i.e. ~2 executions per
        # round. The union with the checkpointed delta stays LAZY
        # (a union of cached RDDs is re-read, never re-joined), so
        # each round is exactly one join execution.
        obs = Observation()
        new = (closure.join(hop, closure["dst"] == hop["mid"])
               .select("src", F.col("dst2").alias("dst"))
               .join(closure, ["src", "dst"], "left_anti")
               .distinct()
               .observe(obs, F.count(F.lit(1)).alias("n"))
               .localCheckpoint(eager=True))
        if obs.get["n"] == 0:
            break
        closure = closure.unionByName(new)
    return closure


def transitive_closure_incremental(new_pairs: DataFrame, closed: DataFrame,
                                   max_rounds: int = 32) -> DataFrame:
    """The reachability a batch of new edges ADDS to an already-
    transitively-closed relation, without re-closing the history - the
    semi-naive step transitive properties need under incremental
    arrival (the non-linear counterpart of rdfs_closure_incremental:
    paths can alternate old and new edges, so this is NOT a plain
    closure of the batch).

    Seed = every path using exactly ONE new edge, built by bridging
    each new edge with an optional closed-prefix and closed-suffix
    (A.dst = d.src hash joins - the big `closed` side is only ever
    probed, never re-closed). Multi-new-edge paths then close by
    iterative doubling over the seed alone: a seed pair already carries
    its A-extensions at both ends, so composing seeds at their meeting
    node covers every old/new alternation (induction over the number
    of new edges on the path). Cost per batch is bounded by the NEW
    reachability, never by |closed|. Returns only pairs absent from
    `closed`."""
    a = closed.select("src", "dst").distinct()
    d = new_pairs.select("src", "dst").distinct()
    pre = a.select(F.col("src").alias("_ps"), F.col("dst").alias("_pd"))
    suf = a.select(F.col("src").alias("_ss"), F.col("dst").alias("_sd"))
    with_pre = d.unionByName(
        pre.join(d, pre["_pd"] == d["src"])
        .select(F.col("_ps").alias("src"), F.col("dst")))
    seed = with_pre.unionByName(
        with_pre.join(suf, with_pre["dst"] == suf["_ss"])
        .select(F.col("src"), F.col("_sd").alias("dst"))) \
        .distinct().localCheckpoint(eager=True)
    from pyspark.sql import Observation
    closure = seed
    for _ in range(max_rounds):
        hop = closure.select(F.col("src").alias("_mid"),
                             F.col("dst").alias("_d2"))
        # same one-execution-per-round shape as transitive_closure
        obs = Observation()
        new = (closure.join(hop, closure["dst"] == hop["_mid"])
               .select("src", F.col("_d2").alias("dst"))
               .join(closure, ["src", "dst"], "left_anti")
               .distinct()
               .observe(obs, F.count(F.lit(1)).alias("n"))
               .localCheckpoint(eager=True))
        if obs.get["n"] == 0:
            break
        closure = closure.unionByName(new)
    return closure.join(a, ["src", "dst"], "left_anti")


def transitive_reduction(pairs: DataFrame, src: str = "src",
                         dst: str = "dst", max_rounds: int = 32,
                         validate_acyclic: bool = True) -> DataFrame:
    """Minimal equivalent DAG (Aho-Garey-Ullman): drop every edge
    (a, c) for which a longer path a -> b ->* c also exists. For a DAG
    the reduction is UNIQUE, so the output is a canonical hierarchy.

    The ontology-cleanup stage after induction: subclass edges
    harvested from 10^12 pages arrive redundantly closed (one site
    asserts Poodle < Animal, another Poodle < Dog < Animal - both
    true, but materializing the shortcut bloats every downstream
    closure and renders the taxonomy unreadable). The reference never
    faces this (tableSchema hierarchies are single-source,
    /root/reference/src/DataDock.CsvWeb/Metadata/Schema.cs); a fused
    crawl-scale ontology must be re-minimized.

    An edge (a, c) is redundant iff some (a, b) edge continues with a
    path b ->* c (b != c; on a DAG the closure has no self-pairs, so
    the (a, c) edge itself never witnesses its own redundancy). One
    closure (iterative doubling, log-depth rounds) + one hash join +
    one anti-join - all on the slim schema-sized pair frame, never the
    instance level.

    Cycles make reduction non-unique; `validate_acyclic` (one cheap
    take(1) on the closure's diagonal) raises instead of silently
    emitting an arbitrary variant - condense cycles first
    (`graph.strongly_connected_components` + `graph.condensation`).
    """
    e = (pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src") != F.col("dst"))
         .distinct())
    clo = transitive_closure(e, max_rounds=max_rounds)
    if validate_acyclic and clo.filter(F.col("src") == F.col("dst")).take(1):
        raise ValueError(
            "transitive_reduction requires a DAG: the input relation "
            "contains a cycle (condense SCCs first)")
    mid = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    reach = clo.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    redundant = (mid.join(reach, "b")
                 .select(F.col("a").alias("src"), F.col("c").alias("dst"))
                 .distinct())
    return e.join(redundant, ["src", "dst"], "left_anti")


def rdfs_closure(triples: DataFrame, derived_only: bool = False,
                 dedupe: bool = True) -> DataFrame:
    """Materialize the RDFS entailment of a (subj, pred, obj) triple set
    under rules rdfs2/3/5/7/9/11 (module docstring). Returns the same
    three columns; `derived_only` drops the input triples from the
    output, `dedupe=False` skips the final distinct (the one shuffle)."""
    t = triples.select("subj", "pred", "obj")

    sub_prop = transitive_closure(
        t.filter(F.col("pred") == RDFS_SUBPROP)
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst")))
    sub_class = transitive_closure(
        t.filter(F.col("pred") == RDFS_SUBCLASS)
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst")))
    domains = t.filter(F.col("pred") == RDFS_DOMAIN).select(
        F.col("subj").alias("p"), F.col("obj").alias("cls"))
    ranges = t.filter(F.col("pred") == RDFS_RANGE).select(
        F.col("subj").alias("p"), F.col("obj").alias("cls"))

    # rdfs5/11: the closures themselves are entailed schema triples
    d_subprop = sub_prop.select(F.col("src").alias("subj"),
                                F.lit(RDFS_SUBPROP).alias("pred"),
                                F.col("dst").alias("obj"))
    d_subclass = sub_class.select(F.col("src").alias("subj"),
                                  F.lit(RDFS_SUBCLASS).alias("pred"),
                                  F.col("dst").alias("obj"))

    # rdfs7 over the instance scan (schema side broadcast)
    d_rdfs7 = (t.join(F.broadcast(sub_prop), t["pred"] == sub_prop["src"])
               .select("subj", F.col("dst").alias("pred"), "obj"))

    # rdfs2/3 fire on asserted AND rdfs7-derived property triples
    props = t.unionByName(d_rdfs7)
    d_rdfs2 = (props.join(F.broadcast(domains), props["pred"] == domains["p"])
               .select("subj", F.lit(RDF_TYPE).alias("pred"),
                       F.col("cls").alias("obj")))
    d_rdfs3 = (props.join(F.broadcast(ranges), props["pred"] == ranges["p"])
               .select(F.col("obj").alias("subj"),
                       F.lit(RDF_TYPE).alias("pred"),
                       F.col("cls").alias("obj")))

    # rdfs9 on ALL type triples: asserted, rdfs2/3-derived, AND
    # rdfs7-derived (a property declared subPropertyOf rdf:type emits
    # type triples through the inheritance pass - round-4 review; the
    # one-pass stratification is complete only with props as the base)
    types = (props.filter(F.col("pred") == RDF_TYPE)
             .unionByName(d_rdfs2).unionByName(d_rdfs3))
    d_rdfs9 = (types.join(F.broadcast(sub_class),
                          types["obj"] == sub_class["src"])
               .select("subj", F.lit(RDF_TYPE).alias("pred"),
                       F.col("dst").alias("obj")))

    derived = (d_subprop.unionByName(d_subclass).unionByName(d_rdfs7)
               .unionByName(d_rdfs2).unionByName(d_rdfs3)
               .unionByName(d_rdfs9))
    if derived_only:
        out = derived.join(t, ["subj", "pred", "obj"], "left_anti")
    else:
        out = t.unionByName(derived)
    return out.distinct() if dedupe else out


def rdfs_closure_incremental(delta: DataFrame, committed: DataFrame,
                             schema: DataFrame) -> DataFrame:
    """Entail ONLY what a new instance batch adds to an already-closed
    store: the instance-side RDFS rules (rdfs2/3/7/9) are LINEAR - each
    has exactly one instance premise, and their cascades (rdfs7-derived
    property triples feeding rdfs2/3, whose type triples feed rdfs9)
    never join two instance triples - so

        closure(S u delta) = closure(S) u closure(schema u delta)

    and the incremental step is one closure over the (small) batch plus
    an anti-join against the committed store. This is what makes
    continuous entailment viable on a stream: per-batch cost is bounded
    by the batch, never by the 10^12-triple history (the same argument
    as incremental_components, but with no iteration at all).

    `delta` must be INSTANCE triples only - a new schema axiom
    (subClassOf/subPropertyOf/domain/range) re-fires rules over the
    whole committed store, which is a batch re-closure, not an
    increment; such deltas raise. Returns the NEW triples only (the
    batch's assertions and their entailments, minus anything already
    committed) - append it to the store. Composes with the batch-dir
    state family: set union is associative, so per-batch derived dirs
    merge by plain distinct at read time."""
    schema_preds = (RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE)
    bad = delta.filter(F.col("pred").isin(*schema_preds)).take(1)
    if bad:
        raise ValueError(
            f"schema triple in incremental delta (pred={bad[0].pred}): "
            "new axioms require a batch re-closure, not an increment")
    full = rdfs_closure(schema.select("subj", "pred", "obj")
                        .unionByName(delta.select("subj", "pred", "obj")))
    return full.join(committed.select("subj", "pred", "obj"),
                     ["subj", "pred", "obj"], "left_anti")


def _owl_emission(symmetric, inverse, transitive):
    """Driver-side (predicate, flipped?) state closure shared by the
    batch and incremental OWL property closures: from (p, False) reach
    every state the symmetric/inverseOf rules derive. Returns
    (emission map, transitive predicate set); raises when a transitive
    predicate's inverse partner is not transitive (OWL requires it, and
    the closure-after-emission ordering relies on it)."""
    inverse = dict(inverse or {})
    sym = set(symmetric)
    trans = set(transitive)
    # owl:inverseOf is symmetric at the schema level
    inv_pairs = set(inverse.items()) | {(q, p) for p, q in inverse.items()}
    for p, q in inv_pairs:
        if p in trans and q not in trans:
            raise ValueError(
                f"inverse partner {q!r} of transitive {p!r} must be "
                "transitive too (OWL: inverse of transitive is transitive)")
    emission: dict[str, set] = {}
    preds = sym | trans | {p for pq in inv_pairs for p in pq}
    for p in preds:
        seen = {(p, False)}
        stack = [(p, False)]
        while stack:
            cur, flip = stack.pop()
            nxt = []
            if cur in sym:
                nxt.append((cur, not flip))
            for a, b in inv_pairs:
                if a == cur:
                    nxt.append((b, not flip))
            for st in nxt:
                if st not in seen:
                    seen.add(st)
                    stack.append(st)
        targets = seen - {(p, False)}
        if targets:
            emission[p] = targets
    return emission, trans


def _owl_emit(t: DataFrame, emission: dict) -> DataFrame:
    """One narrow pass: each edge unions in every (pred, flipped) state
    its predicate reaches - the linear (delta-local) rule half."""
    pre = t
    for p, targets in sorted(emission.items()):
        base = t.filter(F.col("pred") == p)
        for q, flip in sorted(targets):
            if flip:
                pre = pre.unionByName(base.select(
                    F.col("obj").alias("subj"), F.lit(q).alias("pred"),
                    F.col("subj").alias("obj")))
            else:
                pre = pre.unionByName(base.select(
                    "subj", F.lit(q).alias("pred"), "obj"))
    return pre


def owl_property_closure_incremental(delta: DataFrame,
                                     committed: DataFrame,
                                     symmetric: tuple | list = (),
                                     inverse: dict | None = None,
                                     transitive: tuple | list = (),
                                     max_rounds: int = 32) -> DataFrame:
    """What a new batch of assertions ADDS to a store already closed by
    `owl_property_closure` under the SAME rule configuration. The
    symmetric/inverseOf half is linear (delta-local, one emission pass
    over the batch); each transitive predicate then takes the
    semi-naive `transitive_closure_incremental` against its committed
    (already-closed) stripe, so old/new edge alternations close at
    batch-bounded cost. Completeness across rules reuses the batch
    operator's argument: closure commutes with edge reversal and the
    history's stripes are mutually flip-consistent (inverse partners
    both transitive, enforced), so each predicate's own incremental
    closure already contains every cross-rule re-emission. Returns only
    triples absent from `committed`."""
    emission, trans = _owl_emission(symmetric, inverse, transitive)
    d = delta.select("subj", "pred", "obj")
    pre = _owl_emit(d, emission)
    out = pre
    for p in sorted(trans):
        new_edges = (pre.filter(F.col("pred") == p)
                     .select(F.col("subj").alias("src"),
                             F.col("obj").alias("dst")))
        stripe = (committed.filter(F.col("pred") == p)
                  .select(F.col("subj").alias("src"),
                          F.col("obj").alias("dst")))
        inc = transitive_closure_incremental(new_edges, stripe,
                                             max_rounds=max_rounds)
        out = out.unionByName(inc.select(
            F.col("src").alias("subj"), F.lit(p).alias("pred"),
            F.col("dst").alias("obj")))
    return (out.distinct()
            .join(committed.select("subj", "pred", "obj"),
                  ["subj", "pred", "obj"], "left_anti"))


def owl_property_closure(triples: DataFrame,
                         symmetric: tuple | list = (),
                         inverse: dict | None = None,
                         transitive: tuple | list = (),
                         derived_only: bool = False,
                         dedupe: bool = True,
                         max_rounds: int = 32) -> DataFrame:
    """Materialize the OWL property-characteristic entailments for the
    EXPLICITLY listed predicates (the practical "RDFS-Plus" subset on
    top of `rdfs_closure`):

    * symmetric   p in `symmetric`:    (x p y) => (y p x)
    * inverseOf   p -> q in `inverse`: (x p y) => (y q x), both ways
                                       (owl:inverseOf is itself symmetric)
    * transitive  p in `transitive`:   (x p y), (y p z) => (x p z)

    Rule interaction is closed EXACTLY for symmetric/inverse by a
    driver-side fixpoint over (predicate, flipped?) states - predicate
    rules are schema-sized, so chains like p inverseOf q, q symmetric,
    q inverseOf r cost nothing to pre-resolve - and the instance data
    is then scanned ONCE, each p-edge emitting every state its
    predicate reaches. Transitive predicates are closed afterwards by
    per-predicate iterative doubling (`transitive_closure`,
    ceil(log2(depth)) rounds). Completeness of that ordering requires
    the OWL-mandated shape: the inverse of a transitive property is
    transitive, and closure of an (already emitted) symmetric edge set
    is symmetric - both hold because closure commutes with edge
    reversal, so re-feeding closure output through the emission map
    yields nothing new. A transitive predicate whose inverse partner
    is NOT listed transitive violates that assumption and raises.

    Scale shape: the emission pass is a narrow per-edge flatMap
    (predicate-dispatched selects under one union - no shuffle, no
    Python); each transitive closure shuffles only its predicate's
    stripe. Beware instance-scale transitive predicates: closure size
    is worst-case quadratic (the khop/path caveat)."""
    emission, trans = _owl_emission(symmetric, inverse, transitive)
    t = triples.select("subj", "pred", "obj")
    pre = _owl_emit(t, emission)

    closed = []
    for p in sorted(trans):
        edges = (pre.filter(F.col("pred") == p)
                 .select(F.col("subj").alias("src"),
                         F.col("obj").alias("dst")))
        closure = transitive_closure(edges, max_rounds=max_rounds)
        closed.append(closure.select(
            F.col("src").alias("subj"), F.lit(p).alias("pred"),
            F.col("dst").alias("obj")))

    out = pre
    for c in closed:
        out = out.unionByName(c)
    if derived_only:
        out = out.join(t, ["subj", "pred", "obj"], "left_anti")
    return out.distinct() if dedupe else out


OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def sameas_labels(triples: DataFrame,
                  sameas_pred: str = OWL_SAMEAS) -> DataFrame:
    """(iri, canonical) for every IRI touched by a `sameas_pred`
    assertion: connected components over the sameAs graph (owl:sameAs is
    symmetric/transitive, so identity groups ARE the components), with
    the LEXICOGRAPHICALLY SMALLEST member IRI as the group's canonical
    representative - a deterministic, engine-independent choice that a
    SQL oracle can reproduce (min over the component), unlike the
    hash-min label CC converges on internally.

    Scale shape: the sameAs stripe is the linking layer's output
    (KB-sized, not corpus-sized); CC runs on xxhash64 node ids through
    the salted large/small-star loop (`canonicalize.connected_components`,
    hub-safe), and the label -> min-IRI election is one
    map-side-combinable agg."""
    from .canonicalize import connected_components
    pairs = (triples.filter(F.col("pred") == sameas_pred)
             .select(F.col("subj").alias("a"), F.col("obj").alias("b")))
    iris = (pairs.select(F.col("a").alias("iri"))
            .unionByName(pairs.select(F.col("b").alias("iri")))
            .distinct())
    labels = connected_components(
        pairs.select(F.xxhash64("a").alias("src"),
                     F.xxhash64("b").alias("dst")))
    labeled = iris.join(labels,
                        F.xxhash64("iri") == F.col("node")) \
                  .select("iri", "component")
    reps = (labeled.groupBy("component")
            .agg(F.min("iri").alias("canonical")))
    return labeled.join(reps, "component").select("iri", "canonical")


def smush_sameas(triples: DataFrame, sameas_pred: str = OWL_SAMEAS,
                 keep_sameas: bool = False, dedupe: bool = True,
                 broadcast_map: bool | str = "auto") -> DataFrame:
    """owl:sameAs identity smushing - the canonicalization step that
    turns linked mentions into ONE node per real-world entity: every
    IRI in a sameAs component is rewritten (subject position always;
    object position only for obj_kind='iri' rows, literals/bnodes pass
    through) to the component's canonical representative
    (`sameas_labels`). The reference leaves identity to the consuming
    store (dotNetRDF applies sameAs at query time); a 10^12-triple KG
    must materialize it once instead.

    sameAs assertions themselves are dropped by default (they are
    exhausted by the rewrite; `keep_sameas=True` retains them rewritten,
    where surviving non-reflexive edges indicate cross-component links
    worth auditing). Rewriting can collapse distinct triples into
    duplicates, so the result is `distinct()`ed unless `dedupe=False`.

    Scale shape: the (iri -> canonical) map is KB-sized but
    DATA-DEPENDENT (every IRI in any sameAs component), so whether it is
    broadcast is policy, not hardcoded: `broadcast_map` is True / False /
    "auto" (default; count-gated against
    spark.sql.autoBroadcastJoinThreshold via
    `canonicalize.resolve_broadcast` - a map that outgrows executor
    memory falls back to a plain hash/sort-merge join instead of OOMing).
    With the fallback, the corpus-scale triple side joins zero-exchange
    when the store is bucketed by subj (plans/bucketed.write_bucketed);
    only the final distinct shuffles (drop it when the downstream sink
    dedups)."""
    from .canonicalize import resolve_broadcast
    # round-6 optimization: the canonical map feeds the broadcast-policy
    # probe plus BOTH rewrite join sides - un-pinned, each consumer
    # re-ran the label election joins above the CC fixpoint
    canon = sameas_labels(triples, sameas_pred).localCheckpoint(eager=False)
    rest = (triples if keep_sameas
            else triples.filter(F.col("pred") != sameas_pred))
    hint = (F.broadcast if resolve_broadcast(canon, broadcast_map)
            else (lambda df: df))
    smap = hint(canon.select(F.col("iri").alias("_si"),
                             F.col("canonical").alias("_sc")))
    omap = hint(canon.select(F.col("iri").alias("_oi"),
                             F.col("canonical").alias("_oc")))
    t = (rest.join(smap, rest["subj"] == F.col("_si"), "left").drop("_si")
             .join(omap, rest["obj"] == F.col("_oi"), "left").drop("_oi"))
    obj_is_iri = (F.col("obj_kind") == "iri") if "obj_kind" in rest.columns \
        else F.lit(True)
    out = (t.withColumn("subj", F.coalesce("_sc", "subj"))
            .withColumn("obj", F.when(obj_is_iri,
                                      F.coalesce("_oc", "obj"))
                                .otherwise(F.col("obj")))
            .drop("_sc", "_oc"))
    return out.distinct() if dedupe else out
