"""Ontology induction: infer predicate domain/range class signatures
from instance data (rdfs:domain / rdfs:range candidates with support
and coverage).

The reference converts tables under a user-supplied tableSchema
(/root/reference/src/DataDock.CsvWeb/Metadata/Schema.cs) - the
schema is an INPUT. A KG constructed from 10^12 heterogeneous web
pages has no upfront schema; the ontology has to be induced from the
instance level: for each predicate, which classes do its subjects and
objects actually instantiate? The induced (pred, domain, range)
signatures feed SHACL shape drafting (`operators/shacl.py`), entity-
type inference, and extraction QA (a `birthPlace` whose subjects are
60% Product is an extractor bug surfacing statistically).

Counting semantics (deterministic, integer-exact):
  * typed assertions count (assertion occurrence x type) pairs - an
    entity with two rdf:type classes contributes one pair per class
    (multi-typing is evidence for both signatures, and the denominator
    counts the same pairs, so coverage_ppm still sums to 10^6 per
    (pred, position));
  * assertions whose subject/object has NO rdf:type row are excluded
    from that position's denominator (untyped web entities dominate
    any crawl; they carry no class evidence either way);
  * coverage_ppm = floor(10^6 * support / typed_total) in exact
    integer arithmetic - replayable bit-for-bit by the SQL oracle.

Scale shape: the type map (entity -> class) is one filtered projection
of the triple scan; each position is ONE hash join of slim
(pred, entity) fact rows against it plus ONE map-side-combinable
count. The type map's size is data-dependent (every typed entity), so
no broadcast hint (round-4 verdict) - AQE promotes it when small, and
over a subj-bucketed triple store the domain join is co-partitioned.
The per-(pred, position) totals reuse the same counted rows via a
window over pred x position - cardinality = predicates x 2, never the
instance count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def predicate_functionality(triples: DataFrame,
                            subj: str = "subj", pred: str = "pred",
                            obj: str = "obj") -> DataFrame:
    """Per-predicate functionality profile over the RDF SET of
    assertions (duplicates collapse first - provenance copies are not
    evidence of multi-valuedness).

    fun_ppm     = floor(10^6 * n_subjects / n_pairs)   (PARIS's
                  functionality: 10^6 exactly when every subject has
                  one object - a functional predicate)
    inv_fun_ppm = floor(10^6 * n_objects  / n_pairs)   (inverse
                  functionality: 10^6 when objects identify subjects -
                  the key-like predicates entity alignment weights by)

    The audit that tells knowledge fusion WHICH predicates to fuse
    (electing one object is only sound where fun_ppm is near 10^6;
    `fusion.fuse_triples` on a genuinely multi-valued predicate like
    ex:child would destroy data) and tells `align_entities` which
    shared values are identifying. The reference emits whatever the
    tableSchema prescribes (single-valued unless `separator` splits,
    /root/reference/src/DataDock.CsvWeb/Metadata/ColumnDescription.cs)
    - at crawl scale functionality must be MEASURED, not assumed.

    Scale shape: one distinct on slim (s,p,o), then per predicate two
    approx-free distinct counts + a pair count in ONE grouped
    aggregate (count_distinct over two columns each - Spark expands to
    partial aggregates; cardinality = predicates). Integer floor
    division - oracle-exact.
    """
    t = (triples.select(F.col(subj).alias("s"), F.col(pred).alias("p"),
                        F.col(obj).alias("o"))
         .distinct())
    return (t.groupBy(F.col("p").alias("pred"))
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.count_distinct(F.col("s")).alias("n_subjects"),
                 F.count_distinct(F.col("o")).alias("n_objects"))
            .select("pred", "n_pairs", "n_subjects", "n_objects",
                    F.expr("CAST(1000000 AS BIGINT) * n_subjects div "
                           "n_pairs").alias("fun_ppm"),
                    F.expr("CAST(1000000 AS BIGINT) * n_objects div "
                           "n_pairs").alias("inv_fun_ppm")))


def mine_predicate_rules(triples: DataFrame,
                         subj: str = "subj", pred: str = "pred",
                         obj: str = "obj",
                         scale: int = 1_000_000,
                         min_support: int = 1,
                         min_conf_ppm: int = 0) -> DataFrame:
    """Depth-1 horn-rule mining over the instance level (the AMIE
    rule shapes a single join can evaluate): for every ordered
    predicate pair, how often does one assertion entail the other?

      implies    p1(x,y) => p2(x,y)   (p1 != p2; e.g. ex:capitalOf =>
                                       ex:locatedIn)
      inverse    p1(x,y) => p2(y,x)   (p1 != p2; ex:parent/ex:child)
      symmetric  p(x,y)  => p(y,x)    (the p1 == p2 diagonal of the
                                       inverse join; ex:spouse)

    support  = |{(x, y): body AND head hold}| over the RDF SET
    conf_ppm = floor(scale * support / n_body)  - AMIE's standard
    confidence (no PCA denominator: deciding which absent facts count
    as false needs the functionality profile; callers who want PCA
    confidence can join `predicate_functionality` and rescale).

    The ontology-enrichment stage after extraction: mined inverses
    and symmetries feed `owl_property_closure` (which MATERIALIZES
    owl:inverseOf / owl:SymmetricProperty semantics but has to be told
    which predicates carry them), and high-confidence implications are
    extraction-QA signals (a crawl-induced subPropertyOf candidate).

    Scale shape: one distinct on slim (s,p,o), then two self-joins
    keyed by the FULL entity pair ((x,y) forward, (y,x) inverse) -
    the key includes both entities, so per-key fan-out is the number
    of predicates asserted between one ordered pair (tiny; no hub can
    square up) - plus one map-side-combinable support count per
    ordered predicate pair and a broadcast-eligible denominator join
    (predicate census: one row per predicate).
    """
    t = (triples.select(F.col(subj).alias("s"), F.col(pred).alias("p"),
                        F.col(obj).alias("o"))
         .distinct())
    body = t.select(F.col("s").alias("x"), F.col("o").alias("y"),
                    F.col("p").alias("p1"))
    head_fwd = t.select(F.col("s").alias("x"), F.col("o").alias("y"),
                        F.col("p").alias("p2"))
    head_inv = t.select(F.col("o").alias("x"), F.col("s").alias("y"),
                        F.col("p").alias("p2"))
    implies = (body.join(head_fwd, ["x", "y"])
               .filter(F.col("p1") != F.col("p2"))
               .withColumn("rule_type", F.lit("implies")))
    # a self-loop p(a,a) is its own mirror image - trivial, never
    # evidence of inverseness/symmetry (it still counts in n_body)
    inv = (body.filter(F.col("x") != F.col("y"))
           .join(head_inv, ["x", "y"])
           .withColumn("rule_type",
                       F.when(F.col("p1") == F.col("p2"),
                              F.lit("symmetric"))
                       .otherwise(F.lit("inverse"))))
    n_body = t.groupBy(F.col("p").alias("p1")) \
        .agg(F.count(F.lit(1)).alias("n_body"))
    return (implies.unionByName(inv)
            .groupBy("rule_type", "p1", "p2")
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= int(min_support))
            .join(n_body, "p1")
            .select("rule_type", "p1", "p2", "support", "n_body",
                    F.expr(f"CAST({int(scale)} AS BIGINT) * support div "
                           "n_body").alias("conf_ppm"))
            .filter(F.col("conf_ppm") >= int(min_conf_ppm)))


def mine_subclass_candidates(triples: DataFrame,
                             subj: str = "subj", pred: str = "pred",
                             obj: str = "obj",
                             type_pred: str = RDF_TYPE,
                             scale: int = 1_000_000,
                             min_support: int = 1,
                             min_conf_ppm: int = 0) -> DataFrame:
    """Subclass-axiom mining from instance overlap: class A is a
    subclass CANDIDATE of class B to the extent that A's instances
    are also typed B - conf_ppm = floor(scale * |A cap B| / |A|), the
    set-containment confidence (10^6 = every A instance is a B
    instance; the class-level sibling of `mine_predicate_rules`'
    implication shape).

    The taxonomy-INDUCTION stage: harvested rdf:type assertions from
    10^12 pages carry no subclass axioms, so the hierarchy is mined
    here, fed through `entail.transitive_reduction` to recover the
    covering edges, and then drafted into SHACL shapes - induction ->
    reduction -> validation, all instance-driven. Both directions are
    emitted (real taxonomies are asymmetric: Poodle => Dog at 10^6,
    Dog => Poodle low) and the diagonal is excluded.

    Scale shape: one distinct on the slim (entity, class) projection,
    ONE self-join keyed by ENTITY (fan-out per key = that entity's
    type count squared - multi-typing is small, so no class however
    huge can square the join up), one map-side-combinable support
    count per ordered class pair, and a broadcast-eligible class
    census join (one row per class). Integer floor division - the
    oracle replays bit-for-bit.
    """
    types = (triples.filter(F.col(pred) == type_pred)
             .select(F.col(subj).alias("entity"),
                     F.col(obj).alias("cls"))
             .distinct())
    a = types.select("entity", F.col("cls").alias("sub"))
    b = types.select("entity", F.col("cls").alias("sup"))
    n = types.groupBy(F.col("cls").alias("sub")) \
        .agg(F.count(F.lit(1)).alias("n_sub"))
    return (a.join(b, "entity")
            .filter(F.col("sub") != F.col("sup"))
            .groupBy("sub", "sup")
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= int(min_support))
            .join(n, "sub")
            .select("sub", "sup", "support", "n_sub",
                    F.expr(f"CAST({int(scale)} AS BIGINT) * support div "
                           "n_sub").alias("conf_ppm"))
            .filter(F.col("conf_ppm") >= int(min_conf_ppm)))


def induce_domain_range(triples: DataFrame,
                        subj: str = "subj", pred: str = "pred",
                        obj: str = "obj",
                        type_pred: str = RDF_TYPE,
                        min_support: int = 1) -> DataFrame:
    """Per-predicate class-signature induction.

    Returns (pred, position, type, support, typed_total, coverage_ppm)
    where position is 'domain' (subject classes) or 'range' (object
    classes), support counts (assertion, class) pairs, typed_total is
    the position's denominator and coverage_ppm the exact integral
    share. rdf:type rows themselves are excluded from the relation
    side (their signature is definitional, not induced).
    """
    s, p, o = F.col(subj), F.col(pred), F.col(obj)
    types = (triples.filter(p == type_pred)
             .select(s.alias("entity"), o.alias("type"))
             .distinct())
    rel = triples.filter(p != type_pred)
    dom = (rel.select(p.alias("pred"), s.alias("entity"))
           .join(types, "entity")
           .groupBy("pred", "type")
           .agg(F.count(F.lit(1)).alias("support"))
           .withColumn("position", F.lit("domain")))
    rng = (rel.select(p.alias("pred"), o.alias("entity"))
           .join(types, "entity")
           .groupBy("pred", "type")
           .agg(F.count(F.lit(1)).alias("support"))
           .withColumn("position", F.lit("range")))
    both = dom.unionByName(rng)
    tot = Window.partitionBy("pred", "position")
    return (both
            .withColumn("typed_total", F.sum("support").over(tot))
            .filter(F.col("support") >= int(min_support))
            .select("pred", "position", "type", "support", "typed_total",
                    F.expr("CAST(1000000 AS BIGINT) * support div "
                           "typed_total").alias("coverage_ppm")))
