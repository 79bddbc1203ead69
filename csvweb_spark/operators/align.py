"""Cross-KG entity alignment: match entities ACROSS two independently
extracted knowledge graphs by shared (pred, value) evidence, weighted
by how identifying each shared value is (PARIS-style instance matching
reduced to deterministic integer arithmetic).

The linking family (`operators/linking.py`) resolves MENTIONS against
a curated alias dictionary; alignment has no dictionary - two crawls
(two snapshots, two sites, two extractors) each minted their own
entity IRIs for the same real-world things, and the only signal is the
facts themselves. The reference converts one table under one metadata
document (/root/reference/src/DataDock.CsvWeb/Rdf/Converter.cs) so its
IRIs are single-source by construction; a web-scale KG built from
10^12 pages re-extracts the same entities from thousands of sites and
must reconcile them before `canonicalize` can smush anything - the
output (e1, e2) matches are precisely the owl:sameAs candidates the
canonicalization stage consumes.

Scoring (deterministic, integer-exact, oracle-replayable):
  * evidence = the RDF SET of (entity, pred, obj) assertions per side
    (duplicates collapse; provenance copies are not extra evidence);
  * a shared key (pred, obj) asserted by n1 entities on side 1 and n2
    on side 2 contributes floor(scale / (n1 * n2)) to every pair it
    witnesses - a value unique on both sides contributes the full
    scale, `type=Person` contributes ~0 (the resource-allocation
    weighting `graph.link_prediction_ra` uses, applied to the
    bipartite evidence graph; PARIS's inverse-functionality weighting
    has the same monotonicity but needs float products);
  * keys with n1 * n2 > max_key_pairs are DROPPED before the
    quadratic candidate join (the census cap every dedup/LSH operator
    here uses: a key shared by thousands of entities generates the
    most join work and carries the least signal - near-zero weight);
  * per side-1 entity the best side-2 match wins (score desc, then
    lexicographically smallest e2 - reproducible on any cluster
    shape); `mutual` marks pairs that are ALSO the best match for
    their side-2 entity - the high-precision subset.

Scale shape: two slim distinct projections, one census groupBy per
side, one hash join on the evidence key (bounded by the cap), one
map-side-combinable pair aggregate, two rank windows. Nothing
broadcasts unconditionally and no text column survives past the
evidence projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def align_entities(kg1: DataFrame, kg2: DataFrame,
                   subj: str = "subj", pred: str = "pred",
                   obj: str = "obj",
                   scale: int = 1_000_000,
                   max_key_pairs: int = 10_000,
                   min_shared: int = 1,
                   min_score: int = 0,
                   mutual_only: bool = False,
                   return_dropped: bool = False):
    """Align kg1 entities to kg2 entities by weighted shared facts.

    Returns one row per matched side-1 entity:
      (e1, e2, n_shared, score_ppm, mutual)
    where score_ppm sums floor(scale / (n1*n2)) over the shared
    evidence keys, n_shared counts them, and mutual is true when
    (e1, e2) is the best pair from both directions. `mutual_only`
    keeps only that subset. Ties elect the smallest entity IRI.

    The census cap is ON by default, so it is auditable (repo rule:
    no silent cuts): `return_dropped=True` returns (matches, dropped)
    where dropped lists every evidence key the cap excluded as
    (p, o, n1, n2) - each would have contributed <= scale/(n1*n2)
    ~ scale/cap per pair, so the audit doubles as the error bound.
    """
    def side(kg, name):
        return (kg.select(F.col(subj).alias(name),
                          F.col(pred).alias("p"), F.col(obj).alias("o"))
                .distinct())

    s1, s2 = side(kg1, "e1"), side(kg2, "e2")
    c1 = s1.groupBy("p", "o").agg(F.count(F.lit(1)).alias("n1"))
    c2 = s2.groupBy("p", "o").agg(F.count(F.lit(1)).alias("n2"))
    censused = c1.join(c2, ["p", "o"])
    dropped = censused.filter(
        F.col("n1") * F.col("n2") > int(max_key_pairs))
    keys = (censused
            .filter(F.col("n1") * F.col("n2") <= int(max_key_pairs))
            .select("p", "o",
                    F.expr(f"CAST({int(scale)} AS BIGINT) div "
                           "(CAST(n1 AS BIGINT) * CAST(n2 AS BIGINT))")
                    .alias("_w")))
    cand = (s1.join(keys, ["p", "o"])
            .join(s2, ["p", "o"])
            .groupBy("e1", "e2")
            .agg(F.count(F.lit(1)).alias("n_shared"),
                 F.sum("_w").alias("score_ppm"))
            .filter((F.col("n_shared") >= int(min_shared)) &
                    (F.col("score_ppm") >= int(min_score))))
    w1 = Window.partitionBy("e1").orderBy(F.col("score_ppm").desc(),
                                          F.col("e2").asc())
    w2 = Window.partitionBy("e2").orderBy(F.col("score_ppm").desc(),
                                          F.col("e1").asc())
    ranked = (cand.withColumn("_r1", F.row_number().over(w1))
              .withColumn("_r2", F.row_number().over(w2)))
    out = (ranked.filter(F.col("_r1") == 1)
           .select("e1", "e2", "n_shared", "score_ppm",
                   (F.col("_r2") == 1).alias("mutual")))
    if mutual_only:
        out = out.filter(F.col("mutual"))
    return (out, dropped) if return_dropped else out


def align_predicates(kg1: DataFrame, kg2: DataFrame, matches: DataFrame,
                     subj: str = "subj", pred: str = "pred",
                     obj: str = "obj",
                     e1: str = "e1", e2: str = "e2",
                     scale: int = 1_000_000,
                     min_agree: int = 1) -> DataFrame:
    """Predicate alignment GIVEN entity matches (the second half of
    PARIS-style ontology alignment): two extractors name the same
    relation differently (ex:birthPlace vs schema:birthPlace vs
    ex:born_in), and the schema map must be induced from how the
    predicates behave ON THE ALIGNED ENTITIES - p1 aligns with p2 to
    the extent that p1(e1) and p2(e2) hold the same values across
    matched pairs (e1, e2).

    `matches` should be a 1-1 entity map - `align_entities(...,
    mutual_only=True)` guarantees that shape (each e1 once, each e2 at
    most once); under a many-to-one map the two directions count
    different universes and the ppm shares lose their conditional-
    probability reading.

    Per (p1, p2) pair with any agreement:
      n_agree    = |{(match, v): p1(e1)=v and p2(e2)=v}|
      n1 / n2    = matched-universe assertion counts of p1 / p2
      sub12_ppm  = floor(scale * n_agree / n1)  (evidence p1 => p2)
      sub21_ppm  = floor(scale * n_agree / n2)  (evidence p2 => p1)
      equiv_ppm  = floor(scale * n_agree / (n1 + n2 - n_agree))
                   (Jaccard of the value sets - the equivalence score)
    Both subsumption directions are emitted because real schema maps
    are asymmetric (ex:capital => ex:city, never the reverse).

    Scale shape: RDF-set dedup per side, one hash semi-join against
    the (slim) match map per side, ONE join on (matched entity, value)
    - keyed by entity, so no value-frequency skew can square up - and
    per-predicate-pair map-side-combinable counts. Integer floor
    division throughout; oracle-replayable.
    """
    m = (matches.select(F.col(e1).alias("_e1"), F.col(e2).alias("_e2"))
         .distinct())
    s1 = (kg1.select(F.col(subj).alias("_e1"), F.col(pred).alias("p1"),
                     F.col(obj).alias("o"))
          .distinct()
          .join(m, "_e1"))
    s2 = (kg2.select(F.col(subj).alias("_e2"), F.col(pred).alias("p2"),
                     F.col(obj).alias("o"))
          .distinct()
          .join(m.select("_e2").distinct(), "_e2"))
    agree = (s1.join(s2, ["_e2", "o"])
             .groupBy("p1", "p2")
             .agg(F.count(F.lit(1)).alias("n_agree"))
             .filter(F.col("n_agree") >= int(min_agree)))
    n1 = s1.groupBy("p1").agg(F.count(F.lit(1)).alias("n1"))
    n2 = s2.groupBy("p2").agg(F.count(F.lit(1)).alias("n2"))
    sc = int(scale)
    return (agree.join(n1, "p1").join(n2, "p2")
            .select("p1", "p2", "n_agree", "n1", "n2",
                    F.expr(f"CAST({sc} AS BIGINT) * n_agree div n1")
                    .alias("sub12_ppm"),
                    F.expr(f"CAST({sc} AS BIGINT) * n_agree div n2")
                    .alias("sub21_ppm"),
                    F.expr(f"CAST({sc} AS BIGINT) * n_agree div "
                           "(n1 + n2 - n_agree)").alias("equiv_ppm")))
