"""Entity linking: mentions in text / triple objects against an alias
dictionary (BASELINE.json north_star stage C).

* `link_exact` - broadcast-hash join of normalized surface forms against
  the alias dictionary. The dictionary is the small side (alias tables are
  MBs-GBs vs TB-scale mentions) -> F.broadcast, no shuffle of the big side.
* `link_contains` - substring-containment linking for free-text fields
  (documents). Scale path (default): a broadcast inverted index on ONE
  representative token per alias (its rarest, given corpus token document
  frequencies; else the longest) turns the containment theta-join into an
  equi-join pre-filter (BroadcastHashJoin on doc-token = alias-index-token)
  followed by exact containment verification -- linear in |doc tokens|,
  never |docs| x |aliases|. The pre-filter is LOSSLESS: word-bounded
  containment of a multi-token alias requires every alias token to appear
  as a doc token, so joining on any single alias token keeps all true
  matches. `prefilter=False` restores the round-2 BroadcastNestedLoopJoin
  (|docs| x |aliases| compares; only for tiny dims).
* `link_fuzzy_minhash` - MinHash-LSH candidate join between mention token
  sets and alias token sets for inexact surface forms (typos/reordering),
  followed by exact Jaccard verification. Uses the deterministic md5-based
  Carter-Wegman family from operators/dedup.py (round-1 used pyspark.ml
  MinHashLSH, whose hash family is not reproducible in SQL -> no oracle).

Skew note: hub aliases (e.g. 'usa') fan out to many mentions; the broadcast
join keeps that fan-out partition-local (no shuffle key = no hot
partition). For reduce-side consumers downstream, salt on entity_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_surface(col):
    """Case/whitespace/punctuation-edge canonicalization shared by both join
    sides (and the SQL oracle)."""
    return F.regexp_replace(
        F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", " "), r"\s+", " ")


def link_exact(mentions: DataFrame, aliases: DataFrame,
               mention_col: str = "mention",
               alias_col: str = "alias") -> DataFrame:
    """Equi-join on normalized surface form; aliases broadcast."""
    m = mentions.withColumn("_nf", F.trim(normalize_surface(F.col(mention_col))))
    a = F.broadcast(aliases.withColumn(
        "_nf", F.trim(normalize_surface(F.col(alias_col)))))
    return m.join(a, "_nf", "inner").drop("_nf")


def link_contains(docs: DataFrame, aliases: DataFrame,
                  text_col: str = "text", doc_key: str = "doc_id",
                  alias_col: str = "alias",
                  entity_cols: tuple = ("entity_id", "entity_uri"),
                  prefilter: bool = True,
                  token_df: DataFrame | None = None) -> DataFrame:
    """Containment linking: doc mentions entity if the normalized text
    contains the normalized alias as a word-bounded substring.

    Default plan (prefilter=True): build a broadcast inverted index of one
    token per alias, explode each doc's DISTINCT normalized tokens, hash-
    join doc tokens against the index, then verify full containment on the
    survivors. Candidate volume per alias ~ document frequency of its index
    token, so pass `token_df` -- a (token, df) DataFrame of corpus token
    document frequencies (one groupBy over the exploded tokens, computed
    once and reused across alias batches) -- to pick each alias's RAREST
    token; without it the longest token is the heuristic proxy. Either
    choice is exact; only candidate volume differs.

    Semantics note: aliases that normalize to zero tokens match nothing
    (the round-2 nested-loop path could degenerately match an empty alias
    against an empty doc -- two spaces containing two spaces)."""
    d = docs.select(
        F.col(doc_key),
        F.concat(F.lit(" "), normalize_surface(F.col(text_col)), F.lit(" "))
         .alias("_nt"))
    a = aliases.select(
        F.col(alias_col),
        F.concat(F.lit(" "), F.trim(normalize_surface(F.col(alias_col))),
                 F.lit(" ")).alias("_na"),
        *[F.col(c) for c in entity_cols])
    if not prefilter:
        return (d.join(F.broadcast(a), F.expr("contains(_nt, _na)"))
                .select(doc_key, alias_col, *entity_cols))
    toks = F.filter(F.split(F.trim(F.col("_na")), " "), lambda t: t != "")
    if token_df is not None:
        # rarest-by-corpus-DF: explode alias tokens, look up df (tokens
        # absent from the corpus get df 0 - they make the best index keys:
        # the join then proves non-match for free), argmin per alias.
        # Alias tables are MBs: this prep join is small-side work.
        at = (a.withColumn("_t", F.explode(toks))
              .join(F.broadcast(token_df.select(
                  F.col("token").alias("_t"),
                  F.col("df").cast("long").alias("_df"))), "_t", "left")
              .withColumn("_df", F.coalesce("_df", F.lit(0).cast("long"))))
        idx = (at.groupBy("_na", alias_col, *entity_cols)
               .agg(F.min(F.struct(F.col("_df"), F.col("_t")))["_t"]
                    .alias("_itok")))
    else:
        # longest token (ties: lexicographically greatest), constant-folded
        idx = a.withColumn(
            "_itok",
            F.array_max(F.transform(
                toks, lambda t: F.struct(F.length(t).alias("l"),
                                         t.alias("t"))))["t"]
        ).filter(F.col("_itok").isNotNull())
    dtok = d.withColumn(
        "_itok",
        F.explode(F.array_distinct(
            F.filter(F.split(F.trim(F.col("_nt")), " "), lambda t: t != ""))))
    return (dtok.join(F.broadcast(idx), "_itok")
            .filter(F.expr("contains(_nt, _na)"))
            .select(doc_key, alias_col, *entity_cols))


def link_fuzzy_minhash(mentions: DataFrame, aliases: DataFrame,
                       mention_col: str = "mention",
                       alias_col: str = "alias",
                       mention_key: str = "mention_id",
                       num_hash_tables: int = 16,
                       max_distance: float = 0.5,
                       seed: int = 42) -> DataFrame:
    """MinHash-LSH candidate join on token SETS + exact-Jaccard verify,
    returning (mention_key, mention, alias, jaccard_dist, jaccard_dist_bp)
    with jaccard_dist <= max_distance.

    Banding is rows-per-band = 1 (each of the `num_hash_tables` signature
    positions is its own band): for the short token sets of surface forms
    a candidate pair at Jaccard s survives with p = 1 - (1-s)^T (s=0.4,
    T=16 -> 0.9997), and only pairs sharing >= 1 token can ever collide,
    so candidate volume stays ~ |shared-token pairs|, not |m| x |a|.
    The alias dictionary is the broadcast side throughout (north_star:
    'batch-scored against a broadcast alias dictionary'). Deterministic
    md5/Carter-Wegman hashing -> the DuckDB oracle replays the exact
    candidate set; verification makes precision exact."""
    from .dedup import (jaccard_bp, lsh_band_buckets, minhash_signatures,
                        token_set)

    m = mentions.select(
        F.col(mention_key), F.col(mention_col).alias("mention"),
        token_set(F.col(mention_col)).alias("_mt"))
    a = aliases.select(F.col(alias_col).alias("alias"),
                       token_set(F.col(alias_col)).alias("_at"))
    # empty token sets can never reach Jaccard > 0: drop before hashing
    m = m.filter(F.size("_mt") > 0)
    a = a.filter(F.size("_at") > 0)

    mb = lsh_band_buckets(
        minhash_signatures(m, "mention", mention_key,
                           num_hashes=num_hash_tables, seed=seed,
                           shingle_unit="token"),
        mention_key, bands=num_hash_tables, rows_per_band=1)
    ab = lsh_band_buckets(
        minhash_signatures(a, "alias", "alias",
                           num_hashes=num_hash_tables, seed=seed,
                           shingle_unit="token"),
        "alias", bands=num_hash_tables, rows_per_band=1)
    cand = (mb.join(F.broadcast(ab), ["band", "bucket"])
            .select(mention_key, "alias").distinct())
    dist_bp_max = int(round(max_distance * 10000))
    verified = (cand
                .join(m, mention_key)
                .join(F.broadcast(a), "alias")
                .withColumn("jaccard_dist_bp",
                            F.lit(10000) - jaccard_bp(F.col("_mt"),
                                                      F.col("_at")))
                .filter(F.col("jaccard_dist_bp") <= dist_bp_max))
    return verified.select(
        mention_key, "mention", "alias",
        (F.col("jaccard_dist_bp") / 10000.0).alias("jaccard_dist"),
        "jaccard_dist_bp")


def link_editdist(mentions: DataFrame, aliases: DataFrame,
                  mention_col: str = "mention",
                  alias_col: str = "alias",
                  mention_key: str = "mention_id",
                  max_dist: int = 1) -> DataFrame:
    """Edit-distance entity linking for single-typo surface forms: the
    classic record-linkage complement to link_fuzzy_minhash (token-set
    Jaccard is blind to in-token typos - 'germani' vs 'germany' shares
    ZERO tokens, Jaccard 0, but edit distance 1).

    Candidate generation is the SymSpell deletion-neighborhood scheme:
    each side expands its normalized form into {itself} U {every
    single-character deletion}, and candidates are pairs whose
    neighborhoods intersect. For max_dist=1 this blocking is LOSSLESS:
    ed(m,a)<=1 means m=a (shared identity key), or one is a deletion of
    the other (m's delete-1 set contains a, or vice versa), or they
    differ by one substitution (deleting the substituted position from
    BOTH yields a shared key). Only max_dist=1 is accepted - deeper
    thresholds need delete-k neighborhoods (O(len^k) keys/row), a
    different cost class that should be an explicit caller choice.
    Exact `levenshtein() <= max_dist` verification keeps precision
    exact, so blocking only ever bounds recall - and for k=1 it
    provably doesn't.

    Scale shape: the alias dictionary's neighborhood (~len keys per
    alias, dictionary is MBs-GBs) broadcasts; the mention side explodes
    to O(total chars) slim (key, id) rows - linear, never
    |mentions| x |aliases|; the per-pair verify runs only on
    neighborhood collisions. Deterministic string ops end-to-end, so a
    DuckDB oracle replays the exact candidate set and distances
    (Spark's levenshtein and DuckDB's are both plain Levenshtein).

    Returns (mention_key, mention, alias, edit_dist), edit_dist <=
    max_dist, distinct per (mention_key, alias)."""
    assert max_dist == 1, "delete-1 blocking is only lossless for ed<=1"

    def neighborhood(nf):
        dels = F.transform(
            F.sequence(F.lit(1), F.length(nf)),
            lambda i: F.concat(F.substr(nf, F.lit(1), i - F.lit(1)),
                               F.substr(nf, i + F.lit(1), F.length(nf))))
        return F.array_union(F.array(nf), dels)

    m = (mentions.select(F.col(mention_key),
                         F.col(mention_col).alias("mention"),
                         F.trim(normalize_surface(F.col(mention_col)))
                         .alias("_mnf"))
         .filter(F.length("_mnf") > 0))
    a = (aliases.select(F.col(alias_col).alias("alias"),
                        F.trim(normalize_surface(F.col(alias_col)))
                        .alias("_anf"))
         .filter(F.length("_anf") > 0).distinct())
    mk = m.select(mention_key, "_mnf",
                  F.explode(neighborhood(F.col("_mnf"))).alias("_key"))
    ak = a.select("alias", "_anf",
                  F.explode(neighborhood(F.col("_anf"))).alias("_key"))
    cand = (mk.join(F.broadcast(ak), "_key")
            .select(mention_key, "_mnf", "alias", "_anf").distinct())
    return (cand
            .withColumn("edit_dist",
                        F.levenshtein("_mnf", "_anf").cast("long"))
            .filter(F.col("edit_dist") <= max_dist)
            .join(m.select(mention_key, "mention"), mention_key)
            .select(mention_key, "mention", "alias", "edit_dist"))


def disambiguate_by_coherence(candidates: DataFrame, edges: DataFrame,
                              key_col: str = "doc_id",
                              mention_col: str = "mention",
                              entity_col: str = "entity_id",
                              src: str = "src",
                              dst: str = "dst") -> DataFrame:
    """Pick ONE entity per (document, mention) from an ambiguous
    candidate table by KG coherence - the classic collective-linking
    heuristic (Cucerzan/TagMe family): the right reading of 'Paris' on
    a page about Texas is the one adjacent, in the entity graph, to
    the page's OTHER (unambiguously linked) entities.

    Inputs: `candidates` = (key, mention, entity) rows as produced by
    link_exact/link_contains against a many-to-one alias table
    (several rows per mention when the surface form is ambiguous);
    `edges` = the KG relatedness edges (read undirected).

    support(key, mention, e) = # DISTINCT context entities c adjacent
    to e, where the context is the doc's entities from UNAMBIGUOUS
    other mentions (exactly one candidate; the mention being resolved
    never supports itself). Winner = max support, ties to the smallest
    entity id; zero-support candidates still resolve (min id) so every
    mention gets a deterministic answer.

    Scale shape: the candidate x context pairing joins on the DOC key
    - per-doc quadratic in mention count, which is bounded by page
    length (never corpus-quadratic) - then ONE hash equi-join of the
    slim (entity, ctx) pairs against the edge table on the full pair
    key. Joining pairs->edges (not entity->edges first) keeps hub
    entities' 10^6-edge fan-outs out of the plan entirely: the edge
    table is probed, never exploded. Winner election is a map-side-
    combinable min(struct(-support, entity)) - no window sort.

    Returns one row per (key, mention): (key, mention, entity,
    support, n_candidates)."""
    cand = (candidates.select(F.col(key_col).alias("_k"),
                              F.col(mention_col).alias("_m"),
                              F.col(entity_col).alias("_e"))
            .distinct())
    counts = (cand.groupBy("_k", "_m")
              .agg(F.count(F.lit(1)).cast("long").alias("n_candidates")))
    ctx = (cand.join(counts.where(F.col("n_candidates") == 1)
                    .select("_k", "_m"), ["_k", "_m"], "left_semi")
           .select("_k", F.col("_m").alias("_m2"),
                   F.col("_e").alias("_c")))
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = (e.unionByName(e.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
           .where(F.col("u") != F.col("v")).distinct())
    pairs = (cand.join(ctx, "_k")
             .where((F.col("_m2") != F.col("_m"))
                    & (F.col("_c") != F.col("_e")))
             .select("_k", "_m", "_e", "_c").distinct())
    support = (pairs.join(und, (pairs["_e"] == und["u"])
                          & (pairs["_c"] == und["v"]), "left_semi")
               .groupBy("_k", "_m", "_e")
               .agg(F.count(F.lit(1)).cast("long").alias("support")))
    scored = (cand.join(support, ["_k", "_m", "_e"], "left")
              .withColumn("support",
                          F.coalesce("support", F.lit(0).cast("long"))))
    best = (scored.groupBy("_k", "_m")
            .agg(F.min(F.struct((-F.col("support")).alias("ns"),
                                F.col("_e").alias("e"))).alias("b")))
    return (best.join(counts, ["_k", "_m"])
            .select(F.col("_k").alias(key_col),
                    F.col("_m").alias(mention_col),
                    F.col("b.e").alias(entity_col),
                    (-F.col("b.ns")).cast("long").alias("support"),
                    "n_candidates"))
