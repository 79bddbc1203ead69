"""Entity linking: mentions in text / triple objects against an alias
dictionary (BASELINE.json north_star stage C).

* `link_exact` - broadcast-hash join of normalized surface forms against
  the alias dictionary. The dictionary is the small side (alias tables are
  MBs-GBs vs TB-scale mentions) -> F.broadcast, no shuffle of the big side.
* `link_contains` - substring-containment linking for free-text fields
  (documents), still broadcast: a theta-join against a broadcast dim is
  executed as BroadcastNestedLoopJoin - linear in |docs| x |aliases| with
  |aliases| tiny.
* `link_fuzzy_minhash` - MinHashLSH (pyspark.ml) candidate join between
  mention token sets and alias token sets for inexact surface forms
  (typos/reordering), followed by exact Jaccard verification.

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
                  entity_cols: tuple = ("entity_id", "entity_uri")) -> DataFrame:
    """Containment linking: doc mentions entity if the normalized text
    contains the normalized alias as a word-bounded substring."""
    d = docs.select(
        F.col(doc_key),
        F.concat(F.lit(" "), normalize_surface(F.col(text_col)), F.lit(" "))
         .alias("_nt"))
    a = F.broadcast(aliases.select(
        F.col(alias_col),
        F.concat(F.lit(" "), F.trim(normalize_surface(F.col(alias_col))),
                 F.lit(" ")).alias("_na"),
        *[F.col(c) for c in entity_cols]))
    return (d.join(a, F.expr("contains(_nt, _na)"))
            .select(doc_key, alias_col, *entity_cols))


def link_fuzzy_minhash(mentions: DataFrame, aliases: DataFrame,
                       mention_col: str = "mention",
                       alias_col: str = "alias",
                       mention_key: str = "mention_id",
                       num_hash_tables: int = 8,
                       max_distance: float = 0.5) -> DataFrame:
    """MinHashLSH approx-similarity join on token sets (pyspark.ml),
    returning (mention_key, alias, jaccard_distance<=max_distance).

    The ml pipeline: tokenize -> HashingTF (binary) -> MinHashLSH;
    approxSimilarityJoin does the banded bucket join distributed."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, RegexTokenizer

    def prep(df, col, out):
        tok = RegexTokenizer(inputCol=col, outputCol="_toks",
                             pattern=r"[^a-z0-9]+", toLowercase=True)
        tf = HashingTF(inputCol="_toks", outputCol=out, numFeatures=1 << 18,
                       binary=True)
        t = tok.transform(df)
        t = tf.transform(t)
        # MinHashLSH requires at least one non-zero entry
        from pyspark.ml.functions import vector_to_array
        return t.filter(
            F.aggregate(vector_to_array(out), F.lit(0.0),
                        lambda a, b: a + b) > 0)

    m = prep(mentions.withColumnRenamed(mention_col, "_m"), "_m", "features")
    a = prep(aliases.withColumnRenamed(alias_col, "_a"), "_a", "features")
    lsh = MinHashLSH(inputCol="features", outputCol="_hashes",
                     numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(m)
    joined = model.approxSimilarityJoin(m, a, max_distance, distCol="jaccard_dist")
    return joined.select(
        F.col(f"datasetA.{mention_key}").alias(mention_key),
        F.col("datasetA._m").alias("mention"),
        F.col("datasetB._a").alias("alias"),
        F.round(F.col("jaccard_dist"), 4).alias("jaccard_dist"))
