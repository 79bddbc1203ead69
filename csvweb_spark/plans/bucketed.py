"""Bucketed triple store: the zero-exchange join layout for the
corpus-scale tables.

The lineage layer (plans/lineage.py) hash-partitions output into
DIRECTORIES - that gives resumability and partition pruning, but a join
still shuffles both sides. Spark SQL *bucketing* goes further: a table
written with `bucketBy(n, key)` records the bucket spec in the catalog,
and a join (or groupBy) on the bucket key between two tables with the
SAME bucket count compiles WITHOUT any Exchange - each task reads bucket
i of both sides, which were co-hashed at write time.

Why this matters at 100 TB: the dominant cost of every KG consumer that
self-joins the triple table - BGP pattern joins on shared subjects,
owl:sameAs rewrites, entity-map joins in canonicalization - is the
exchange of the corpus-scale side. Bucketing the materialized store by
`subj` (and the entity map by `node`) pays ONE write-time shuffle and
amortizes it over every subsequent join: a nightly BGP workload over an
append-only store re-shuffles nothing. `sortBy` within buckets
additionally lets the sort-merge join skip its per-task sort when each
bucket holds one file.

Caveats (documented, not hidden):
* bucketing is a catalog feature - tables must be read back via
  `spark.table(name)`, not `spark.read.parquet(path)` (a path read
  forgets the bucket spec and re-shuffles);
* both join sides need the same bucket count (Spark can also coalesce
  compatible multiples when `spark.sql.bucketing.coalesceBucketsInJoin`
  is on);
* one file per bucket per writing task - repartition by the bucket
  column first (done here) so a 1000-task write does not create 1000
  small files per bucket.

The reference has no storage layer at all (it streams triples to an
IRdfHandler, `Rdf/Converter.cs:235-238`); this module is the Spark-first
answer to "where do the triples live so queries stay fast".
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, n_buckets: int,
                   bucket_col: str = "subj",
                   path: Optional[str] = None,
                   sort_in_bucket: bool = True,
                   mode: str = "overwrite") -> None:
    """Materialize `df` as a bucketed catalog table. One write-time
    shuffle (repartition on the bucket column) buys zero-exchange joins
    on `bucket_col` for every reader; `path` pins the parquet location
    (external table) - without it the warehouse dir is used."""
    out = df.repartition(n_buckets, bucket_col)
    w = (out.write.format("parquet").mode(mode)
         .bucketBy(n_buckets, bucket_col))
    if sort_in_bucket:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read - REQUIRED for the bucket spec to reach the planner
    (a direct path read silently loses it and joins re-shuffle)."""
    return spark.table(table)


PRED_PART_COL = "pred_part"


def write_pred_partitioned(df: DataFrame, path: str,
                           n_pred_parts: int = 64,
                           n_buckets: int = 16,
                           mode: str = "overwrite") -> None:
    """The POS-style second index of the triple store: parquet
    PARTITIONED BY a bounded hash of `pred` (so a pred-bound scan
    touches 1/n_pred_parts of the files via partition PRUNING - the
    classic RDF predicate-partitioning trick, bounded because raw pred
    values can be a 10^5-value directory explosion) and bucketed-style
    clustered by obj WITHIN each partition (repartition keeps files per
    partition bounded).

    The subj-bucketed catalog table (write_bucketed) serves
    subject-joins; this layout serves the other dominant BGP shape -
    `?s <p> ?o / ?s <p> CONST` patterns - where the win is not a join
    but reading 1-2% of the store instead of all of it. Readers use
    `read_pred_partitioned(spark, path, pred=...)`, which applies the
    same hash so pruning happens at planning time."""
    from pyspark.sql import functions as F
    part = F.pmod(F.xxhash64("pred"), F.lit(n_pred_parts)).cast("int")
    (df.withColumn(PRED_PART_COL, part)
       .repartition(n_buckets, PRED_PART_COL, "obj")
       .write.mode(mode)
       .partitionBy(PRED_PART_COL)
       .parquet(path))


def read_pred_partitioned(spark: SparkSession, path: str,
                          pred: Optional[str] = None,
                          n_pred_parts: int = 64) -> DataFrame:
    """Scan the POS layout; with `pred` given, the partition filter
    (same xxhash64 the writer used) prunes to ONE directory at planning
    time and the residual pred equality prunes hash collisions - the
    plan's scan must show `PushedFilters`/partition count 1, pinned in
    test_plans."""
    from pyspark.sql import functions as F
    df = spark.read.parquet(path)
    if pred is None:
        return df.drop(PRED_PART_COL)
    part = F.pmod(F.xxhash64(F.lit(pred)), F.lit(n_pred_parts))
    return (df.where((F.col(PRED_PART_COL) == part.cast("int"))
                     & (F.col("pred") == pred))
            .drop(PRED_PART_COL))


class TripleStore:
    """Dual-layout materialized triple store + per-pattern router:

    * SPO - the subj-bucketed catalog table (`write_bucketed`), serving
      subject-keyed joins with zero exchange;
    * POS - the pred-partitioned parquet (`write_pred_partitioned`),
      serving pred-bound patterns with planning-time partition pruning.

    `scan(pattern)` returns the layout that serves a BGP triple pattern
    best; pass `store.scan` as the `triples` argument of
    operators.bgp.match_bgp and every pattern reads its own layout (the
    router contract: any returned frame is a SUPERSET of the pattern's
    triples - match_bgp re-applies the constant filters)."""

    def __init__(self, spark: SparkSession, table: str, pos_path: str,
                 n_pred_parts: int = 64):
        self.spark = spark
        self.table = table
        self.pos_path = pos_path
        self.n_pred_parts = n_pred_parts

    @classmethod
    def materialize(cls, df: DataFrame, table: str, pos_path: str,
                    n_buckets: int = 16, n_pred_parts: int = 64,
                    mode: str = "overwrite") -> "TripleStore":
        """Write both layouts (two write-time shuffles, amortized over
        every read) and return the router."""
        write_bucketed(df, table, n_buckets, mode=mode)
        write_pred_partitioned(df, pos_path, n_pred_parts=n_pred_parts,
                               mode=mode)
        return cls(df.sparkSession, table, pos_path, n_pred_parts)

    def scan(self, pattern=None) -> DataFrame:
        if (pattern is not None and isinstance(pattern[1], str)
                and not pattern[1].startswith("?")):
            return read_pred_partitioned(self.spark, self.pos_path,
                                         pattern[1], self.n_pred_parts)
        return read_bucketed(self.spark, self.table)
