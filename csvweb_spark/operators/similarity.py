"""Similarity search over an embedding column (array<float>).

* `ann_topk_bruteforce` - exact cosine top-k: broadcast the (small) query
  set against the corpus (narrow crossJoin, JVM-codegen'd cosine), then a
  PER-PARTITION top-k prune (mapInPandas over the already-scored rows,
  same (cos4 desc, neighbor_id asc) total order as the final ranking)
  before the global per-query window - the exchange carries at most
  k x n_partitions rows per query, never corpus x queries.
* `ann_topk_lsh` - the scale path: random-hyperplane LSH bucket join
  (sign-bit sketches), probing only same-bucket candidates, exact cosine
  re-rank. Recall tunable via bits/tables.
* `ann_topk_ivf` - the other scale path: IVF (inverted-file) - a k-means
  coarse quantizer partitions the corpus into cells; each query probes its
  n_probe nearest centroids and exact-reranks only those inverted lists.

At 100 TB the broadcast side is the queries (KBs-MBs); the corpus scan
stays narrow and column-pruned to (key, vector).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve by name
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_sim


def _scored(corpus: DataFrame, queries: DataFrame, key_col: str,
            vec_col: str, query_key: str) -> DataFrame:
    q = F.broadcast(queries.select(
        F.col(query_key).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv")))
    c = corpus.select(F.col(key_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    return (c.crossJoin(q)
            .withColumn("cos", cosine_sim(F.col("cv"), F.col("qv"))))


def partition_topk(scored: DataFrame, k: int) -> DataFrame:
    """Exact per-partition top-k over (query_id, neighbor_id, cos4) rows,
    shuffle-free: mapInPandas keeps a running best-k per query across the
    partition's Arrow batches (vectorized pandas sort, no per-row Python).
    The order (cos4 desc, neighbor_id asc) is IDENTICAL to the global
    ranking window, so per-partition pruning is lossless for the final
    top-k; output is <= k rows per (query, partition)."""
    import pandas as pd

    sel = scored.select("query_id", "neighbor_id", "cos4")
    schema = sel.schema

    def gen(batches):
        best = None
        for pdf in batches:
            cur = pd.concat([best, pdf]) if best is not None else pdf
            cur = cur.sort_values(["query_id", "cos4", "neighbor_id"],
                                  ascending=[True, False, True],
                                  kind="mergesort")
            best = cur.groupby("query_id", sort=False).head(k)
        if best is not None and len(best):
            yield best

    return sel.mapInPandas(gen, schema)


def ann_topk_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 5,
                        key_col: str = "vec_id", vec_col: str = "embedding",
                        query_key: str = "vec_id",
                        exclude_self: bool = True) -> DataFrame:
    """Exact top-k neighbors per query by cosine (desc), ties by neighbor id.

    Returns (query_id, neighbor_id, rank, cos4) with cos4 = round(cos, 4) so
    results hash-compare stably across engines. The score is computed by the
    JVM expression (matches the DuckDB oracle bit-for-bit); the per-query
    window only ever sees the per-partition top-k survivors, so no single
    reduce task receives the full scored corpus (round-1 defect: the window
    shuffled all n x q scored rows to q partitions)."""
    scored = _scored(corpus, queries, key_col, vec_col, query_key)
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    # rank on the rounded score so cross-engine float noise cannot reorder
    scored = scored.withColumn("cos4", F.round(F.col("cos"), 4))
    # zero-norm vectors score NaN; exclude them BEFORE the partial top-k -
    # pandas sorts NaN last while Spark's desc window ranks NaN first, so
    # letting NaN through would make the per-partition prune disagree with
    # the global ranking (and a NaN "neighbor" is meaningless anyway)
    scored = scored.filter(~F.isnan("cos4"))
    partial = partition_topk(scored, k)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos4").desc(), F.col("neighbor_id").asc())
    return (partial
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos4"))


def hyperplane_sketch(vec: Column, planes) -> Column:
    """Sign-bit sketch of `vec` against integer hyperplanes (python lists,
    constant-folded) -> long bucket id.

    Arithmetic is EXACT: each component is quantized floor(x * 1e6) (one
    IEEE multiply + floor - bit-identical in any engine reading the same
    floats), then the dot product is integer. |floor(x*1e6)| <= ~2^21 for
    unit-normed inputs x, |w| <= 1000, dim <= 4096 -> |dot| < 2^42, no
    overflow. Sign ties (dot == 0) land on the same side everywhere, so a
    DuckDB oracle replays bucket assignment exactly - FP summation order
    can never flip a bucket."""
    q = F.transform(vec, lambda x: F.floor(x * F.lit(1000000.0)).cast("long"))
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(q, F.array(*[F.lit(int(w)) for w in plane]),
                       lambda a, b: a * b),
            F.lit(0).cast("long"), lambda acc, v: acc + v)
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def hyperplane_sketches(vec: Column, all_planes) -> Column:
    """ALL tables' sign-bit sketches as ONE vectorized numpy matmul per
    Arrow batch -> array<long> of per-table buckets.

    Arithmetic is bit-identical to `hyperplane_sketch` (parity-tested):
    float64 quantization floor(x*1e6) then an int64 dot against the same
    integer planes - every value < 2^42, exact in both engines, so the
    DuckDB oracle replays buckets exactly. The pure-Catalyst formulation
    is kept for reference/parity, but F.aggregate/zip_with higher-order
    lambdas are evaluated INTERPRETED per element (the same lesson as
    minhash): tables*bits*dim lambda calls per row made the JVM path
    ~10x slower than this batched matmul."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    W = np.asarray(all_planes, dtype="int64")        # tables x bits x dim
    tables, bits, dim = W.shape
    Wf = W.reshape(tables * bits, dim).T.copy()      # dim x (tables*bits)
    weights = (np.int64(1) << np.arange(bits, dtype="int64"))

    @F.pandas_udf(ArrayType(LongType()))
    def sk(vs: pd.Series) -> pd.Series:
        n = len(vs)
        q = np.zeros((n, dim), dtype="int64")
        ok = np.zeros(n, dtype=bool)
        for i, v in enumerate(vs):
            if v is not None and len(v) == dim:
                arr = np.asarray(v, dtype="float64")
                # non-finite components would make floor().astype(int64)
                # undefined garbage; the JVM expression yields no set bit
                # for such rows (null propagation) - mirror bucket 0
                if np.isfinite(arr).all():
                    q[i] = np.floor(arr * 1e6).astype("int64")
                    ok[i] = True
        dots = q @ Wf                                # n x (tables*bits)
        pos = (dots > 0).astype("int64").reshape(n, tables, bits)
        buckets = (pos * weights).sum(axis=2)        # n x tables
        # degenerate rows (null vector / dim mismatch): the JVM expression
        # yields bucket 0 (null dot -> no bit set) - mirror it exactly
        zeros = [0] * tables
        out = [buckets[i].tolist() if ok[i] else zeros for i in range(n)]
        return pd.Series(out)

    return sk(vec)


def _det_planes(dim: int, bits: int, table: int, scale: int = 1000):
    """Deterministic integer hyperplanes: w[table][bit][d] =
    (60-bit md5 prefix of 'table:bit:d') % (2*scale+1) - scale, uniform in
    [-scale, scale]. Symmetric iid components give the standard
    sign-random-projection LSH; md5 derivation means the DuckDB oracle
    regenerates the identical planes in SQL:
    (('0x'||substr(md5(t||':'||b||':'||d),1,15))::bigint % 2001) - 1000."""
    import hashlib
    return [[int(hashlib.md5(f"{table}:{b}:{d}".encode())
                 .hexdigest()[:15], 16) % (2 * scale + 1) - scale
             for d in range(dim)]
            for b in range(bits)]


def ann_topk_lsh(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 key_col: str = "vec_id", vec_col: str = "embedding",
                 query_key: str = "vec_id", dim: int = 64, bits: int = 8,
                 tables: int = 4, seed: int = 42,
                 exclude_self: bool = True) -> DataFrame:
    """Approximate top-k: `tables` independent sign-bit sketches; candidates
    are same-bucket pairs in any table; exact cosine re-rank. The bucket
    join replaces the cross join - candidate count ~ n * (n/2^bits) *
    tables per table instead of n * q.

    ALL table sketches are computed in ONE corpus scan (an array of
    per-table buckets + posexplode), mirroring dedup_embedding_cosine's
    LSH blocking: at 100 TB the corpus scan dominates, and a per-table
    scan loop (the round-2 shape) costs `tables`x the I/O and `tables`
    broadcast rounds for the identical candidate set. The single join on
    (_t, bucket) keeps per-table buckets disjoint, then candidate dedup
    collapses pairs found by several tables."""
    all_planes = [_det_planes(dim, bits, seed + t) for t in range(tables)]

    def sketches(vec: Column) -> Column:
        return hyperplane_sketches(vec, all_planes)

    cb = (corpus.select(
            F.col(key_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
            sketches(F.col(vec_col).cast("array<double>")).alias("_bkts"))
          .select("neighbor_id", "cv",
                  F.posexplode("_bkts").alias("_t", "bucket")))
    qb = F.broadcast(queries.select(
            F.col(query_key).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
            sketches(F.col(vec_col).cast("array<double>")).alias("_bkts"))
          .select("query_id", "qv",
                  F.posexplode("_bkts").alias("_t", "bucket")))
    cands = (cb.join(qb, ["_t", "bucket"]).drop("_t", "bucket")
             .dropDuplicates(["query_id", "neighbor_id"]))
    if exclude_self:
        cands = cands.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cands.withColumn(
        "cos4", F.round(cosine_sim(F.col("cv"), F.col("qv")), 4))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos4").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos4"))


def _l2_to_const(vec: Column, center: list[float]) -> Column:
    """Squared L2 distance from `vec` to a constant centroid (folded into
    the codegen'd expression - no UDF, no broadcast join)."""
    return F.aggregate(
        F.zip_with(vec, F.array(*[F.lit(float(x)) for x in center]),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, v: acc + v)


def ann_topk_ivf(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 key_col: str = "vec_id", vec_col: str = "embedding",
                 query_key: str = "vec_id", n_cells: int = 16,
                 n_probe: int = 4, seed: int = 42,
                 exclude_self: bool = True,
                 train_fraction: float | None = None,
                 max_train_rows: int = 65536) -> DataFrame:
    """IVF approximate top-k: candidate volume ~ n x n_probe / n_cells per
    query instead of n (brute force). The quantizer trains on a SAMPLE of
    the corpus (a coarse quantizer needs ~1000x n_cells points, not 10^12:
    train_fraction=None auto-sizes the sample to max_train_rows); the
    resulting centroids are a driver-side constant (n_cells x dim floats,
    KBs) folded into the probe expression, so cell assignment and query
    probing are pure codegen'd column math. Assignment happens in the same
    narrow scan that reads the vectors; only (cell)-bucketed candidates
    shuffle."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(F.col(key_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    feat = c.withColumn("features", array_to_vector("cv"))
    if train_fraction is None:
        n = corpus.count()  # parquet sources: metadata-only
        train_fraction = min(1.0, max_train_rows / max(n, 1))
    train = (feat.sample(False, train_fraction, seed)
             if train_fraction < 1.0 else feat)
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(train)
    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]

    def cell_dists(vec):
        return F.array(*[
            F.struct(_l2_to_const(vec, ctr).alias("d"),
                     F.lit(i).alias("cell"))
            for i, ctr in enumerate(centroids)])

    # corpus side: hard assignment to the nearest centroid (argmin = first
    # element of the sorted (d, cell) struct array)
    assigned = c.withColumn(
        "cell", F.array_sort(cell_dists(F.col("cv")))[0]["cell"])
    # query side: probe the n_probe nearest cells
    probed = (queries.select(
        F.col(query_key).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"))
        .withColumn("cell", F.explode(F.transform(
            F.slice(F.array_sort(cell_dists(F.col("qv"))), 1, n_probe),
            lambda s: s["cell"]))))
    cands = assigned.join(F.broadcast(probed), "cell").drop("cell")
    if exclude_self:
        cands = cands.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cands.withColumn(
        "cos4", F.round(cosine_sim(F.col("cv"), F.col("qv")), 4))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos4").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos4"))


def quantize_vec(vec: Column, scale: int = 1_000_000) -> Column:
    """Integer-quantize an embedding: floor(x * scale) per component as
    BIGINT. The shared determinism trick (minhash/simhash/pagerank):
    all downstream arithmetic on quantized vectors is exact integer
    math, so any engine replays it bit-for-bit - no FP accumulation-
    order hazard inside iterative algorithms."""
    return F.transform(vec.cast("array<double>"),
                       lambda x: F.floor(x * F.lit(int(scale)))
                       .cast("long"))


def kmeans_lloyd(df: DataFrame, k: int = 8, iterations: int = 2,
                 key_col: str = "vec_id", vec_col: str = "embedding",
                 scale: int = 1_000_000):
    """Deterministic, engine-replayable Lloyd k-means over an embedding
    column - the clustering stage SemDeDup-style semantic dedup and
    diversity-stratified sampling block on, and the in-repo quantizer
    alternative to `ann_topk_ivf`'s pyspark.ml KMeans (whose float
    accumulation order no SQL oracle can replay).

    Every quantity is integer-exact on `quantize_vec` vectors:
      * init: the k corpus rows with the smallest (md5(key), key) -
        a deterministic pseudo-random draw, fetched via TakeOrdered
        (partition-local top-k, no global sort), cells numbered in
        that order;
      * assign: squared-L2 to each centroid (long zip_with/aggregate),
        argmin = min(struct(dist, cell)) - ties to the lowest cell id;
      * update: per-(cell, dimension) SUM + COUNT (map-side
        combinable; the n x dim explosion is the standard factored
        Lloyd shuffle - no vector ever lands whole on a reducer),
        centroid component = sum div count (truncating integer
        division - Spark `div` and DuckDB `//` agree, negatives
        included); clusters that lose all members keep their previous
        centroid (deterministic, no resampling).
    Fixed `iterations` (no convergence probe) keeps the unrolled
    oracle finite; a final assignment pass binds the RETURNED
    assignments to the RETURNED centroids.

    Long-overflow headroom: |component| <= ~2*scale for unit-norm-ish
    embeddings, so per-cell component sums stay under 2^63 up to
    ~10^12 members per cell at the default scale - document-scale
    safe; lower `scale` for larger corpora.

    Returns (assignments, centroids): (key, cell, dist) and
    (cell, cv: array<bigint>)."""
    assert k >= 1 and iterations >= 0
    spark = df.sparkSession
    q = df.select(F.col(key_col).alias("_id"),
                  quantize_vec(F.col(vec_col), scale).alias("v"))
    seeds = (q.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
             .limit(k).collect())
    cents = spark.createDataFrame(
        [(i, list(r.v)) for i, r in enumerate(seeds)],
        "cell bigint, cv array<bigint>")

    def _assign(cents_df):
        dist = F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"), lambda acc, x: acc + x)
        cand = (q.crossJoin(F.broadcast(cents_df))
                .select("_id", "v", F.struct(dist.alias("d"),
                                             F.col("cell").alias("cell"),
                                             F.col("v").alias("vv"))
                        .alias("s")))
        return (cand.groupBy("_id").agg(F.min("s").alias("b"))
                .select("_id", F.col("b.cell").alias("cell"),
                        F.col("b.d").alias("dist"),
                        F.col("b.vv").alias("v")))

    for _ in range(iterations):
        best = _assign(cents)
        sums = (best.select("cell", F.posexplode("v")
                            .alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(F.sum("val").alias("s"),
                     F.count(F.lit(1)).alias("c")))
        newc = (sums.withColumn("cval", F.expr("s div c"))
                .groupBy("cell")
                .agg(F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("pos", "cval"))),
                    lambda st: st["cval"]).alias("ncv")))
        cents = (cents.join(newc, "cell", "left")
                 .select("cell", F.coalesce("ncv", "cv").alias("cv"))
                 .localCheckpoint(eager=True))
    assignments = _assign(cents).select(
        F.col("_id").alias(key_col), "cell", "dist")
    return assignments, cents


def assign_to_centroids(df: DataFrame, centroids: DataFrame,
                        key_col: str = "vec_id",
                        vec_col: str = "embedding",
                        scale: int = 1_000_000) -> DataFrame:
    """Assign NEW vectors to previously-trained `kmeans_lloyd`
    centroids - the incremental path (an ingest batch lands in the
    existing cell structure without retraining; streaming SemDeDup
    blocks new documents against committed cells). Identical integer
    arithmetic and argmin tie-break as training, so assignments are
    exactly what a retrained final pass would give for unchanged
    centroids. Returns (key, cell, dist)."""
    q = df.select(F.col(key_col).alias("_id"),
                  quantize_vec(F.col(vec_col), scale).alias("v"))
    dist = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    cand = (q.crossJoin(F.broadcast(centroids))
            .select("_id", F.struct(dist.alias("d"),
                                    F.col("cell").alias("cell"))
                    .alias("s")))
    return (cand.groupBy("_id").agg(F.min("s").alias("b"))
            .select(F.col("_id").alias(key_col),
                    F.col("b.cell").alias("cell"),
                    F.col("b.d").alias("dist")))


# ---------------------------------------------------------------------------
# Product quantization (compressed ANN: train / encode / ADC search)
# ---------------------------------------------------------------------------

def _subvectors(df: DataFrame, key_col: str, vec_col: str, m: int,
                scale: int) -> DataFrame:
    """(_id, sub, v): quantized subvectors - each embedding split into
    `m` contiguous slices.  One narrow projection + explode; the slice
    width is probed from one row (the dedup.py dim-probe precedent),
    and a non-divisible dimension raises."""
    if m < 1:
        raise ValueError("m must be >= 1")
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("empty input")
    dim = first.d
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    w = dim // m
    q = df.select(F.col(key_col).alias("_id"),
                  quantize_vec(F.col(vec_col), scale).alias("_v"))
    subs = F.array(*[
        F.struct(F.lit(j).cast("long").alias("sub"),
                 F.slice("_v", j * w + 1, w).alias("sv"))
        for j in range(m)])
    return (q.select("_id", F.explode(subs).alias("s"))
            .select("_id", F.col("s.sub").alias("sub"),
                    F.col("s.sv").alias("v")))


def _sub_l2(a: str = "v", b: str = "cv") -> Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def pq_train(df: DataFrame, m: int = 4, k: int = 16,
             iterations: int = 2, key_col: str = "vec_id",
             vec_col: str = "embedding", scale: int = 1_000_000):
    """Product-quantization codebooks (Jegou et al. 2011): split each
    embedding into `m` contiguous subvectors and k-means each subspace
    - the memory-compression half of billion-scale ANN: a 768-dim
    float vector becomes `m` small code ids (m longs here, m BYTES in
    a packed layout), and `pq_search_adc` ranks candidates from
    codebook lookup tables without ever touching raw vectors.

    One subspace-grouped Lloyd instead of m separate jobs: subvector
    rows carry a `sub` column, assignment joins the (m*k)-row codebook
    dimension on `sub` (broadcast by visible size), updates aggregate
    per (sub, cell, pos) - all m subspaces train in the same
    map-side-combinable shuffles, and the SQL oracle replays the whole
    thing as ONE kmeans unroll with `sub` added to every key (the
    embed_kmeans oracle shape).  Shared deterministic seeding: the k
    corpus rows with the smallest (md5(key), key) seed EVERY subspace
    with their slices - same integer arithmetic, argmin ties to the
    lowest cell, empty cells carry forward, fixed iterations (the
    kmeans_lloyd contract, inherited trick for trick).

    Returns (codes, codebooks): (key, codes array<long>, m entries in
    subspace order) and (sub, cell, cv array<bigint>)."""
    if k < 1 or iterations < 0:
        raise ValueError("k >= 1 and iterations >= 0 required")
    spark = df.sparkSession
    subq = _subvectors(df, key_col, vec_col, m, scale)
    seeds = (df.select(F.col(key_col).alias("_id"),
                       quantize_vec(F.col(vec_col), scale).alias("v"))
             .orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
             .limit(k).collect())
    dim = len(seeds[0].v)
    w = dim // m
    cents = spark.createDataFrame(
        [(j, i, list(r.v[j * w:(j + 1) * w]))
         for j in range(m) for i, r in enumerate(seeds)],
        "sub bigint, cell bigint, cv array<bigint>")

    def _assign(cents_df):
        cand = (subq.join(F.broadcast(cents_df), "sub")
                .select("_id", "sub", "v",
                        F.struct(_sub_l2().alias("d"),
                                 F.col("cell").alias("cell"),
                                 F.col("v").alias("vv")).alias("s")))
        return (cand.groupBy("_id", "sub").agg(F.min("s").alias("b"))
                .select("_id", "sub", F.col("b.cell").alias("cell"),
                        F.col("b.d").alias("dist"),
                        F.col("b.vv").alias("v")))

    for _ in range(iterations):
        best = _assign(cents)
        sums = (best.select("sub", "cell",
                            F.posexplode("v").alias("pos", "val"))
                .groupBy("sub", "cell", "pos")
                .agg(F.sum("val").alias("s"),
                     F.count(F.lit(1)).alias("c")))
        newc = (sums.withColumn("cval", F.expr("s div c"))
                .groupBy("sub", "cell")
                .agg(F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("pos", "cval"))),
                    lambda st: st["cval"]).alias("ncv")))
        cents = (cents.join(newc, ["sub", "cell"], "left")
                 .select("sub", "cell",
                         F.coalesce("ncv", "cv").alias("cv"))
                 .localCheckpoint(eager=True))
    codes = (_assign(cents)
             .groupBy("_id")
             .agg(F.transform(
                 F.array_sort(F.collect_list(
                     F.struct("sub", "cell"))),
                 lambda st: st["cell"]).alias("codes"))
             .select(F.col("_id").alias(key_col), "codes"))
    return codes, cents


def pq_encode(df: DataFrame, codebooks: DataFrame,
              key_col: str = "vec_id", vec_col: str = "embedding",
              scale: int = 1_000_000) -> DataFrame:
    """Encode NEW vectors against trained PQ codebooks - the
    incremental path (identical arithmetic to training's final pass,
    the assign_to_centroids contract).  Returns (key, codes)."""
    probe = codebooks.agg(F.max("sub").alias("mx")).first()
    m = int(probe.mx) + 1
    subq = _subvectors(df, key_col, vec_col, m, scale)
    cand = (subq.join(F.broadcast(codebooks), "sub")
            .select("_id", "sub",
                    F.struct(_sub_l2().alias("d"),
                             F.col("cell").alias("cell")).alias("s")))
    return (cand.groupBy("_id", "sub").agg(F.min("s").alias("b"))
            .groupBy("_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("sub", F.col("b.cell").alias("cell")))),
                lambda st: st["cell"]).alias("codes"))
            .select(F.col("_id").alias(key_col), "codes"))


def pq_search_adc(queries: DataFrame, codes: DataFrame,
                  codebooks: DataFrame, k: int = 5,
                  query_key_col: str = "query_id",
                  vec_col: str = "embedding",
                  key_col: str = "vec_id",
                  scale: int = 1_000_000) -> DataFrame:
    """Asymmetric-distance PQ search: rank the encoded corpus against
    RAW query vectors through per-query lookup tables - the classic
    ADC scan (Jegou et al. 2011).  Per query and subspace, the
    distance to each codebook centroid is precomputed (Q*m*k rows -
    tiny, broadcast by visible size); the corpus side only ever
    touches its m-long codes: posexplode -> join the LUT on
    (sub, code) -> one map-side-combinable sum per (query, key) ->
    per-query top-k via partial WindowGroupLimit.  A 768-dim corpus
    is ranked from m lookups per row instead of 768 multiplies, and
    raw corpus vectors are never read - the memory/IO win that makes
    billion-vector rerank pipelines feasible.  Exact integer
    arithmetic end to end; ADC distance is an approximation OF the
    true distance by construction (quantization error), which is the
    operator's documented contract - rerank survivors with
    ann_topk_bruteforce for exact final order.

    Returns (query_key, key, adc_dist, rnk), ties (dist asc, key
    asc)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    probe = codebooks.agg(F.max("sub").alias("mx")).first()
    m = int(probe.mx) + 1
    qsub = _subvectors(queries, query_key_col, vec_col, m, scale)
    lut = (qsub.join(F.broadcast(codebooks), "sub")
           .select(F.col("_id").alias("_qid"), "sub", "cell",
                   _sub_l2().alias("d")))
    probe_codes = (codes.select(F.col(key_col).alias("_key"),
                                F.posexplode("codes")
                                .alias("sub", "cell"))
                   .withColumn("sub", F.col("sub").cast("long")))
    scored = (probe_codes.join(lut, ["sub", "cell"])
              .groupBy("_qid", "_key")
              .agg(F.sum("d").cast("long").alias("adc_dist")))
    w = Window.partitionBy("_qid").orderBy(
        F.col("adc_dist").asc(), F.col("_key").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(F.col("_qid").alias(query_key_col),
                    F.col("_key").alias(key_col),
                    "adc_dist", F.col("rnk").cast("long").alias("rnk")))
