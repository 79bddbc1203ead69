"""Graph queries over the materialized KG edges (consumers of the
north_star's node/edge tables: neighborhood retrieval, degree audits).

* `khop_neighbors` - breadth-first expansion to hop distance k via
  iterative hash joins: per round, join the frontier against the edge
  list, anti-join out visited nodes, checkpoint. k is small (2-4 in
  retrieval use), so rounds are bounded and each is shuffle-on-node-id
  (uniform for hashed ids). The frontier is usually tiny vs the edge
  table -> broadcast it per round.
* `degree_stats` - per-node degree over undirected edges: one map-side-
  combinable groupBy; the input to hub detection (the north_star's skew
  mitigation needs to KNOW its hubs) and to degree-capped sampling.

Both are DuckDB-oracle-checkable (BFS min-hop via recursive CTE).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pin(df: DataFrame) -> DataFrame:
    """Pin a LOOP-INVARIANT frame of an iterative operator (round-6
    optimization, guide SS2.4/SS5): without this, every round's job
    re-executes the edge-set distinct / node-set union-distinct /
    degree aggregate from the source - 2-4 redundant shuffles per
    round that dominate the per-round cost at every scale.

    localCheckpoint(eager=True) rather than persist(): a persisted
    plan is materialized WITHOUT adaptive partition coalescing
    (spark.sql.optimizer.canChangeCachedPlanOutputPartitioning is off
    by default), so the cache holds shuffle.partitions tiny blocks and
    every round's stage that reads it schedules that many near-empty
    tasks - measured as the dominant per-round cost on bench-scale
    graphs. The eager checkpoint executes through AQE (coalesced
    output), truncates lineage, and the stored partitions are sized by
    the advisory target at every scale. Storage is freed when the
    operator's frames are garbage-collected; callers' unpersist()
    calls are harmless no-ops on checkpointed frames."""
    return df.localCheckpoint(eager=True)


def degree_stats(edges: DataFrame, src: str = "src",
                 dst: str = "dst") -> DataFrame:
    """(node, degree) over the undirected view (self-loops dropped,
    parallel edges deduplicated)."""
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v"))
           .select(F.greatest("u", "v").alias("a"),
                   F.least("u", "v").alias("b"))
           .distinct())
    both = (und.select(F.col("a").alias("node"))
            .unionByName(und.select(F.col("b").alias("node"))))
    return both.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def pagerank(edges: DataFrame, iterations: int = 5,
             damping_bp: int = 8500, scale: int = 1_000_000,
             src: str = "src", dst: str = "dst",
             redistribute_dangling: bool = False,
             init_ranks: DataFrame | None = None) -> DataFrame:
    """Integer-scaled PageRank over the DIRECTED edge set - the KG hub/
    importance score feeding retrieval ranking and curation (which
    entities deserve canonical-page status).

    Determinism/oracle design: every quantity is a bigint. rank_0 = scale
    for all nodes; per round
        contrib(u) = rank(u) div out_degree(u)        (integer div)
        rank'(v)   = base + (damping_bp * sum_in(v)) div 10^4
    with base = (scale * (10^4 - damping_bp)) div 10^4. Integer sums are
    order-independent, so DuckDB replays the EXACT ranks with an unrolled
    CTE chain (the pagerank driver query) - no FP accumulation-order
    hazard, the same trick as the minhash/simhash families. Semantics
    notes: parallel edges are deduplicated; dangling-node mass is dropped
    (not redistributed), the common simplification - document, don't
    hide. Fixed iteration count (no convergence test) keeps the oracle
    replayable; 5-10 rounds ranks hubs correctly long before full
    convergence.

    `redistribute_dangling=True` switches to the textbook treatment:
    each round the rank mass sitting on dangling nodes (no out-edges)
    is summed (a 1-row broadcast aggregate, integer-exact) and every
    node receives `dsum div N` inside the damped term - total mass is
    conserved up to integer truncation instead of leaking. Still
    fully oracle-replayable (the per-round dangling sum is one scalar
    subquery in the unrolled CTE chain). Default stays False for
    continuity with the recorded r4 ranks.

    `init_ranks` (a previous (node, rank) table) WARM-STARTS the
    iteration - the incremental-maintenance path: after a kg_diff
    delta touches a sliver of a 10^10-edge graph, ranks re-converge
    from the previous fixpoint in a couple of rounds instead of
    re-iterating from uniform (the iteration is a contraction toward
    one fixpoint, so any start converges to the same ranks - warm
    start changes the ROUND COUNT needed, never the limit; tested:
    warm-starting from the converged ranks is a fixpoint, one more
    round is a no-op up to integer truncation). Nodes absent from
    init_ranks (the delta's new nodes) start at `scale`; departed
    nodes' stale rows are ignored (left join on the CURRENT node set).
    Still fully oracle-replayable: pr0 seeds from the carried table.

    Scale shape: each round is one bounded join of edges against the
    (node, rank) table - both keyed on node id, AQE-skew-splittable - and
    one map-side-combinable integer sum groupBy(dst); a 10^8-in-degree
    hub's contributions pre-aggregate per map partition, never
    concentrating rows. localCheckpoint per round truncates the growing
    lineage exactly as connected_components does."""
    assert iterations >= 0 and 0 <= damping_bp <= 10_000
    e = _pin(edges.select(F.col(src).alias("s"),
                          F.col(dst).alias("d")).distinct())
    nodes = _pin(e.select(F.col("s").alias("node"))
                 .unionByName(e.select(F.col("d").alias("node")))
                 .distinct())
    outdeg = _pin(e.groupBy("s").agg(F.count(F.lit(1)).alias("odeg")))
    base = (scale * (10_000 - damping_bp)) // 10_000
    if init_ranks is not None:
        ranks = (nodes.join(init_ranks.select(
            F.col("node"), F.col("rank").cast("long").alias("_init")),
            "node", "left")
            .select("node", F.coalesce("_init", F.lit(scale).cast("long"))
                    .alias("rank")))
    else:
        ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    if redistribute_dangling:
        n_nodes = nodes.count()
        dang = (nodes.join(outdeg.select(F.col("s").alias("node")),
                           "node", "left_anti")
                .localCheckpoint(eager=True))
    for _ in range(iterations):
        contrib = (e.join(ranks.withColumnRenamed("node", "s"), "s")
                   .join(outdeg, "s")
                   .select(F.col("d").alias("node"),
                           F.expr("rank div odeg").alias("c"))
                   .groupBy("node").agg(F.sum("c").alias("in_sum")))
        if redistribute_dangling:
            dsum = (ranks.join(dang, "node", "left_semi")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0))
                         .cast("long").alias("_dsum")))
            ranks = (nodes.join(contrib, "node", "left")
                     .crossJoin(F.broadcast(dsum))
                     .select("node",
                             (F.lit(base) + F.expr(
                                 f"({damping_bp} * (coalesce(in_sum, 0L)"
                                 f" + _dsum div {n_nodes})) div 10000"))
                             .cast("long").alias("rank")))
        else:
            ranks = (nodes.join(contrib, "node", "left")
                     .select("node",
                             (F.lit(base) + F.expr(
                                 f"({damping_bp} * coalesce(in_sum, 0L)) "
                                 f"div 10000")).cast("long").alias("rank")))
        ranks = ranks.localCheckpoint(eager=True)
    # final ranks are checkpoint-materialized (or, with iterations=0, a
    # cheap projection); the loop-invariant caches can go
    for _df in (e, nodes, outdeg):
        _df.unpersist()
    return ranks


def kcore(edges: DataFrame, k: int = 3, max_rounds: int = 20,
          src: str = "src", dst: str = "dst") -> DataFrame:
    """The k-core of the undirected simple graph: iteratively peel
    nodes of degree < k until stable; returns (node, deg) for the
    surviving nodes with their WITHIN-CORE degree. The dense-subgraph
    signal KG curation uses both ways - link-farm/spam clusters are
    high-core, and entities outside the 2-core are weakly-attested
    leaves.

    Peeling is monotone and idempotent once stable, so the early-stop
    below cannot change the result vs a fixed round count - which is
    what makes the unrolled-CTE oracle exact (it just runs the full
    max_rounds). Self-loops dropped, parallel/reversed edges
    deduplicated, matching triangle_count's graph reading.

    Scale shape: per round two LeftSemi joins restrict the edge list to
    live endpoints and one map-side-combinable count rebuilds degrees -
    edges never carry payload; localCheckpoint truncates lineage; the
    convergence probe is a 1-row count."""
    assert k >= 1 and max_rounds >= 1
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .where(F.col("u") != F.col("v")))
    und = (e.unionByName(e.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
           .distinct().localCheckpoint(eager=True))
    alive = und.select(F.col("u").alias("node")).distinct() \
        .localCheckpoint(eager=True)
    n_alive = alive.count()
    deg = None
    for _ in range(max_rounds):
        live_e = (und.join(alive.withColumnRenamed("node", "u"), "u",
                           "left_semi")
                  .join(alive.withColumnRenamed("node", "v"), "v",
                        "left_semi"))
        deg = live_e.groupBy(F.col("u").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("deg"))
        nxt = deg.where(F.col("deg") >= k).select("node") \
            .localCheckpoint(eager=True)
        n_next = nxt.count()
        alive = nxt
        if n_next == n_alive:
            break
        n_alive = n_next
    return deg.where(F.col("deg") >= k)


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          iterations: int = 5, damping_bp: int = 8500,
                          scale: int = 1_000_000, src: str = "src",
                          dst: str = "dst") -> DataFrame:
    """Seed-personalized PageRank - the KG relatedness score: random
    walks teleport back to the SEED set instead of the whole graph, so
    high-rank nodes are important RELATIVE to the seeds (entity
    disambiguation context, related-entity retrieval, topic-focused
    crawl prioritization).

    Same all-bigint determinism contract as `pagerank` (integer sums,
    div, fixed rounds - unrolled-CTE oracle replayable): rank_0 = scale
    on seeds / 0 elsewhere; per round
        rank'(v) = seed(v)*base + damping * sum_in(v) div 10^4
    with base = (scale * (10^4 - damping_bp)) div 10^4 - the teleport
    mass lands only on seeds. Non-seed nodes unreachable from seeds
    stay at exactly 0 (pruned from the output).

    Scale shape: identical to pagerank (bounded node-keyed joins +
    map-side-combined integer sums, localCheckpoint per round); the
    seed frame joins broadcast-or-hash by Catalyst's size estimate."""
    assert iterations >= 0 and 0 <= damping_bp <= 10_000
    e = _pin(edges.select(F.col(src).alias("s"),
                          F.col(dst).alias("d")).distinct())
    nodes = (e.select(F.col("s").alias("node"))
             .unionByName(e.select(F.col("d").alias("node")))
             .distinct())
    seed = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct() \
        .withColumn("_is_seed", F.lit(True))
    nodes = nodes.join(seed, "node", "left") \
        .select("node", F.coalesce("_is_seed", F.lit(False))
                .alias("_is_seed")).localCheckpoint(eager=True)
    outdeg = _pin(e.groupBy("s").agg(F.count(F.lit(1)).alias("odeg")))
    base = (scale * (10_000 - damping_bp)) // 10_000
    ranks = nodes.withColumn(
        "rank", F.when(F.col("_is_seed"), F.lit(scale))
        .otherwise(F.lit(0)).cast("long")).drop("_is_seed")
    for _ in range(iterations):
        contrib = (e.join(ranks.withColumnRenamed("node", "s"), "s")
                   .join(outdeg, "s")
                   .select(F.col("d").alias("node"),
                           F.expr("rank div odeg").alias("c"))
                   .groupBy("node").agg(F.sum("c").alias("in_sum")))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node", (
                     F.when(F.col("_is_seed"), F.lit(base))
                     .otherwise(F.lit(0))
                     + F.expr(f"({damping_bp} * coalesce(in_sum, 0L)) "
                              f"div 10000")).cast("long").alias("rank")))
        ranks = ranks.localCheckpoint(eager=True)
    for _df in (e, outdeg):
        _df.unpersist()
    return ranks.where(F.col("rank") > 0)


def hits(edges: DataFrame, iterations: int = 3, scale: int = 1_000_000,
         src: str = "src", dst: str = "dst") -> DataFrame:
    """Kleinberg HITS (hubs & authorities) over the directed edge set -
    the web-graph score pair PageRank doesn't give: an authority is a
    page many good hubs point AT, a hub is a page pointing at many good
    authorities (SODA'98 / JACM'99; the link-analysis complement for
    ranking extracted web entities).

    Determinism/oracle design (same contract as `pagerank`): all-bigint.
    hub_0 = scale; per round
        auth_raw(v) = sum_{u->v} hub(u);   auth = auth_raw*scale div max
        hub_raw(u)  = sum_{u->v} auth(v);  hub  = hub_raw*scale div max
    Max-normalization (the standard power-iteration rescale, integer
    here) replaces the L2 norm so DuckDB replays EXACT scores with an
    unrolled CTE chain - integer sums are order-independent. Fixed
    iteration count keeps the oracle replayable; the hub/authority
    ORDERING stabilizes in 2-3 rounds on web-shaped graphs. Overflow
    bound: values stay <= scale after normalizing, so round sums are
    <= max_degree*scale and the rescale multiply <= max_degree*scale^2
    - pick scale so that fits in int64 (10^6 allows degree ~10^6).

    Scale shape: per round two bounded joins keyed on node id (AQE-skew
    splittable) and two map-side-combinable integer-sum groupBys - a
    10^8-degree hub pre-aggregates per map partition. The per-round max
    is a 1-row broadcast (crossJoin of an aggregate, never a driver
    collect); localCheckpoint truncates lineage per round."""
    assert iterations >= 1 and scale > 0
    e = _pin(edges.select(F.col(src).alias("s"),
                          F.col(dst).alias("d")).distinct())
    nodes = _pin(e.select(F.col("s").alias("node"))
                 .unionByName(e.select(F.col("d").alias("node")))
                 .distinct())
    hubs = nodes.withColumn("hub", F.lit(scale).cast("long"))
    auth = None

    def _normalize(raw: DataFrame, out_name: str) -> DataFrame:
        # checkpoint BEFORE the max aggregate: `full` feeds both the
        # 1-row max and the rescale, and un-checkpointed it executed
        # the whole upstream join+sum twice per half-round (round-6
        # optimization; the rescale itself is a narrow projection, so
        # checkpointing here also keeps lineage truncated per round)
        full = (nodes.join(raw, "node", "left")
                .select("node", F.coalesce("raw", F.lit(0))
                        .cast("long").alias("raw"))
                .localCheckpoint(eager=True))
        mx = full.agg(F.greatest(F.max("raw"), F.lit(1)).alias("_m"))
        return (full.crossJoin(F.broadcast(mx))
                .select("node", F.expr(f"(raw * {scale}) div _m")
                        .cast("long").alias(out_name)))

    for _ in range(iterations):
        a_raw = (e.join(hubs.withColumnRenamed("node", "s"), "s")
                 .groupBy(F.col("d").alias("node"))
                 .agg(F.sum("hub").alias("raw")))
        auth = _normalize(a_raw, "authority")
        h_raw = (e.join(auth.withColumnRenamed("node", "d"), "d")
                 .groupBy(F.col("s").alias("node"))
                 .agg(F.sum("authority").alias("raw")))
        hubs = _normalize(h_raw, "hub")
    # hubs/auth are narrow rescales over their checkpointed `full`
    # frames - the loop-invariant caches are no longer referenced
    for _df in (e, nodes):
        _df.unpersist()
    return hubs.join(auth, "node")


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst",
                   orient_by_degree: bool = False) -> DataFrame:
    """(node, triangles) - per-node triangle participation over the
    undirected simple graph (self-loops dropped, parallel edges
    deduplicated). The KG quality signal behind clustering-coefficient
    audits: entities whose neighborhoods are cliques are dense aliases,
    bridges with zero triangles are suspect links.

    Algorithm: edge orientation + one join. Orient every edge low->high,
    join the oriented list with itself on the middle node to enumerate
    wedges (a<b<c with a-b, b-c), then semi-join the closing edge (a,c).
    Each triangle is produced EXACTLY once (its id-ordered orientation),
    so counts are deterministic and a DuckDB three-way self-join replays
    them row-for-row.

    Scale shape: two shuffles on node id (the wedge join + the closing
    semi-join), both AQE-skew-splittable; the wedge set - the quadratic
    hazard - is bounded by sum(out_deg^2) under the orientation, and
    `orient_by_degree=True` switches to (degree, id) orientation which
    provably minimizes that bound for power-law graphs (hubs point
    nowhere): same triangle set, different wedge count; id-orientation
    stays the default because the oracle replays it with no degree CTE."""
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v"))
           .select(F.greatest("u", "v").alias("hi"),
                   F.least("u", "v").alias("lo"))
           .distinct().localCheckpoint(eager=False))
    if orient_by_degree:
        deg = degree_stats(und, "lo", "hi")
        lod = deg.select(F.col("node").alias("lo"),
                         F.col("degree").alias("lo_deg"))
        hid = deg.select(F.col("node").alias("hi"),
                         F.col("degree").alias("hi_deg"))
        ranked = (und.join(lod, "lo").join(hid, "hi")
                  .select(
                      F.when((F.col("lo_deg") < F.col("hi_deg"))
                             | ((F.col("lo_deg") == F.col("hi_deg"))
                                & (F.col("lo") < F.col("hi"))),
                             F.col("lo")).otherwise(F.col("hi")).alias("a"),
                      F.when((F.col("lo_deg") < F.col("hi_deg"))
                             | ((F.col("lo_deg") == F.col("hi_deg"))
                                & (F.col("lo") < F.col("hi"))),
                             F.col("hi")).otherwise(F.col("lo")).alias("b")))
    else:
        ranked = und.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    # both orientations are total orders, so rank(a)<rank(b)<rank(c)
    # implies the closing a-c edge (if present) is oriented a->c too
    e2 = ranked.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = ranked.join(e2, "b").select("a", "b", "c")
    closing = ranked.select("a", F.col("b").alias("c"))
    tri = wedges.join(closing, ["a", "c"], "left_semi")
    per_node = (tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("triangles")))
    return per_node


def khop_neighbors(edges: DataFrame, seeds: DataFrame, k: int,
                   src: str = "src", dst: str = "dst",
                   seed_col: str = "node",
                   broadcast_frontier: bool = True) -> DataFrame:
    """(node, hops) for every node within hop distance <= k of any seed
    (hops = minimum distance; seeds themselves at 0), over the
    UNDIRECTED edge view.

    Iterative BFS: each round joins the current frontier to the edge
    list, removes already-visited nodes, and checkpoints the (small)
    visited/frontier sets to cut lineage. With `broadcast_frontier`
    (retrieval-sized seed sets) the edge table never shuffles - k
    broadcast joins total; disable for massive seed sets and the joins
    become node-id hash joins."""
    und = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .filter(F.col("a") != F.col("b")))
    bidir = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    visited = (seeds.select(F.col(seed_col).alias("node")).distinct()
               .withColumn("hops", F.lit(0)))
    frontier = visited.select("node")
    from pyspark.sql import Observation
    for hop in range(1, k + 1):
        f = F.broadcast(frontier) if broadcast_frontier else frontier
        reached = (bidir.join(f, bidir["a"] == f["node"])
                   .select(F.col("b").alias("node")).distinct())
        # emptiness probe rides as an observed metric on the frontier
        # checkpoint job (round 6) - one job per hop, no extra take()
        obs = Observation()
        frontier = (reached.join(visited.select("node"), "node",
                                 "left_anti")
                    .observe(obs, F.count(F.lit(1)).alias("n"))
                    .localCheckpoint(eager=True))
        if obs.get["n"] == 0:
            break
        visited = visited.unionByName(
            frontier.withColumn("hops", F.lit(hop))) \
            .localCheckpoint(eager=True)
    return visited


def node_similarity(edges: DataFrame, src: str = "src", dst: str = "dst",
                    min_common: int = 1,
                    max_center_degree: int | None = None) -> DataFrame:
    """Neighborhood similarity for node pairs sharing at least
    `min_common` neighbors over the undirected simple graph:
    (node_a, node_b, common, degree_a, degree_b, jaccard_bp) with
    node_a < node_b and jaccard_bp = floor(10^4 * |N(a) n N(b)| /
    |N(a) u N(b)|) in exact integer arithmetic (no float drift vs the
    SQL oracle). The KG link-prediction / alias-suggestion signal:
    entities whose neighborhoods overlap strongly but that carry no
    sameAs edge are merge candidates for review.

    Algorithm: wedge enumeration, like `triangle_count` - both
    directions of each deduplicated edge, self-joined on the shared
    neighbor (the wedge center), pairs oriented a < b, counted per
    pair, then degree-joined. Shuffles on node id only.

    Scale shape: a center of degree d contributes d*(d-1)/2 candidate
    pairs, so hubs dominate cost quadratically (the north_star's
    wikipedia.org shape). `max_center_degree` excludes wedge CENTERS
    above the cap - similarity via mega-hubs is noise anyway (sharing
    wikipedia.org as a neighbor is no evidence of likeness), which is
    why capped centers are dropped rather than sampled; the pair's OWN
    degrees still count every edge, keeping jaccard_bp honest as a
    lower bound. Default None = exact (the oracle config)."""
    # round-6 optimization: the undirected-dedup frame feeds the degree
    # table and both wedge-join sides - lazily checkpoint so the
    # distinct runs once, not per consumer
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v"))
           .select(F.greatest("u", "v").alias("hi"),
                   F.least("u", "v").alias("lo"))
           .distinct().localCheckpoint(eager=False))
    bidir = (und.select(F.col("lo").alias("node"), F.col("hi").alias("nbr"))
             .unionByName(und.select(F.col("hi").alias("node"),
                                     F.col("lo").alias("nbr"))))
    deg = bidir.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    centers = bidir
    if max_center_degree is not None:
        # broadcast the tiny OVER-cap hub set and anti-join - the
        # below-cap set is nearly the whole graph, and broadcasting IT
        # would OOM the driver at exactly the hub-skewed scale the cap
        # exists for (round-4 review)
        hubs = (deg.filter(F.col("degree") > max_center_degree)
                .select(F.col("node").alias("nbr")))
        centers = centers.join(F.broadcast(hubs), "nbr", "left_anti")
    left = centers.select(F.col("nbr").alias("c"), F.col("node").alias("a"))
    right = centers.select(F.col("nbr").alias("c"), F.col("node").alias("b"))
    pairs = (left.join(right, "c")
             .filter(F.col("a") < F.col("b"))
             .groupBy("a", "b")
             .agg(F.count(F.lit(1)).alias("common"))
             .filter(F.col("common") >= min_common))
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("degree_a"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("degree_b"))
    out = (pairs.join(da, "a").join(db, "b")
           .select(F.col("a").alias("node_a"), F.col("b").alias("node_b"),
                   "common", "degree_a", "degree_b"))
    # exact integral floor division (`div` on longs), same as the
    # DuckDB oracle's `//`; union size >= 1 whenever a pair exists
    return out.withColumn(
        "jaccard_bp",
        F.expr("CAST(10000 AS BIGINT) * CAST(common AS BIGINT) div "
               "CAST(degree_a + degree_b - common AS BIGINT)"))


def shortest_paths(edges: DataFrame, seeds: DataFrame,
                   src: str = "src", dst: str = "dst",
                   weight: str | None = None, seed_col: str = "node",
                   max_iter: int = 64, broadcast_frontier: bool = True,
                   validate_weights: bool = True) -> DataFrame:
    """(node, dist) = minimum total edge weight from any seed over the
    DIRECTED edge set (use an explicit bidirectional union for the
    undirected view); `weight=None` counts hops (weight 1). Weights are
    cast to LONG - integer-exact accumulation, so the result
    hash-compares against a SQL oracle with no float drift. Negative
    weights raise (Bellman-Ford would need |V| full rounds to be safe;
    this loop exits on frontier exhaustion, which is only correct for
    non-negative weights). The guard costs one early-exit scan of the
    edge table; pass `validate_weights=False` when the weight column
    is non-negative by construction (it is skipped automatically for
    hop counting).

    Frontier Bellman-Ford: each round joins only the IMPROVED nodes to
    the edge list, min-aggregates candidate distances per destination,
    keeps the strictly-better ones, and merges. With non-negative
    weights every node's distance improves at most O(diameter in
    shortcut-steps) times, and the frontier empties exactly at the
    fixpoint. `khop_neighbors` stays the unweighted-k fast path (no
    per-round aggregate).

    Scale shape: with `broadcast_frontier` (retrieval-sized seed sets)
    the corpus-scale edge table NEVER shuffles - each round is one
    broadcast hash join + a node-keyed partial agg; disable for massive
    frontiers and the joins become node-id hash joins. Per-round
    localCheckpoint truncates the iterative plan (same discipline as
    connected_components)."""
    w = (F.col(weight).cast("long") if weight is not None
         else F.lit(1).cast("long"))
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"),
                     w.alias("w"))
    if weight is not None and validate_weights \
            and e.filter(F.col("w") < 0).take(1):
        raise ValueError("negative edge weights are not supported")
    dist = (seeds.select(F.col(seed_col).alias("node")).distinct()
            .withColumn("dist", F.lit(0).cast("long"))
            .localCheckpoint(eager=True))
    frontier = dist
    converged = False
    for _ in range(max_iter):
        f = F.broadcast(frontier) if broadcast_frontier else frontier
        cand = (e.join(f, e["a"] == f["node"])
                .select(F.col("b").alias("node"),
                        (F.col("dist") + F.col("w")).alias("d"))
                .groupBy("node").agg(F.min("d").alias("d")))
        old = dist.select("node", F.col("dist").alias("_old"))
        # lazy checkpoint: the take(1) below materializes it, so each
        # round costs two jobs (probe + dist merge), not three. NB a
        # round-6 attempt to fold the probe into the merge job via an
        # observed metric on this lazy checkpoint mis-fires: the
        # checkpoint's creation completes an "action" with zero tasks,
        # so the observation reports n=0 before any data flows -
        # observations only pair with EAGER materialization.
        improved = (cand.join(old, "node", "left")
                    .filter(F.col("_old").isNull() |
                            (F.col("d") < F.col("_old")))
                    .select("node", F.col("d").alias("dist"))
                    .localCheckpoint(eager=False))
        if not improved.take(1):
            converged = True
            break
        dist = (dist.join(improved.select("node"), "node", "left_anti")
                .unionByName(improved)
                .localCheckpoint(eager=True))
        frontier = improved
    if not converged:
        # returning partial distances silently would hash-mismatch the
        # oracle at best and feed wrong distances downstream at worst
        # (round-4 review: the repo rule is no silent caps)
        raise ValueError(
            f"shortest_paths did not converge within max_iter="
            f"{max_iter} rounds (graph hop-diameter from the seeds "
            "exceeds it); raise max_iter")
    return dist


def cooccurrence_projection(edges: DataFrame, src: str = "src",
                            dst: str = "dst",
                            max_fanout: Optional[int] = None,
                            min_shared: int = 1,
                            return_dropped: bool = False):
    """Bipartite co-occurrence projection (the market-basket / related-
    entity graph): for every pair of `src` nodes sharing at least
    `min_shared` distinct `dst` values, emit (node_a, node_b, n_shared)
    with node_a < node_b. This is how a KG derives an entity-affinity
    edge set from containment edges (entities per page, parts per
    order, tokens per doc).

    Scale shape: the projection is per-dst quadratic BY CONSTRUCTION -
    a dst with fanout f yields f*(f-1)/2 pairs, so one 10^6-fanout hub
    (a boilerplate page every entity links to) emits 5*10^11 rows.
    `max_fanout` census-caps that: dsts above the cap are REMOVED and
    returned as an audit DataFrame (d, fanout) when `return_dropped`
    (repo rule: no silent caps; high-fanout dsts carry near-zero
    affinity signal anyway, the same argument as stop-word removal).
    The self-join shuffles both sides on `dst` once - same-key sort-
    merge with exchange reuse, AQE-skew-splittable - and the pair
    count is a map-side-combinable groupBy.

    Deterministic (set semantics on edges, ordered pair output), so a
    SQL self-join oracle replays it exactly."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")) \
        .distinct()
    dropped = None
    if max_fanout is not None:
        census = e.groupBy("d").agg(F.count(F.lit(1)).alias("fanout"))
        dropped = census.filter(F.col("fanout") > max_fanout)
        e = e.join(dropped.select("d"), "d", "left_anti")
    a = e.select(F.col("s").alias("node_a"), "d")
    b = e.select(F.col("s").alias("node_b"), "d")
    pairs = (a.join(b, "d")
             .filter(F.col("node_a") < F.col("node_b"))
             .groupBy("node_a", "node_b")
             .agg(F.count(F.lit(1)).alias("n_shared"))
             .filter(F.col("n_shared") >= min_shared))
    if return_dropped:
        if dropped is None:
            # always a DataFrame, never None (round-3 ADVICE on the
            # dedup_simhash audit contract)
            dropped = (e.groupBy("d")
                       .agg(F.count(F.lit(1)).alias("fanout"))
                       .filter(F.lit(False)))
        return pairs, dropped
    return pairs


def label_propagation(edges: DataFrame, rounds: int = 3,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """Synchronous label propagation over the undirected view - the
    standard cheap community-detection pass for KG neighborhoods
    (denser-than-component clusters: CC merges everything reachable,
    LPA keeps chain-distant regions apart).

    Deterministic variant (plain LPA is notoriously order-dependent):
    labels start as the node id; each round EVERY node takes the most
    frequent label among its neighbors, ties broken by the SMALLEST
    label; a fixed `rounds` count, no convergence test. Every step is
    an order-independent aggregate (count, then min over a (-count,
    label) struct), so the result is invariant to partitioning and an
    unrolled SQL window oracle replays it exactly.

    Scale shape per round: one hash join of the undirected edge list
    against the (node, label) table (both keyed on node id), one
    map-side-combinable (node, label) count, one struct-min groupBy.
    A 10^8-degree hub pre-aggregates its neighbor-label counts per map
    partition - no single-reducer concentration. localCheckpoint per
    round truncates the iterative lineage (pagerank discipline).
    Self-loops are dropped; isolated nodes do not appear (no edges, no
    community membership)."""
    assert rounds >= 0
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v")))
    und = _pin(und.unionByName(und.select(F.col("v").alias("u"),
                                          F.col("u").alias("v")))
               .distinct())
    labels = (und.select(F.col("u").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    for _ in range(rounds):
        nbr = (und.join(labels.withColumnRenamed("node", "v"), "v")
               .select(F.col("u").alias("node"), "label"))
        cnt = (nbr.groupBy("node", "label")
               .agg(F.count(F.lit(1)).alias("c")))
        labels = (cnt.groupBy("node")
                  .agg(F.min(F.struct((-F.col("c")).alias("negc"),
                                      F.col("label").alias("label")))
                       .alias("m"))
                  .select("node", F.col("m.label").alias("label"))
                  .localCheckpoint(eager=True))
    if rounds == 0:
        # labels is a projection over `und`: materialize before the
        # cache goes away so rounds=0 callers don't recompute uncached
        labels = labels.localCheckpoint(eager=True)
    und.unpersist()
    return labels


def strongly_connected_components(edges: DataFrame, max_outer: int = 4,
                                  max_rounds: int = 60,
                                  trim_rounds: int = 3,
                                  src: str = "src",
                                  dst: str = "dst") -> DataFrame:
    """Strongly connected components of the DIRECTED graph: returns
    (node, scc) where `scc` is the MINIMUM member id of the node's
    component - a purely semantic label, so any correct algorithm (and
    any oracle) must produce the identical table. The directed-graph
    counterpart of `connected_components`: on web graphs SCCs are the
    link-exchange rings / redirect loops / navigational cliques that
    undirected CC cannot see (a spam farm linking in a cycle is an SCC;
    a site merely linked FROM everywhere is not).

    Algorithm: FW-BW coloring with trimming (the Slota/Multistep family,
    the standard distributed SCC shape), entirely in DataFrame ops:

      1. TRIM - a node with no in-edge or no out-edge among the live
         nodes cannot sit on a cycle, so it is its own singleton SCC.
         Iterated `trim_rounds` per outer pass: on bow-tie-shaped web
         graphs this alone retires most of the corpus (the IN/OUT
         tendrils), which is why it runs before any fixpoint work.
      2. COLOR - forward min-label fixpoint: color(v) = min id over
         {u : u ->* v} u {v}. All members of one SCC share ancestors,
         hence share a color; a color's ROOT (the node whose id equals
         its color) has no smaller ancestor, so the root is the minimum
         member of ITS component.
      3. HARVEST - backward reachability from each root restricted to
         the root's color class: u joins when (u -> v, v marked,
         color(u) == color(v)). The marked set of root c is exactly
         SCC(c) (anything backward-reachable within the color is also
         forward-reachable from c by the color definition), and c being
         the min member makes `scc = color` the semantic label. All
         colors harvest in the SAME joins - one root per color, many
         components per outer pass.
      4. Remove harvested nodes, repeat: each outer pass retires every
         component whose minimum member is minimal within its ancestor
         set, so condensation-DAG depth (in those terms) bounds
         `max_outer` - tiny on real graphs (the giant SCC falls in pass
         one; trimming eats the tendrils).

    Determinism/scale: every step is a hash join + map-side-combinable
    min/count on bare (long, long) rows - no payload ever rides the
    shuffle; localCheckpoint truncates lineage per round; the color
    fixpoint probe is a 1-row checksum aggregate (min-labels only
    decrease, so an unchanged decimal(38,0) label sum == fixpoint -
    no extra diff join). Non-convergence RAISES (repo rule: no silent
    caps) - partial SCC labels poison every consumer.

    Self-loops are dropped from the edge relation (they never change
    strong connectivity) but their endpoints stay in the node set.
    Parallel edges are deduplicated.
    """
    assert max_outer >= 1 and max_rounds >= 1 and trim_rounds >= 0
    e0 = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
          .distinct())
    nodes = (e0.select(F.col("u").alias("node"))
             .unionByName(e0.select(F.col("v").alias("node")))
             .distinct())
    e = e0.where(F.col("u") != F.col("v")).localCheckpoint(eager=True)
    remaining = nodes.localCheckpoint(eager=True)
    done = []           # (node, scc) slices
    n_remaining = remaining.count()

    def _live(edges_df, rem):
        return (edges_df
                .join(rem.withColumnRenamed("node", "u"), "u", "left_semi")
                .join(rem.withColumnRenamed("node", "v"), "v", "left_semi"))

    for _outer in range(max_outer):
        if n_remaining == 0:
            break
        live = _live(e, remaining)
        # 1. trim tendrils: no in-edge or no out-edge => singleton SCC
        for _t in range(trim_rounds):
            has_out = live.select(F.col("u").alias("node")).distinct()
            has_in = live.select(F.col("v").alias("node")).distinct()
            from pyspark.sql import Observation
            obs = Observation()
            keep = (remaining.join(has_out, "node", "left_semi")
                    .join(has_in, "node", "left_semi")
                    .observe(obs, F.count(F.lit(1)).alias("n"))
                    .localCheckpoint(eager=True))
            n_keep = obs.get["n"]
            if n_keep == n_remaining:
                break
            done.append(remaining.join(keep, "node", "left_anti")
                        .select("node", F.col("node").alias("scc"))
                        .localCheckpoint(eager=True))
            remaining, n_remaining = keep, n_keep
            live = _live(e, remaining)
        if n_remaining == 0:
            break
        live = live.localCheckpoint(eager=True)
        # 2. forward min-label fixpoint (color). Round-6 optimization:
        # the per-round checksum rides as an observed metric on the
        # checkpoint job (one job per round instead of checkpoint +
        # checksum aggregate); same order-independent decimal(38,0)
        # label sum, so the fixpoint detection is unchanged.
        from pyspark.sql import Observation
        labels = remaining.withColumn("label", F.col("node")) \
            .localCheckpoint(eager=True)
        checksum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        converged = False
        for _r in range(max_rounds):
            prop = (live.join(labels.withColumnRenamed("node", "u"), "u")
                    .groupBy(F.col("v").alias("node"))
                    .agg(F.min("label").alias("inmin")))
            obs = Observation()
            labels = (labels.join(prop, "node", "left")
                      .select("node",
                              F.least("label", F.coalesce("inmin", "label"))
                              .alias("label"))
                      .observe(obs, F.sum(F.col("label")
                                          .cast("decimal(38,0)"))
                               .alias("s"))
                      .localCheckpoint(eager=True))
            new_sum = obs.get["s"]
            if new_sum == checksum:
                converged = True
                break
            checksum = new_sum
        if not converged:
            raise ValueError(
                f"strongly_connected_components: color fixpoint not "
                f"reached within max_rounds={max_rounds}; raise it")
        # 3. harvest: backward reach from roots within their color class
        marked = (labels.where(F.col("label") == F.col("node"))
                  .localCheckpoint(eager=True))
        n_marked = marked.count()
        for _r in range(max_rounds):
            cand = (live
                    .join(marked.select(F.col("node").alias("v"), "label"),
                          "v")
                    .select(F.col("u").alias("node"), "label")
                    .join(labels.withColumnRenamed("label", "ulabel"),
                          "node")
                    .where(F.col("label") == F.col("ulabel"))
                    .select("node", "label"))
            obs = Observation()
            marked = (marked.unionByName(cand).distinct()
                      .observe(obs, F.count(F.lit(1)).alias("n"))
                      .localCheckpoint(eager=True))
            n_new = obs.get["n"]
            if n_new == n_marked:
                break
            n_marked = n_new
        else:
            raise ValueError(
                f"strongly_connected_components: harvest walk not "
                f"closed within max_rounds={max_rounds}; raise it")
        done.append(marked.select("node", F.col("label").alias("scc")))
        obs = Observation()
        remaining = (remaining.join(marked.select("node"), "node",
                                    "left_anti")
                     .observe(obs, F.count(F.lit(1)).alias("n"))
                     .localCheckpoint(eager=True))
        n_remaining = obs.get["n"]
    if n_remaining > 0:
        raise ValueError(
            f"strongly_connected_components: {n_remaining} nodes "
            f"unresolved after max_outer={max_outer} passes (deep "
            "condensation chain of locally-minimal components); raise "
            "max_outer")
    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    return out


def random_walks(edges: DataFrame, walks_per_node: int = 2,
                 length: int = 3, src: str = "src",
                 dst: str = "dst") -> DataFrame:
    """Deterministic random-walk corpus over the directed graph - the
    DeepWalk/node2vec PREPARATION stage: the walk table is the
    skip-gram training input for graph embeddings, and a cheap
    neighborhood sample for similarity features. 'Random' is a
    REPRODUCIBLE pseudo-random draw on the shared md5 base hash
    (dedup.md5_hash60): at step t of walk w from start s standing on
    node u, the next edge is out-neighbor rank

        md5_hash60(concat(s, '|', w, '|', t, '|', u)) % out_deg(u)

    over the (src ORDER BY dst) row-number ranking - fully replayable
    in SQL, independent across walks/steps, and invariant to
    partitioning/cluster size (df.sample is neither).

    Walks STOP at sinks (no out-edges): shorter rows simply end, the
    standard directed-walk convention. Output one row per visited
    position: (start, walk, step, node), step 0 = the start node
    itself.

    Scale shape: the adjacency ranking is ONE window sort keyed by
    src (rank/out_deg materialized once, reused by every step).
    Honest hub caveat: contiguous 0..deg-1 ranking of a 10^8-out-
    degree hub is one task sorting that hub's edge list - a one-time
    materialization cost (not per step), and the store to pre-build
    at that scale is the ranked adjacency itself (write once,
    bucket by src); each
    step is then a single hash equi-join of the frontier on
    (node, rank) - frontier rows are 4 longs, text/payload never
    moves. Hub fan-out is bounded by the JOIN being rank-exact (one
    matched edge per frontier row, never an explode of the hub's
    list). localCheckpoint truncates the per-step lineage."""
    from .dedup import md5_hash60
    from pyspark.sql.window import Window

    assert walks_per_node >= 1 and length >= 1
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")) \
        .distinct()
    w = Window.partitionBy("u").orderBy("v")
    adj = (e.withColumn("rank",
                        F.row_number().over(w).cast("long") - 1)
           .withColumn("deg", F.count(F.lit(1)).over(
               Window.partitionBy("u")).cast("long"))
           .localCheckpoint(eager=True))
    nodes = (e.select(F.col("u").alias("node"))
             .unionByName(e.select(F.col("v").alias("node")))
             .distinct())
    walks = nodes.select(
        F.col("node").alias("start"),
        F.explode(F.array(*[F.lit(i).cast("long")
                            for i in range(walks_per_node)]))
        .alias("walk"))
    degs = adj.select("u", "deg").distinct()
    frontier = walks.select("start", "walk",
                            F.lit(0).cast("long").alias("step"),
                            F.col("start").alias("node"))
    out = frontier
    for t in range(1, length + 1):
        # two-phase step: a 1-row-per-node deg lookup computes the
        # picked rank FIRST, so the adjacency join is exact on
        # (node, rank) - a hub's edge list is probed, never exploded
        picked = (frontier
                  .join(degs, frontier["node"] == degs["u"])
                  .select("start", "walk", "node",
                          F.pmod(md5_hash60(F.concat_ws(
                              "|", F.col("start"), F.col("walk"),
                              F.lit(t), F.col("node"))),
                              F.col("deg")).cast("long")
                          .alias("pick")))
        nxt = (picked
               .join(adj, (picked["node"] == adj["u"])
                     & (picked["pick"] == adj["rank"]))
               .select("start", "walk",
                       F.lit(t).cast("long").alias("step"),
                       F.col("v").alias("node"))
               .localCheckpoint(eager=True))
        out = out.unionByName(nxt)
        frontier = nxt
    return out


def multi_source_distances(edges: DataFrame, seeds: DataFrame, k: int,
                           src: str = "src", dst: str = "dst",
                           seed_col: str = "node",
                           directed: bool = True) -> DataFrame:
    """PER-SEED BFS min-hop distances within k hops: (seed, node,
    hops), seeds at distance 0 from themselves. Unlike
    `khop_neighbors` (which folds all seeds into ONE frontier), the
    frontier here is keyed (seed, node), so every seed's distance
    field survives - the input the centrality estimators need.

    Scale shape: per round one hash join of the (seed, node) frontier
    against the edge table on the node id plus a (seed, node)-keyed
    anti-join vs visited - bare long pairs, map-side-combinable
    distinct. Frontier volume is O(|seeds| x reachable-per-hop): this
    is a SEED-SAMPLED estimator by design (hundreds of seeds over a
    10^10-node graph, never all-pairs), the standard approximation
    for centrality at scale (Eppstein-Wang family)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")) \
        .where(F.col("a") != F.col("b")).distinct()
    if not directed:
        e = e.unionByName(e.select(F.col("b").alias("a"),
                                   F.col("a").alias("b"))).distinct()
    visited = (seeds.select(F.col(seed_col).alias("seed")).distinct()
               .select("seed", F.col("seed").alias("node"),
                       F.lit(0).cast("long").alias("hops"))
               .localCheckpoint(eager=True))
    frontier = visited.select("seed", "node")
    from pyspark.sql import Observation
    for hop in range(1, k + 1):
        reached = (e.join(frontier, e["a"] == frontier["node"])
                   .select("seed", F.col("b").alias("node")).distinct())
        obs = Observation()
        frontier = (reached.join(visited.select("seed", "node"),
                                 ["seed", "node"], "left_anti")
                    .observe(obs, F.count(F.lit(1)).alias("n"))
                    .localCheckpoint(eager=True))
        if obs.get["n"] == 0:
            break
        visited = (visited.unionByName(
            frontier.withColumn("hops", F.lit(hop).cast("long")))
            .localCheckpoint(eager=True))
    return visited


def harmonic_centrality(edges: DataFrame, seeds: DataFrame, k: int,
                        src: str = "src", dst: str = "dst",
                        seed_col: str = "node",
                        directed: bool = True,
                        ppm: int = 1_000_000) -> DataFrame:
    """Seed-sampled harmonic centrality: per node, sum over seeds s
    (s != node, s reaching node within k hops) of 1/d(s, node) - the
    centrality measure that stays well-defined on disconnected
    graphs (Boldi-Vigna), here estimated from a deterministic seed
    sample as usual at web scale. Integer-exact: each term is
    `ppm div d` (truncating), so `harmonic_ppm` is engine-replayable;
    `n_reached` counts contributing seeds. One map-side-combinable
    aggregation over `multi_source_distances` output."""
    d = multi_source_distances(edges, seeds, k, src=src, dst=dst,
                               seed_col=seed_col, directed=directed)
    return (d.where(F.col("hops") > 0)
            .groupBy("node")
            .agg(F.sum(F.expr(f"{int(ppm)} div hops")).cast("long")
                 .alias("harmonic_ppm"),
                 F.count(F.lit(1)).cast("long").alias("n_reached")))


def negative_triple_samples(triples: DataFrame, n_per: int = 1,
                            n_buckets: int = 64,
                            nodes: Optional[DataFrame] = None,
                            seed: int = 42) -> DataFrame:
    """Deterministic negative sampling for KG-embedding training
    (TransE-family corruption): per positive triple, `n_per` corrupted
    copies with the subject OR object (hash-chosen) replaced by a
    uniform draw from the entity pool - the other half of the
    embedding-prep story next to `random_walks`, and just as
    reproducible (df.sample would give different negatives per run/
    cluster).

    Uniformity WITHOUT a global sort: the entity pool (distinct
    subjects u IRI objects, or a caller `nodes` frame) is ranked
    inside `n_buckets` hash buckets (row_number windows partitioned
    by bucket - never one partition), bucket sizes fold driver-side
    into a CASE chain mapping a draw r in [0, N) to (bucket, offset)
    through the cumulative sizes - a pure projection - and the
    replacement arrives by ONE equi-join on (bucket, rank). Draw
    r = md5_hash60(seed|s|p|o|i|'r') % N; corrupted side =
    md5_hash60(...|'side') % 2. Degenerate draws (replacement equals
    the value it replaces) are FILTERED (a 'negative' equal to the
    positive is a false label), so expect slightly fewer than
    n_per * |triples| rows - deterministic, and the SQL oracle
    replays the same filter.

    Output: (subj, pred, obj, sample_ix, corrupted) where `corrupted`
    is 's' or 'o' and the named side already carries the replacement.
    """
    from .dedup import md5_hash60

    assert n_per >= 1 and n_buckets >= 1
    spark = triples.sparkSession
    if nodes is None:
        pool = triples.select(F.col("subj").alias("node"))
        if "obj_kind" in triples.columns:
            pool = pool.unionByName(
                triples.where(F.col("obj_kind") == "iri")
                .select(F.col("obj").alias("node")))
        else:
            pool = pool.unionByName(
                triples.select(F.col("obj").alias("node")))
    else:
        pool = nodes.select(F.col(nodes.columns[0]).alias("node"))
    pool = pool.distinct()
    from pyspark.sql.window import Window
    bucket = F.pmod(md5_hash60(F.col("node")), F.lit(int(n_buckets)))
    ranked = (pool.withColumn("bucket", bucket.cast("long"))
              .withColumn("rank", F.row_number().over(
                  Window.partitionBy("bucket").orderBy("node"))
                  .cast("long") - 1)
              .localCheckpoint(eager=True))
    sizes = {r.bucket: r.c for r in
             ranked.groupBy("bucket")
             .agg(F.count(F.lit(1)).alias("c")).collect()}
    n_total = sum(sizes.values())
    assert n_total >= 2, "entity pool too small to corrupt against"
    cum, acc = [], 0
    for b in sorted(sizes):
        cum.append((b, acc))
        acc += sizes[b]

    # RDF SET semantics: a provenance-duplicated positive is one fact
    # (duplicates would mint byte-identical negatives - same hash key)
    fact = triples.select("subj", "pred", "obj").distinct().select(
        "subj", "pred", "obj",
        F.explode(F.array(*[F.lit(i).cast("long")
                            for i in range(n_per)])).alias("sample_ix"))
    key = F.concat_ws("|", F.lit(seed), F.col("subj"), F.col("pred"),
                      F.col("obj"), F.col("sample_ix"))
    r = F.pmod(md5_hash60(F.concat(key, F.lit("|r"))),
               F.lit(n_total)).cast("long")
    side = F.pmod(md5_hash60(F.concat(key, F.lit("|side"))), F.lit(2))
    # cumulative-size CASE: draw -> (bucket, offset). Round-6
    # optimization: the draw `_r` is projected ONCE and the mapping is
    # a single FLAT CaseWhen (one branch per bucket, conditions in
    # ascending cumulative order, first match wins) - the previous
    # nested when/otherwise loop built a CASE tree 64 levels deep with
    # the md5 draw expression replicated into every level, which blew
    # up optimizer/codegen time (the query's cost was dominated by the
    # driver compiling the expression, not by data). Semantics are
    # identical: r falls in bucket b iff r < cum_end(b) and r >=
    # cum_end(b-1), exactly the first true ascending condition.
    drawn = fact.select("subj", "pred", "obj", "sample_ix",
                        (side == 0).alias("corrupt_s"),
                        r.alias("_r"))
    bexpr = None
    oexpr = None
    rr = F.col("_r")
    for b, start in cum:
        nxt = start + sizes[b]
        cond = rr < F.lit(nxt)
        if bexpr is None:
            bexpr = F.when(cond, F.lit(b))
            oexpr = F.when(cond, (rr - F.lit(start)).cast("long"))
        else:
            bexpr = bexpr.when(cond, F.lit(b))
            oexpr = oexpr.when(cond, (rr - F.lit(start)).cast("long"))
    drawn = drawn.select("subj", "pred", "obj", "sample_ix", "corrupt_s",
                         bexpr.cast("long").alias("bucket"),
                         oexpr.cast("long").alias("rank"))
    joined = drawn.join(ranked, ["bucket", "rank"])
    out = (joined
           .where(F.when(F.col("corrupt_s"),
                         F.col("node") != F.col("subj"))
                  .otherwise(F.col("node") != F.col("obj")))
           .select(
               F.when(F.col("corrupt_s"), F.col("node"))
               .otherwise(F.col("subj")).alias("subj"),
               "pred",
               F.when(F.col("corrupt_s"), F.col("obj"))
               .otherwise(F.col("node")).alias("obj"),
               "sample_ix",
               F.when(F.col("corrupt_s"), F.lit("s"))
               .otherwise(F.lit("o")).alias("corrupted")))
    return out


def condensation(edges: DataFrame, scc: DataFrame, src: str = "src",
                 dst: str = "dst") -> DataFrame:
    """The condensation DAG: contract every strongly connected
    component (labels from `strongly_connected_components`) to one
    node and keep distinct inter-component edges - (scc_src, scc_dst,
    n_edges). The macro-structure read of a web graph (the bow-tie:
    which rings feed which), and the cycle-free order reasoning/
    propagation passes want. Two hash joins against the label table
    + one map-side-combinable count; self-edges (intra-component)
    drop."""
    lbl_s = scc.select(F.col("node").alias("_u"),
                       F.col("scc").alias("scc_src"))
    lbl_d = scc.select(F.col("node").alias("_v"),
                       F.col("scc").alias("scc_dst"))
    e = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v")) \
        .distinct()
    return (e.join(lbl_s, "_u").join(lbl_d, "_v")
            .where(F.col("scc_src") != F.col("scc_dst"))
            .groupBy("scc_src", "scc_dst")
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges")))


def degree_histogram(edges: DataFrame, src: str = "src",
                     dst: str = "dst") -> DataFrame:
    """Log2-bucketed degree distribution over the undirected simple
    graph: (bucket, n_nodes, min_degree, max_degree) with bucket =
    floor(log2(degree)) - the power-law audit every skew-mitigation
    choice in this repo (salting, census caps, hub broadcasts) is
    calibrated against. Integer-exact: bucket computed by bit length
    (63 - number of leading zeros), not FP log. Two map-side-
    combinable aggregations over bare longs."""
    deg = degree_stats(edges, src=src, dst=dst)
    # floor(log2(d)) = binary-representation length - 1: exact integer
    # arithmetic (FP log2 drifts at powers of two), engine-portable
    # (DuckDB: length(bin(d)) - 1 modulo its 0b prefix handling)
    bucket = (F.length(F.conv(F.col("degree").cast("string"), 10, 2))
              - 1).cast("long")
    return (deg.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                 F.min("degree").cast("long").alias("min_degree"),
                 F.max("degree").cast("long").alias("max_degree")))


def ktruss(edges: DataFrame, k: int = 4, max_rounds: int = 20,
           src: str = "src", dst: str = "dst") -> DataFrame:
    """The k-truss of the undirected simple graph: iteratively drop
    edges whose SUPPORT (triangles containing the edge) is below k-2
    until stable; returns surviving (u, v, support) with u < v and the
    within-truss support. The edge-grained sibling of `kcore` and the
    sharper spam/community-density signal (a k-truss is contained in
    the (k-1)-core but demands actual triangle density, which link
    farms built as stars cannot fake).

    Per round: triangles of the LIVE edge set enumerate once via the
    ordered three-way self-join (a<b<c, each triangle found exactly
    once - triangle_count's shape), explode to their 3 member edges,
    one map-side-combinable count rebuilds supports, and a filter
    peels. Peeling is monotone and idempotent at the fixpoint, so the
    early-stop equals a fixed round count (the kcore argument) - the
    unrolled-SQL oracle just runs all rounds. localCheckpoint bounds
    lineage; the convergence probe is a 1-row count. Self-loops
    dropped, parallel/reversed edges deduplicated."""
    assert k >= 2 and max_rounds >= 1
    e = (edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
         .where(F.col("x") != F.col("y"))
         .select(F.least("x", "y").alias("u"),
                 F.greatest("x", "y").alias("v"))
         .distinct().localCheckpoint(eager=True))
    need = k - 2
    n_edges = e.count()
    sup = None
    for _ in range(max_rounds):
        ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
        bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
        ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
        tri = (ab.join(bc, "b").join(ac, ["a", "c"], "left_semi")
               .select("a", "b", "c"))
        mem = (tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
               .unionByName(tri.select(F.col("b").alias("u"),
                                       F.col("c").alias("v")))
               .unionByName(tri.select(F.col("a").alias("u"),
                                       F.col("c").alias("v"))))
        sup = (e.join(mem.groupBy("u", "v")
                      .agg(F.count(F.lit(1)).cast("long")
                           .alias("support")), ["u", "v"], "left")
               .withColumn("support",
                           F.coalesce("support",
                                      F.lit(0).cast("long"))))
        nxt = (sup.where(F.col("support") >= need)
               .select("u", "v").localCheckpoint(eager=True))
        n_next = nxt.count()
        e = nxt
        if n_next == n_edges:
            break
        n_edges = n_next
    return sup.where(F.col("support") >= need)


def link_prediction_ra(edges: DataFrame, src: str = "src",
                       dst: str = "dst", scale: int = 1_000_000,
                       min_common: int = 1,
                       max_center_degree: int | None = None,
                       top_k: int | None = None) -> DataFrame:
    """Resource-allocation link prediction over the undirected simple
    graph: for node pairs at distance 2 that are NOT already linked,
    score_ppm(a, b) = sum over common neighbors z of
    floor(scale / degree(z)) - Zhou/Lu/Zhang's RA index in exact
    integer arithmetic. The KG-completion candidate generator: the
    highest-scoring absent edges are the missing links extraction
    should have produced (entity pairs sharing many LOW-degree
    neighbors - sharing wikipedia.org is evidence of nothing, and RA's
    1/deg(z) weighting encodes exactly that, unlike the raw
    common-neighbor count `node_similarity` ranks by).

    Algorithm: wedge enumeration exactly like `node_similarity`
    (bidirectional deduplicated edges self-joined on the wedge center),
    but each wedge carries floor(scale / deg(center)) and pairs sum it;
    existing edges are removed with one anti-join (predicted = absent
    only). `max_center_degree` drops over-cap CENTERS before the
    quadratic join (a degree-d center contributes d*(d-1)/2 pairs; at
    hub scale those pairs each score <= scale/d ~ 0, so the cap removes
    the most work for the least signal - the broadcast-inverted hub
    anti-join from `node_similarity`). `top_k` keeps the k best
    predictions per node_a (ties broken by smaller node_b) via a
    rank window that compiles to a partial WindowGroupLimit - the
    per-partition prune runs BEFORE the shuffle.

    Per-row floor division means score_ppm is bit-replayable by the
    SQL oracle (DuckDB `//`), summed in longs - no float drift.
    """
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v"))
           .select(F.greatest("u", "v").alias("hi"),
                   F.least("u", "v").alias("lo"))
           .distinct().localCheckpoint(eager=False))
    bidir = (und.select(F.col("lo").alias("node"), F.col("hi").alias("nbr"))
             .unionByName(und.select(F.col("hi").alias("node"),
                                     F.col("lo").alias("nbr"))))
    deg = bidir.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    centers = bidir
    if max_center_degree is not None:
        hubs = (deg.filter(F.col("degree") > max_center_degree)
                .select(F.col("node").alias("nbr")))
        centers = centers.join(F.broadcast(hubs), "nbr", "left_anti")
    # weight each wedge center once: floor(scale / deg(center))
    cw = (deg.select(F.col("node").alias("c"),
                     F.expr(f"CAST({int(scale)} AS BIGINT) div "
                            "CAST(degree AS BIGINT)").alias("_ra")))
    left = (centers.select(F.col("nbr").alias("c"), F.col("node").alias("a"))
            .join(cw, "c"))
    right = centers.select(F.col("nbr").alias("c"), F.col("node").alias("b"))
    pairs = (left.join(right, "c")
             .filter(F.col("a") < F.col("b"))
             .groupBy("a", "b")
             .agg(F.count(F.lit(1)).alias("common"),
                  F.sum("_ra").alias("score_ppm"))
             .filter(F.col("common") >= min_common))
    # predicted links are ABSENT links: drop pairs already edges
    pairs = pairs.join(
        und.select(F.col("lo").alias("a"), F.col("hi").alias("b")),
        ["a", "b"], "left_anti")
    out = pairs.select(F.col("a").alias("node_a"),
                       F.col("b").alias("node_b"),
                       "common", "score_ppm")
    if top_k is not None:
        from pyspark.sql.window import Window
        w = (Window.partitionBy("node_a")
             .orderBy(F.col("score_ppm").desc(), F.col("node_b").asc()))
        out = (out.withColumn("_rk", F.row_number().over(w))
               .filter(F.col("_rk") <= int(top_k)).drop("_rk"))
    return out


def modularity(edges: DataFrame, labels: DataFrame,
               src: str = "src", dst: str = "dst",
               node: str = "node", community: str = "community"
               ) -> DataFrame:
    """Newman modularity of a community assignment over the undirected
    simple graph, in EXACT rational arithmetic: per community c,
    Q_c = e_c/m - (d_c/(2m))^2 where m = total edges, e_c =
    intra-community edges, d_c = summed member degrees. Emitted as the
    integer numerator q_num_4m2 = 4*m*e_c - d_c^2 over the common
    denominator 4*m^2 (decimal(38,0) - no float drift, so the SQL
    oracle replays bit-for-bit; Q = sum(q_num_4m2) / (4*m^2), and
    q_float rides alongside for human reading OUTSIDE any hash gate).

    The community-quality audit for `label_propagation` output: LPA
    converges to SOME labeling; modularity says whether it found
    structure (Q near 0 = no better than random given the degree
    sequence) - the acceptance gate before community labels feed
    curation or dedup blocking.

    Scale shape: one label join per edge endpoint (labels are
    data-dependent in size - no broadcast hint, round-4 verdict; over
    a node-bucketed label store the joins co-partition), one
    map-side-combinable intra-edge count per community, one degree
    aggregate per community, and a 2-row-per-community merge. Nodes
    absent from `labels` are excluded from every community (their
    edges still count toward m and toward labeled members' degrees,
    so partial labelings stay honest); `labels` is one row per node
    (LPA output shape).

    Self-loops dropped, parallel/reversed edges deduplicated (same
    normalization as every undirected op here); isolated labeled nodes
    contribute d_c = 0.
    """
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v"))
           .select(F.greatest("u", "v").alias("hi"),
                   F.least("u", "v").alias("lo"))
           .distinct().localCheckpoint(eager=False))
    # round-6 (r5 ADVICE): the one-row-per-node contract was documented
    # but not enforced - provenance-duplicated (node, community) rows
    # silently double-counted degree_sum and n_nodes. Deduplicate the
    # projection (same normalization discipline as the edge set); a
    # node labeled with CONFLICTING communities remains the caller's
    # contract violation, but exact duplicates are now harmless.
    lab = labels.select(F.col(node).alias("_n"),
                        F.col(community).alias("_c")).distinct()
    lab_lo = lab.select(F.col("_n").alias("lo"), F.col("_c").alias("c_lo"))
    lab_hi = lab.select(F.col("_n").alias("hi"), F.col("_c").alias("c_hi"))
    labeled = und.join(lab_lo, "lo", "left").join(lab_hi, "hi", "left")
    intra = (labeled.filter(F.col("c_lo").eqNullSafe(F.col("c_hi")))
             .groupBy(F.col("c_lo").alias("community"))
             .agg(F.count(F.lit(1)).alias("intra_edges")))
    bidir = (und.select(F.col("lo").alias("node"), F.col("hi").alias("nbr"))
             .unionByName(und.select(F.col("hi").alias("node"),
                                     F.col("lo").alias("nbr"))))
    deg = bidir.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    dsum = (lab.join(deg, lab["_n"] == deg["node"], "left")
            .groupBy(F.col("_c").alias("community"))
            .agg(F.sum(F.coalesce(F.col("degree"),
                                  F.lit(0).cast("long")))
                 .alias("degree_sum"),
                 F.count(F.lit(1)).alias("n_nodes")))
    m = und.count()  # driver-side 1-row scalar, like every CC probe
    if m == 0:
        raise ValueError("modularity is undefined on an empty graph (m=0)")
    merged = (dsum.join(intra, "community", "left")
              .withColumn("intra_edges",
                          F.coalesce("intra_edges", F.lit(0).cast("long"))))
    big = "CAST({} AS DECIMAL(38,0))"
    return (merged.select(
        "community", "n_nodes", "intra_edges", "degree_sum",
        F.expr(f"{big.format(4 * m)} * {big.format('intra_edges')} - "
               f"{big.format('degree_sum')} * {big.format('degree_sum')}"
               ).alias("q_num_4m2"),
        F.lit(4 * m * m).cast("decimal(38,0)").alias("q_den_4m2"))
        .withColumn("q_float",
                    F.col("q_num_4m2").cast("double") /
                    F.col("q_den_4m2").cast("double")))


def assortativity(edges: DataFrame, src: str = "src",
                  dst: str = "dst") -> DataFrame:
    """Degree assortativity of the undirected simple graph in EXACT
    integer arithmetic: Newman's r is the Pearson correlation of the
    degrees at the two ends of an edge. Over the 2m directed
    (both-ways) edge incidences with end degrees (j, k), the symmetric
    sums S_j = sum j, S_jk = sum j*k, S_jj = sum j^2 give

        r = (2m * S_jk - S_j^2) / (2m * S_jj - S_j^2)

    emitted as integer r_num / r_den in decimal(38,0) (no float drift;
    the oracle replays bit-for-bit) with r_float alongside for humans.

    The structural audit of an extracted web KG: strongly negative r
    is the hub-and-spoke signature (every entity linked to
    wikipedia.org and nothing else - extraction found pages, not
    structure); r near 0 with real triangle counts is organic link
    structure. Together with `modularity` and `degree_histogram` it is
    the acceptance panel a 10^12-page graph build reports per
    partition manifest.

    Scale shape: dedup to undirected edges, one degree aggregate, two
    hash joins to attach end degrees (degree table is data-dependent -
    no broadcast hint; over a node-bucketed store they co-partition),
    then ONE map-side-combinable global sum - a single row leaves the
    executors. Degenerate denominators (all degrees equal, e.g. a pure
    cycle) emit r_num = r_den = 0; consumers treat that as undefined.
    """
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v"))
           .select(F.greatest("u", "v").alias("hi"),
                   F.least("u", "v").alias("lo"))
           .distinct().localCheckpoint(eager=False))
    bidir = (und.select(F.col("lo").alias("node"), F.col("hi").alias("nbr"))
             .unionByName(und.select(F.col("hi").alias("node"),
                                     F.col("lo").alias("nbr"))))
    deg = bidir.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    dj = deg.select(F.col("node").alias("node"), F.col("degree").alias("j"))
    dk = deg.select(F.col("node").alias("nbr"), F.col("degree").alias("k"))
    inc = bidir.join(dj, "node").join(dk, "nbr")
    big = "CAST({} AS DECIMAL(38,0))"
    sums = inc.agg(
        F.count(F.lit(1)).alias("m2"),
        F.sum(F.expr(big.format("j"))).alias("s_j"),
        F.sum(F.expr(f"{big.format('j')} * {big.format('k')}"))
        .alias("s_jk"),
        F.sum(F.expr(f"{big.format('j')} * {big.format('j')}"))
        .alias("s_jj"))
    return (sums.select(
        (F.col("m2") / 2).cast("long").alias("m"),
        F.col("s_j").cast("decimal(38,0)").alias("s_j"),
        F.col("s_jk").cast("decimal(38,0)").alias("s_jk"),
        F.col("s_jj").cast("decimal(38,0)").alias("s_jj"),
        (F.expr(big.format("m2")) * F.col("s_jk")
         - F.col("s_j") * F.col("s_j")).cast("decimal(38,0)")
        .alias("r_num"),
        (F.expr(big.format("m2")) * F.col("s_jj")
         - F.col("s_j") * F.col("s_j")).cast("decimal(38,0)")
        .alias("r_den"))
        .withColumn("r_float",
                    F.when(F.col("r_den") == 0, F.lit(None).cast("double"))
                    .otherwise(F.col("r_num").cast("double") /
                               F.col("r_den").cast("double"))))


def neighborhood_function(edges: DataFrame, k: int, p: int = 8,
                          directed: bool = False,
                          src: str = "src", dst: str = "dst") -> DataFrame:
    """HyperANF (Boldi, Rosa & Vigna 2011): the neighborhood function
    - per node, how many nodes lie within t hops, for t = 0..k -
    estimated by giving every node a deterministic HyperLogLog sketch
    of its ball and iterating BALL(t, v) = BALL(t-1, v) merged with
    BALL(t-1, u) for every out-neighbor u. Register max-merge IS set
    union on sketches (hll_merge == sketch-of-union, exactly), so by
    induction round t's registers equal `hll_sketch` of the EXACT
    t-hop ball membership - the property the unit test pins. From the
    per-node estimates: effective diameter (the t where the average
    ball stops growing), reachable-set mass, and the
    distance-distribution audit of an extracted web graph - all
    without an all-pairs BFS, the ONLY known way to get distance
    structure out of a 10^12-edge graph (HyperANF measured Facebook's
    four degrees of separation).

    Per round: ONE hash join of the (node, reg_ix, rho) register table
    against the edge list (register rows per node <= min(ball, 2^p),
    so the join output is <= |E| * 2^p rows worst case, map-side max
    absorbs them before the shuffle) + ONE max groupBy;
    localCheckpoint truncates lineage between rounds. A high-OUT-
    degree hub replicates its registers once per out-edge - inherent
    to the algorithm; cap p (fixed 2^p rows per node) rather than the
    graph. Registers and the exact-integer estimate columns are
    SQL-replayable end-to-end (shared md5 base hash); only the float
    harmonic-mean estimate rides outside the hash gate.

    Returns (node, t, n_regs_set, n_zero_regs, inv_sum_scaled,
    distinct_est) for t = 0..k; t = 0 is the singleton ball.
    `directed=True` follows out-edges only (BALL = forward-reachable
    set); default treats edges as undirected.
    """
    from csvweb_spark.operators.sketches import hll_estimate, hll_sketch
    if k < 0:
        raise ValueError("k must be >= 0")
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s") != F.col("d"))
         .distinct())
    if not directed:
        e = (e.unionByName(e.select(F.col("d").alias("s"),
                                    F.col("s").alias("d")))
             .distinct())
    # the register-table join re-reads the edge list every round: pin
    # it once (round 6; _pin - the distinct/union otherwise re-shuffles
    # per round)
    e = _pin(e)
    nodes = (e.select(F.col("s").alias("node"))
             .unionByName(e.select(F.col("d").alias("node")))
             .distinct())
    regs = hll_sketch(nodes, "node", ["node"], p) \
        .localCheckpoint(eager=True)
    out = hll_estimate(regs, ["node"], p) \
        .withColumn("t", F.lit(0).cast("int"))
    nb_edges = e.select(F.col("s").alias("node"), F.col("d").alias("_u"))
    for t in range(1, k + 1):
        nb = regs.select(F.col("node").alias("_u"), "reg_ix", "rho")
        contrib = (nb_edges.join(nb, "_u")
                   .select("node", "reg_ix", "rho"))
        regs = (regs.unionByName(contrib)
                .groupBy("node", "reg_ix")
                .agg(F.max("rho").alias("rho"))
                .localCheckpoint(eager=True))
        out = out.unionByName(
            hll_estimate(regs, ["node"], p)
            .withColumn("t", F.lit(t).cast("int")))
    e.unpersist()
    return out.select("node", "t", "n_regs_set", "n_zero_regs",
                      "inv_sum_scaled", "distinct_est")


def _reach_fixpoint(pairs: DataFrame, seeds: DataFrame,
                    max_rounds: int) -> DataFrame:
    """All nodes reachable from `seeds` (inclusive) over the directed
    (a, b) pair frame - frontier BFS to the fixpoint, localCheckpoint
    per round, raises if `max_rounds` passes without converging
    (silently truncated reachability would misclassify bow-tie
    regions)."""
    from pyspark.sql import Observation
    visited = seeds.select("node").distinct().localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_rounds):
        reached = (pairs.join(frontier, pairs["a"] == frontier["node"])
                   .select(F.col("b").alias("node")).distinct())
        obs = Observation()
        frontier = (reached.join(visited, "node", "left_anti")
                    .observe(obs, F.count(F.lit(1)).alias("n"))
                    .localCheckpoint(eager=True))
        if obs.get["n"] == 0:
            return visited
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    raise ValueError(
        f"reachability did not converge in {max_rounds} rounds; "
        "raise max_rounds (depth exceeds it)")


def bowtie_decomposition(edges: DataFrame, scc_labels: DataFrame,
                         src: str = "src", dst: str = "dst",
                         node_col: str = "node", scc_col: str = "scc",
                         max_rounds: int = 64) -> DataFrame:
    """Broder bow-tie decomposition (Broder et al. 2000, 'Graph
    structure in the Web') of the directed graph around its giant
    SCC: every node classified as

      core          - member of the largest SCC (ties: smallest scc id)
      in            - reaches the core, not in it
      out           - reachable from the core, not in it
      tube          - on an IN -> OUT path that bypasses the core
      tendril       - in the core's weak component but none of the above
      disconnected  - outside the core's weak component

    THE macro-structure report of a crawled web graph: the IN/OUT/core
    mass ratios say whether the crawl found the web's navigational
    heart or got stuck in a tendril, and a bloated DISCONNECTED class
    is the frontier-starvation signature. Takes `scc_labels`
    ((node, scc) from `strongly_connected_components`) as input like
    `modularity` takes LPA labels - SCC is its own operator and the
    composition stays auditable.

    Five frontier-BFS fixpoints (forward/backward from the core,
    forward from IN, backward from OUT, undirected from the core for
    the weak component), each a per-round hash join + distinct on slim
    node sets with localCheckpoint lineage cuts; the classification is
    a CASE over six left-joined membership flags. The giant-SCC
    election is one driver-side 1-row take (the CC-probe precedent).
    Rounds are bounded by graph DEPTH from a seed SET (the whole core
    seeds at once), not by cycle length.
    """
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct().localCheckpoint(eager=True))
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    und = e.unionByName(rev)
    nodes = (e.select(F.col("a").alias("node"))
             .unionByName(e.select(F.col("b").alias("node")))
             .distinct())
    lab = scc_labels.select(F.col(node_col).alias("node"),
                            F.col(scc_col).alias("_scc"))
    giant_row = (lab.groupBy("_scc").agg(F.count(F.lit(1)).alias("_n"))
                 .orderBy(F.col("_n").desc(), F.col("_scc").asc())
                 .take(1))
    if not giant_row:
        raise ValueError("scc_labels is empty")
    giant = giant_row[0]["_scc"]
    core = lab.filter(F.col("_scc") == F.lit(giant)).select("node") \
        .localCheckpoint(eager=True)
    # Round-6 optimization (guide SS2.6 - overlap independent jobs): the
    # forward, backward and weak-component fixpoints depend only on
    # `core`, and the IN->fwd / OUT->bwd walks only on each other's
    # first-stage results - each fixpoint is a chain of small
    # driver-synchronous jobs that leaves most cores idle, so running
    # the independent ones from a small thread pool lets their rounds
    # back-fill each other's task tails (FIFO scheduling; job
    # descriptions and groups are thread-local). Results are identical:
    # the same five fixpoints over the same frames.
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=3) as pool:
        f_fwd = pool.submit(_reach_fixpoint, e, core, max_rounds)
        f_bwd = pool.submit(_reach_fixpoint, rev, core, max_rounds)
        f_wcc = pool.submit(_reach_fixpoint, und, core, max_rounds)
        fwd, bwd, wcc = f_fwd.result(), f_bwd.result(), f_wcc.result()
    out_set = fwd.join(core, "node", "left_anti") \
        .localCheckpoint(eager=True)
    in_set = bwd.join(core, "node", "left_anti") \
        .localCheckpoint(eager=True)
    cio = core.unionByName(in_set).unionByName(out_set)
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_fi = pool.submit(
            lambda: (_reach_fixpoint(e, in_set, max_rounds)
                     .join(cio, "node", "left_anti")) if in_set.take(1)
            else in_set)
        f_to = pool.submit(
            lambda: (_reach_fixpoint(rev, out_set, max_rounds)
                     .join(cio, "node", "left_anti")) if out_set.take(1)
            else out_set)
        from_in, to_out = f_fi.result(), f_to.result()
    tube = from_in.join(to_out, "node", "left_semi")

    def flag(s, name):
        return s.select("node").withColumn(name, F.lit(True))

    cls = (nodes
           .join(flag(core, "_core"), "node", "left")
           .join(flag(in_set, "_in"), "node", "left")
           .join(flag(out_set, "_out"), "node", "left")
           .join(flag(tube, "_tube"), "node", "left")
           .join(flag(wcc, "_wcc"), "node", "left")
           .select("node",
                   F.when(F.col("_core"), F.lit("core"))
                   .when(F.col("_in"), F.lit("in"))
                   .when(F.col("_out"), F.lit("out"))
                   .when(F.col("_tube"), F.lit("tube"))
                   .when(F.col("_wcc"), F.lit("tendril"))
                   .otherwise(F.lit("disconnected")).alias("cls")))
    return cls
