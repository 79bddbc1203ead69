"""Entity canonicalization: connected components over sameAs edges
(BASELINE.json north_star stage D).

Pure-DataFrame implementation of the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 - the same algorithm GraphFrames uses), which converges in
O(log n) rounds even on long chains, vs O(diameter) for naive label
propagation.

Scale/skew design (north_star mandate - hub entities must not hot-spot):
* the min-neighbor aggregation is a SALTED two-phase min (partial min per
  (node, salt) with map-side combine, then a skew-free merge over
  <= n_salts rows per node) - a hub with 10^8 edges contributes at most
  n_salts x n_partitions rows to any shuffle;
* the join back to the edge list is keyed by (node, salt) against the
  salt-replicated min map, so hub edges spread over n_salts reduce tasks
  instead of one; AQE skew-join splitting remains enabled as a second
  line of defense;
* per-round `localCheckpoint` truncates the exponentially-growing lineage.

API: long node ids (use `edges_from_uris` to hash string entity URIs).
Output: (node, component) with component = min node id of the component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edges_from_uris(df: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Map string endpoints to stable 64-bit ids (xxhash64). Collisions at
    10^12 nodes: P ~ 2.7e-5 over the whole corpus (birthday bound) -
    acceptable for dedup canonicalization; use dual-hash verification when
    not."""
    return df.select(F.xxhash64(src).alias("src"), F.xxhash64(dst).alias("dst"))


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set in canonical (big, small) orientation, no self
    loops, deduplicated."""
    return (edges
            .select(F.greatest("src", "dst").alias("u"),
                    F.least("src", "dst").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


N_SALTS = 16


def choose_n_salts(edges: DataFrame, src: str = "src", dst: str = "dst",
                   target_bucket: int = 65_536,
                   max_salts: int = 256) -> int:
    """Skew-adaptive salt count from the graph's ACTUAL hub profile
    (round-3 VERDICT item: N_SALTS was static; the degree_stats shape in
    operators/graph.py tells us the hubs).

    Max degree via one map-side-combinable aggregation: a hub key
    pre-aggregates to one row per map partition before the (tiny) count
    shuffle, so measuring the skew is itself skew-safe. Then
    n_salts = clamp(ceil(max_degree / target_bucket), 1, max_salts):
    a uniform graph pays ZERO salting overhead (n_salts=1 - no replicated
    min map, no extra rows), while a 10^8-degree wikipedia.org-style hub
    gets its edges spread so no (key, salt) group exceeds ~target_bucket
    rows. One small driver-side job per call. NB the choice is only valid
    for the graph it measured: star rounds CONTRACT components, growing a
    root's degree toward the component size even when the input had no
    hubs (review fix) - connected_components therefore re-measures every
    round in adaptive mode rather than trusting the input profile."""
    deg = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .filter(F.col("a") != F.col("b")))
    bidir = deg.unionByName(deg.select(F.col("b").alias("a"),
                                       F.col("a").alias("b")))
    row = (bidir.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
           .agg(F.max("d").alias("m")).collect())
    max_deg = int(row[0]["m"] or 0) if row else 0
    return max(1, min(max_salts, -(-max_deg // target_bucket)))


def _salted_min(edges: DataFrame, key: str, val: str,
                n_salts: int = N_SALTS) -> tuple[DataFrame, DataFrame]:
    """Hub-safe per-key min: (salted edges with `_salt`, per-key mins).

    Two-phase shape (round-1 used Window.partitionBy(key).min, which ships
    EVERY edge of a hub node to one task):
      1. partial min per (key, salt) -- map-side combine, so a 10^8-degree
         hub contributes at most n_salts x n_input_partitions rows to the
         shuffle;
      2. global min over <= n_salts rows per key -- skew-free by
         construction.
    The salt is derived from the value endpoint, so a hub's edges spread
    uniformly over n_salts reduce tasks. Callers that need the min joined
    back to the edges join on (key, _salt) against the salt-replicated min
    map (see _large_star) -- the heavy exchange is then keyed by
    (key, salt), never by key alone.

    The explicit repartition makes the ONE full-data exchange shared by
    both consumers (the per-(key,salt) aggregate needs no further exchange
    because its grouping keys equal the partitioning; the join-back reuses
    the same partitioning): total exchanges per star round equal the
    unsalted window formulation, with the hub spread on top."""
    salted = edges.withColumn("_salt", F.pmod(F.xxhash64(val), F.lit(n_salts)))
    salted = salted.repartition(key, "_salt")
    partial = salted.groupBy(key, "_salt").agg(F.min(val).alias("_pm"))
    mins = partial.groupBy(key).agg(F.min("_pm").alias("_m"))
    return salted, mins


def _replicate_per_salt(mins: DataFrame, n_salts: int = N_SALTS) -> DataFrame:
    return mins.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))


def _large_star(edges: DataFrame, n_salts: int = N_SALTS) -> DataFrame:
    """large-star: every neighbor larger than u points to u's min neighbor
    (including u itself). Salted two-phase min + (key, salt)-keyed join
    back, so hub nodes never concentrate in a single task."""
    bidir = (edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
             .unionByName(edges.select(F.col("v").alias("a"),
                                       F.col("u").alias("b"))))
    if n_salts <= 1:
        # round-6 fast path: on a salt-free round (hub-free graph, the
        # adaptive default's common case) skip the salt machinery - a
        # plain map-side-combinable min + one key join, two fewer
        # exchanges per star round. Identical result: salting only
        # changes physical distribution, never the per-key min.
        mins = (bidir.groupBy("a").agg(F.min("b").alias("_m"))
                .select("a", F.least("_m", F.col("a")).alias("m")))
        joined = bidir.filter(F.col("b") > F.col("a")).join(mins, "a")
        return (joined
                .select(F.col("b").alias("u"), F.col("m").alias("v"))
                .distinct())
    salted, mins = _salted_min(bidir, "a", "b", n_salts)
    mins = mins.select("a", F.least("_m", F.col("a")).alias("m"))
    # only b > a rows survive large-star, so filter BEFORE the join-back:
    # the min still aggregates over the full salted set (above), but the
    # join probes half the rows per round (review fix); the filter sits
    # downstream of the shared exchange, so the exchange reuse holds
    joined = (salted.filter(F.col("b") > F.col("a"))
              .join(_replicate_per_salt(mins, n_salts), ["a", "_salt"]))
    return (joined
            .select(F.col("b").alias("u"), F.col("m").alias("v"))
            .distinct())


def _small_star(edges: DataFrame, n_salts: int = N_SALTS) -> DataFrame:
    """small-star: for each node u (over edges oriented big->small), connect
    all of its smaller neighbors and u itself to the minimum neighbor.
    Same salted two-phase min as _large_star; the u->min self edge comes
    straight from the (tiny) per-key min map, no join needed."""
    if n_salts <= 1:
        # round-6 fast path (see _large_star): plain min + key join on
        # salt-free rounds
        mins = edges.groupBy("u").agg(F.min("v").alias("_m"))
        joined = edges.join(mins, "u")
        to_min = joined.select(F.col("v").alias("s"),
                               F.col("_m").alias("d"))
        self_edge = mins.select(F.col("u").alias("s"),
                                F.col("_m").alias("d"))
        return (to_min.unionByName(self_edge)
                .filter(F.col("s") != F.col("d"))
                .select(F.greatest("s", "d").alias("u"),
                        F.least("s", "d").alias("v"))
                .distinct())
    salted, mins = _salted_min(edges, "u", "v", n_salts)
    joined = salted.join(_replicate_per_salt(mins, n_salts), ["u", "_salt"])
    to_min = joined.select(F.col("v").alias("s"), F.col("_m").alias("d"))
    self_edge = mins.select(F.col("u").alias("s"), F.col("_m").alias("d"))
    return (to_min.unionByName(self_edge)
            .filter(F.col("s") != F.col("d"))
            .select(F.greatest("s", "d").alias("u"),
                    F.least("s", "d").alias("v"))
            .distinct())


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 30,
                         n_salts: int | None = None) -> DataFrame:
    """-> (node, component) for every node appearing in `edges`;
    component = min node id reachable.

    `n_salts=None` (the default since round 6) picks the salt count
    adaptively: re-measured from the CURRENT edge set's max degree at
    the start of every round (choose_n_salts on the checkpointed frame -
    one cheap map-side-combinable agg per round, the same order as the
    convergence signature the loop already pays), because star rounds
    contract components and grow root degrees toward the component size
    - an input-only measurement would under-salt late rounds of a
    hub-free mesh (review fix). Round-6 measurement: the old static
    N_SALTS=16 default replicated the per-key min map 16x into every
    round's join-back even on hub-free graphs (~7.7M extra build rows
    per round on the bench sameAs graph at sf1.0) - salting is pure
    overhead until a hub actually appears, and the adaptive probe costs
    one small cached-frame aggregate per round. Pass an explicit int to
    pin the salt count (the salt count never changes the result)."""
    nodes = (edges.select(F.col(src).alias("node"))
             .unionByName(edges.select(F.col(dst).alias("node")))
             .distinct())
    adaptive = n_salts is None
    e = _canonical(edges.select(F.col(src).alias("src"),
                                F.col(dst).alias("dst")))
    e = e.localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_iter):
        if adaptive:
            n_salts = choose_n_salts(e, "u", "v")
        # round-6 optimization: the convergence signature rides as an
        # observed metric on the checkpoint job itself (metrics fire
        # when the eager localCheckpoint materializes the round), so
        # each round costs ONE job instead of checkpoint + a second
        # signature aggregate. Identical signature: same count + the
        # same order-independent hash sum over the round's edge set.
        from pyspark.sql import Observation
        obs = Observation()
        e = _small_star(_large_star(e, n_salts), n_salts).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.hash("u", "v").cast("long")),
                       F.lit(0)).alias("h"))
        e = e.localCheckpoint(eager=True)
        m = obs.get
        sig = (m["n"], m["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged: every edge is (member, root); roots map to themselves
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (nodes.join(labels, "node", "left")
            .select("node",
                    F.coalesce("component", "node").alias("component")))


def salt_edges(edges: DataFrame, n_salts: int = 16) -> DataFrame:
    """Explicit skew mitigation for pre-AQE clusters: replicate hub-side
    aggregation keys with a salt, aggregate per (key, salt), then merge -
    two-phase min. Exposed for pipelines that aggregate per component after
    canonicalization (component sizes are power-law)."""
    return edges.withColumn("_salt", F.pmod(F.hash("src", "dst"), F.lit(n_salts)))


def component_stats(labels: DataFrame) -> DataFrame:
    """Two-phase (salted) component-size aggregation, demonstrating the
    hub-safe reduce shape: pre-aggregate per (component, salt) then merge."""
    salted = labels.withColumn("_salt", F.pmod(F.hash("node"), F.lit(64)))
    partial = salted.groupBy("component", "_salt").agg(
        F.count(F.lit(1)).alias("c"))
    return partial.groupBy("component").agg(F.sum("c").alias("size"))


# Conservative per-row estimate for an (iri/node -> canonical-iri) map row
# when gating a broadcast against spark.sql.autoBroadcastJoinThreshold:
# two URI strings (~60 B each at web scale) + row overhead.
BYTES_PER_MAP_ROW = 128


def _parse_size_bytes(v: str) -> int:
    """Parse Spark size-conf strings ('10485760', '10MB', '1g', '-1')."""
    s = str(v).strip().lower()
    mult = 1
    for suffix, m in (("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20),
                      ("kb", 1 << 10), ("t", 1 << 40), ("g", 1 << 30),
                      ("m", 1 << 20), ("k", 1 << 10), ("b", 1)):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    return int(s) * mult


def resolve_broadcast(canon: DataFrame, broadcast_map) -> bool:
    """Resolve a `bool | "auto"` broadcast policy for a canonical-identity
    map (round-4 VERDICT item #1: an unconditional F.broadcast hint does
    not fall back - it OOMs when a data-dependent sameAs map outgrows
    executor memory at 10^12-triple scale).

    "auto" gates on a cheap driver-side count: the map is broadcast only
    if its estimated size (rows x BYTES_PER_MAP_ROW) fits under
    spark.sql.autoBroadcastJoinThreshold. The count uses limit(cap+1) so
    an over-sized map is never fully scanned just to be rejected. A
    threshold of -1 (broadcast disabled) always resolves to False."""
    if broadcast_map is True or broadcast_map is False:
        return broadcast_map
    if broadcast_map != "auto":
        raise ValueError(
            f"broadcast_map must be True, False or 'auto', got {broadcast_map!r}")
    spark = canon.sparkSession
    thresh = _parse_size_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
    if thresh <= 0:
        return False
    cap_rows = max(1, thresh // BYTES_PER_MAP_ROW)
    return canon.limit(cap_rows + 1).count() <= cap_rows


def canonicalize_triples(triples: DataFrame, labels: DataFrame,
                         uri_for_component=None,
                         broadcast_map: bool | str = "auto") -> DataFrame:
    """Rewrite triple subjects/objects to canonical entity URIs given a
    (node, component) labeling over xxhash64(uri) ids. IRIs not in any
    component pass through.

    The canon map is KB-bounded (linked entities + their aliases), not
    corpus-bounded, so it is usually broadcast and the 10^12-page scan
    never shuffles here. But its size is data-dependent, so the hint is
    POLICY, not hardcoded: `broadcast_map` is True / False / "auto"
    (default; count-gated against spark.sql.autoBroadcastJoinThreshold,
    see `resolve_broadcast`). When it resolves False the rewrite falls
    back to a plain hash/sort-merge join - still correct, and
    zero-exchange on the triple side when the store is bucketed
    (plans/bucketed.write_bucketed)."""
    if "canonical" in labels.columns:
        canon = labels.select("node", "canonical")
    else:
        canon = labels.select(
            F.col("node"),
            (uri_for_component(F.col("component")) if uri_for_component
             else F.concat(F.lit("http://example.org/canon/"),
                           F.col("component").cast("string"))).alias("canonical"))
    hint = (F.broadcast if resolve_broadcast(canon, broadcast_map)
            else (lambda df: df))
    subj_map = hint(canon.select(F.col("node").alias("_n1"),
                                 F.col("canonical").alias("_sc")))
    obj_map = hint(canon.select(F.col("node").alias("_n2"),
                                F.col("canonical").alias("_oc")))
    t = triples.withColumn("_sh", F.xxhash64("subj")) \
               .withColumn("_oh", F.xxhash64("obj"))
    t = (t.join(subj_map, F.col("_sh") == F.col("_n1"), "left").drop("_n1")
          .join(obj_map, F.col("_oh") == F.col("_n2"), "left").drop("_n2"))
    return (t.withColumn("subj", F.coalesce("_sc", "subj"))
             .withColumn("obj", F.when(F.col("obj_kind") == "iri",
                                       F.coalesce("_oc", "obj"))
                                 .otherwise(F.col("obj")))
             .drop("_sh", "_oh", "_sc", "_oc"))


def incremental_components(new_edges: DataFrame, labels: DataFrame,
                           src: str = "src", dst: str = "dst",
                           max_iter: int = 30,
                           n_salts: int | None = N_SALTS) -> DataFrame:
    """Merge a NEW batch of identity edges into a committed (node,
    component) labeling without re-running CC over history - the
    cross-batch canonicalization step for the streaming KG path
    (foreachBatch: commit the returned labels, re-feed them as `labels`
    next batch).

    Contract-and-expand: new-edge endpoints are first CONTRACTED
    through the committed labels (a node already labeled is replaced by
    its component id - which, by the CC convention, is the component's
    min member id), CC runs on the contracted batch graph only - cost
    bounded by the BATCH size, never by history - and the result is
    expanded back over the full membership of every touched committed
    component (if components A and B merge, every member of A u B
    relabels to min(A, B)). Untouched components are not returned;
    union with the committed table minus the touched components to
    materialize the full new state.

    Returns (node, component) for every node in a touched or new
    component. Relabeled OLD components (their id changed by a merge)
    are exactly the rows where a returned node's component differs from
    the committed table - downstream consumers that materialized
    canonical IRIs must reconcile those (the same compensation exact
    incremental dedup needs); `left_anti` the return against `labels`
    to audit them.

    Scale shape: two hash semi-joins against the committed table (node
    -> label pull, component -> membership pull), CC on the contracted
    batch graph (salted, hub-safe), one expansion join. The committed
    table is never scanned iteratively."""
    e = new_edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    touched_nodes = (e.select(F.col("src").alias("node"))
                     .unionByName(e.select(F.col("dst").alias("node")))
                     .distinct())
    old = labels.join(touched_nodes, "node", "left_semi") \
                .select("node", "component")
    # contract: endpoint -> committed component id where one exists
    smap = old.select(F.col("node").alias("src"),
                      F.col("component").alias("_sc"))
    dmap = old.select(F.col("node").alias("dst"),
                      F.col("component").alias("_dc"))
    contracted = (e.join(smap, "src", "left").join(dmap, "dst", "left")
                  .select(F.coalesce("_sc", "src").alias("src"),
                          F.coalesce("_dc", "dst").alias("dst")))
    cc = connected_components(contracted, max_iter=max_iter,
                              n_salts=n_salts) \
        .withColumnRenamed("component", "new_component")
    # expand: every member of a touched committed component follows its
    # old component id's new label; genuinely new nodes are in cc already
    touched_comps = old.select(F.col("component")).distinct()
    members = (labels.join(touched_comps, "component", "left_semi")
               .select("node", F.col("component").alias("_oc")))
    expanded = (members.join(cc.select(F.col("node").alias("_oc"),
                                       "new_component"), "_oc")
                .select("node", F.col("new_component").alias("component")))
    fresh = (cc.join(members.select("node"), "node", "left_anti")
             .select("node", F.col("new_component").alias("component")))
    return expanded.unionByName(fresh)
