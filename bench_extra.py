"""bench_extra.py: targeted per-query benchmark (guide 1.4) - same
inputs, session config and timing methodology as the frozen bench.py,
but runs only the query names given on argv (all when none given).
Headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Timed sections exclude input synthesis (pages are materialized and counted
before the clock starts). The flagship is the CSVW triple-extraction
pipeline over a pages table synthesized from `documents` (one CSV page per
10 docs), reported both as seconds and docs/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def docs_table_spec():
    from csvweb_spark.csvw.model import Column, Datatype, Table
    t = Table(url="http://pages.example.org/docs.csv")
    about = "http://pages.example.org/doc/{doc_id}"
    t.columns = [
        Column(name="doc_id", about_url=about, datatype=Datatype(base="integer")),
        Column(name="lang", about_url=about),
        Column(name="source", about_url=about),
        Column(name="n_chars", about_url=about, datatype=Datatype(base="integer")),
        Column(name="text", about_url=about),
    ]
    return t


def build_session(cpus: int) -> SparkSession:
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("csvweb-spark-bench")
            .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.driver.memory", os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "16g"))
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def run_bench(spark: SparkSession, sf_dir: str, only=None) -> dict:
    from csvweb_spark.csvw.convert import MODE_STANDARD
    from csvweb_spark.operators.dedup import dedup_minhash_lsh
    from csvweb_spark.operators.similarity import ann_topk_bruteforce
    from csvweb_spark.operators.text import quality_features, text_profile
    from csvweb_spark.operators.triples import (
        convert_pages_spark, convert_table_group_spark)
    from csvweb_spark.pipeline import kg_canonical_triples, synth_aliases
    from csvweb_spark.sources.html_tables import (
        extract_html_tables, html_pages_from_table)
    from csvweb_spark.sources.pages import pages_from_documents

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # ---- input synthesis (not timed) ----
    pages = pages_from_documents(spark, sf_dir, docs_per_page=10)
    pages = pages.repartition(spark.sparkContext.defaultParallelism).persist()
    n_pages = pages.count()
    # repartition to the session's parallelism before persisting: the sf0.1
    # parquet files are single-split (<1 MB), which would serialize every
    # narrow stage (signature UDFs, shingling, scoring) on one core - the
    # opposite of the real corpus, where input splits >> cores
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(spark.sparkContext.defaultParallelism).persist())
    n_docs = docs.count()
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .repartition(spark.sparkContext.defaultParallelism).persist())
    emb.count()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    hpages = html_pages_from_table(
        docs, (F.col("doc_id") / 10).cast("long"),
        "http://pages.example.org/h/{key}.html",
        ["doc_id", "lang", "source", "n_chars", "text"], "doc_id").persist()
    hpages.count()

    table = docs_table_spec()

    # warm-up: one FULL untimed pass - a limit() warm-up touches only a
    # few partitions, leaving cold Python-worker forks + Arrow init inside
    # the first timed run on most cores (the same lesson the scaling
    # harness learned; workers are reused afterwards)
    convert_table_group_spark(pages, table, scope_by_url=True).count()
    convert_pages_spark(pages.limit(8).withColumn(
        "metadata_json",
        F.concat(F.lit('{"url": "'), F.col("url"), F.lit('"}')))).count()
    dedup_minhash_lsh(docs.limit(64), threshold=0.9).count()

    def timed(name, fn, retry_under: float = 40.0):
        """min-of-2 for short queries (same methodology as bench.py);
        bench_extra only: skip queries not in the `only` selection."""
        if only is not None and name not in only:
            return None
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        result = fn()
        dt = time.time() - t0
        if dt < retry_under:
            t1 = time.time()
            fn()
            dt = min(dt, time.time() - t1)
        timings[name] = round(dt, 3)
        return result

    # flagship: compiled CSVW extraction (minimal mode)
    n_triples = timed("csvw_extract_compiled", lambda: convert_table_group_spark(
        pages, table, scope_by_url=True).count())
    if "csvw_extract_compiled" in timings:
        extras["docs_per_sec_compiled"] = round(
            n_docs / max(timings["csvw_extract_compiled"], 1e-9), 1)
        extras["triples_compiled"] = n_triples

    # standard mode (4x triple volume: row scaffolding)
    timed("csvw_extract_standard", lambda: convert_table_group_spark(
        pages, table, mode=MODE_STANDARD, scope_by_url=True).count())

    # heterogeneous kernel path on the same pages (per-page metadata)
    kpages = pages.withColumn(
        "metadata_json",
        F.concat(F.lit('{"url": "'), F.col("url"), F.lit('"}')))
    timed("csvw_extract_kernel", lambda: convert_pages_spark(kpages).count())
    if "csvw_extract_kernel" in timings:
        extras["docs_per_sec_kernel"] = round(
            n_docs / max(timings["csvw_extract_kernel"], 1e-9), 1)

    # dedup: MinHash-LSH near-dup over documents (retry_under raised:
    # a host throttling epoch can inflate one ~6 s run past 40 s, and
    # an unretried single sample then reads as a fake 7x regression -
    # measured 45.6 s throttled vs 6.3 s clean on identical code)
    timed("dedup_minhash_lsh", lambda: dedup_minhash_lsh(
        docs, threshold=0.6).count(), retry_under=120.0)

    # dedup: span-level exact-substring (stride-1 = suffix-array guarantee)
    from csvweb_spark.operators.dedup import duplicate_spans
    timed("dedup_spans", lambda: duplicate_spans(
        docs, window=16, stride=1).count())

    # dedup: directed quote containment (word 3-grams, blocked on source)
    from csvweb_spark.operators.dedup import dedup_containment
    # half the corpus: 20 source blocks -> ~312k directed pair compares
    timed("dedup_containment", lambda: dedup_containment(
        docs.filter(F.col("doc_id") % 2 == 0), threshold=0.8).count())

    # similarity: exact top-5 for 32 query vectors
    queries = emb.filter(F.col("vec_id") < 32)
    timed("ann_topk", lambda: ann_topk_bruteforce(emb, queries, k=5).count())

    # similarity: LSH ANN through the round-3 single-scan sketching path
    # (all hash tables from ONE corpus scan)
    from csvweb_spark.operators.similarity import ann_topk_lsh
    timed("ann_topk_lsh", lambda: ann_topk_lsh(
        emb, queries, k=5, dim=64, bits=8, tables=6).count())

    # HTML <table> detection + extraction (north_star tabular-content path)
    timed("html_table_extract", lambda: extract_html_tables(hpages).count())

    # end-to-end KG construction stages A-D (extraction -> conversion ->
    # linking -> connected-components canonicalization)
    timed("kg_pipeline_e2e", lambda: kg_canonical_triples(
        pages, table, synth_aliases(docs))[0].count(), retry_under=120.0)

    # single-typo edit-distance linking: SymSpell delete-1 neighborhood
    # candidates (alias side broadcast) + levenshtein verify, over every
    # part name with one deterministic character deletion
    from csvweb_spark.operators.linking import link_editdist
    part_b = spark.read.parquet(f"{sf_dir}/part.parquet")
    _nm = F.col("p_name")
    _pos = (F.col("p_partkey") % F.length(_nm) + 1).cast("int")
    typo_mentions = part_b.select(
        F.col("p_partkey").cast("long").alias("mention_id"),
        F.concat(F.substr(_nm, F.lit(1), _pos - F.lit(1)),
                 F.substr(_nm, _pos + F.lit(1), F.length(_nm)))
        .alias("mention"))
    timed("link_editdist", lambda: link_editdist(
        typo_mentions, part_b.select(F.col("p_name").alias("alias"))
    ).count())

    # text analysis full pass
    # text_profile switched to the Cavnar-Trenkle n-gram LID in round 5
    # (r4 VERDICT item #8); the marker-model twin keeps the r4 plan
    # measurable so BENCH deltas attribute any text_profile move to the
    # model upgrade vs a plan regression.
    timed("text_profile", lambda: text_profile(docs).count())
    timed("text_profile_marker", lambda: text_profile(
        docs, lid_model="marker").count())
    timed("text_quality", lambda: quality_features(docs).count())

    # corpus curation: C4 line cleaning + full vocabulary statistics
    from csvweb_spark.operators.text import (clean_documents_c4,
                                             token_document_frequencies)
    timed("text_c4_clean", lambda: clean_documents_c4(docs).count())
    timed("token_stats", lambda: token_document_frequencies(docs).count())

    # decontamination: stride-1 doc spans vs 20 broadcast probe texts
    from csvweb_spark.operators.dedup import contamination
    probes = docs.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("probe_id"), "text")
    timed("contamination", lambda: contamination(
        docs, probes, window=16, stride=1).count())

    # dedup: simhash block trick through the round-3 hardened path
    # (bucket census + cap before the self-join)
    from csvweb_spark.operators.dedup import dedup_simhash
    timed("dedup_simhash", lambda: dedup_simhash(
        docs, max_hamming=3, max_bucket_size=256).count())

    # time-series joins over events (growth guard for the asof/interval
    # operators)
    from csvweb_spark.operators.asof import asof_join
    from csvweb_spark.operators.interval import interval_join
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .repartition(spark.sparkContext.defaultParallelism).persist())
    ev.count()
    markers = (ev.filter(F.col("event_id") % 5 == 0)
               .groupBy("user_id", "ts")
               .agg(F.max("event_id").alias("marker_id")))
    timed("events_asof", lambda: asof_join(
        ev.select("event_id", "user_id", "ts"), markers,
        "ts", ["user_id"], ["marker_id"]).count())
    win = ev.filter(F.col("event_id") % 20 == 0).select(
        F.col("event_id").alias("window_id"), "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"))
    timed("events_interval", lambda: interval_join(
        ev, win, "ts", ["user_id"], "start_ts", "end_ts",
        bucket_minutes=60).count())

    # round-3 operator surface (r3 VERDICT item 8: bench the new ops so
    # round-4+ regressions are visible)
    # graph retrieval: 3-hop BFS over a chain + hub-star edge table
    from csvweb_spark.operators.graph import khop_neighbors
    ids = docs.select(F.col("doc_id").alias("n"))
    chains = (ids.filter((F.col("n") % 100) != 99)
              .select(F.col("n").alias("src"), (F.col("n") + 1).alias("dst"))
              .join(ids.select(F.col("n").alias("dst")), "dst", "left_semi"))
    star = (ids.filter((F.col("n") > 0) & (F.col("n") < 2000))
            .select(F.lit(0).cast("long").alias("src"),
                    F.col("n").alias("dst")))
    edges_khop = chains.unionByName(star).persist()
    edges_khop.count()  # synthesis excluded from timing
    seeds = spark.createDataFrame([(0,), (2500,)], "node long")
    timed("kg_khop", lambda: khop_neighbors(edges_khop, seeds, k=3).count())

    # triangle counting over the same persisted edge table (round-4
    # oriented wedge join + closing-edge semi-join; the hub star makes
    # the wedge set genuinely quadratic in hub degree)
    from csvweb_spark.operators.graph import triangle_count
    timed("kg_triangles", lambda: triangle_count(edges_khop).count())

    # integer PageRank + neighborhood Jaccard over the same graph
    # (round 4): the hub star makes both genuinely skew-stressed
    from csvweb_spark.operators.graph import node_similarity, pagerank
    timed("pagerank", lambda: pagerank(edges_khop, iterations=5).count())
    timed("kg_node_sim", lambda: node_similarity(edges_khop).count())

    # RDFS closure at corpus scale (round 4): every doc asserts
    # (doc, ex:from, source); a 4-triple schema drives subPropertyOf
    # inheritance, domain/range typing and the subclass lift, so the
    # broadcast rule joins scan the full instance set
    from csvweb_spark.operators.entail import (
        RDFS_DOMAIN, RDFS_RANGE, RDFS_SUBCLASS, RDFS_SUBPROP, rdfs_closure)
    inst = docs.select(
        F.concat(F.lit("d:"), F.col("doc_id")).alias("subj"),
        F.lit("ex:from").alias("pred"),
        F.concat(F.lit("s:"), F.col("source")).alias("obj"))
    schema = spark.createDataFrame(
        [("ex:from", RDFS_SUBPROP, "ex:origin"),
         ("ex:from", RDFS_DOMAIN, "ex:Doc"),
         ("ex:origin", RDFS_RANGE, "ex:Source"),
         ("ex:Doc", RDFS_SUBCLASS, "ex:Thing")],
        "subj string, pred string, obj string")
    kg_triples = inst.unionByName(schema).persist()
    kg_triples.count()
    timed("rdfs_entail", lambda: rdfs_closure(kg_triples).count())

    # two-pattern BGP join over the corpus-scale triple table (shared
    # ?d variable -> node-id hash join)
    from csvweb_spark.operators.bgp import match_bgp
    langs = docs.select(
        F.concat(F.lit("d:"), F.col("doc_id")).alias("subj"),
        F.lit("ex:lang").alias("pred"), F.col("lang").alias("obj"))
    bgp_t = kg_triples.unionByName(langs)
    timed("bgp_match", lambda: match_bgp(
        bgp_t, [("?d", "ex:from", "?s"), ("?d", "ex:lang", "?l")]).count())

    # owl:sameAs smushing at corpus scale (round 4): 5-member alias
    # chain groups over every doc id (12k components at sf0.1), CC over
    # the ~48k-edge sameAs graph + broadcast rewrite of the 120k-row
    # instance set; wall clock is CC star-round overhead (path length
    # sets the round count, so group size 5 matches the oracle query)
    from csvweb_spark.operators.entail import OWL_SAMEAS, smush_sameas
    sameas = (docs.filter(F.col("doc_id") % 5 != 4)
              .select(F.concat(F.lit("d:"), F.col("doc_id")).alias("subj"),
                      F.lit(OWL_SAMEAS).alias("pred"),
                      F.concat(F.lit("d:"),
                               F.col("doc_id") + 1).alias("obj")))
    smush_in = (kg_triples.unionByName(langs).unionByName(sameas)
                .withColumn("obj_kind",
                            F.when(F.col("pred") == "ex:lang",
                                   F.lit("literal")).otherwise(F.lit("iri"))))
    timed("owl_sameas_smush", lambda: smush_sameas(smush_in).count(),
          retry_under=0.0)

    # weighted shortest paths (round 4): dense seed set (every 10th doc)
    # over the chain+star graph so the frontier loop converges in ~10
    # rounds of broadcast joins - measures per-round cost, not diameter
    from csvweb_spark.operators.graph import shortest_paths
    wedges = edges_khop.withColumn(
        "w", (F.lit(1) + F.pmod(F.col("src"), F.lit(3))).cast("long"))
    sp_seeds = docs.filter(F.col("doc_id") % 10 == 0) \
        .select(F.col("doc_id").alias("node"))
    timed("kg_shortest_paths", lambda: shortest_paths(
        wedges, sp_seeds, weight="w", validate_weights=False,
        broadcast_frontier=False).count(), retry_under=0.0)

    # passage chunking (round 4): 64-token windows every 48 tokens over
    # the full corpus - one narrow JVM pass, fan-out ~n_tokens/48 rows
    from csvweb_spark.operators.text import chunk_documents
    timed("doc_chunks", lambda: chunk_documents(
        docs, window=64, stride=48).count())

    # N-Triples ingest: parse the flagship conversion's own export back
    # (lines persisted untimed; the timed pass is the pure-JVM parse)
    from csvweb_spark.operators.serialize import parse_ntriples, to_ntriples
    nt_lines = to_ntriples(convert_table_group_spark(
        pages, table, scope_by_url=True)).persist()
    nt_lines.count()
    timed("rdf_ntriples_parse", lambda: parse_ntriples(nt_lines).count())
    nt_lines.unpersist()

    # cross-corpus line-level dedup (round 4): every doc shares a
    # planted banner line, winner-per-line groupBy + rebuild
    from csvweb_spark.operators.dedup import dedup_lines_global
    bdocs = docs.select(
        "doc_id", F.concat(F.lit("COOKIE BANNER accept all\n"),
                           F.col("text")).alias("text"))
    timed("dedup_lines", lambda: dedup_lines_global(bdocs).count())

    # KMV distinct-token cardinality sketches per language (round 4)
    from csvweb_spark.operators.sketches import kmv_distinct
    from csvweb_spark.operators.text import whitespace_tokens
    toks = docs.select(
        "lang", F.explode(whitespace_tokens(F.col("text"))).alias("token"))
    timed("kmv_distinct", lambda: kmv_distinct(
        toks, "token", ["lang"], k=256).count())

    # deterministic exact-k stratified draw (WindowGroupLimit prune path)
    from csvweb_spark.operators.sampling import stratified_sample_topk
    timed("sample_stratified", lambda: stratified_sample_topk(
        docs, k=100, stratum_col="source").count())

    # domain curation: per-host profile + at-most-k cap
    from csvweb_spark.operators.urls import cap_per_host, host_profile
    upages = docs.select(
        "doc_id",
        F.concat(F.lit("http://h"), F.col("doc_id") % 997,
                 F.lit(".example.org/p/"), F.col("doc_id")).alias("url"))
    timed("host_curation", lambda: cap_per_host(upages, 3).count()
          + host_profile(upages).count())

    # one-call curation composition (single-pass audit metrics path).
    # The synthetic corpus has no terminal punctuation, which the C4
    # filter would clean to nothing - append a period per line so every
    # stage (clean, PII, exact dedup, LSH) processes the full corpus
    from csvweb_spark.pipeline import curate_documents
    cdocs = docs.withColumn(
        "text", F.concat(F.regexp_replace("text", "\n", ".\n"), F.lit(".")))

    def _curate():
        reg: list = []
        _, m = curate_documents(cdocs, dedup_threshold=0.6,
                                cache_registry=reg)
        for c in reg:
            c.unpersist()
        return m["output"]

    timed("curate_documents", _curate, retry_under=0.0)

    # late round-4 graph/temporal surface: LPA communities and the
    # co-occurrence projection on the same skew-stressed graph (hub
    # degree ~2000 -> the census cap and the label-count combine are
    # what is being measured), plus the struct-max snapshot election
    # over the full docs table keyed per source
    from csvweb_spark.operators.asof import snapshot_asof
    from csvweb_spark.operators.graph import (cooccurrence_projection,
                                              label_propagation)
    timed("kg_communities", lambda: label_propagation(
        edges_khop, rounds=2).count(), retry_under=0.0)
    basket = li.select(F.col("l_partkey").alias("src"),
                       F.col("l_orderkey").alias("dst"))
    timed("kg_cooccurrence", lambda: cooccurrence_projection(
        basket, max_fanout=8).count())
    versioned = docs.select(
        F.concat(F.lit("d:"), F.col("doc_id") % 1000).alias("subj"),
        F.lit("ex:text").alias("pred"),
        F.col("n_chars").alias("obj"),
        F.timestamp_seconds(1700000000 + F.col("doc_id")).alias("ts"))
    timed("kg_snapshot_asof", lambda: snapshot_asof(
        versioned, "2023-11-15 00:00:00", ts_col="ts").count())

    # round-5 web-KG surface: link-graph extraction + host aggregation
    # and embedded-JSON-LD parsing over doc-scale synthesized HTML
    # (synthesis is narrow JVM concat inside the timed plan, identical
    # across rounds). Three anchors per page: cross-host, root-relative
    # (self-host), and a ../ relative needing dot-segment removal.
    from csvweb_spark.sources.jsonld import jsonld_triples
    from csvweb_spark.sources.weblinks import extract_links, host_edges
    lurl = F.concat(F.lit("http://h"), F.col("doc_id") % 997,
                    F.lit(".example.org/d/sub/"), F.col("doc_id"))
    lpages = docs.select(
        lurl.alias("url"),
        F.encode(F.concat(
            F.lit('<html><body><a href="http://h'),
            (F.col("doc_id") + 1) % 997,
            F.lit('.example.org/p">cross <b>host</b></a>\n'),
            F.lit('<a href="/about?utm_source=x&page=1">about us</a>\n'),
            F.lit('<a href="../up/'), F.col("doc_id") % 50,
            F.lit('.html#sec">up link</a></body></html>')),
            "UTF-8").alias("html"))
    timed("web_link_hosts", lambda: host_edges(
        extract_links(lpages)).count())
    jpages = docs.select(
        lurl.alias("url"),
        F.encode(F.concat(
            F.lit('<html><head><script type="application/ld+json">'
                  '{"@context": "https://schema.org",'
                  ' "@id": "http://ex.org/d/'), F.col("doc_id"),
            F.lit('", "@type": "Article", "name": "doc '),
            F.col("doc_id"),
            F.lit('", "wordCount": '), F.col("n_chars"),
            F.lit(', "publisher": {"name": "host '),
            F.col("doc_id") % 997,
            F.lit('"}}</script></head><body>x</body></html>')),
            "UTF-8").alias("html"))
    timed("web_jsonld_triples", lambda: jsonld_triples(jpages).count())
    # microdata markup over the same doc-scale pages: one Product item
    # with text/meta/href/nested-scope value sources per page
    from csvweb_spark.sources.microdata import microdata_triples
    mpages = docs.select(
        lurl.alias("url"),
        F.encode(F.concat(
            F.lit('<html><body><div itemscope '
                  'itemtype="https://schema.org/Product" '
                  'itemid="urn:d:'), F.col("doc_id"),
            F.lit('"><span itemprop="name">doc '), F.col("doc_id"),
            F.lit(' &amp; co</span><meta itemprop="size" content="'),
            F.col("n_chars"),
            F.lit('"><a itemprop="brand" href="/b/'),
            F.col("doc_id") % 97,
            F.lit('">b</a><div itemprop="offers" itemscope '
                  'itemtype="https://schema.org/Offer"><meta '
                  'itemprop="sku" content="'), F.col("doc_id"),
            F.lit('"></div></div></body></html>')),
            "UTF-8").alias("html"))
    timed("web_microdata_triples",
          lambda: microdata_triples(mpages).count())
    # RDFa-Lite markup over the same doc-scale pages: OG head meta +
    # an about-rooted item with text/content/href/lang/chained-
    # resource value sources per page
    from csvweb_spark.sources.rdfa import rdfa_triples
    rpages = docs.select(
        lurl.alias("url"),
        F.encode(F.concat(
            F.lit('<html><body><meta property="og:title" '
                  'content="Doc '), F.col("doc_id"),
            F.lit('"><div vocab="https://schema.org/" about="#d'),
            F.col("doc_id"),
            F.lit('" typeof="Article"><span property="name">doc '),
            F.col("doc_id"),
            F.lit(' &amp; co</span><a property="url" href="/d/'),
            F.col("doc_id") % 97,
            F.lit('">l</a><span property="about" lang="en">topic '),
            F.col("doc_id") % 13,
            F.lit('</span><div property="publisher" typeof="Org" '
                  'resource="http://pub-'), F.col("doc_id") % 31,
            F.lit('.org/"></div></div></body></html>')),
            "UTF-8").alias("html"))
    timed("web_rdfa_triples", lambda: rdfa_triples(rpages).count())
    from csvweb_spark.sources.webtext import extract_page_text
    epages = docs.select(
        lurl.alias("url"),
        F.encode(F.concat(
            F.lit("<html><head><title>t</title></head><body>"
                  "<script>var x=1;</script><h1>doc "),
            F.col("doc_id"),
            F.lit("</h1><p>"),
            F.regexp_replace("text", "\n", "</p><p>"),
            F.lit("</p></body></html>")), "UTF-8").alias("html"))
    timed("web_extract_text", lambda: extract_page_text(epages)
          .select(F.sum(F.length("text"))).collect())

    # WARC ingest: ~200 synthetic segments (one per host bucket) of
    # concatenated response records; segments persist OUTSIDE the
    # timing so the row measures the byte walk + page filter, not the
    # fixture render
    from csvweb_spark.sources.warc import warc_pages
    wrec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\n"
              "WARC-Date: 2026-02-01T00:00:01Z\r\n"
              "WARC-Target-URI: "), lurl,
        F.lit("\r\nContent-Length: "),
        (F.octet_length("text") + 59).cast("string"),
        F.lit("\r\n\r\nHTTP/1.1 200 OK\r\n"
              "Content-Type: text/html; charset=UTF-8\r\n\r\n"),
        F.col("text"), F.lit("\r\n\r\n"))
    wsegs = (docs.groupBy((F.col("doc_id") % 200).alias("segment_id"))
             .agg(F.encode(F.concat_ws("", F.collect_list(wrec)),
                           "UTF-8").alias("blob"))
             .persist())
    extras["warc_segments"] = wsegs.count()  # render excluded
    timed("web_warc_ingest", lambda: warc_pages(wsegs)
          .select(F.sum(F.length("html"))).collect())
    wsegs.unpersist()

    # redirect-chain resolution: doc-scale chain edges (chains of up
    # to 100 via the doc-id lattice) through 4 pointer-doubling joins
    from csvweb_spark.operators.redirects import resolve_redirects
    redges = (docs.filter(F.col("doc_id") % 100 != 0)
              .select(F.concat(F.lit("http://r.org/u/"),
                               F.col("doc_id")).alias("src"),
                      F.concat(F.lit("http://r.org/u/"),
                               (F.col("doc_id") - 1)).alias("dst")))
    timed("web_redirect_resolve", lambda: resolve_redirects(
        redges, max_hops=128).agg(F.sum("hops")).collect(),
        retry_under=0.0)

    # main-content extraction over the prose pages: the jusText-style
    # block classifier at full-crawl cost class (per-page map, JVM)
    from csvweb_spark.sources.webtext import extract_main_content
    timed("web_main_content", lambda: extract_main_content(epages)
          .select(F.sum(F.length("main_text"))).collect())

    # sitemap parse (per-host, cheap side) + doc-scale recrawl join:
    # the timed cost is the key-unique url join vs the crawl state
    from csvweb_spark.sources.sitemaps import (recrawl_candidates,
                                               sitemap_entries)
    sm_bodies = (docs.select(
        (F.col("doc_id") % 997).alias("hid"),
        F.format_string(
            "<url><loc>http://h%d.example.org/d/sub/%d</loc>"
            "<lastmod>2026-01-15</lastmod></url>",
            (F.col("doc_id") % 997).cast("int"), "doc_id").alias("e"))
        .groupBy("hid")
        .agg(F.concat(F.lit("<urlset>"),
                      F.array_join(F.collect_list("e"), ""),
                      F.lit("</urlset>")).alias("body"))
        .select(F.format_string("http://h%d.example.org/sitemap.xml",
                                "hid").alias("url"), "body"))
    sm_pages = docs.filter(F.col("doc_id") % 3 != 0).select(
        lurl.alias("url"),
        F.lit("2026-01-13").cast("timestamp").alias("warc_ts"))
    timed("web_sitemap_recrawl", lambda: recrawl_candidates(
        sitemap_entries(sm_bodies), sm_pages).count())

    # charset sniff+decode over doc-scale binary pages: odd ids are
    # windows-1252 (meta-declared latin1 alias + translate path), even
    # ids utf-8 (validity-gate path) - both decode branches measured
    from csvweb_spark.sources.charset import decode_pages
    cbody = F.concat(F.lit("<html><head>"),
                     F.when(F.col("doc_id") % 2 == 1,
                            F.lit("<meta charset=latin1>"))
                      .otherwise(F.lit('<meta charset="utf-8">')),
                     F.lit("</head><body><p>café doc "),
                     F.col("doc_id"), F.lit("</p></body></html>"))
    cpages = docs.select(
        lurl.alias("url"),
        F.when(F.col("doc_id") % 2 == 1,
               F.encode(cbody, "ISO-8859-1"))
         .otherwise(F.encode(cbody, "UTF-8")).alias("html"))
    timed("web_charset_decode", lambda: decode_pages(cpages)
          .select(F.sum(F.length("html_str"))).collect())

    # robots.txt politeness filter: 997 per-host rule bodies vs the
    # doc-scale page table - measures the page-side join+HOF verdict,
    # which is the 100 TB cost (the rule parse is per-host, ~0)
    from csvweb_spark.sources.robots import filter_allowed
    robots = (spark.range(997).select(
        F.concat(F.lit("h"), F.col("id"), F.lit(".example.org"))
         .alias("host"),
        F.concat(F.lit("User-agent: *\nDisallow: /d/sub\n"
                       "Allow: /d/sub/1\nDisallow: /*.log$\n"))
         .alias("body")))
    timed("web_robots_filter", lambda: filter_allowed(
        lpages.select("url"), robots).count())

    # round-5 text additions: Gopher quality gate (map-only) and the
    # TF-IDF top-k keyword extraction (explode + two aggs + window)
    from csvweb_spark.operators.text import gopher_quality, tfidf_topk
    timed("quality_gopher", lambda: gopher_quality(
        docs, min_words=10).count())
    timed("tfidf_topk", lambda: tfidf_topk(
        docs.select("doc_id", "text"), k=3).count())

    # BM25 retrieval over the inverted index (retrieval.py): index
    # build + 6 corpus-derived queries + per-query top-10, end to end
    from pyspark.sql import Window

    from csvweb_spark.operators.retrieval import (
        bm25_topk_terms, build_inverted_index, document_frequencies)

    def _bm25():
        postings = build_inverted_index(docs.select("doc_id", "text"))
        dft = document_frequencies(postings)
        w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
        qterms = (dft.withColumn("trk", F.row_number().over(w))
                  .filter(F.col("trk") <= 7)
                  .select(F.when(F.col("trk") <= 5, F.col("trk"))
                          .otherwise(F.lit(6)).cast("long")
                          .alias("query_id"), "term"))
        return bm25_topk_terms(postings, qterms, k=10).count()

    timed("bm25_topk", _bm25)

    # deterministic Bloom filter: build over the doc-id key set, probe
    # every lineitem row (duplicates kept - the realistic big-side
    # runtime-filter probe: k chained bitmap joins, no explode/regroup)
    from csvweb_spark.operators.sketches import bloom_build, bloom_probe

    def _bloom():
        bl = bloom_build(docs.select("doc_id"), "doc_id",
                         m_bits=1 << 20, k=4)
        return bloom_probe(li.select("l_orderkey"), bl, "l_orderkey",
                           m_bits=1 << 20, k=4).count()

    timed("bloom_prefilter", _bloom)

    # HyperLogLog registers per returnflag over lineitem part keys
    # (no distinct pre-shuffle; map-side max absorbs duplicates)
    from csvweb_spark.operators.sketches import hll_distinct

    def _hll():
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        vals = li.select("l_returnflag",
                         F.col("l_partkey").cast("string").alias("pk"))
        return hll_distinct(vals, "pk", ["l_returnflag"], p=8).count()

    timed("hll_distinct", _hll)

    # weight-proportional sampling + Heaps-law vocabulary curve +
    # bitemporal as-of/as-at read (all narrow/one-shuffle shapes)
    from csvweb_spark.operators.asof import snapshot_bitemporal
    from csvweb_spark.operators.sampling import sample_weighted_topk
    from csvweb_spark.operators.text import vocab_growth

    timed("sample_weighted", lambda: sample_weighted_topk(
        docs.select("doc_id", "lang", "n_chars"), k=20,
        weight_col="n_chars", stratum_col="lang").count())
    timed("vocab_growth", lambda: vocab_growth(docs).count())

    def _bitemporal():
        ev = (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
              .select("user_id", "event_type",
                      F.floor(F.col("value") * 100).cast("long")
                      .alias("obj"), "ts",
                      F.expr("timestampadd(DAY, CAST(event_id % 3 AS "
                             "INT), ts)").alias("tx_ts")))
        return snapshot_bitemporal(
            ev, "2024-01-20 00:00:00", "2024-01-21 00:00:00",
            ts_col="ts", tx_col="tx_ts",
            key_cols=("user_id", "event_type"), val_cols=("obj",)).count()

    timed("kg_bitemporal", _bitemporal)

    # Count-Min frequency sketch: build 4x512 counters over token
    # frequencies + probe the vocabulary (d chained broadcastable joins)
    from csvweb_spark.operators.sketches import cm_build, cm_estimate
    from csvweb_spark.operators.text import word_frequencies

    def _cm():
        wf = word_frequencies(docs)
        sk = cm_build(wf, "word", d=4, w=512, weight_col="n")
        return cm_estimate(wf, sk, "word", d=4, w=512).count()

    timed("cm_heavy_hitters", _cm)

    # per-source unigram-distribution drift audit (explode + map-side
    # aggs + V-row broadcast dimension + per-group fold)
    from csvweb_spark.operators.text import token_drift
    timed("token_drift", lambda: token_drift(
        docs.select("source", "text"), "source", top_v=256).count())

    # PQ ANN end to end: train 8x16-dim codebooks (one subspace-grouped
    # Lloyd), encode the corpus, ADC-rank 8 queries
    from csvweb_spark.operators.similarity import pq_search_adc, pq_train

    def _pq():
        codes, books = pq_train(emb, m=8, k=16, iterations=1)
        qs = (emb.filter(F.col("vec_id") < 8)
              .select(F.col("vec_id").alias("query_id"), "embedding"))
        return pq_search_adc(qs, codes, books, k=10).count()

    timed("pq_ann", _pq)

    # distributed BPE training: 6 pair-count shuffles over the
    # vocabulary table + narrow merge folds (the tokenizer-training
    # pass of the LLM-data pipeline)
    from csvweb_spark.operators.text import (train_bpe_distributed,
                                             word_frequencies)

    def _bpe():
        merges, syms = train_bpe_distributed(word_frequencies(docs), 6)
        n = syms.count()
        syms.unpersist()
        return n

    timed("bpe_train", _bpe)

    # 10x-edge graph entries (r4 VERDICT item #9): the small chain+star
    # graph above measures per-round scheduling constants for the
    # iterative ops (rounds x ~10 jobs), not throughput - a real 2x
    # per-edge regression would vanish inside the constant. Same
    # generator shape at 10x nodes/edges (chains ~10x, hub star 10x ->
    # hub degree 20k keeps it skew-stressed), so BENCH deltas on these
    # rows track per-edge cost. Small entries stay for continuity.
    ids10 = spark.range(n_docs * 10).select(F.col("id").alias("n"))
    chains10 = (ids10.filter((F.col("n") % 100) != 99)
                .select(F.col("n").alias("src"),
                        (F.col("n") + 1).alias("dst"))
                .filter(F.col("dst") < n_docs * 10))
    star10 = (ids10.filter((F.col("n") > 0) & (F.col("n") < 20000))
              .select(F.lit(0).cast("long").alias("src"),
                      F.col("n").alias("dst")))
    edges10 = (chains10.unionByName(star10)
               .repartition(spark.sparkContext.defaultParallelism)
               .persist())
    extras["edges_10x"] = edges10.count()  # synthesis excluded
    timed("pagerank_10x", lambda: pagerank(
        edges10, iterations=5).count(), retry_under=0.0)
    timed("kg_communities_10x", lambda: label_propagation(
        edges10, rounds=2).count(), retry_under=0.0)
    wedges10 = edges10.withColumn(
        "w", (F.lit(1) + F.pmod(F.col("src"), F.lit(3))).cast("long"))
    sp_seeds10 = ids10.filter(F.col("n") % 10 == 0) \
        .select(F.col("n").alias("node"))
    timed("kg_shortest_paths_10x", lambda: shortest_paths(
        wedges10, sp_seeds10, weight="w", validate_weights=False,
        broadcast_frontier=False).count(), retry_under=0.0)
    from csvweb_spark.operators.graph import hits as _hits10
    timed("kg_hits_10x", lambda: _hits10(
        edges10, iterations=2).count(), retry_under=0.0)
    # RA link prediction with the hub cap engaged (deg-20k hub would
    # contribute C(20k,2) near-zero-score pairs; the cap IS the scale
    # path) and modularity of a blocks-of-500 labeling
    from csvweb_spark.operators.graph import link_prediction_ra, modularity
    timed("kg_link_predict_10x", lambda: link_prediction_ra(
        edges10, max_center_degree=100).count(), retry_under=0.0)
    labels10 = ids10.select(
        F.col("n").alias("node"),
        F.concat(F.lit("c"), F.expr("n div 500")).alias("community"))
    timed("kg_modularity_10x", lambda: modularity(
        edges10, labels10).count(), retry_under=0.0)
    from csvweb_spark.operators.graph import assortativity
    timed("kg_assortativity_10x", lambda: assortativity(
        edges10).count(), retry_under=0.0)
    from csvweb_spark.operators.graph import neighborhood_function
    timed("kg_anf_10x", lambda: neighborhood_function(
        edges10, k=2, p=6).count(), retry_under=0.0)
    edges10.unpersist()

    # round-5 additions: SHACL/VoID over a customer-proportional KG
    # (4 triples per customer - these SCALE with sf, unlike the
    # driver queries' bounded oracle fixtures), HITS on the shared
    # graphs, WARC sink round-trip, eTLD+1, collocations
    from csvweb_spark.operators.graph import hits
    from csvweb_spark.operators.shacl import (RDF_TYPE as _RT,
                                              validate_shapes)
    from csvweb_spark.operators.text import collocations
    from csvweb_spark.operators.urls import registrable_domain
    from csvweb_spark.operators.void_stats import predicate_partitions
    from csvweb_spark.sources.warc import render_warc, warc_pages
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    _k = F.col("c_custkey")
    _xsd = "http://www.w3.org/2001/XMLSchema#"
    _no = F.lit(None).cast("string")

    def _t(df, s, p, o, kind, dt=_no):
        return df.select(s.alias("subj"), F.lit(p).alias("pred"),
                         o.alias("obj"), F.lit(kind).alias("obj_kind"),
                         dt.alias("obj_datatype"))

    _s = F.concat(F.lit("ex:C"), _k)
    bench_kg = (
        _t(cust, _s, _RT, F.lit("ex:Customer"), "iri")
        .unionByName(_t(cust, _s, "ex:name", F.col("c_name"), "literal",
                        F.lit(_xsd + "string")))
        .unionByName(_t(cust, _s, "ex:nation",
                        F.concat(F.lit("ex:N"), F.col("c_nationkey")),
                        "iri"))
        .unionByName(_t(cust, _s, "ex:bal",
                        F.col("c_acctbal").cast("string"), "literal",
                        F.lit(_xsd + "decimal")))
        .unionByName(_t(cust.select("c_nationkey").distinct()
                        .filter(F.col("c_nationkey") < 20),
                        F.concat(F.lit("ex:N"), F.col("c_nationkey")),
                        _RT, F.lit("ex:Nation"), "iri"))).persist()
    extras["bench_kg_triples"] = bench_kg.count()  # synthesis excluded
    _shapes = [{"shape": "ex:CustomerShape", "target_class": "ex:Customer",
                "properties": [
                    {"path": "ex:name", "min_count": 1, "max_count": 1,
                     "datatype": _xsd + "string"},
                    {"path": "ex:nation", "class": "ex:Nation"},
                    {"path": "ex:bal", "min_inclusive": 0,
                     "max_inclusive": 9000}]}]
    timed("kg_shacl_validate", lambda: validate_shapes(
        bench_kg, _shapes).count())
    timed("kg_void_stats", lambda: predicate_partitions(bench_kg).count())
    from csvweb_spark.operators.ontology import (induce_domain_range,
                                                 predicate_functionality)
    timed("kg_ontology", lambda: induce_domain_range(
        bench_kg.select("subj", "pred", "obj")).count())
    timed("kg_functionality", lambda: predicate_functionality(
        bench_kg.select("subj", "pred", "obj")).count())
    from csvweb_spark.operators.retrieval import entity_cards
    timed("kg_cards", lambda: entity_cards(
        bench_kg.select("subj", "pred", "obj"), k=3).count())
    # subclass mining over a 3-type-per-entity sf-scaling type set
    from csvweb_spark.operators.ontology import mine_subclass_candidates
    sub_types = (
        _t(cust, _s, _RT, F.lit("ex:Customer"), "iri")
        .unionByName(_t(cust, _s, _RT,
                        F.concat(F.lit("ex:Seg"), F.col("c_mktsegment")),
                        "iri"))
        .unionByName(_t(cust.filter(_k % 2 == 0), _s, _RT,
                        F.lit("ex:EU"), "iri")))
    timed("kg_subclass", lambda: mine_subclass_candidates(
        sub_types.select("subj", "pred", "obj")).count())
    from csvweb_spark.operators.void_stats import class_linkage
    timed("kg_schema_graph", lambda: class_linkage(
        bench_kg.select("subj", "pred", "obj")).count())
    bench_kg.unpersist()

    timed("kg_hits", lambda: hits(edges_khop, iterations=2).count())

    warc_in = cust.select(
        F.concat(F.lit("http://h"), F.col("c_nationkey"),
                 F.lit(".example.org/c/"), _k).alias("url"),
        F.make_timestamp(F.lit(2026), F.lit(2), F.lit(1), F.lit(0),
                         F.lit(0), (_k % 60).cast("int")).alias("warc_ts"),
        F.concat(F.lit("<html><body><p>Customer "), F.col("c_name"),
                 F.lit("</p></body></html>")).cast("binary").alias("html"))
    timed("web_warc_roundtrip", lambda: warc_pages(
        render_warc(warc_in), ok_only=False).count())

    hosts_in = cust.select(
        (F.when(_k % 5 == 0, F.concat(F.lit("www.s"), _k, F.lit(".com")))
         .when(_k % 5 == 1, F.concat(F.lit("www.s"), _k, F.lit(".co.uk")))
         .when(_k % 5 == 2, F.concat(F.lit("s"), _k, F.lit(".github.io")))
         .when(_k % 5 == 3, F.concat(F.lit("a.s"), _k, F.lit(".ck")))
         .otherwise(F.concat(F.lit("x"), _k, F.lit(".www.ck"))))
        .alias("host"))
    timed("web_registrable_domain", lambda: registrable_domain(
        hosts_in).count())

    timed("text_collocations", lambda: collocations(
        docs, min_pair_count=2).count())

    from csvweb_spark.operators.graph import personalized_pagerank
    from csvweb_spark.operators.interval import coalesce_intervals
    from csvweb_spark.sources.cdx import cdx_index
    seeds2 = spark.createDataFrame([(0,), (250,)], "node long")
    timed("kg_pagerank_seeded", lambda: personalized_pagerank(
        edges_khop, seeds2, iterations=3).count())
    warc_segs = render_warc(warc_in, segment_col=None,
                            gzip_members=True)
    timed("web_cdx_index", lambda: cdx_index(warc_segs).count())
    ev_iv = ev.select(
        "user_id", "event_type", F.col("ts").alias("start"),
        (F.col("ts") + F.make_interval(
            secs=(F.col("event_id") % 7 + 1).cast("double")))
        .alias("end"))
    timed("events_coalesce", lambda: coalesce_intervals(
        ev_iv, ["user_id", "event_type"]).count())

    # round-5 late additions: SCC (cyclic blocks-of-8 graph, scales
    # with sf), deterministic walks, integer k-means, bigram LM
    # scoring, SCD2 validity intervals, KG snapshot diff, mojibake
    from csvweb_spark.operators.asof import kg_diff
    from csvweb_spark.operators.graph import (random_walks,
                                              strongly_connected_components)
    from csvweb_spark.operators.interval import validity_intervals
    from csvweb_spark.operators.similarity import kmeans_lloyd
    from csvweb_spark.operators.text import (score_documents_lm,
                                             train_bigram_lm)
    from csvweb_spark.sources.charset import add_mojibake_repair
    _kk = F.col("c_custkey")
    _b = _kk - (_kk % 8)
    scc_edges = (
        cust.filter(_kk % 8 < 4).select(_kk.alias("src"),
                                        (_kk + 1).alias("dst"))
        .unionByName(cust.filter(_kk % 8 == 4)
                     .select(_kk.alias("src"), _b.alias("dst")))
        .unionByName(cust.filter(_kk % 8 == 4)
                     .select(_kk.alias("src"), (_kk + 1).alias("dst")))
        .unionByName(cust.filter(_kk % 8 == 5)
                     .select(_kk.alias("src"), (_kk + 1).alias("dst")))
        .unionByName(cust.filter(_kk % 8 == 7)
                     .select(_kk.alias("src"), _b.alias("dst"))))
    timed("kg_scc", lambda: strongly_connected_components(
        scc_edges, max_outer=2, max_rounds=12).count(), retry_under=0.0)
    timed("kg_walks", lambda: random_walks(
        edges_khop, walks_per_node=2, length=3).count())
    timed("embed_kmeans", lambda: kmeans_lloyd(
        emb, k=8, iterations=2)[0].count(), retry_under=0.0)

    def _lm():
        pc, uc = train_bigram_lm(docs.filter(F.col("doc_id") % 2 == 0))
        return score_documents_lm(
            docs.filter(F.col("doc_id") % 2 == 1), pc, uc,
            uc.count()).count()
    timed("text_lm_score", _lm)
    ev_va = ev.select(
        F.concat(F.lit("ex:U"), F.col("user_id")).alias("subj"),
        F.col("event_type").alias("pred"),
        (F.floor(F.col("value") * 10).cast("long") % 3).alias("obj"),
        "ts")
    timed("kg_validity", lambda: validity_intervals(
        ev_va, ["subj", "pred"], ts_col="ts").count())
    old_kg = cust.select(
        F.concat(F.lit("ex:C"), _kk).alias("subj"),
        F.lit("ex:segment").alias("pred"),
        F.col("c_mktsegment").alias("obj"))
    new_kg = cust.select(
        F.concat(F.lit("ex:C"), _kk).alias("subj"),
        F.lit("ex:segment").alias("pred"),
        F.when(_kk % 10 == 0, F.concat(F.col("c_mktsegment"),
                                       F.lit("-R2")))
        .otherwise(F.col("c_mktsegment")).alias("obj"))
    timed("kg_diff", lambda: kg_diff(
        old_kg, new_kg, key_cols=("subj", "pred", "obj")).count())
    # truth-discovery fusion: 20 customers vote per subject, sources
    # keyed by nation with a 25-row weight table (scales with sf)
    from csvweb_spark.operators.fusion import fuse_triples
    fuse_in = cust.select(
        F.concat(F.lit("ex:C"), F.expr("c_custkey div 20")).alias("subj"),
        F.lit("ex:segment").alias("pred"),
        F.col("c_mktsegment").alias("obj"),
        F.concat(F.lit("src"), F.col("c_nationkey")).alias("source"))
    fuse_w = spark.range(25).select(
        F.concat(F.lit("src"), F.col("id")).alias("source"),
        (F.col("id") % 5 + 1).cast("long").alias("weight"))
    timed("kg_fusion", lambda: fuse_triples(fuse_in, fuse_w).count())
    # incremental fusion: a 1/8 batch against the other 7/8 committed
    from csvweb_spark.operators.fusion import fuse_triples_incremental
    fuse_com = fuse_in.filter(_kk % 8 != 0)
    fuse_bat = fuse_in.filter(_kk % 8 == 0)
    timed("kg_fusion_incr", lambda: fuse_triples_incremental(
        fuse_bat, fuse_com, fuse_w).count())
    # cross-KG alignment: two IRI mints over the same customers, names
    # unique (full evidence) + nations shared (near-zero RA weight)
    from csvweb_spark.operators.align import align_entities

    def _mint(prefix):
        s = F.concat(F.lit(prefix), _kk)
        return (cust.select(s.alias("subj"),
                            F.lit("ex:name").alias("pred"),
                            F.col("c_name").alias("obj"))
                .unionByName(cust.select(
                    s.alias("subj"), F.lit("ex:nation").alias("pred"),
                    F.concat(F.lit("ex:N"), F.col("c_nationkey"))
                    .alias("obj"))))
    timed("kg_align", lambda: align_entities(
        _mint("ex:A"), _mint("ex:B")).count())
    from csvweb_spark.operators.align import align_predicates
    id_map = cust.select(F.concat(F.lit("ex:A"), _kk).alias("e1"),
                         F.concat(F.lit("ex:B"), _kk).alias("e2"))
    timed("kg_pred_align", lambda: align_predicates(
        _mint("ex:A"), _mint("ex:B"), id_map).count())
    # depth-1 rule mining over sf-scaling implication/inverse fixtures
    from csvweb_spark.operators.ontology import mine_predicate_rules
    _c = F.concat(F.lit("ex:C"), _kk)
    rules_in = (
        cust.select(_c.alias("subj"), F.lit("ex:market").alias("pred"),
                    F.col("c_mktsegment").alias("obj"))
        .unionByName(cust.filter(_kk % 2 == 0).select(
            _c.alias("subj"), F.lit("ex:sector").alias("pred"),
            F.col("c_mktsegment").alias("obj")))
        .unionByName(cust.select(
            _c.alias("subj"), F.lit("ex:follows").alias("pred"),
            F.concat(F.lit("ex:C"), _kk + 1).alias("obj")))
        .unionByName(cust.filter(_kk % 2 == 0).select(
            F.concat(F.lit("ex:C"), _kk + 1).alias("subj"),
            F.lit("ex:followed_by").alias("pred"), _c.alias("obj"))))
    timed("kg_rules", lambda: mine_predicate_rules(
        rules_in, min_support=2).count())
    # bow-tie: bounded 10-head core cycle + sf-scaling block
    # attachments (blocks past 120 are the DISCONNECTED mass TRIM
    # retires - the realistic crawl shape)
    from csvweb_spark.operators.graph import (
        bowtie_decomposition, strongly_connected_components as _scc_op)
    _r12 = _kk % 12

    def _bt(cond, s, d):
        return cust.filter(cond).select(s.alias("src"), d.alias("dst"))

    bt_edges = (
        _bt((_r12 == 0) & (_kk < 108), _kk, _kk + 12)
        .unionByName(_bt(_kk == 108, _kk, F.lit(0).cast("long")))
        .unionByName(_bt(_r12 == 1, _kk, _kk - 1))
        .unionByName(_bt(_r12 == 2, _kk, _kk - 1))
        .unionByName(_bt(_r12 == 0, _kk, _kk + 3))
        .unionByName(_bt(_r12 == 3, _kk, _kk + 1))
        .unionByName(_bt(_r12 == 2, _kk, _kk + 3))
        .unionByName(_bt(_r12 == 5, _kk, _kk - 1))
        .unionByName(_bt(_r12 == 1, _kk, _kk + 5))
        .unionByName(_bt(_r12 == 7, _kk, _kk - 4))
        .unionByName(_bt(_r12 == 8, _kk, _kk + 1)))
    timed("kg_bowtie", lambda: bowtie_decomposition(
        bt_edges, _scc_op(bt_edges, max_outer=3)).count(),
        retry_under=0.0)
    # transitive reduction of blocks-of-8 chains + head->tail shortcuts
    from csvweb_spark.operators.entail import transitive_reduction
    tr_edges = (cust.filter(_kk % 8 < 7)
                .select(_kk.alias("src"), (_kk + 1).alias("dst"))
                .unionByName(cust.filter(_kk % 8 == 0)
                             .select(_kk.alias("src"),
                                     (_kk + 7).alias("dst"))))
    timed("kg_taxonomy_reduce", lambda: transitive_reduction(
        tr_edges).count(), retry_under=0.0)
    timed("web_mojibake", lambda: add_mojibake_repair(docs)
          .agg(F.sum(F.col("text_fixed_applied").cast("long"))).count())
    from csvweb_spark.operators.graph import harmonic_centrality
    from csvweb_spark.operators.sampling import split_corpus
    hseeds = spark.createDataFrame([(0,), (250,)], "node long")
    timed("kg_harmonic", lambda: harmonic_centrality(
        edges_khop, hseeds, k=3).count())
    timed("corpus_split", lambda: split_corpus(
        docs, {"train": 8000, "val": 1000, "test": 1000})
        .groupBy("split").count().count())
    from csvweb_spark.operators.graph import negative_triple_samples
    from csvweb_spark.operators.sketches import table_fingerprint
    from csvweb_spark.sources.warc import render_wat, wat_pages
    timed("kg_negatives", lambda: negative_triple_samples(
        old_kg.withColumn("obj_kind", F.lit("iri")), n_per=2).count(),
        retry_under=0.0)
    timed("table_fingerprint", lambda: table_fingerprint(
        li, ["l_orderkey", "l_partkey", "l_returnflag"]).count())
    timed("web_wat_roundtrip", lambda: wat_pages(
        render_wat(warc_in.withColumn("html",
                                      F.col("html").cast("string")))
        ).count())
    from csvweb_spark.operators.text import readability
    from csvweb_spark.sources.webtext import publish_dates
    timed("text_readability", lambda: readability(docs).count())
    timed("web_publish_dates", lambda: publish_dates(epages).count())

    # relational: TPC-H-ish Q1
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    timed("q1_pricing_summary", lambda: (
        li.filter(F.col("l_shipdate") <= F.lit("2002-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(dec("l_quantity")).alias("sum_qty"),
             F.count(F.lit(1)).alias("n"))).count())

    total = round(sum(timings.values()), 3)
    return {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "n_pages": n_pages,
        "n_docs": n_docs,
        **extras,
    }


def _cpu_stat():
    with open("/proc/stat") as f:
        p = f.readline().split()
    v = list(map(int, p[1:9]))
    return v[0] + v[1] + v[2] + v[5] + v[6], v[7]  # busy ticks, steal ticks


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    b0, t0 = _cpu_stat(), time.time()
    only = set(sys.argv[1:]) or None
    result = run_bench(spark, sf_dir, only=only)
    b1, wall = _cpu_stat(), time.time() - t0
    hz = os.sysconf("SC_CLK_TCK")
    # host-contention context for this run (see SCALING.md): cores the
    # hypervisor withheld while the bench ran
    result["host_steal_cores"] = round((b1[1] - b0[1]) / hz / wall, 2)
    result["host_busy_cores"] = round((b1[0] - b0[0]) / hz / wall, 2)
    result["cpus"] = cpus
    print(json.dumps(result))


if __name__ == "__main__":
    main()
