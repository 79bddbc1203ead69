"""Lexical retrieval: distributed inverted index + BM25 top-k search.

The text-side complement to the embedding-ANN family (similarity.py):
given the corpus the pipeline just curated, answer "which documents
best match these query terms" with the classic Okapi BM25 ranking -
the retrieval primitive behind contamination auditing ("which training
docs match this benchmark question"), corpus QA sampling, and
more-like-this expansion.  The reference engine has no retrieval
operator; this is part of the §2.8 [new] LLM-pipeline layer.

Scale shape (the 100 TB story):
* the inverted index is ONE corpus scan: project (key, dl, token) with
  a single explode, then a map-side-combinable groupBy(key, term) -
  the shuffle carries distinct (doc, term) rows, never raw text.  Doc
  length rides along via max(dl) inside the same partial aggregate, so
  no second scan and no doc-table join.
* document frequencies are a second (tiny, vocabulary-keyed)
  aggregation over the posting rows.
* queries are a user-supplied, by-contract-small table: the (query_id,
  term) probe joins the df table and then the postings on `term`; AQE
  broadcasts the probe side (no explicit hint - the round-4 verdict's
  rule: data-dependent sizes never get an unconditional broadcast).
* per-(query, doc) scores fold with one map-side-combinable sum, and
  the final per-query top-k is a row_number window that compiles to
  partial WindowGroupLimit (rank <= k prunes map-side before the
  window shuffle - same plan pin as sampling.stratified_sample_topk).
* the one inherent skew is a stop-word query term whose posting list
  is O(corpus); `max_df` prunes postings for terms above a document-
  frequency cap (the standard stop-term guard real engines apply at
  index time).  Off by default so the oracle replay is exact.

Determinism (the hash-gate contract, same policy as text.tfidf_topk):
ln() is not bit-reproducible across engines, so the gated score is an
integer-exact BM25 surrogate in ppm:

    idf_ppm   = min(idf_cap_ppm,
                    (2*(N - df) + 1) * 10^6 div (2*df + 1))
    ratio_ppm = dl * 10^8 div avgdl_c          (dl/avgdl; avgdl_c =
                                                100*T div N centitokens)
    dlnorm    = (100 - b_100) * 10^4
                + (b_100 * ratio_ppm) div 100  ((1 - b + b*r) in ppm)
    den_ppm   = tf * 10^6 + (k1_100 * dlnorm) div 100
    tfnorm    = tf * (k1_100 + 100) * 10^10 div den_ppm
    score_ppm = sum over query terms of (idf_ppm * tfnorm) div 10^6

The length-normalized tf part IS textbook BM25 (k1 = k1_100/100,
b = b_100/100) in exact rational arithmetic; only the idf drops the
ln() around the odds ratio (N - df + 0.5)/(df + 0.5) - the ln argument
itself, saturated at `idf_cap_ppm` so rare-term products stay inside
bigint.  ln is monotone, so single-term rankings are identical to
Okapi; multi-term sums weight rare terms harder than ln-BM25 would.
A float `bm25` column (the real ln formula) rides alongside for
ranking studies - driver queries project the integer columns only.

Overflow envelope (documented, not checked per-row): N < 4.6*10^12
docs, dl < 9*10^10 tokens, tf < 4*10^6 - beyond any real corpus/doc.

Tokenization is text.whitespace_tokens - the ONE shared tokenizer, so
the DuckDB oracle mirror already exists and can never drift.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import whitespace_tokens

SCALE = 1_000_000


def build_inverted_index(df: DataFrame, text_col: str = "text",
                         key_col: str = "doc_id") -> DataFrame:
    """Posting rows (term, key, tf, dl) from one corpus scan.

    dl (document length in tokens) is projected BEFORE the explode and
    folded with max() inside the same (key, term) partial aggregate -
    constant per key, so max is exact and the doc table is never
    re-joined.  Raw text never shuffles: the exchange carries distinct
    (doc, term) pairs with two longs.
    """
    toks = whitespace_tokens(F.col(text_col))
    pairs = df.select(F.col(key_col).alias("key"),
                      F.size(toks).cast("long").alias("dl"),
                      F.explode(toks).alias("term"))
    return (pairs.groupBy("key", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"),
                 F.max("dl").alias("dl"))
            .select("term", "key", "tf", "dl"))


def document_frequencies(postings: DataFrame) -> DataFrame:
    """(term, df) from the posting rows: postings are distinct per
    (key, term), so count(*) IS the document frequency."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"))


def _corpus_stats(postings: DataFrame) -> DataFrame:
    """One-row (n_docs, avgdl_c): document count and average document
    length in centitokens, from the postings alone (per-key dl is
    constant, so sum(dl)/sum(tf-rows-per-key) folds via a per-key
    max + global agg).  Kept as a 1-row DataFrame and broadcast-cross-
    joined (the pagerank dangling-mass pattern) - never collected."""
    per_doc = postings.groupBy("key").agg(F.max("dl").alias("dl"))
    return per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("(100 * sum(dl)) div count(1)").cast("long")
         .alias("avgdl_c"))


def bm25_topk_terms(postings: DataFrame, qterms: DataFrame, k: int = 10,
                    *, k1_100: int = 120, b_100: int = 75,
                    idf_cap_ppm: int = 10 ** 12,
                    max_df: int | None = None) -> DataFrame:
    """BM25 top-k documents per query over a prebuilt inverted index.

    qterms: (query_id, term) rows - duplicates are collapsed (set
    semantics; classic qtf weighting can be recovered by pre-weighting
    rows, but distinct terms keep the oracle total-ordering trivial).

    Returns (query_id, key, score_ppm, bm25, n_terms_hit, rnk) - the k
    highest-scoring documents per query, ties broken (score_ppm desc,
    key asc); `bm25` is the float ln-idf Okapi score for comparison
    (NOT hash-gated - project it away in driver queries).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not 0 <= b_100 <= 100:
        raise ValueError("b_100 must be in [0, 100]")
    if k1_100 < 0:
        raise ValueError("k1_100 must be >= 0")
    # round-6 optimization (guide SS1.2/SS5): three consumers read the
    # posting table (corpus stats, document frequencies, the probe
    # join), and their pruned projections differ, so Catalyst cannot
    # reuse one exchange - an unpinned posting plan re-ran the full
    # corpus explode+aggregate three times per query. A lazy local
    # checkpoint materializes it once on the first action and truncates
    # the lineage; no extra job, storage freed when the frame is GC'd.
    postings = postings.localCheckpoint(eager=False)
    stats = _corpus_stats(postings)
    dft = document_frequencies(postings)
    if max_df is not None:
        dft = dft.filter(F.col("df") <= max_df)
    probe = qterms.select("query_id", "term").distinct().join(dft, "term")
    hits = (probe.join(postings, "term")
            .crossJoin(F.broadcast(stats)))
    idf = F.least(
        F.lit(idf_cap_ppm).cast("long"),
        F.expr(f"((2 * (n_docs - df) + 1) * {SCALE}) div (2 * df + 1)"))
    # (dl * 10^8) div avgdl_c is ratio_ppm = dl/avgdl; inlined so the
    # whole dlnorm is one codegen expression.
    dlnorm = (F.lit((100 - b_100) * 10_000)
              + F.expr(f"({b_100} * ((dl * 100000000) div avgdl_c)) "
                       "div 100"))
    scored = (hits
              .withColumn("_idf", idf.cast("long"))
              .withColumn("_dln", dlnorm.cast("long"))
              .withColumn("_den", F.expr(
                  f"tf * {SCALE} + ({k1_100} * _dln) div 100"))
              .withColumn("_tfn", F.expr(
                  f"(tf * {k1_100 + 100} * 10000000000) div _den"))
              .withColumn("_s", F.expr(f"(_idf * _tfn) div {SCALE}"))
              .withColumn("_f", _bm25_float(k1_100, b_100)))
    per_doc = (scored.groupBy("query_id", "key")
               .agg(F.sum("_s").cast("long").alias("score_ppm"),
                    F.sum("_f").alias("bm25"),
                    F.count(F.lit(1)).cast("long").alias("n_terms_hit")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_ppm").desc(), F.col("key").asc())
    return (per_doc.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .withColumn("rnk", F.col("rnk").cast("long")))


def _bm25_float(k1_100: int, b_100: int) -> Column:
    """The real Okapi BM25 term score (ln idf) as a double - emitted
    alongside the gated integer score, never hashed.  Literals carry
    the D suffix: bare `100.0` parses as DECIMAL in Spark SQL and its
    bounded division scale would quantize the score at ~1e-7."""
    k1, b = k1_100 / 100.0, b_100 / 100.0
    return F.expr(
        "ln(((n_docs - df + 0.5D) / (df + 0.5D)) + 1.0D)"
        f" * (tf * {1.0 + k1!r}D)"
        f" / (tf + {k1!r}D * (1.0D - {b!r}D"
        f" + {b!r}D * dl / (avgdl_c / 100.0D)))")


def bm25_topk(df: DataFrame, queries: DataFrame, k: int = 10,
              *, text_col: str = "text", key_col: str = "doc_id",
              query_text_col: str = "query_text",
              k1_100: int = 120, b_100: int = 75,
              idf_cap_ppm: int = 10 ** 12,
              max_df: int | None = None) -> DataFrame:
    """End-to-end form: build the index from `df` and search it with
    free-text queries (query_id, query_text), tokenized by the shared
    whitespace tokenizer.  Delegates to bm25_topk_terms."""
    postings = build_inverted_index(df, text_col, key_col)
    qterms = queries.select(
        "query_id",
        F.explode(whitespace_tokens(F.col(query_text_col))).alias("term"))
    return bm25_topk_terms(postings, qterms, k, k1_100=k1_100,
                           b_100=b_100, idf_cap_ppm=idf_cap_ppm,
                           max_df=max_df)


def entity_cards(triples: DataFrame, k: int = 5,
                 subj: str = "subj", pred: str = "pred",
                 obj: str = "obj",
                 scale: int = 1_000_000) -> DataFrame:
    """Top-k most-identifying facts per entity - the 'entity card' a
    KG serving layer renders for search/QA: a hub subject with
    thousands of assertions shows its k most DISCRIMINATING facts,
    not its first k in storage order.

    Informativeness is IDF-shaped but integer-exact: weight_ppm =
    floor(scale / n_pred) where n_pred is the predicate's global
    assertion census over the RDF set - a predicate asserted
    everywhere (rdf:type, ex:crawledFrom) weighs ~0, a rare one
    weighs the full scale. Ties break (pred, obj) lexicographically,
    so the card is reproducible on any cluster shape. rank is
    1-based per subject.

    Scale shape: one distinct on slim (s,p,o), one predicate census
    (rows = predicates) joined back (broadcast-eligible; no hint -
    AQE promotes it), and ONE rank window whose row_number <= k
    compiles with a partial WindowGroupLimit below the subject
    exchange - each map task forwards at most k facts per subject,
    the same plan-pinned shape as `sample_stratified`'s exact-k.
    """
    t = (triples.select(F.col(subj).alias("subj"),
                        F.col(pred).alias("pred"),
                        F.col(obj).alias("obj"))
         .distinct())
    census = t.groupBy("pred").agg(F.count(F.lit(1)).alias("_n"))
    w = census.select(
        "pred",
        F.expr(f"CAST({int(scale)} AS BIGINT) div _n").alias("weight_ppm"))
    win = Window.partitionBy("subj").orderBy(
        F.col("weight_ppm").desc(), F.col("pred").asc(), F.col("obj").asc())
    return (t.join(w, "pred")
            .withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= int(k))
            .select("subj", "rank", "pred", "obj", "weight_ppm"))
