"""BM25 retrieval over the distributed inverted index (retrieval.py)."""
import math

import pytest
from pyspark.sql import functions as F

from csvweb_spark.operators.retrieval import (
    bm25_topk, bm25_topk_terms, build_inverted_index,
    document_frequencies)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


def test_inverted_index_postings(spark):
    docs = _docs(spark, [(1, "apple banana apple"), (2, ""),
                         (3, "  banana  ")])
    rows = {(r.term, r.key): (r.tf, r.dl)
            for r in build_inverted_index(docs).collect()}
    assert rows == {("apple", 1): (2, 3), ("banana", 1): (1, 3),
                    ("banana", 3): (1, 1)}
    dfs = {r.term: r.df
           for r in document_frequencies(
               build_inverted_index(docs)).collect()}
    assert dfs == {"apple": 1, "banana": 2}


def test_bm25_idf_rarer_term_scores_higher(spark):
    # equal tf and dl; "rare" is in 1 doc, "common" in 3 of 4
    docs = _docs(spark, [(1, "rare pad"), (2, "common pad"),
                         (3, "common pad"), (4, "common pad")])
    qs = _queries(spark, [(1, "rare"), (2, "common")])
    out = {r.query_id: r.score_ppm
           for r in bm25_topk(docs, qs, k=1).collect()}
    assert out[1] > out[2]


def test_bm25_length_normalization(spark):
    # same tf=1 for the query term; longer doc is penalized
    docs = _docs(spark, [(1, "apple x"), (2, "apple x y z w v u t")])
    qs = _queries(spark, [(1, "apple")])
    rows = bm25_topk(docs, qs, k=2).orderBy("rnk").collect()
    assert [r.key for r in rows] == [1, 2]
    assert rows[0].score_ppm > rows[1].score_ppm


def test_bm25_tf_saturation_monotone(spark):
    # higher tf at equal dl scores higher, but sub-linearly (k1 cap)
    docs = _docs(spark, [(1, "a p p p p p p p"),
                         (2, "a a p p p p p p"),
                         (3, "a a a a p p p p")])
    qs = _queries(spark, [(1, "a")])
    rows = {r.key: r.score_ppm for r in bm25_topk(docs, qs, k=3).collect()}
    assert rows[3] > rows[2] > rows[1]
    # saturation: going 1->2 gains more than 2->4
    assert rows[2] - rows[1] > rows[3] - rows[2]


def test_bm25_multi_term_sum_and_hits(spark):
    docs = _docs(spark, [(1, "apple banana"), (2, "apple apple"),
                         (3, "cherry")])
    qs = _queries(spark, [(1, "apple banana")])
    rows = {r.key: r for r in bm25_topk(docs, qs, k=3).collect()}
    assert rows[1].n_terms_hit == 2 and rows[2].n_terms_hit == 1
    assert 3 not in rows
    # both-terms doc beats the single-term doc here (tf=1 each but two
    # idf contributions, banana rarer than apple)
    assert rows[1].score_ppm > rows[2].score_ppm


def test_bm25_float_matches_manual(spark):
    docs = _docs(spark, [(1, "apple pie crust"), (2, "apple apple"),
                         (3, "pear tart base")])
    qs = _queries(spark, [(1, "apple")])
    rows = {r.key: r.bm25 for r in bm25_topk(docs, qs, k=3).collect()}
    n, avgdl = 3, (3 + 2 + 3) / 3

    def okapi(tf, df, dl, k1=1.2, b=0.75):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    # avgdl enters as integer centitokens -> tiny quantization; compare
    # against the same centitoken value the engine used
    avgdl = ((100 * 8) // 3) / 100
    assert rows[1] == pytest.approx(okapi(1, 2, 3), rel=1e-12)
    assert rows[2] == pytest.approx(okapi(2, 2, 2), rel=1e-12)


def test_bm25_topk_limit_and_ties(spark):
    # 5 identical docs: ties break by key asc, k=3 keeps lowest keys
    docs = _docs(spark, [(i, "same text here") for i in range(5)])
    qs = _queries(spark, [(1, "same")])
    rows = bm25_topk(docs, qs, k=3).orderBy("rnk").collect()
    assert [r.key for r in rows] == [0, 1, 2]
    assert [r.rnk for r in rows] == [1, 2, 3]
    assert len({r.score_ppm for r in rows}) == 1


def test_bm25_max_df_prunes_stop_terms(spark):
    docs = _docs(spark, [(1, "the apple"), (2, "the pear"),
                         (3, "the fig"), (4, "the plum")])
    qs = _queries(spark, [(1, "the apple")])
    out = bm25_topk(docs, qs, k=4, max_df=2).collect()
    # "the" (df=4) is pruned: only doc 1 matches, via "apple" alone
    assert [(r.key, r.n_terms_hit) for r in out] == [(1, 1)]


def test_bm25_terms_form_equals_text_form(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "b c d"), (3, "c d e")])
    qs = _queries(spark, [(7, "b d")])
    qterms = spark.createDataFrame([(7, "b"), (7, "d"), (7, "b")],
                                   "query_id long, term string")
    a = sorted(map(tuple, bm25_topk(docs, qs, k=3)
                   .select("query_id", "key", "score_ppm").collect()))
    b = sorted(map(tuple,
                   bm25_topk_terms(build_inverted_index(docs), qterms, k=3)
                   .select("query_id", "key", "score_ppm").collect()))
    assert a == b and len(a) == 3


def test_bm25_validates_params(spark):
    docs = _docs(spark, [(1, "x")])
    qs = _queries(spark, [(1, "x")])
    with pytest.raises(ValueError):
        bm25_topk(docs, qs, k=0)
    with pytest.raises(ValueError):
        bm25_topk(docs, qs, k=1, b_100=101)
    with pytest.raises(ValueError):
        bm25_topk(docs, qs, k=1, k1_100=-1)


def test_bm25_plan_window_group_limit_no_python(spark):
    """Scale-shape pin: the per-query top-k compiles with a PARTIAL
    WindowGroupLimit (map tasks forward <= k rows per query before the
    query exchange), the posting build is a map-side-combinable partial
    HashAggregate, and nothing in the whole pipeline drops to a per-row
    or Arrow Python stage - BM25 is pure JVM columns end to end."""
    base = (spark.range(2000)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("alpha beta term"),
                             (F.col("id") % 40).cast("string"),
                             F.lit(" gamma delta")).alias("text")))
    qs = spark.createDataFrame([(1, "alpha"), (2, "beta gamma")],
                               "query_id long, query_text string")
    out = bm25_topk(base.repartition(4), qs, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # posting aggregate folds map-side: a partial aggregate on
    # (key, term) appears below its exchange
    assert plan.count("HashAggregate") >= 2, plan
