"""Crawl-health operators (operators/crawl_quality.py)."""

from pyspark.sql import functions as F

from csvweb_spark.operators.crawl_quality import (reciprocal_link_stats,
                                                  soft404_signals,
                                                  spider_trap_candidates,
                                                  url_template_key)


def _key(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(url_template_key(F.col("u")).alias("k")) \
        .collect()[0].k


def test_url_template_key(spark):
    assert _key(spark, "http://a.com/item/123?page=7") == \
        "a.com/item/N?page=N"
    assert _key(spark, "https://a.com/x/deadbeef01/y") == "a.com/x/H/y"
    # short hex stays; long decimal is N (decimal rule runs after hex)
    assert _key(spark, "http://a.com/cafe/123456789012") == \
        "a.com/cafe/H"
    assert _key(spark, "http://a.com/about") == "a.com/about"


def test_spider_trap_by_fanout_and_depth(spark):
    rows = [(f"http://t.com/cal/{i}",) for i in range(30)]
    rows += [("http://t.com/a/b/a/b/a/b/a/b/a/b/a/b/a/b",)]
    rows += [("http://ok.com/about",)]
    urls = spark.createDataFrame(rows, "url string")
    out = {(r.host, r.template): r for r in spider_trap_candidates(
        urls, max_urls_per_template=10, max_path_depth=12).collect()}
    cal = out[("t.com", "t.com/cal/N")]
    assert cal.n_urls == 30 and cal.is_trap
    deep = out[("t.com", "t.com/a/b/a/b/a/b/a/b/a/b/a/b/a/b")]
    assert deep.n_urls == 1 and deep.path_depth == 14 and deep.is_trap
    assert not out[("ok.com", "ok.com/about")].is_trap


def test_spider_trap_counts_distinct_urls(spark):
    # the same URL fetched 50 times is ONE url, not a trap
    urls = spark.createDataFrame(
        [("http://t.com/cal/1",)] * 50, "url string")
    out = spider_trap_candidates(urls, max_urls_per_template=10) \
        .collect()
    assert len(out) == 1 and out[0].n_urls == 1 and not out[0].is_trap


def test_reciprocal_link_stats(spark):
    edges = spark.createDataFrame(
        [("a", "b", 5), ("b", "a", 2),      # mutual pair
         ("a", "c", 1),                     # one-way
         ("c", "c", 9)],                    # self edge ignored
        "src_host string, dst_host string, n_links long")
    out = {r.host: r for r in reciprocal_link_stats(edges).collect()}
    assert (out["a"].out_hosts, out["a"].mutual_hosts) == (2, 1)
    assert out["a"].reciprocity == 0.5
    assert (out["b"].out_hosts, out["b"].mutual_hosts,
            out["b"].reciprocity) == (1, 1, 1.0)
    assert "c" not in out or out["c"].out_hosts == 0  # only self edge


def test_soft404_rules(spark):
    fat = "word " * 60
    pages = spark.createDataFrame([
        ("u1", "Page not found", "Sorry."),            # title + thin
        ("u2", "Nice title", fat + "page not found"),  # body marker
        ("u3", "All about 404 errors", fat),           # fat article: ok
        ("u4", "Normal", fat),                         # clean
        ("u5", None, None),                            # nulls survive
    ], "url string, title string, text string")
    out = {r.url: r.is_soft404 for r in soft404_signals(pages).collect()}
    assert out == {"u1": True, "u2": True, "u3": False, "u4": False,
                   "u5": False}
