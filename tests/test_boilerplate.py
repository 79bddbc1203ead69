"""Host-scoped boilerplate removal (operators/boilerplate.py)."""

from pyspark.sql import functions as F

from csvweb_spark.operators.boilerplate import (boilerplate_census_audit,
                                                host_boilerplate_lines,
                                                strip_host_boilerplate)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_strip_host_scoped_threshold(spark):
    pages = _pages(spark, [
        ("http://a.com/1", "FOOTER\nalpha"),
        ("http://a.com/2", "FOOTER\nbeta"),
        ("http://a.com/3", "FOOTER\ngamma\nrare"),
        # same FOOTER text on another host with only one page: kept
        ("http://b.com/1", "FOOTER\ndelta"),
    ])
    out = {r.url: r for r in strip_host_boilerplate(
        pages, min_pages=2, min_frac_pct=50).collect()}
    assert out["http://a.com/1"].text_clean == "alpha"
    assert out["http://a.com/1"].n_removed == 1
    assert out["http://a.com/3"].text_clean == "gamma\nrare"
    # host b: FOOTER on 1 of 1 pages but min_pages=2 -> untouched
    assert out["http://b.com/1"].text_clean == "FOOTER\ndelta"
    assert out["http://b.com/1"].n_removed == 0


def test_within_page_repeats_count_once(spark):
    # a page repeating a line 5 times contributes ONE census vote -
    # a single spammy page cannot promote its own text to template
    pages = _pages(spark, [
        ("http://a.com/1", "x\nx\nx\nx\nx"),
        ("http://a.com/2", "y"),
        ("http://a.com/3", "z"),
    ])
    bl = host_boilerplate_lines(pages, min_pages=2, min_frac_pct=50)
    assert bl.count() == 0


def test_census_cap_and_audit(spark):
    # 3 template lines on both pages, cap 2 -> top-2 kept, audit fires
    pages = _pages(spark, [
        ("http://a.com/1", "t1\nt2\nt3\nunique1"),
        ("http://a.com/2", "t1\nt2\nt3\nunique2"),
    ])
    bl = host_boilerplate_lines(pages, min_pages=2, min_frac_pct=50,
                                max_lines_per_host=2)
    assert bl.count() == 2
    audit = boilerplate_census_audit(bl, max_lines_per_host=2).collect()
    assert [r.host for r in audit] == ["a.com"]
    # uncapped census sees all 3
    assert host_boilerplate_lines(pages, min_pages=2,
                                  min_frac_pct=50).count() == 3


def test_strip_plan_census_moves_digests_not_text(spark):
    pages = _pages(spark, [("http://a.com/1", "FOOTER\nalpha" * 3)])
    df = strip_host_boilerplate(pages)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # every exchange either carries the digest census or the per-host
    # digest-set join key - the page text column itself never appears
    # on an exchange's immediate input projection
    for i, line in enumerate(plan.splitlines()):
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line, line


def test_broadcast_rules_is_opt_in(spark):
    pages = _pages(spark, [
        ("http://a.com/1", "F\na"), ("http://a.com/2", "F\nb")])
    # no unconditional broadcast HINT by default (AQE may still
    # size-gate one at runtime, which is the desired adaptive path);
    # broadcast_rules=True plants the hint explicitly
    default_opt = strip_host_boilerplate(pages) \
        ._jdf.queryExecution().optimizedPlan().toString()
    bc_opt = strip_host_boilerplate(pages, broadcast_rules=True) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in default_opt.lower()
    assert "broadcast" in bc_opt.lower()
