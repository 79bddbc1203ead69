"""Hyperlink-graph + embedded-JSON-LD extraction (sources/weblinks.py,
sources/jsonld.py)."""

import pytest
from pyspark.sql import functions as F

from csvweb_spark.sources.weblinks import (
    anchor_alias_candidates, extract_links, host_edges,
    link_pages_from_table, resolve_url)
from csvweb_spark.sources.jsonld import jsonld_triples


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, None, h.encode() if h is not None else None, None, "en")
         for u, h in rows],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")


# ---------------------------------------------------------------- links

def test_extract_links_basic_and_quotes(spark):
    pages = _pages(spark, [
        ("http://a.example.org/x/page.html",
         '<p><a href="http://b.example.org/1">Bee <b>One</b></a>'
         "<a href='other.html'>Other</a>"
         '<A HREF="/root.html">Root</A>'
         '<a href="//c.example.org/p">proto-rel</a>'
         '<a href="mailto:x@y.z">mail</a>'
         '<a href="javascript:void(0)">js</a>'
         '<a name="anchor-without-href">plain</a></p>'),
    ])
    out = {(r.dst_url, r.anchor_text)
           for r in extract_links(pages).collect()}
    assert out == {
        ("http://b.example.org/1", "Bee One"),
        ("http://a.example.org/x/other.html", "Other"),
        ("http://a.example.org/root.html", "Root"),
        ("http://c.example.org/p", "proto-rel"),
    }


def test_extract_links_relative_resolution(spark):
    pages = _pages(spark, [
        ("http://h.example.org/a/b/c.html",
         '<a href="../up.html">up</a>'
         '<a href="./same.html">same</a>'
         '<a href="../../../toofar.html">clamped</a>'
         '<a href="#frag">self</a>'
         '<a href="d.html#sec2">fragstrip</a>'),
        # base with no path at all: relative resolves under '/'
        ("http://bare.example.org",
         '<a href="x.html">x</a>'),
    ])
    out = {r.dst_url for r in extract_links(pages).collect()}
    assert out == {
        "http://h.example.org/a/up.html",
        "http://h.example.org/a/b/same.html",
        "http://h.example.org/toofar.html",      # clamped at root
        "http://h.example.org/a/b/c.html",        # fragment-only = self
        "http://h.example.org/a/b/d.html",        # fragment stripped
        "http://bare.example.org/x.html",
    }


def test_extract_links_null_html_and_no_anchors(spark):
    pages = _pages(spark, [
        ("http://t.example.org/none", None),
        ("http://t.example.org/prose", "<html><body>no links</body></html>"),
    ])
    assert extract_links(pages).count() == 0


def test_resolve_url_query_handling(spark):
    df = spark.createDataFrame(
        [("http://h.x/a/b.html?q=1", "c.html?r=2")], "base string, h string")
    got = df.select(resolve_url(F.col("base"), F.col("h"))
                    .alias("u")).collect()[0].u
    # base query must not leak into the merge directory
    assert got == "http://h.x/a/c.html?r=2"


def test_host_edges_and_aliases(spark):
    pages = _pages(spark, [
        ("http://s1.example.org/",
         '<a href="http://d.example.org/p">Acme Corp</a>'
         '<a href="http://d.example.org:80/p?utm_source=z">acme   corp</a>'
         '<a href="/self">self</a>'),
        ("http://s2.example.org/",
         '<a href="https://d.example.org/p">ACME Corp</a>'),
    ])
    links = extract_links(pages)
    he = {(r.src_host, r.dst_host): r.n_links
          for r in host_edges(links).collect()}
    assert he == {("s1.example.org", "d.example.org"): 2,
                  ("s1.example.org", "s1.example.org"): 1,
                  ("s2.example.org", "d.example.org"): 1}
    he2 = {(r.src_host, r.dst_host): r.n_links
           for r in host_edges(links, drop_self=True).collect()}
    assert ("s1.example.org", "s1.example.org") not in he2

    al = {(r.alias, r.dst_canonical): r.n_links
          for r in anchor_alias_candidates(links).collect()}
    # the two http variants canonicalize to one URL (port + utm dropped)
    assert al[("acme corp", "http://d.example.org/p")] == 2
    assert al[("acme corp", "https://d.example.org/p")] == 1
    assert ("self", "http://s1.example.org/self") in al


def test_link_pages_round_trip(spark):
    src = spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, v long")
    pages = link_pages_from_table(
        src, "http://n{k}.example.org/",
        [("http://r{v}.example.org/page", "row {k}"), ("/about", "about")],
        "k")
    links = extract_links(pages).collect()
    got = {(r.src_url, r.dst_url, r.anchor_text) for r in links}
    assert got == {
        ("http://n1.example.org/", "http://r10.example.org/page", "row 1"),
        ("http://n1.example.org/", "http://n1.example.org/about", "about"),
        ("http://n2.example.org/", "http://r20.example.org/page", "row 2"),
        ("http://n2.example.org/", "http://n2.example.org/about", "about"),
    }


def test_extract_links_plan_is_jvm_only(spark):
    pages = _pages(spark, [("http://x.example.org/", '<a href="a">a</a>')])
    plan = extract_links(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate explode" in plan


# --------------------------------------------------------------- JSON-LD

def _one_page(spark, payload: str):
    html = ('<html><head><script type="application/ld+json">'
            + payload + "</script></head><body></body></html>")
    return _pages(spark, [("http://j.example.org/p", html)])


def test_jsonld_scalars_and_types(spark):
    pages = _one_page(spark, """
    {"@context": "https://schema.org", "@id": "http://e.x/org/1",
     "@type": "Organization", "name": "Acme", "employees": 42,
     "rating": 4.5, "active": true, "skipme": null}
    """)
    rows = {(r.subj, r.pred, r.obj, r.obj_kind, r.obj_datatype)
            for r in jsonld_triples(pages).collect()}
    X = "http://www.w3.org/2001/XMLSchema#"
    assert rows == {
        ("http://e.x/org/1",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "https://schema.org/Organization", "iri", None),
        ("http://e.x/org/1", "https://schema.org/name", "Acme",
         "literal", X + "string"),
        ("http://e.x/org/1", "https://schema.org/employees", "42",
         "literal", X + "integer"),
        ("http://e.x/org/1", "https://schema.org/rating", "4.5",
         "literal", X + "double"),
        ("http://e.x/org/1", "https://schema.org/active", "true",
         "literal", X + "boolean"),
    }


def test_jsonld_nested_bnodes_arrays_graph(spark):
    pages = _one_page(spark, """
    {"@context": "https://schema.org", "@graph": [
       {"@id": "http://e.x/p/1", "@type": "Product",
        "offers": {"price": 9},
        "sameAs": ["http://w.x/a", "http://w.x/b"],
        "brand": {"@id": "http://e.x/org/1"}}
    ]}
    """)
    rows = jsonld_triples(pages).collect()
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r.pred.rsplit("/", 1)[-1], []).append(r)
    # nested id-less node -> deterministic bnode, shared by its triples
    (offer_edge,) = by_pred["offers"]
    assert offer_edge.obj.startswith("_:jl") and offer_edge.obj_kind == "bnode"
    (price,) = by_pred["price"]
    assert price.subj == offer_edge.obj and price.obj == "9"
    # array fans out
    assert {r.obj for r in by_pred["sameAs"]} == \
        {"http://w.x/a", "http://w.x/b"}
    # @id child is an iri edge, no recursion triples beyond the edge
    (brand,) = by_pred["brand"]
    assert brand.obj == "http://e.x/org/1" and brand.obj_kind == "iri"
    # determinism: second run emits identical bnode labels
    again = jsonld_triples(pages).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_jsonld_value_objects_and_lang(spark):
    pages = _one_page(spark, """
    {"@context": "https://schema.org", "@id": "http://e.x/d/1",
     "issued": {"@value": "2026-01-01",
                "@type": "http://www.w3.org/2001/XMLSchema#date"},
     "label": {"@value": "bonjour", "@language": "fr"}}
    """)
    rows = {(r.pred, r.obj, r.obj_datatype, r.obj_lang)
            for r in jsonld_triples(pages).collect()}
    assert ("https://schema.org/issued", "2026-01-01",
            "http://www.w3.org/2001/XMLSchema#date", None) in rows
    assert ("https://schema.org/label", "bonjour", None, "fr") in rows


def test_jsonld_malformed_and_strict(spark):
    html = ('<script type="application/ld+json">{not json</script>'
            '<script type="application/ld+json">'
            '{"@id": "http://e.x/ok", "k": "v"}</script>')
    pages = _pages(spark, [("http://j.example.org/m", html)])
    rows = jsonld_triples(pages).collect()
    assert {r.subj for r in rows} == {"http://e.x/ok"}
    with pytest.raises(Exception):
        jsonld_triples(pages, strict=True).collect()


def test_jsonld_prunes_before_python(spark):
    """Pages without a JSON-LD block must be filtered JVM-side before
    the mapInPandas stage (the plan's Python stage input carries the
    size(_blocks) > 0 filter below it)."""
    pages = _pages(spark, [
        ("http://j.example.org/none", "<html><body>plain</body></html>")])
    df = jsonld_triples(pages)
    assert df.count() == 0
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "size(" in plan and "MapInPandas" in plan
    assert plan.index("MapInPandas") < plan.index("size(")


# --------------------------------------------- robots meta / link policy

def test_extract_links_rel_nofollow(spark):
    pages = _pages(spark, [
        ("http://a.example.org/",
         '<a href="/f">follow</a>'
         '<a rel="nofollow" href="/n1">dq</a>'
         "<a rel='ugc NOFOLLOW sponsored' href='/n2'>sq list</a>"
         '<a rel="noopener" href="/other-rel">other</a>'
         '<a href="/inner"><span rel="nofollow">inner rel ignored</span>'
         "</a>"),
    ])
    got = {(r.dst_url, r.nofollow) for r in extract_links(pages).collect()}
    assert got == {
        ("http://a.example.org/f", False),
        ("http://a.example.org/n1", True),
        ("http://a.example.org/n2", True),
        ("http://a.example.org/other-rel", False),
        ("http://a.example.org/inner", False),
    }


def test_robots_directives_parse(spark):
    from csvweb_spark.sources.weblinks import robots_directives
    pages = _pages(spark, [
        # attribute order + case + multi-tag union + none expansion
        ("http://a.example.org/",
         '<meta content="NOARCHIVE , nosnippet" name="robots">'
         "<meta name='ROBOTS' content='none'>"),
        # plain noindex,nofollow
        ("http://b.example.org/",
         '<meta name="robots" content="noindex, nofollow">'),
        # a non-robots meta must not contribute
        ("http://c.example.org/",
         '<meta name="description" content="noindex">'),
        # no html at all
        ("http://d.example.org/", None),
    ])
    out = {r.url: (list(r.directives), r.noindex, r.nofollow)
           for r in robots_directives(pages).collect()}
    assert out["http://a.example.org/"] == (
        ["noarchive", "none", "nosnippet"], True, True)
    assert out["http://b.example.org/"] == (
        ["nofollow", "noindex"], True, True)
    assert out["http://c.example.org/"] == ([], False, False)
    assert out["http://d.example.org/"] == ([], False, False)


def test_follow_edges_and_indexable(spark):
    from csvweb_spark.sources.weblinks import (follow_edges, indexable_urls,
                                               robots_directives)
    pages = _pages(spark, [
        ("http://a.example.org/",
         '<meta name="robots" content="nofollow">'
         '<a href="/x">x</a>'),
        ("http://b.example.org/",
         '<a href="/y">y</a><a rel="nofollow" href="/z">z</a>'),
    ])
    pol = robots_directives(pages)
    fe = follow_edges(extract_links(pages), pol)
    assert {r.dst_url for r in fe.collect()} == {"http://b.example.org/y"}
    assert sorted(fe.columns) == sorted(
        ["src_url", "dst_url", "anchor_text", "nofollow"])
    assert {r.url for r in indexable_urls(pol).collect()} == {
        "http://a.example.org/", "http://b.example.org/"}


def test_robots_directives_plan_zero_shuffle(spark):
    from csvweb_spark.sources.weblinks import robots_directives
    pages = _pages(spark, [("http://x.example.org/",
                            '<meta name="robots" content="noindex">')])
    plan = robots_directives(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # per-page tokens never leave the row
