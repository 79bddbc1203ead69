"""HTML microdata extraction (sources/microdata.py): the
itemscope/itemprop/itemtype -> quads path.  Parser semantics are
exercised on the pure-Python walker (fast); the Spark plumbing
(prune + mapInPandas + schema) gets one end-to-end test."""

import pytest

from csvweb_spark.sources.microdata import (
    _resolve_ref, _vocab_of_type, _walk_page, microdata_triples)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_S = "http://www.w3.org/2001/XMLSchema#string"
URL = "http://h.example.org/d/page?q=1"


def triples(html):
    return [(s, p, o, k, dt) for _, s, p, o, k, dt, _
            in _walk_page(URL, html)]


# ------------------------------------------------------------- walker

def test_scope_type_and_text_prop():
    got = triples('<div itemscope itemtype="https://schema.org/Book" '
                  'itemid="urn:b:1"><span itemprop="name">A  '
                  '<i>Tale</i></span></div>')
    assert got == [
        ("urn:b:1", RDF_TYPE, "https://schema.org/Book", "iri", None),
        ("urn:b:1", "https://schema.org/name", "A Tale", "literal",
         XSD_S),
    ]


def test_attribute_value_sources_and_resolution():
    got = triples('<div itemscope itemtype="https://schema.org/P" '
                  'itemid="urn:p:1">'
                  '<meta itemprop="m" content="42">'
                  '<a itemprop="u" href="/x">t</a>'
                  '<img itemprop="i" src="pic.png">'
                  '<time itemprop="d" datetime="2021-02-03">feb</time>'
                  '<data itemprop="v" value="9">nine</data></div>')
    vals = {p.rsplit("/", 1)[1]: (o, k) for _, p, o, k, _ in got[1:]}
    assert vals == {
        "m": ("42", "literal"),
        "u": ("http://h.example.org/x", "iri"),
        "i": ("http://h.example.org/d/pic.png", "iri"),
        "d": ("2021-02-03", "literal"),
        "v": ("9", "literal"),
    }


def test_nested_scope_edge_and_deterministic_bnodes():
    html = ('<div itemscope itemtype="https://schema.org/P" '
            'itemid="urn:p:1"><div itemprop="maker" itemscope '
            'itemtype="https://schema.org/Org">'
            '<span itemprop="name">Acme</span></div></div>')
    a = _walk_page(URL, html)
    b = _walk_page(URL, html)
    assert a == b  # same bytes -> same blank labels
    edge = [t for t in a if t[2].endswith("/maker")][0]
    assert edge[1] == "urn:p:1" and edge[3].startswith("_:md")
    assert edge[4] == "bnode"
    name = [t for t in a if t[2].endswith("/name")][0]
    assert name[1] == edge[3]  # child props hang off the child node


def test_vocab_inheritance_and_multi_token_props():
    got = triples('<div itemscope itemtype="https://schema.org/P" '
                  'itemid="urn:p:1"><div itemprop="part" itemscope '
                  'itemid="urn:c:1"><span itemprop="a b">x</span>'
                  '</div></div>')
    preds = sorted(p for s, p, *_ in got if s == "urn:c:1")
    # typeless child scope inherits https://schema.org/ for its props
    assert preds == ["https://schema.org/a", "https://schema.org/b"]


def test_entity_decode_and_whitespace_squash():
    got = triples('<div itemscope itemtype="https://schema.org/P" '
                  'itemid="urn:p:1"><span itemprop="name"> a &amp;b '
                  '\n &lt;c&gt; </span></div>')
    assert got[1][2] == "a &b <c>"


def test_orphan_prop_stray_close_unclosed_scope():
    # itemprop outside any scope emits nothing; stray </b> ignored;
    # unclosed text prop finalizes at EOF
    got = triples('<p itemprop="x">orphan</p></b>'
                  '<div itemscope itemtype="https://schema.org/P" '
                  'itemid="urn:p:1"><span itemprop="name">tail')
    assert got == [
        ("urn:p:1", RDF_TYPE, "https://schema.org/P", "iri", None),
        ("urn:p:1", "https://schema.org/name", "tail", "literal",
         XSD_S),
    ]


def test_multiple_types_first_sets_vocab():
    got = triples('<div itemscope itemtype="http://v.org/ns#A '
                  'http://w.org/B" itemscope itemid="urn:x:1">'
                  '<span itemprop="p">v</span></div>')
    assert ("urn:x:1", RDF_TYPE, "http://v.org/ns#A", "iri", None) in got
    assert ("urn:x:1", RDF_TYPE, "http://w.org/B", "iri", None) in got
    assert got[-1][1] == "http://v.org/ns#p"


def test_helpers():
    assert _vocab_of_type("https://schema.org/Product") == \
        "https://schema.org/"
    assert _vocab_of_type("http://v.org/ns#T") == "http://v.org/ns#"
    assert _vocab_of_type("urn:x") is None
    assert _resolve_ref(URL, "urn:a:b") == "urn:a:b"
    assert _resolve_ref(URL, "//c.org/p") == "http://c.org/p"
    assert _resolve_ref(URL, "") == URL
    assert _resolve_ref(URL, "q#frag") == "http://h.example.org/d/q"


# ------------------------------------------------------------- spark

def test_microdata_triples_end_to_end(spark):
    pages = spark.createDataFrame(
        [("http://a.org/1", None,
          b'<div itemscope itemtype="https://schema.org/P" '
          b'itemid="urn:1"><meta itemprop="k" content="v"></div>',
          None, "en"),
         ("http://a.org/2", None, b"<p>no markup at all</p>", None,
          "en"),
         ("http://a.org/3", None, None, None, "en")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    out = microdata_triples(pages).collect()
    assert {(r.url, r.subj, r.pred, r.obj, r.obj_kind, r.obj_datatype)
            for r in out} == {
        ("http://a.org/1", "urn:1", RDF_TYPE, "https://schema.org/P",
         "iri", None),
        ("http://a.org/1", "urn:1", "https://schema.org/k", "v",
         "literal", XSD_S),
    }
