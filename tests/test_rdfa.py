"""RDFa-Lite extraction (sources/rdfa.py): kernel walker semantics +
the Spark quad surface."""

import pandas as pd
import pytest

from csvweb_spark.sources.rdfa import (_walk_page, rdfa_triples,
                                       rdfa_pages_from_table)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"
URL = "http://ex.org/page"


def walk(body: str, url: str = URL):
    return _walk_page(url, f"<html><body>{body}</body></html>")


def test_page_is_initial_subject_og_meta():
    # OpenGraph head markup without about/typeof describes the page
    t = _walk_page(URL, '<html><head><meta property="og:title" '
                        'content="My &amp; Page"></head></html>')
    assert t == [(URL, URL, "http://ogp.me/ns#title", "My & Page",
                  "literal", XSD + "string", None)]


def test_vocab_typeof_about_and_text_property():
    t = walk('<div vocab="https://schema.org/" about="#a" '
             'typeof="Person"><span property="name">Al  ice</span></div>')
    assert (URL, URL + "#a", RDF_TYPE, "https://schema.org/Person",
            "iri", None, None) in t
    assert (URL, URL + "#a", "https://schema.org/name", "Al ice",
            "literal", XSD + "string", None) in t


def test_prefix_declaration_shadows_and_inherits():
    t = walk('<div prefix="ex: http://e1/ " about="#s">'
             '<span property="ex:p">v1</span>'
             '<div prefix="ex: http://e2/">'
             '<span property="ex:p">v2</span></div></div>')
    preds = {(x[2], x[3]) for x in t}
    assert ("http://e1/p", "v1") in preds
    assert ("http://e2/p", "v2") in preds


def test_href_src_resource_objects_resolve_with_fragments():
    t = walk('<div vocab="https://schema.org/" about="#s">'
             '<a property="url" href="/x#frag">l</a>'
             '<img property="image" src="img.png">'
             '<link property="sameAs" resource="http://o.org/s">'
             '</div>')
    objs = {x[2].rsplit("/", 1)[-1]: (x[3], x[4]) for x in t}
    assert objs["url"] == ("http://ex.org/x#frag", "iri")
    assert objs["image"] == ("http://ex.org/img.png", "iri")
    assert objs["sameAs"] == ("http://o.org/s", "iri")


def test_chaining_property_typeof_mints_deterministic_bnode():
    body = ('<div vocab="https://schema.org/" about="#s">'
            '<div property="knows" typeof="Person">'
            '<span property="name">Carol</span></div></div>')
    t1, t2 = walk(body), walk(body)
    assert t1 == t2  # same bytes -> same blank labels
    edge = [x for x in t1 if x[2].endswith("/knows")][0]
    assert edge[4] == "bnode" and edge[3].startswith("_:ra")
    assert (URL, edge[3], RDF_TYPE, "https://schema.org/Person",
            "iri", None, None) in t1
    assert (URL, edge[3], "https://schema.org/name", "Carol",
            "literal", XSD + "string", None) in t1


def test_property_typeof_resource_types_the_iri_object():
    t = walk('<div vocab="https://schema.org/" about="#s">'
             '<div property="brand" typeof="Brand" '
             'resource="http://b.org/x">'
             '<span property="name">B</span></div></div>')
    assert (URL, URL + "#s", "https://schema.org/brand",
            "http://b.org/x", "iri", None, None) in t
    assert (URL, "http://b.org/x", RDF_TYPE,
            "https://schema.org/Brand", "iri", None, None) in t
    assert (URL, "http://b.org/x", "https://schema.org/name", "B",
            "literal", XSD + "string", None) in t


def test_datatype_lang_and_empty_datatype():
    t = walk('<div vocab="https://schema.org/" about="#s">'
             '<span property="age" datatype="xsd:integer">30</span>'
             '<span property="nick" lang="fr">Ali</span>'
             '<span property="raw" datatype="" lang="fr">x</span>'
             '</div>')
    by = {x[2].rsplit("/", 1)[-1]: x for x in t}
    assert by["age"][5] == XSD + "integer" and by["age"][6] is None
    assert by["nick"][5] is None and by["nick"][6] == "fr"
    # datatype="" forces plain string and suppresses lang
    assert by["raw"][5] == XSD + "string" and by["raw"][6] is None


def test_lang_inherits_and_is_overridable():
    t = walk('<div vocab="https://schema.org/" about="#s" lang="de">'
             '<span property="a">x</span>'
             '<span property="b" lang="en">y</span></div>')
    by = {x[2].rsplit("/", 1)[-1]: x[6] for x in t}
    assert by == {"a": "de", "b": "en"}


def test_unknown_prefix_and_no_vocab_terms_drop():
    t = walk('<div about="#s"><span property="name">x</span>'
             '<span property="zz:p">y</span></div>')
    assert t == []


def test_content_attr_beats_text_and_typeof_fanout():
    t = walk('<div vocab="https://schema.org/" typeof="A B" about="#s">'
             '<span property="name" content="meta">text</span></div>')
    types = sorted(x[3] for x in t if x[2] == RDF_TYPE)
    assert types == ["https://schema.org/A", "https://schema.org/B"]
    lit = [x for x in t if x[2].endswith("/name")][0]
    assert lit[3] == "meta"


def test_malformed_markup_is_lenient():
    # stray close, unclosed property element at EOF, typeof bnode
    t = _walk_page(URL, '<div vocab="https://schema.org/" about="#s">'
                        '</span><span property="name">tail text')
    assert (URL, URL + "#s", "https://schema.org/name", "tail text",
            "literal", XSD + "string", None) in t


def test_spark_surface_and_prune(spark):
    pages = spark.createDataFrame(
        pd.DataFrame({
            "url": ["http://a.org/1", "http://a.org/2"],
            "html": [b'<div vocab="https://schema.org/" about="#s">'
                     b'<span property="name">A</span></div>',
                     b"<p>no markup at all</p>"],
        }))
    out = rdfa_triples(pages)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].subj == "http://a.org/1#s"
    assert rows[0].obj_datatype == XSD + "string"
    # prune is a JVM filter before the mapInPandas
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "contains" in plan.lower()


def test_pages_from_table_renderer(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": [1, 2],
                                             "nm": ["x", "y"]}))
    pages = rdfa_pages_from_table(
        df, "http://p{k}.org/", '<div vocab="https://schema.org/" '
        'about="#s"><span property="name">{nm}</span></div>', "k")
    t = rdfa_triples(pages).orderBy("url").collect()
    assert [(r.subj, r.obj) for r in t] == [
        ("http://p1.org/#s", "x"), ("http://p2.org/#s", "y")]
