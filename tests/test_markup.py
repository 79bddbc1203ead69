"""Structured-data channel fusion (sources/markup.py)."""

import pytest

from csvweb_spark.sources.markup import (XSD_STRING, fuse_markup_triples,
                                         markup_triples,
                                         normalize_plain_literals)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, None, h.encode(), None, "en") for u, h in rows],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")


#: same entity, same name fact in all three channels; one extra fact
#: per channel so single-channel provenance is visible too
_TRIPLE_PAGE = (
    '<script type="application/ld+json">'
    '{"@context": "https://schema.org",'
    ' "@id": "http://ex.org/e1", "@type": "Thing",'
    ' "name": "Widget", "identifier": 7}</script>'
    '<div itemscope itemtype="https://schema.org/Thing" '
    'itemid="http://ex.org/e1">'
    '<span itemprop="name">Widget</span>'
    '<meta itemprop="sku" content="W-7"></div>'
    '<div vocab="https://schema.org/" about="http://ex.org/e1" '
    'typeof="Thing"><span property="name">Widget</span>'
    '<span property="slogan" lang="en">buy it</span></div>')


def test_fuse_cross_channel_agreement(spark):
    pages = _pages(spark, [("http://a.example/", _TRIPLE_PAGE)])
    fused = {(r.pred, r.obj): (r.channels, r.n_channels)
             for r in fuse_markup_triples(pages).collect()}
    name = fused[("https://schema.org/name", "Widget")]
    assert name == ("jsonld,microdata,rdfa", 3)
    typ = fused[("http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                 "https://schema.org/Thing")]
    assert typ == ("jsonld,microdata,rdfa", 3)
    assert fused[("https://schema.org/identifier", "7")] == ("jsonld", 1)
    assert fused[("https://schema.org/sku", "W-7")] == ("microdata", 1)
    assert fused[("https://schema.org/slogan", "buy it")] == ("rdfa", 1)


def test_fuse_lang_tagged_literal_not_stringified(spark):
    pages = _pages(spark, [("http://a.example/", _TRIPLE_PAGE)])
    rows = {r.pred: r for r in fuse_markup_triples(pages).collect()}
    slogan = rows["https://schema.org/slogan"]
    assert slogan.obj_lang == "en" and slogan.obj_datatype is None
    name = rows["https://schema.org/name"]
    assert name.obj_datatype == XSD_STRING and name.obj_lang is None


def test_fuse_blank_nodes_stay_channel_scoped(spark):
    # id-less nodes in two channels must NOT merge even though both
    # assert the same property/value shape
    html = ('<script type="application/ld+json">'
            '{"@context": "https://schema.org",'
            ' "name": "Anon"}</script>'
            '<div itemscope itemtype="https://schema.org/Thing">'
            '<span itemprop="name">Anon</span></div>')
    pages = _pages(spark, [("http://b.example/", html)])
    rows = [r for r in fuse_markup_triples(pages).collect()
            if r.pred == "https://schema.org/name"]
    assert len(rows) == 2
    assert all(r.n_channels == 1 for r in rows)
    labels = sorted(r.subj[:4] for r in rows)
    assert labels == ["_:jl", "_:md"]


def test_markup_triples_channel_column_and_selection(spark):
    pages = _pages(spark, [("http://a.example/", _TRIPLE_PAGE)])
    only = markup_triples(pages, channels=("rdfa",))
    chans = {r.channel for r in only.collect()}
    assert chans == {"rdfa"}


def test_markup_triples_rejects_unknown_channel(spark):
    pages = _pages(spark, [("http://a.example/", _TRIPLE_PAGE)])
    with pytest.raises(ValueError, match="unknown markup channel"):
        markup_triples(pages, channels=("jsonld", "opengraph"))
    with pytest.raises(ValueError, match="at least one"):
        markup_triples(pages, channels=())


def test_normalize_plain_literals_is_rdf11(spark):
    df = spark.createDataFrame(
        [("u", "s", "p", "x", "literal", None, None),
         ("u", "s", "p", "x", "literal", None, "en"),
         ("u", "s", "p", "x", "iri", None, None),
         ("u", "s", "p", "1", "literal",
          "http://www.w3.org/2001/XMLSchema#integer", None)],
        "url string, subj string, pred string, obj string, "
        "obj_kind string, obj_datatype string, obj_lang string")
    out = normalize_plain_literals(df).collect()
    dts = [r.obj_datatype for r in out]
    assert dts[0] == XSD_STRING          # plain literal -> xsd:string
    assert dts[1] is None                # lang-tagged stays untyped
    assert dts[2] is None                # IRIs untouched
    assert dts[3].endswith("integer")    # typed literal untouched
