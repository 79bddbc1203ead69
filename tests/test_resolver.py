"""Pluggable resolver + single-URL conversion (reference surface:
ITableResolver.cs + ConvertAsync(Uri) discovery, Rdf/Converter.cs:141-207).
Pure-Python tests (no Spark session)."""

import pytest

from csvweb_spark.csvw.parse_meta import MetadataParseError
from csvweb_spark.sources.resolver import (
    DictResolver, FileResolver, HttpResolver, convert_url, locate_metadata)

CSV_URL = "http://ex.org/data/countries.csv"
CSV_TEXT = "code,name\nAD,Andorra\nAE,United Arab Emirates\n"
META = """{
  "@context": "http://www.w3.org/ns/csvw",
  "url": "countries.csv",
  "tableSchema": {
    "aboutUrl": "http://ex.org/c/{code}",
    "columns": [
      {"name": "code", "propertyUrl": "http://ex.org/def/code"},
      {"name": "name", "propertyUrl": "http://ex.org/def/name"}
    ]
  }
}"""


def test_sidecar_metadata_discovery_and_convert():
    r = DictResolver({CSV_URL: CSV_TEXT, CSV_URL + "-metadata.json": META})
    found = locate_metadata(r, CSV_URL)
    assert found is not None and found[0] == CSV_URL + "-metadata.json"
    res = convert_url(CSV_URL, r)
    trip = {(t.subj, t.pred, t.obj) for t in res.triples}
    assert ("http://ex.org/c/AD", "http://ex.org/def/name", "Andorra") in trip
    assert len(res.triples) == 4
    assert res.errors == []


def test_link_header_takes_precedence():
    r = DictResolver(
        {CSV_URL: CSV_TEXT,
         "http://ex.org/data/linked.json": META,
         CSV_URL + "-metadata.json": '{"url": "countries.csv"}'},
        links={CSV_URL: '<linked.json>; rel="describedby"; '
                        'type="application/csvm+json"'})
    found = locate_metadata(r, CSV_URL)
    assert found[0] == "http://ex.org/data/linked.json"


def test_wellknown_csvm_template_override():
    r = DictResolver({
        CSV_URL: CSV_TEXT,
        "http://ex.org/.well-known/csvm": "{+url}.desc.json\n",
        CSV_URL + ".desc.json": META,
    })
    found = locate_metadata(r, CSV_URL)
    assert found[0] == CSV_URL + ".desc.json"


def test_bare_csv_inferred_schema():
    r = DictResolver({CSV_URL: CSV_TEXT})
    assert locate_metadata(r, CSV_URL) is None
    res = convert_url(CSV_URL, r)
    # inferred columns: predicate = url#<header-name>, subjects are bnodes
    preds = {t.pred for t in res.triples}
    assert preds == {CSV_URL + "#code", CSV_URL + "#name"}
    assert len(res.triples) == 4


def test_unresolvable_raises():
    r = DictResolver({})
    with pytest.raises(MetadataParseError):
        convert_url("http://nowhere.example/x.csv", r)


def test_file_resolver(tmp_path):
    (tmp_path / "d").mkdir()
    (tmp_path / "d" / "t.csv").write_text("a,b\n1,2\n")
    (tmp_path / "d" / "t.csv-metadata.json").write_text(
        '{"@context": "http://www.w3.org/ns/csvw", "url": "t.csv"}')
    r = FileResolver(str(tmp_path), "http://ex.org")
    url = "http://ex.org/d/t.csv"
    assert r.resolve(url).startswith("a,b")
    res = convert_url(url, r)
    assert len(res.triples) == 2


def test_file_resolver_blocks_path_traversal(tmp_path):
    """A crafted '../' relative part must not escape the resolver root
    (resolvers can be fed untrusted crawl-frontier URLs)."""
    root = tmp_path / "root"
    root.mkdir()
    (root / "ok.csv").write_text("a\n1\n")
    (tmp_path / "secret.txt").write_text("outside")
    r = FileResolver(str(root), "http://ex.org")
    assert r.resolve("http://ex.org/ok.csv").startswith("a")
    assert r.resolve("http://ex.org/../secret.txt") is None
    assert r.resolve("http://ex.org/a/../../secret.txt") is None


class _FakeResponse:
    def __init__(self, body: bytes, headers: dict):
        self._body = body
        self.headers = headers

    def read(self):
        return self._body

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeOpener:
    """Stands in for urllib's opener: serves {url: (bytes, headers)},
    404s everything else, and records requests for protocol assertions."""

    def __init__(self, pages: dict):
        self.pages = pages
        self.requests = []

    def open(self, req, timeout=None):
        import urllib.error
        self.requests.append((req.get_method(), req.full_url,
                              dict(req.header_items())))
        if req.full_url not in self.pages:
            raise urllib.error.HTTPError(req.full_url, 404, "nf", {}, None)
        body, headers = self.pages[req.full_url]
        return _FakeResponse(b"" if req.get_method() == "HEAD" else body,
                             headers)


def test_http_resolver_protocol_and_discovery():
    """HttpResolver drives the full discovery loop (Link header ->
    {+url}-metadata.json -> csv-metadata.json) through a mocked opener:
    charset decode, BOM strip, Accept negotiation, 404-as-None."""
    csv_url = "http://ex.org/d/t.csv"
    meta_url = "http://ex.org/d/t.csv-metadata.json"
    opener = _FakeOpener({
        csv_url: ("﻿a,b\n1,2\n".encode("utf-8"),
                  {"Content-Type": "text/csv; charset=utf-8",
                   "Link": f'<{meta_url}>; rel="describedby"; '
                           f'type="application/csvm+json"'}),
        meta_url: ((b'{"@context": "http://www.w3.org/ns/csvw", '
                    b'"url": "t.csv",}'),  # trailing comma: lenient parse
                   {"Content-Type": "application/csvm+json"}),
    })
    r = HttpResolver(opener=opener)
    text = r.resolve(csv_url)
    assert text.startswith("a,b")  # BOM stripped, charset honored
    # Link header comes from the cached GET response - no extra request
    n_before = len(opener.requests)
    assert 'rel="describedby"' in r.link_header(csv_url)
    assert len(opener.requests) == n_before
    meta = r.resolve_json(meta_url)
    assert meta["url"] == "t.csv"
    # the reference's Accept negotiation (DefaultResolver.cs:33-35)
    m, u, h = opener.requests[-1]
    assert u == meta_url and "csvm+json;q=0.9" in h.get("Accept", "")
    assert r.resolve_json("http://ex.org/missing.json") is None
    # end-to-end: convert_url over the live-protocol resolver
    res = convert_url(csv_url, r)
    assert len(res.triples) == 2
    # transport errors are NOT swallowed into 'no metadata'
    import urllib.error

    class _DownOpener(_FakeOpener):
        def open(self, req, timeout=None):
            raise urllib.error.HTTPError(req.full_url, 503, "down", {}, None)

    with pytest.raises(urllib.error.HTTPError):
        HttpResolver(opener=_DownOpener({})).resolve(csv_url)


def test_multi_link_header_picks_the_describedby_entry():
    """A Link header with several entries must resolve the URL whose OWN
    params carry rel=describedby, not the first <...> in the header."""
    r = DictResolver(
        {CSV_URL: CSV_TEXT, "http://ex.org/data/meta.json": META},
        links={CSV_URL: '<style.css>; rel="stylesheet", '
                        '<meta.json>; rel=describedby; '
                        'type="application/csvm+json"'})
    found = locate_metadata(r, CSV_URL)
    assert found is not None and found[0] == "http://ex.org/data/meta.json"


def test_non_referencing_metadata_is_skipped():
    """Discovery rule: metadata that does not reference the tabular file
    is ignored - conversion falls back to the inferred default schema
    instead of converting an unrelated table group."""
    other_meta = META.replace("countries.csv", "other.csv")
    r = DictResolver({
        CSV_URL: CSV_TEXT,
        "http://ex.org/data/other.csv": "code,name\nZZ,Nowhere\n",
        "http://ex.org/data/csv-metadata.json": other_meta,
    })
    assert locate_metadata(r, CSV_URL) is None
    res = convert_url(CSV_URL, r)
    objs = {t.obj for t in res.triples}
    assert "Andorra" in objs          # converted THE REQUESTED csv
    assert "Nowhere" not in objs      # not the unrelated table group
