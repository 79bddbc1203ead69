"""Pluggable table/metadata resolution + single-URL conversion.

Reference surface: ITableResolver (ITableResolver.cs:11-20) with
DefaultResolver (DefaultResolver.cs:24-39) fetching over HTTP, and the
metadata discovery loop in Rdf/Converter.cs:141-207 (ConvertAsync(Uri)).
At corpus scale the repo re-expresses discovery as a deterministic
key-derivation join against a metadata sidecar table
(operators/triples.py join_metadata_sidecar); THIS module is the
user-facing single-URL path: a user who wants to convert one arbitrary
URL plugs in a resolver (HTTP, filesystem, dict/test fixture) and gets
the reference's ConvertAsync behavior.

No resolver here performs network IO -- the sandbox has none -- but the
protocol is exactly the reference's: `resolve(url) -> text` for tabular
payloads, `resolve_json(url) -> dict` for metadata, plus an optional
`link_header(url)` hook standing in for the HTTP `Link:` response header
the reference inspects first.

Discovery order (Rdf/Converter.cs:141-207):
  1. Link header with rel="describedby" (csvm+json / ld+json types);
  2. the /.well-known/csvm URI-template list (default when absent:
     "{+url}-metadata.json" then "csv-metadata.json", per the CSVW spec);
  3. no metadata found -> convert the bare CSV with an inferred schema
     (header names, string columns) exactly like the reference's
     default-metadata fallback.
"""

from __future__ import annotations

import re
from typing import Callable, Optional

from ..csvw.convert import MODE_MINIMAL, ConversionResult, PageConverter
from ..csvw.model import Table
from ..csvw.parse_meta import MetadataParseError, parse_metadata
from ..testing.turtle import urljoin

DEFAULT_CSVM_TEMPLATES = ["{+url}-metadata.json", "csv-metadata.json"]


class DictResolver:
    """Resolver over an in-memory {url: text} mapping (tests, pre-crawled
    page sets). JSON urls are parsed on demand; `links` optionally maps a
    csv url to its Link-header string."""

    def __init__(self, pages: dict, links: Optional[dict] = None):
        self.pages = pages
        self.links = links or {}

    def resolve(self, url: str) -> Optional[str]:
        return self.pages.get(url)

    def resolve_json(self, url: str) -> Optional[dict]:
        import json
        text = self.pages.get(url)
        if text is None:
            return None
        try:
            return json.loads(text)
        except ValueError:
            return None

    def link_header(self, url: str) -> Optional[str]:
        return self.links.get(url)


class FileResolver:
    """Resolver mapping a URL prefix onto a directory tree (the shape of
    the W3C suite checkout and any local crawl mirror)."""

    def __init__(self, root: str, base_url: str):
        self.root = root
        self.base_url = base_url.rstrip("/") + "/"

    def _path(self, url: str) -> Optional[str]:
        import os
        if not url.startswith(self.base_url):
            return None
        rel = url[len(self.base_url):].split("?")[0].split("#")[0]
        # containment check: a crafted '..%2F'-style relative part must not
        # escape the resolver root (untrusted URLs reach resolvers through
        # crawl frontiers)
        root = os.path.realpath(self.root)
        p = os.path.realpath(os.path.join(root, rel))
        if p != root and not p.startswith(root + os.sep):
            return None
        return p if os.path.isfile(p) else None

    def resolve(self, url: str) -> Optional[str]:
        p = self._path(url)
        if p is None:
            return None
        with open(p, encoding="utf-8-sig", newline="") as f:
            return f.read()

    def resolve_json(self, url: str) -> Optional[dict]:
        import json
        text = self.resolve(url)
        return json.loads(text) if text is not None else None

    def link_header(self, url: str) -> Optional[str]:
        return None


class HttpResolver:
    """urllib-based live resolver - the reference's DefaultResolver
    (DefaultResolver.cs:24-39, HttpClient GETs) for the single-URL path.

    * `resolve` GETs the table URL and decodes by the response charset
      (default utf-8; a UTF-8 BOM is stripped like the C# StreamReader);
    * `resolve_json` sends the reference's Accept negotiation
      (application/csvm+json;q=0.9, application/json;q=0.8,
      DefaultResolver.cs:33-35) and parses leniently (BOM/trailing
      commas, like the fixture loader);
    * `link_header` surfaces the HTTP `Link:` response header for the
      discovery loop - served from the response cache when the URL was
      already fetched, else via a HEAD request.

    404/410/... resolve to None (the discovery loop's 'not found' signal);
    transport errors (DNS, refused, timeout) raise - callers must see the
    difference between 'no metadata there' and 'network down'. The opener
    is injectable; tests drive the full protocol through a fake opener
    (no network in this sandbox)."""

    ACCEPT_JSON = "application/csvm+json;q=0.9, application/json;q=0.8"
    _NOT_FOUND = (403, 404, 405, 410, 451)

    def __init__(self, opener=None, timeout: float = 30.0,
                 user_agent: str = "csvweb-spark/1.0"):
        import urllib.request
        self._opener = opener or urllib.request.build_opener()
        self._timeout = timeout
        self._ua = user_agent
        self._headers_cache: dict = {}

    def _fetch(self, url: str, accept: Optional[str] = None,
               method: str = "GET"):
        """(bytes, headers) or None on a not-found-ish status."""
        import urllib.error
        import urllib.request
        hdrs = {"User-Agent": self._ua}
        if accept:
            hdrs["Accept"] = accept
        req = urllib.request.Request(url, headers=hdrs, method=method)
        try:
            with self._opener.open(req, timeout=self._timeout) as resp:
                headers = dict(resp.headers.items()) \
                    if hasattr(resp.headers, "items") else dict(resp.headers)
                self._headers_cache[url] = headers
                return (resp.read() if method != "HEAD" else b""), headers
        except urllib.error.HTTPError as e:
            if e.code in self._NOT_FOUND:
                return None
            raise

    @staticmethod
    def _decode(data: bytes, headers: dict) -> str:
        import re as _re
        ctype = next((v for k, v in headers.items()
                      if k.lower() == "content-type"), "")
        m = _re.search(r"charset=([A-Za-z0-9_.\-]+)", ctype)
        text = data.decode(m.group(1) if m else "utf-8", errors="replace")
        return text[1:] if text.startswith("﻿") else text

    def resolve(self, url: str) -> Optional[str]:
        got = self._fetch(url)
        if got is None:
            return None
        return self._decode(*got)

    def resolve_json(self, url: str) -> Optional[dict]:
        got = self._fetch(url, accept=self.ACCEPT_JSON)
        if got is None:
            return None
        from ..csvw.normalize_meta import load_metadata_json
        try:
            return load_metadata_json(self._decode(*got))
        except ValueError:
            return None

    def link_header(self, url: str) -> Optional[str]:
        headers = self._headers_cache.get(url)
        if headers is None:
            got = self._fetch(url, method="HEAD")
            if got is None:
                return None
            headers = got[1]
        return next((v for k, v in headers.items() if k.lower() == "link"),
                    None)


def _csvm_templates(resolver, csv_url: str) -> list[str]:
    """The /.well-known/csvm template list (one URI template per line),
    defaulting per spec when the document doesn't resolve."""
    wk = urljoin(csv_url, "/.well-known/csvm")
    text = resolver.resolve(wk)
    if not text:
        return list(DEFAULT_CSVM_TEMPLATES)
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    return lines or list(DEFAULT_CSVM_TEMPLATES)


def _describedby_targets(link_header: str) -> list[str]:
    """URLs of the Link-header entries whose OWN parameter list carries
    rel=describedby (quoted or bare). Parsing is per-entry, so a
    multi-link header like '<style.css>; rel="stylesheet", <meta.json>;
    rel="describedby"' yields only meta.json (review fix: the old code
    took the FIRST <...> url and substring-checked the whole header)."""
    out = []
    for m in re.finditer(r"<([^>]+)>((?:\s*;[^,<]*)*)", link_header):
        params = m.group(2) or ""
        if re.search(r'rel\s*=\s*"?describedby"?', params, re.I):
            out.append(m.group(1))
    return out


def _metadata_references(text: str, metadata_url: str, csv_url: str) -> bool:
    """CSVW discovery rule: metadata located via Link header or the csvm
    templates is only used when it actually DESCRIBES the tabular file -
    some table's url must resolve to csv_url against the metadata's own
    base (review fix: a stale csv-metadata.json describing other files
    was adopted wholesale). Unparseable candidates are treated as
    non-referencing."""
    import json
    try:
        obj = json.loads(text)
    except ValueError:
        return False
    if not isinstance(obj, dict):
        return False
    tables = obj.get("tables")
    urls = []
    if isinstance(tables, list):
        urls = [t.get("url") for t in tables if isinstance(t, dict)]
    elif "url" in obj:
        urls = [obj.get("url")]
    return any(isinstance(u, str)
               and urljoin(metadata_url, u) == csv_url for u in urls)


def locate_metadata(resolver, csv_url: str) -> Optional[tuple[str, str]]:
    """Discovery loop (Rdf/Converter.cs:141-207): returns
    (metadata_url, metadata_text) or None. Candidates that resolve but do
    not reference csv_url are skipped (the spec's 'ignore and continue'
    rule), falling through to the next candidate / default conversion."""
    link = getattr(resolver, "link_header", lambda _u: None)(csv_url)
    if link:
        for target in _describedby_targets(link):
            murl = urljoin(csv_url, target)
            text = resolver.resolve(murl)
            if text is not None and _metadata_references(text, murl, csv_url):
                return murl, text
    base = csv_url.split("?")[0]
    for tpl in _csvm_templates(resolver, csv_url):
        # expand the {+url}/{url} variables FIRST, then resolve a
        # relative template against the csv's base (round-2 review fix:
        # the expansion was discarded for relative templates, probing the
        # literal placeholder URL)
        cand = tpl.replace("{+url}", csv_url).replace("{url}", csv_url)
        if not tpl.startswith("{"):
            cand = urljoin(base, cand)
        text = resolver.resolve(cand)
        if text is not None and _metadata_references(text, cand, csv_url):
            return cand, text
    return None


def _json_resolver_of(resolver) -> Callable[[str], dict]:
    def resolve_json(url: str) -> dict:
        obj = resolver.resolve_json(url)
        if obj is None:
            raise MetadataParseError(f"Cannot resolve {url}")
        return obj
    return resolve_json


def convert_url(csv_url: str, resolver, mode: str = MODE_MINIMAL,
                uri_escaping: str = "reference") -> ConversionResult:
    """The reference's ConvertAsync(Uri sourceUri) re-expressed over a
    pluggable resolver: discover metadata, resolve every table payload,
    convert. Falls back to an inferred single-table schema when no
    metadata is found (default-metadata path)."""
    found = locate_metadata(resolver, csv_url)
    conv = PageConverter(mode=mode, uri_escaping=uri_escaping)
    if found is not None:
        murl, mtext = found
        group = parse_metadata(mtext, murl,
                               json_resolver=_json_resolver_of(resolver))
        texts = {}
        for t in group.tables:
            text = resolver.resolve(t.url)
            if text is None:
                raise MetadataParseError(f"Cannot resolve table {t.url}")
            texts[t.url] = text
        return conv.convert_table_group(group, texts)
    text = resolver.resolve(csv_url)
    if text is None:
        raise MetadataParseError(f"Cannot resolve {csv_url}")
    table = Table(url=csv_url)  # inferred header schema, string columns
    return conv.convert_table(table, text)
