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
        p = os.path.join(self.root, rel)
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


def _csvm_templates(resolver, csv_url: str) -> list[str]:
    """The /.well-known/csvm template list (one URI template per line),
    defaulting per spec when the document doesn't resolve."""
    wk = urljoin(csv_url, "/.well-known/csvm")
    text = resolver.resolve(wk)
    if not text:
        return list(DEFAULT_CSVM_TEMPLATES)
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    return lines or list(DEFAULT_CSVM_TEMPLATES)


def locate_metadata(resolver, csv_url: str) -> Optional[tuple[str, str]]:
    """Discovery loop (Rdf/Converter.cs:141-207): returns
    (metadata_url, metadata_text) or None."""
    link = getattr(resolver, "link_header", lambda _u: None)(csv_url)
    if link:
        m = re.search(r"<([^>]+)>", link)
        # the spec (and Rdf/Converter.cs discovery) requires the
        # describedby relation; the metadata media types select among
        # multiple such links but never substitute for the rel itself
        if m and 'rel="describedby"' in link:
            murl = urljoin(csv_url, m.group(1))
            text = resolver.resolve(murl)
            if text is not None:
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
        if text is not None:
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
