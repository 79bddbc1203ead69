"""Embedded JSON-LD -> triples: the schema.org structured-data path.

Real-world web KG construction gets most of its high-precision triples
not from <table> elements but from ``<script type="application/ld+json">``
blocks (schema.org markup: products, organizations, articles, events).
The reference has no equivalent (csvweb is CSV/metadata only); this
module extends the same (subj, pred, obj, obj_kind, obj_datatype,
obj_lang) quad shape the CSVW converter emits
(operators/triples.py:TRIPLES_SCHEMA) to the embedded-JSON-LD payload,
so downstream linking / canonicalization / entailment consume both
sources uniformly.

Two stages, matching the engine's Python-budget rule (SURVEY.md §4.2):

1. **Block extraction is pure JVM** - regexp_extract_all over the html
   column finds the script bodies; pages without a JSON-LD block are
   dropped before any Python runs, so at crawl scale (a few % of pages
   carry markup) the expensive stage sees only the relevant rows.
2. **Parsing is one Arrow-batched mapInPandas** over (url, block) rows
   - C-speed ``json.loads`` + an iterative node walk; never per-row
   Python UDFs.

Supported JSON-LD subset (the schema.org publishing profile):

* ``@context`` as a string base ("https://schema.org") or a dict with
  ``@vocab``; terms expand to ``vocab + '/' + term`` (any trailing
  '/' or '#' on the vocab is respected).  No term-map contexts.
* ``@graph`` arrays, top-level arrays, nested node objects.
* ``@id`` nodes -> IRIs; id-less nested nodes get DETERMINISTIC blank
  node labels ``_:jl{sha1(url)[:10]}n{preorder}`` (stable across runs
  and resumable batches - same page bytes, same labels).
* ``@type`` (string or list) -> rdf:type triples with the expanded
  class IRI.
* scalar values -> typed literals (bool -> xsd:boolean, int ->
  xsd:integer, float -> xsd:double, str -> xsd:string); ``@value``
  objects carry an explicit ``@type`` datatype or ``@language`` tag.
* arrays fan out one triple per element.
* malformed JSON or non-object payloads are skipped (crawl reality:
  broken markup abounds; an optional `strict` flag raises instead).
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

_SCRIPT_RE = (r"(?is)<script[^>]*type\s*=\s*[\"']application/ld\+json[\"']"
              r"[^>]*>(.*?)</script>")

JSONLD_TRIPLES_SCHEMA = ("url string, subj string, pred string, obj string, "
                         "obj_kind string, obj_datatype string, "
                         "obj_lang string")


def _vocab_of(ctx) -> str | None:
    """Base vocabulary IRI from a string/@vocab context (subset)."""
    if isinstance(ctx, str):
        return ctx
    if isinstance(ctx, dict):
        v = ctx.get("@vocab")
        if isinstance(v, str):
            return v
    return None


def _expand(term: str, vocab: str | None) -> str:
    """Expand a term against the vocabulary: absolute IRIs pass
    through; otherwise vocab + '/' + term (vocab's own trailing
    '/'/'#' respected).  No vocab -> the bare term (still a join key,
    just not dereferenceable)."""
    if ":" in term and "://" in term:
        return term
    if not vocab:
        return term
    if vocab.endswith(("/", "#")):
        return vocab + term
    return vocab + "/" + term


def _literal(value, url: str, subj: str, pred: str, out: list) -> None:
    if isinstance(value, bool):
        out.append((url, subj, pred, "true" if value else "false",
                    "literal", XSD + "boolean", None))
    elif isinstance(value, int):
        out.append((url, subj, pred, str(value),
                    "literal", XSD + "integer", None))
    elif isinstance(value, float):
        out.append((url, subj, pred, repr(value),
                    "literal", XSD + "double", None))
    elif isinstance(value, str):
        out.append((url, subj, pred, value,
                    "literal", XSD + "string", None))
    # None / unsupported scalar: no triple


def _walk_page(url: str, blocks: list[str], strict: bool) -> list[tuple]:
    """All triples of one page's JSON-LD blocks.  Node numbering for
    blank labels is a single preorder counter across the page's blocks
    so labels are unique per page and deterministic."""
    out: list[tuple] = []
    page_tag = hashlib.sha1(url.encode()).hexdigest()[:10]
    counter = [0]

    def node_subj(node: dict, vocab) -> str:
        nid = node.get("@id")
        if isinstance(nid, str) and nid:
            return _expand(nid, vocab) if "://" not in nid else nid
        counter[0] += 1
        return f"_:jl{page_tag}n{counter[0]}"

    def walk(node: dict, vocab) -> str:
        ctx = node.get("@context")
        if ctx is not None:
            v = _vocab_of(ctx)
            if v is not None:
                vocab = v
        subj = node_subj(node, vocab)
        types = node.get("@type")
        if isinstance(types, str):
            types = [types]
        if isinstance(types, list):
            for t in types:
                if isinstance(t, str):
                    out.append((url, subj, RDF_TYPE, _expand(t, vocab),
                                "iri", None, None))
        for key, raw in node.items():
            if key.startswith("@"):
                continue
            pred = _expand(key, vocab)
            values = raw if isinstance(raw, list) else [raw]
            for v in values:
                if isinstance(v, dict):
                    if "@value" in v:
                        lex = v["@value"]
                        dt = v.get("@type")
                        lang = v.get("@language")
                        if lang:
                            out.append((url, subj, pred, str(lex),
                                        "literal", None, lang))
                        elif dt:
                            out.append((url, subj, pred, str(lex),
                                        "literal", _expand(dt, vocab), None))
                        else:
                            _literal(lex, url, subj, pred, out)
                    else:
                        child = walk(v, vocab)
                        out.append((url, subj, pred, child,
                                    "iri" if not child.startswith("_:")
                                    else "bnode", None, None))
                else:
                    _literal(v, url, subj, pred, out)
        return subj

    for block in blocks:
        try:
            doc = json.loads(block)
        except ValueError:
            if strict:
                raise
            continue
        roots = doc if isinstance(doc, list) else [doc]
        for root in roots:
            if not isinstance(root, dict):
                if strict:
                    raise ValueError(f"JSON-LD root is not an object: {url}")
                continue
            graph = root.get("@graph")
            if isinstance(graph, list):
                vocab = _vocab_of(root.get("@context"))
                for n in graph:
                    if isinstance(n, dict):
                        # graph nodes inherit the envelope context
                        merged = dict(n)
                        if "@context" not in merged and vocab is not None:
                            merged["@context"] = vocab
                        walk(merged, vocab)
            else:
                walk(root, None)
    return out


def jsonld_triples(pages: DataFrame, url_col: str = "url",
                   html_col: str = "html",
                   strict: bool = False) -> DataFrame:
    """Quads from every embedded JSON-LD block of every page.

    Scale shape: JVM regex prunes to pages that actually carry a
    ``<script type="application/ld+json">`` block (crawl reality: a
    few %), THEN one Arrow-batched mapInPandas parses the survivors -
    json.loads + dict walk, no per-row Python.  Output is the engine
    quad shape minus row (url, subj, pred, obj, obj_kind,
    obj_datatype, obj_lang), ready for linking / canonicalization /
    entailment.  Blank-node labels are deterministic per page bytes,
    so re-running a failed partition emits identical rows (resumable
    sink safe)."""
    html_str = F.col(html_col).cast("string")
    blocks = F.regexp_extract_all(html_str, F.lit(_SCRIPT_RE), 1)
    staged = (pages
              .where(F.col(html_col).isNotNull())
              .select(F.col(url_col).alias("url"), blocks.alias("_blocks"))
              .where(F.size("_blocks") > 0))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "subj", "pred", "obj", "obj_kind", "obj_datatype",
                "obj_lang"]
        for pdf in batches:
            rows: list[tuple] = []
            for url, blks in zip(pdf["url"], pdf["_blocks"]):
                rows.extend(_walk_page(url, list(blks), strict))
            yield pd.DataFrame(rows, columns=cols)

    return staged.mapInPandas(parse, JSONLD_TRIPLES_SCHEMA)


def jsonld_pages_from_table(df: DataFrame, url_template: str,
                            node_template: str, key_col: str) -> DataFrame:
    """Render one HTML page per row of `df` whose body embeds one
    JSON-LD script: ``node_template.format(**row)`` must yield the
    JSON text.  Distributed applyInPandas like
    weblinks.link_pages_from_table; lets the DuckDB oracle recompute
    the expected triples relationally from the same rows."""
    from .pages import PAGES_SCHEMA

    def make_pages(key, pdf: pd.DataFrame) -> pd.DataFrame:
        urls, htmls = [], []
        for row in pdf.sort_values(key_col, kind="mergesort") \
                      .to_dict("records"):
            body = ('<script type="application/ld+json">'
                    + node_template.format(**row) + "</script>")
            urls.append(url_template.format(**row))
            htmls.append(
                f"<html><head>{body}</head><body>x</body></html>".encode())
        return pd.DataFrame({
            "url": urls,
            "warc_ts": [pd.Timestamp("2026-01-01")] * len(urls),
            "html": htmls,
            "text": [None] * len(urls),
            "lang": ["en"] * len(urls),
        })

    return df.groupBy(key_col).applyInPandas(make_pages, PAGES_SCHEMA)
