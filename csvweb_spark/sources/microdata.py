"""HTML microdata (itemscope/itemprop/itemtype) -> triples.

The second structured-data channel of real crawls after embedded
JSON-LD (sources/jsonld.py): schema.org markup written as HTML
attributes instead of a script payload.  The reference has no
equivalent (csvweb is CSV/metadata only; its converter at
`src/DataDock.CsvWeb/Rdf/Converter.cs` consumes tables, never markup);
this module emits the same (url, subj, pred, obj, obj_kind,
obj_datatype, obj_lang) quad shape as the CSVW converter
(operators/triples.py:TRIPLES_SCHEMA) and the JSON-LD path, so
linking / canonicalization / entailment consume all three sources
uniformly.

Scale shape, matching the engine's Python-budget rule (SURVEY.md §4.2):

1. **Pruning is pure JVM** - a `contains(html, 'itemscope')` filter
   drops the overwhelming majority of crawl pages before any Python
   runs (markup incidence is a few %).
2. **Parsing is one Arrow-batched mapInPandas** over the survivors: a
   single compiled tag-scanner regex drives an iterative stack walk -
   C-speed `re` + list ops, never per-row Python UDFs, no shuffle.

Microdata-to-RDF subset implemented (the schema.org publishing
profile; W3C microdata-rdf draft is the semantics source):

* ``itemscope`` opens a node; ``itemid`` (absolute IRI) names it, else
  a DETERMINISTIC blank label ``_:md{sha1(url)[:10]}n{preorder}``
  (same page bytes -> same labels: resumable-sink safe).
* ``itemtype`` (space-separated) -> rdf:type triples; the FIRST type
  also sets the property vocabulary = the type IRI up to and
  including its last '/' or '#' (schema.org semantics).  Scopes
  without itemtype inherit the enclosing scope's vocabulary.
* ``itemprop`` (space-separated -> one triple per token) on a
  non-scope element takes its value from the tag-appropriate source:
  ``meta@content``; ``a/area/link@href`` and
  ``img/audio/video/embed/iframe/source/track@src`` (resolved against
  the page URL, emitted as IRIs); ``time@datetime`` /
  ``data/meter@value`` when present; otherwise the element's TEXT
  CONTENT (descendant tags stripped, the webtext entity subset
  decoded, whitespace squashed).  Text literals are xsd:string.
* ``itemprop`` + ``itemscope`` on one element -> an edge from the
  enclosing scope's subject to the new node.
* Unclosed void elements, stray close tags, and itemprops outside any
  scope are tolerated (crawl reality); they emit nothing rather than
  wrong triples.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

MICRODATA_TRIPLES_SCHEMA = ("url string, subj string, pred string, "
                            "obj string, obj_kind string, "
                            "obj_datatype string, obj_lang string")

# one tag: close-slash, name, attr soup (quote-aware), self-close slash
_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>",
    re.S)
_ATTR_RE = re.compile(
    r"([a-zA-Z][\w:.-]*)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+))?")
_ABS_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

#: HTML void elements - never pushed on the open-element stack
_VOID = frozenset({"meta", "link", "img", "br", "hr", "input", "source",
                   "area", "base", "col", "embed", "track", "wbr",
                   "param"})

#: elements whose itemprop value is an attribute, not text content
_ATTR_VALUE = {"meta": ("content", "literal"),
               "a": ("href", "iri"), "area": ("href", "iri"),
               "link": ("href", "iri"),
               "img": ("src", "iri"), "audio": ("src", "iri"),
               "video": ("src", "iri"), "embed": ("src", "iri"),
               "iframe": ("src", "iri"), "source": ("src", "iri"),
               "track": ("src", "iri")}

# the same 7-entity decode subset (and order: &amp; last) as
# webtext.html_text, so one escape pass round-trips
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
             ("&amp;", "&")]


def _unescape(s: str) -> str:
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def _parse_attrs(soup: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for name, raw in _ATTR_RE.findall(soup):
        if raw and raw[0] in "\"'" and raw[-1] == raw[0]:
            raw = raw[1:-1]
        out.setdefault(name.lower(), raw)
    return out


def _vocab_of_type(type_iri: str) -> str | None:
    """Property vocabulary of a type IRI: everything up to and
    including the last '/' or '#' (https://schema.org/Product ->
    https://schema.org/)."""
    cut = max(type_iri.rfind("/"), type_iri.rfind("#"))
    if cut <= len("https:/"):  # no path separator beyond the scheme
        return None
    return type_iri[:cut + 1]


def _expand(prop: str, vocab: str | None) -> str:
    if _ABS_RE.match(prop) and "://" in prop:
        return prop
    return (vocab + prop) if vocab else prop


def _resolve_ref(base: str, ref: str) -> str | None:
    """Python twin of the weblinks.resolve_url SUBSET needed for
    itemid/href/src values: absolute IRIs (any scheme - these are
    graph identifiers, not crawl frontier entries) pass through;
    root-relative joins the base origin; other relative refs join the
    base directory.  No dot-segment handling (markup fixtures and the
    dominant crawl shapes don't use ../ in item references; weblinks
    covers the crawler-side semantics)."""
    ref = ref.strip().split("#", 1)[0]
    if not ref:
        return base.split("#", 1)[0]
    if _ABS_RE.match(ref):
        return ref
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+)", base)
    if not m:
        return None
    origin = m.group(1)
    if ref.startswith("//"):
        return base.split(":", 1)[0] + ":" + ref
    if ref.startswith("/"):
        return origin + ref
    base_noq = base.split("#", 1)[0].split("?", 1)[0]
    path = base_noq[len(origin):]
    base_dir = path[:path.rfind("/") + 1] if "/" in path else "/"
    return origin + base_dir + ref


def _squash(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


def _walk_page(url: str, html: str) -> list[tuple]:
    """All microdata triples of one page, via a single tag-scanner
    pass over the byte string with an open-element stack.  Blank-node
    numbering is one preorder counter per page."""
    out: list[tuple] = []
    page_tag = hashlib.sha1(url.encode()).hexdigest()[:10]
    counter = [0]
    # stack frames: [tag, subj|None, vocab|None, collecting list
    # [(scope_subj, pred_iri, buf)] for THIS element (empty if not a
    # text-valued itemprop)]
    stack: list[list] = []
    # buffers of every open text-collecting element (text chunks
    # append to all of them: textContent includes descendant text)
    collecting: list[list[str]] = []
    pos = 0

    def cur_scope() -> tuple[str | None, str | None]:
        for frame in reversed(stack):
            if frame[1] is not None:
                return frame[1], frame[2]
        return None, None

    def inherited_vocab() -> str | None:
        for frame in reversed(stack):
            if frame[2] is not None:
                return frame[2]
        return None

    for m in _TAG_RE.finditer(html):
        text = html[pos:m.start()]
        if text and collecting:
            for buf in collecting:
                buf.append(text)
        pos = m.end()
        closing, tag, soup, selfclose = m.groups()
        tag = tag.lower()
        if closing:
            # lenient close: pop to the matching open tag if present
            names = [f[0] for f in stack]
            if tag in names:
                while stack:
                    frame = stack.pop()
                    for scope_subj, pred, buf in frame[3]:
                        lex = _squash(_unescape(
                            re.sub(r"(?s)<[^>]*>", " ", "".join(buf))))
                        out.append((url, scope_subj, pred, lex,
                                    "literal", XSD_STRING, None))
                        if buf in collecting:
                            collecting.remove(buf)
                    if frame[0] == tag:
                        break
            continue

        attrs = _parse_attrs(soup)
        has_scope = "itemscope" in attrs
        props = [p for p in attrs.get("itemprop", "").split() if p]
        scope_subj, scope_vocab = cur_scope()

        subj = None
        vocab = None
        if has_scope:
            itemid = attrs.get("itemid", "")
            if itemid:
                subj = _resolve_ref(url, itemid) or itemid
            else:
                counter[0] += 1
                subj = f"_:md{page_tag}n{counter[0]}"
            types = [t for t in attrs.get("itemtype", "").split() if t]
            vocab = (_vocab_of_type(types[0]) if types
                     else (scope_vocab or inherited_vocab()))
            for t in types:
                out.append((url, subj, RDF_TYPE, t, "iri", None, None))
            if props and scope_subj is not None:
                kind = "bnode" if subj.startswith("_:") else "iri"
                for p in props:
                    out.append((url, scope_subj,
                                _expand(p, scope_vocab), subj, kind,
                                None, None))

        frame_collect: list = []
        if props and not has_scope and scope_subj is not None:
            src = _ATTR_VALUE.get(tag)
            if tag == "time" and attrs.get("datetime"):
                for p in props:
                    out.append((url, scope_subj,
                                _expand(p, scope_vocab),
                                attrs["datetime"], "literal",
                                XSD_STRING, None))
            elif tag in ("data", "meter") and attrs.get("value"):
                for p in props:
                    out.append((url, scope_subj,
                                _expand(p, scope_vocab),
                                attrs["value"], "literal",
                                XSD_STRING, None))
            elif src is not None:
                attr, kind = src
                raw = attrs.get(attr)
                if raw is not None:
                    val = (_resolve_ref(url, raw) if kind == "iri"
                           else _unescape(raw))
                    if val is not None:
                        for p in props:
                            out.append((url, scope_subj,
                                        _expand(p, scope_vocab), val,
                                        kind,
                                        XSD_STRING if kind == "literal"
                                        else None, None))
            else:
                # text-valued: collect until this element closes
                buf: list[str] = []
                for p in props:
                    frame_collect.append(
                        (scope_subj, _expand(p, scope_vocab), buf))
                collecting.append(buf)

        if tag not in _VOID and not selfclose:
            stack.append([tag, subj, vocab, frame_collect])
        elif frame_collect:
            # a void/self-closed text-prop has empty text content
            for scope_s, pred, buf in frame_collect:
                out.append((url, scope_s, pred, "", "literal",
                            XSD_STRING, None))
            collecting.remove(frame_collect[0][2])
    # text after the final tag still belongs to open collectors
    tail = html[pos:]
    if tail and collecting:
        for buf in collecting:
            buf.append(tail)
    # unclosed collecting elements at EOF: finalize with what we have
    while stack:
        frame = stack.pop()
        for scope_subj, pred, buf in frame[3]:
            lex = _squash(_unescape(
                re.sub(r"(?s)<[^>]*>", " ", "".join(buf))))
            out.append((url, scope_subj, pred, lex, "literal",
                        XSD_STRING, None))
    return out


def microdata_triples(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """Quads from every microdata item of every page.

    Scale shape: a JVM `contains('itemscope')` filter prunes the scan
    to pages that carry markup at all, THEN one Arrow-batched
    mapInPandas runs the stack-walk parser on the survivors.  Output
    is the engine quad shape minus row; blank labels are deterministic
    per page bytes (resumable-sink safe, same contract as
    jsonld_triples)."""
    html_str = F.col(html_col).cast("string")
    staged = (pages
              .where(F.col(html_col).isNotNull()
                     & F.contains(html_str, F.lit("itemscope")))
              .select(F.col(url_col).alias("url"),
                      html_str.alias("_html")))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "subj", "pred", "obj", "obj_kind",
                "obj_datatype", "obj_lang"]
        for pdf in batches:
            rows: list[tuple] = []
            for url, html in zip(pdf["url"], pdf["_html"]):
                rows.extend(_walk_page(url, html))
            yield pd.DataFrame(rows, columns=cols)

    return staged.mapInPandas(parse, MICRODATA_TRIPLES_SCHEMA)


def microdata_pages_from_table(df: DataFrame, url_template: str,
                               body_template: str,
                               key_col: str) -> DataFrame:
    """Render one HTML page per row of `df` whose body is
    ``body_template.format(**row)`` (the caller writes the microdata
    markup; escape cell values with webtext.escape_html where needed).
    Distributed applyInPandas like the other page renderers, so the
    DuckDB oracle recomputes the expected triples relationally from
    the same rows."""
    from .pages import PAGES_SCHEMA

    def make_pages(key, pdf: pd.DataFrame) -> pd.DataFrame:
        urls, htmls = [], []
        for row in pdf.sort_values(key_col, kind="mergesort") \
                      .to_dict("records"):
            urls.append(url_template.format(**row))
            htmls.append(("<html><body>"
                          + body_template.format(**row)
                          + "</body></html>").encode())
        return pd.DataFrame({
            "url": urls,
            "warc_ts": [pd.Timestamp("2026-01-01")] * len(urls),
            "html": htmls,
            "text": [None] * len(urls),
            "lang": ["en"] * len(urls),
        })

    return df.groupBy(key_col).applyInPandas(make_pages, PAGES_SCHEMA)
