"""HTML RDFa Lite (vocab/prefix/typeof/property/resource) -> triples.

The THIRD structured-data channel of real crawls, after embedded
JSON-LD (sources/jsonld.py) and microdata (sources/microdata.py).
The reference has no markup extractor at all (csvweb converts CSV
tables only, `src/DataDock.CsvWeb/Rdf/Converter.cs`); this module
emits the same (url, subj, pred, obj, obj_kind, obj_datatype,
obj_lang) quad shape as the CSVW converter (operators/
triples.py:TRIPLES_SCHEMA), so linking / canonicalization /
entailment / SPARQL consume all three markup sources uniformly.

Scale shape (the engine's Python-budget rule, SURVEY.md §4.2):

1. **Pruning is pure JVM** - a `contains(html, 'property=') OR
   contains(html, 'typeof=')` filter drops pages with no RDFa markup
   before any Python runs.
2. **Parsing is one Arrow-batched mapInPandas** over the survivors,
   reusing microdata's compiled tag-scanner regex and stack walk -
   C-speed `re` + list ops, no shuffle, never per-row Python UDFs.

RDFa Lite 1.1 subset implemented (W3C rdfa-lite + the Core
processing-sequence rules it relies on; deviations documented):

* ``vocab`` sets the default term vocabulary for ``property`` /
  ``typeof`` / ``datatype`` terms, inherited by descendants
  (``vocab=""`` clears it).
* ``prefix="p1: iri1 p2: iri2"`` declares CURIE prefixes, inherited
  and shadowable by descendants; ``p:term`` expands through the
  innermost declaration.  Bare terms go through ``vocab``; absolute
  IRIs pass through.
* The page URL is the initial subject, so ``<meta property="og:title"
  content=...>`` without any enclosing ``about``/``typeof`` describes
  the page itself (RDFa Core's base-as-initial-context rule - the
  dominant crawl shape: OpenGraph headers).
* ``about`` (re)sets the subject for the element and its subtree
  (resolved against the page URL).
* ``property`` emits a triple from the current subject; the object is
  the FIRST of: ``resource`` / ``href`` / ``src`` (resolved, IRI
  object - with ``typeof`` also present the types attach to that IRI
  and it becomes the subtree subject); ``typeof`` alone (chaining: a
  fresh blank node becomes object and subtree subject); ``content``
  attribute (literal); else the element's TEXT CONTENT (descendant
  tags stripped, entity subset decoded, whitespace squashed).
* Literals honor ``datatype`` (CURIE/term/IRI-expanded;
  ``datatype=""`` forces a plain string) else the in-scope ``lang`` /
  ``xml:lang`` (obj_datatype NULL + obj_lang tag, the engine's
  langString shape) else xsd:string.
* ``typeof`` without ``property`` mints the subject (``about`` /
  ``resource`` if present, else a deterministic per-page blank node
  ``_:ra{sha1(url)[:10]}n{preorder}``) and emits rdf:type triples;
  space-separated typeof fans out.
* NOT implemented (full-RDFa-only, rare in crawls, documented so the
  subset is checkable): ``rel``/``rev`` chains, @inlist, incomplete-
  triple completion for hanging rels, xmlns: prefix declarations,
  @datetime value source, the role attribute.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .microdata import (RDF_TYPE, XSD_STRING, _TAG_RE, _VOID,
                        _parse_attrs, _resolve_ref, _squash, _unescape)

RDFA_TRIPLES_SCHEMA = ("url string, subj string, pred string, "
                       "obj string, obj_kind string, "
                       "obj_datatype string, obj_lang string")

_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

#: initial in-scope prefixes (RDFa 1.1 initial context, trimmed to the
#: vocabularies this engine ships elsewhere)
_INITIAL_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "schema": "https://schema.org/",
    "og": "http://ogp.me/ns#",
    "dc": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
}


def _parse_prefix_attr(raw: str, base: dict[str, str]) -> dict[str, str]:
    """``prefix="p1: iri1 p2: iri2"`` -> merged prefix map (child
    declarations shadow inherited ones)."""
    toks = raw.split()
    out = dict(base)
    i = 0
    while i + 1 < len(toks):
        name = toks[i]
        if name.endswith(":"):
            out[name[:-1]] = toks[i + 1]
            i += 2
        else:  # malformed pair: skip one token, stay lenient
            i += 1
    return out


def _resolve_keep_frag(base: str, ref: str) -> str | None:
    """Fragment-PRESERVING reference resolution for about/resource/
    href/src in RDFa position: unlike crawl-frontier hrefs
    (microdata._resolve_ref drops fragments - they never name new
    documents), RDFa subjects and objects routinely ARE fragments
    (`about="#alice"` -> `<page>#alice`)."""
    ref = ref.strip()
    if ref.startswith("#"):
        return base.split("#", 1)[0] + ref
    if "#" in ref:
        body, frag = ref.split("#", 1)
        resolved = _resolve_ref(base, body)
        return None if resolved is None else resolved + "#" + frag
    return _resolve_ref(base, ref)


def _expand_term(term: str, vocab: str | None,
                 prefixes: dict[str, str]) -> str | None:
    """CURIE / vocab-term / absolute-IRI expansion for property,
    typeof and datatype tokens.  Unknown-prefix CURIEs and bare terms
    with no in-scope vocab expand to nothing (the triple is dropped,
    matching RDFa Core's term-resolution failure mode)."""
    if ":" in term:
        pfx, local = term.split(":", 1)
        if pfx in prefixes and not local.startswith("//"):
            return prefixes[pfx] + local
        # absolute-IRI pass-through needs a real authority (`://`) or a
        # known opaque scheme - a bare undeclared `zz:p` CURIE from
        # crawl garbage is NOT an IRI here (same contract as
        # microdata._expand), though RDFa Core would admit it
        if _ABS_IRI_RE.match(term) and (
                "//" in local or pfx.lower() in ("urn", "mailto",
                                                 "tel", "doi")):
            return term
        return None
    if vocab:
        return vocab + term
    return None


def _walk_page(url: str, html: str) -> list[tuple]:
    """All RDFa-Lite triples of one page via a single tag-scanner pass
    with an open-element stack.  Blank-node numbering is one preorder
    counter per page (deterministic per page bytes: resumable-sink
    safe, same contract as jsonld/microdata)."""
    out: list[tuple] = []
    page_tag = hashlib.sha1(url.encode()).hexdigest()[:10]
    counter = [0]
    base_subj = url.split("#", 1)[0]
    # stack frames: [tag, subject, vocab, prefixes, lang,
    #                collect list [(subj, pred, dt, lang, buf)]]
    stack: list[list] = []
    collecting: list[list[str]] = []
    pos = 0

    def bnode() -> str:
        counter[0] += 1
        return f"_:ra{page_tag}n{counter[0]}"

    def state() -> tuple[str, str | None, dict[str, str], str | None]:
        if stack:
            f = stack[-1]
            return f[1], f[2], f[3], f[4]
        return base_subj, None, _INITIAL_PREFIXES, None

    def close_frame(frame: list) -> None:
        for subj, pred, dt, lang, buf in frame[5]:
            lex = _squash(_unescape(
                re.sub(r"(?s)<[^>]*>", " ", "".join(buf))))
            out.append((url, subj, pred, lex, "literal", dt, lang))
            if buf in collecting:
                collecting.remove(buf)

    for m in _TAG_RE.finditer(html):
        text = html[pos:m.start()]
        if text and collecting:
            for buf in collecting:
                buf.append(text)
        pos = m.end()
        closing, tag, soup, selfclose = m.groups()
        tag = tag.lower()
        if closing:
            names = [f[0] for f in stack]
            if tag in names:
                while stack:
                    frame = stack.pop()
                    close_frame(frame)
                    if frame[0] == tag:
                        break
            continue

        attrs = _parse_attrs(soup)
        subj, vocab, prefixes, lang = state()

        if "vocab" in attrs:
            vocab = attrs["vocab"].strip() or None
        if attrs.get("prefix"):
            prefixes = _parse_prefix_attr(attrs["prefix"], prefixes)
        lang = attrs.get("lang", attrs.get("xml:lang", lang)) or None

        if "about" in attrs:
            resolved = _resolve_keep_frag(url, attrs["about"])
            if resolved is not None:
                subj = resolved

        props = [p for p in attrs.get("property", "").split() if p]
        types = [t for t in attrs.get("typeof", "").split() if t]
        ref = next((attrs[a] for a in ("resource", "href", "src")
                    if attrs.get(a) is not None), None)

        child_subj = subj
        frame_collect: list = []
        if props:
            pred_iris = [pi for p in props
                         if (pi := _expand_term(p, vocab, prefixes))]
            if ref is not None:
                obj = _resolve_keep_frag(url, ref)
                if obj is not None:
                    for pi in pred_iris:
                        out.append((url, subj, pi, obj, "iri", None,
                                    None))
                    for t in types:
                        ti = _expand_term(t, vocab, prefixes)
                        if ti:
                            out.append((url, obj, RDF_TYPE, ti, "iri",
                                        None, None))
                    child_subj = obj
            elif types:
                node = bnode()
                for pi in pred_iris:
                    out.append((url, subj, pi, node, "bnode", None,
                                None))
                for t in types:
                    ti = _expand_term(t, vocab, prefixes)
                    if ti:
                        out.append((url, node, RDF_TYPE, ti, "iri",
                                    None, None))
                child_subj = node
            else:
                dt_raw = attrs.get("datatype")
                if dt_raw is not None:
                    dt = (_expand_term(dt_raw, vocab, prefixes)
                          if dt_raw.strip() else XSD_STRING)
                    dt = dt or XSD_STRING
                    lit_lang = None
                elif lang:
                    dt, lit_lang = None, lang
                else:
                    dt, lit_lang = XSD_STRING, None
                if attrs.get("content") is not None:
                    for pi in pred_iris:
                        out.append((url, subj, pi,
                                    _unescape(attrs["content"]),
                                    "literal", dt, lit_lang))
                else:
                    buf: list[str] = []
                    for pi in pred_iris:
                        frame_collect.append((subj, pi, dt, lit_lang,
                                              buf))
                    if frame_collect:
                        collecting.append(buf)
        else:
            if ref is not None:
                resolved = _resolve_keep_frag(url, ref)
                if resolved is not None:
                    child_subj = resolved
            if types:
                node = child_subj if ("about" in attrs or ref is not None) \
                    else bnode()
                for t in types:
                    ti = _expand_term(t, vocab, prefixes)
                    if ti:
                        out.append((url, node, RDF_TYPE, ti, "iri",
                                    None, None))
                child_subj = node

        if tag not in _VOID and not selfclose:
            stack.append([tag, child_subj, vocab, prefixes, lang,
                          frame_collect])
        elif frame_collect:
            # void/self-closed text property: empty text content
            for subj_c, pred, dt, lit_lang, buf in frame_collect:
                out.append((url, subj_c, pred, "", "literal", dt,
                            lit_lang))
            collecting.remove(frame_collect[0][4])

    tail = html[pos:]
    if tail and collecting:
        for buf in collecting:
            buf.append(tail)
    while stack:
        close_frame(stack.pop())
    return out


def rdfa_triples(pages: DataFrame, url_col: str = "url",
                 html_col: str = "html") -> DataFrame:
    """Quads from every RDFa-Lite statement of every page.

    Scale shape: a JVM `contains('property=') OR contains('typeof=')`
    filter prunes the scan to pages that carry RDFa at all (every
    emitted triple requires one of the two attributes), THEN one
    Arrow-batched mapInPandas runs the stack-walk parser on the
    survivors."""
    html_str = F.col(html_col).cast("string")
    staged = (pages
              .where(F.col(html_col).isNotNull()
                     & (F.contains(html_str, F.lit("property="))
                        | F.contains(html_str, F.lit("typeof="))))
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

    return staged.mapInPandas(parse, RDFA_TRIPLES_SCHEMA)


def rdfa_pages_from_table(df: DataFrame, url_template: str,
                          body_template: str, key_col: str) -> DataFrame:
    """Render one HTML page per row of `df` whose body is
    ``body_template.format(**row)`` (the caller writes the RDFa
    markup).  Distributed applyInPandas like the other page renderers,
    so the DuckDB oracle recomputes the expected triples relationally
    from the same rows."""
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
