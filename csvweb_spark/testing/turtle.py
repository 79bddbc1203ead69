"""Minimal Turtle parser + blank-node-insensitive graph comparison.

Test-support code: parses the reference's golden .ttl fixtures (a limited
Turtle subset: @base/@prefix, IRIs with \\uXXXX escapes, prefixed names,
'a', ';' ',' '.', bnode property lists '[...]', literals with ^^/@lang and
integer/decimal/double/boolean shorthand, triple-quoted strings) into
(subj, pred, obj, kind, datatype, lang) tuples, and compares triple sets
blank-node-insensitively - mirroring the dotNetRDF GraphDiff comparison the
reference's harness uses (Tests/CsvwTestCasesSpec.cs:159-190), including its
plain-literal == xsd:string normalization (lines 173-190).

No external RDF library is used (none is available in this environment).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin as _urljoin


def urljoin(base: str, iri: str) -> str:
    """RFC 3986 resolve, but keep absolute IRIs verbatim (urllib's urljoin
    drops an empty #fragment from absolute IRIs, which would corrupt
    namespace prefixes like xsd's trailing '#')."""
    if not base or re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", iri):
        return iri
    out = _urljoin(base, iri)
    if iri.endswith("#") and not out.endswith("#"):
        out += "#"  # urljoin drops empty fragments; namespaces need them
    return out

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"


class TurtleParseError(Exception):
    pass


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iri><[^>]*>)
  | (?P<longstr>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
  | (?P<str>"(?:[^"\\\n]|\\.)*")
  | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<dtype>\^\^)
  | (?P<bnode>_:[A-Za-z0-9_.-]+)
  | (?P<punct>[;,.\[\]()])
  | (?P<pname>[A-Za-z0-9_-]*:(?:[^\s;,.\[\]()"']|\.(?=[^\s;,.\[\]()"']))*)
  | (?P<kw>@prefix|@base|a|true|false)
  | (?P<num>[+-]?(?:\d+\.\d+(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?))
  | (?P<word>[A-Za-z][A-Za-z0-9_-]*)
    """,
    re.VERBOSE,
)

_UESC = re.compile(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})")
_STR_ESC = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape_iri(s: str) -> str:
    return _UESC.sub(lambda m: chr(int(m.group(1) or m.group(2), 16)), s)


def _unescape_string(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n == "u":
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if n == "U":
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
            out.append(_STR_ESC.get(n, n))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


class TurtleParser:
    def __init__(self, text: str, base: str = ""):
        if text.startswith("﻿"):
            text = text[1:]
        self.tokens = []
        pos = 0
        while pos < len(text):
            m = _TOKEN.match(text, pos)
            if m is None:
                raise TurtleParseError(f"Cannot tokenize at: {text[pos:pos+40]!r}")
            pos = m.end()
            if m.lastgroup == "ws":
                continue
            self.tokens.append((m.lastgroup, m.group()))
        self.i = 0
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple] = []
        self._bnode_n = 0

    # -- token helpers --------------------------------------------------------

    def _peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else (None, None)

    def _next(self):
        tok = self._peek()
        self.i += 1
        return tok

    def _expect(self, value):
        kind, tok = self._next()
        if tok != value:
            raise TurtleParseError(f"Expected {value!r}, got {tok!r}")

    def _fresh_bnode(self):
        self._bnode_n += 1
        return f"_:gen{self._bnode_n}"

    # -- grammar ----------------------------------------------------------------

    def parse(self) -> list[tuple]:
        while self.i < len(self.tokens):
            kind, tok = self._peek()
            if tok == "@prefix" or (kind == "word" and tok.upper() == "PREFIX"):
                self._next()
                _, pname = self._next()
                if not pname.endswith(":"):
                    raise TurtleParseError(f"Bad prefix decl near {pname!r}")
                _, iri = self._next()
                self.prefixes[pname[:-1]] = urljoin(self.base, _unescape_iri(iri[1:-1]))
                if self._peek()[1] == ".":
                    self._next()
            elif tok == "@base" or (kind == "word" and tok.upper() == "BASE"):
                self._next()
                _, iri = self._next()
                self.base = urljoin(self.base, _unescape_iri(iri[1:-1]))
                if self._peek()[1] == ".":
                    self._next()
            else:
                self._parse_statement()
        return self.triples

    def _parse_statement(self):
        subj, kind = self._parse_subject()
        # '[ ...po-list... ] .' - predicateObjectList is optional after a
        # blankNodePropertyList subject
        if kind == "bnode" and self._peek()[1] == ".":
            self._next()
            return
        self._parse_predicate_object_list(subj, kind)
        self._expect(".")

    def _parse_subject(self):
        kind, tok = self._next()
        if kind == "iri":
            return urljoin(self.base, _unescape_iri(tok[1:-1])), "iri"
        if kind == "bnode":
            return tok, "bnode"
        if tok == "[":
            b = self._fresh_bnode()
            if self._peek()[1] != "]":
                self._parse_predicate_object_list(b, "bnode")
            self._expect("]")
            return b, "bnode"
        if kind == "pname":
            return self._expand_pname(tok), "iri"
        raise TurtleParseError(f"Bad subject token {tok!r}")

    def _expand_pname(self, tok):
        prefix, local = tok.split(":", 1)
        if prefix not in self.prefixes:
            raise TurtleParseError(f"Unknown prefix {prefix!r}")
        return self.prefixes[prefix] + local

    def _parse_predicate_object_list(self, subj, subj_kind):
        while True:
            kind, tok = self._next()
            if tok == "a" and kind == "kw":
                pred = RDF_TYPE
            elif kind == "iri":
                pred = urljoin(self.base, _unescape_iri(tok[1:-1]))
            elif kind == "pname":
                pred = self._expand_pname(tok)
            else:
                raise TurtleParseError(f"Bad predicate token {tok!r}")
            while True:
                obj = self._parse_object()
                self.triples.append((subj, pred) + obj)
                if self._peek()[1] == ",":
                    self._next()
                    continue
                break
            if self._peek()[1] == ";":
                self._next()
                # tolerate trailing ';' before '.' or ']'
                if self._peek()[1] in (".", "]", None):
                    return
                continue
            return

    def _parse_object(self):
        kind, tok = self._next()
        if kind == "iri":
            return (urljoin(self.base, _unescape_iri(tok[1:-1])), "iri", None, None)
        if kind == "bnode":
            return (tok, "bnode", None, None)
        if kind == "pname":
            return (self._expand_pname(tok), "iri", None, None)
        if tok == "[":
            b = self._fresh_bnode()
            if self._peek()[1] != "]":
                self._parse_predicate_object_list(b, "bnode")
            self._expect("]")
            return (b, "bnode", None, None)
        if kind in ("str", "longstr"):
            value = _unescape_string(tok[3:-3] if kind == "longstr" else tok[1:-1])
            nk, nt = self._peek()
            if nt == "^^":
                self._next()
                dk, dt = self._next()
                if dk == "iri":
                    dtype = urljoin(self.base, _unescape_iri(dt[1:-1]))
                elif dk == "pname":
                    dtype = self._expand_pname(dt)
                else:
                    raise TurtleParseError(f"Bad datatype token {dt!r}")
                return (value, "literal", dtype, None)
            if nk == "langtag":
                self._next()
                return (value, "literal", None, nt[1:])
            return (value, "literal", None, None)
        if kind == "num":
            if "e" in tok.lower():
                return (tok, "literal", XSD + "double", None)
            if "." in tok:
                return (tok, "literal", XSD + "decimal", None)
            return (tok, "literal", XSD + "integer", None)
        if tok in ("true", "false"):
            return (tok, "literal", XSD + "boolean", None)
        if tok == "(":
            return (self._parse_collection(), "bnode", None, None)
        raise TurtleParseError(f"Bad object token {tok!r}")

    RDF_NIL = RDF_NS + "nil"

    def _parse_collection(self):
        """'( o1 o2 ... )' -> rdf:first/rest chain; returns the head node."""
        items = []
        while self._peek()[1] != ")":
            if self._peek() == (None, None):
                raise TurtleParseError("Unterminated collection")
            items.append(self._parse_object())
        self._next()  # consume ')'
        if not items:
            return self.RDF_NIL
        head = None
        prev = None
        for obj in items:
            node = self._fresh_bnode()
            self.triples.append((node, RDF_NS + "first") + obj)
            if prev is not None:
                self.triples.append((prev, RDF_NS + "rest", node, "bnode",
                                     None, None))
            else:
                head = node
            prev = node
        self.triples.append((prev, RDF_NS + "rest", self.RDF_NIL, "iri",
                             None, None))
        return head


def parse_turtle(text: str, base: str = "") -> list[tuple]:
    """-> list of (subj, pred, obj, obj_kind, obj_datatype, obj_lang)."""
    out = []
    for s, p, o, okind, dt, lang in TurtleParser(text, base).parse():
        skind = "bnode" if s.startswith("_:") else "iri"
        out.append((s, p, o, okind, dt, lang, skind))
    # normalize to FIXTURES.md shape: subject kind folded into the label
    return [(s, p, o, okind, dt, lang) for s, p, o, okind, dt, lang, _ in out]


# -- blank-node-insensitive comparison ---------------------------------------


def _normalize_literal(t: tuple) -> tuple:
    """Plain literal == typed xsd:string (CsvwTestCasesSpec.NormalizeLiterals)."""
    s, p, o, kind, dt, lang = t
    if kind == "literal" and dt is None and (lang is None or lang == ""):
        dt = XSD + "string"
    if kind == "literal" and lang == "":
        lang = None
    return (s, p, o, kind, dt, lang)


def _is_bnode(term: str, kind: str | None = None) -> bool:
    return term.startswith("_:")


def graphs_isomorphic(a: list[tuple], b: list[tuple]) -> bool:
    """Exact bijective blank-node matching (multiset semantics)."""
    a = [_normalize_literal(t) for t in a]
    b = [_normalize_literal(t) for t in b]
    if len(a) != len(b):
        return False

    def ground(t):
        s, p, o, kind, dt, lang = t
        return (None if _is_bnode(s) else s, p,
                None if kind == "bnode" else o, kind, dt, lang)

    from collections import Counter
    if Counter(ground(t) for t in a) != Counter(ground(t) for t in b):
        return False

    def bnodes(ts):
        out = []
        for s, p, o, kind, *_ in ts:
            if _is_bnode(s) and s not in out:
                out.append(s)
            if kind == "bnode" and o not in out:
                out.append(o)
        return out

    ba, bb = bnodes(a), bnodes(b)
    if len(ba) != len(bb):
        return False
    if not ba:
        return Counter(a) == Counter(b)

    # signature refinement: initial signature = multiset of ground-adjacent
    # triples; iterate once, then backtrack over candidates (graphs here are
    # small - fixture-scale only).
    def signature(ts, node):
        sig = []
        for s, p, o, kind, dt, lang in ts:
            if s == node:
                sig.append(("out", p, None if kind == "bnode" else o, kind, dt, lang))
            if kind == "bnode" and o == node:
                sig.append(("in", p, None if _is_bnode(s) else s))
        return Counter(sig)

    sig_a = {n: signature(a, n) for n in ba}
    sig_b = {n: signature(b, n) for n in bb}
    cands = {n: [m for m in bb if sig_b[m] == sig_a[n]] for n in ba}
    if any(not c for c in cands.values()):
        return False

    set_b = Counter(b)
    order = sorted(ba, key=lambda n: len(cands[n]))

    def apply_mapping(mapping):
        mapped = []
        for s, p, o, kind, dt, lang in a:
            s2 = mapping.get(s, s) if _is_bnode(s) else s
            o2 = mapping.get(o, o) if kind == "bnode" else o
            mapped.append((s2, p, o2, kind, dt, lang))
        return Counter(mapped) == set_b

    def backtrack(ix, mapping, used):
        if ix == len(order):
            return apply_mapping(mapping)
        n = order[ix]
        for m in cands[n]:
            if m in used:
                continue
            mapping[n] = m
            used.add(m)
            if backtrack(ix + 1, mapping, used):
                return True
            del mapping[n]
            used.discard(m)
        return False

    return backtrack(0, {}, set())


def diff_report(a: list[tuple], b: list[tuple], limit: int = 20) -> str:
    from collections import Counter
    ca = Counter(_normalize_literal(t) for t in a)
    cb = Counter(_normalize_literal(t) for t in b)
    only_a = list((ca - cb).elements())[:limit]
    only_b = list((cb - ca).elements())[:limit]
    lines = ["only in actual:"] + [f"  {t}" for t in only_a] + \
            ["only in expected:"] + [f"  {t}" for t in only_b]
    return "\n".join(lines)
