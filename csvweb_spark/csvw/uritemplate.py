"""RFC-6570-subset URI templates as used by CSVW aboutUrl/propertyUrl/valueUrl.

Re-implements /root/reference/src/DataDock.CsvWeb/UriTemplate.cs:30-118:

* expressions matched by the regex \\{([^{]+)\\}
* '{#varlist}' -> '#' + comma-joined resolved variables
* '{a,b}'      -> comma-joined resolved variables
* substituted values are NOT percent-encoded (proof: the reference's
  escaping golden keeps a literal space inside the IRI,
  Tests/data/escaping.out.ttl:3-4)
* an empty or missing binding raises BindingError; the converter maps that
  to a null node -> triple suppressed (Rdf/Converter.cs:597-609,416-420)

`compile_template` pre-splits the template once per column (the reference
compiles its regex once per UriTemplate instance, UriTemplate.cs:33); the
compiled form is also consumed by operators/triples.py to build equivalent
Spark concat expressions (no Python at row time on the scale path).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Optional
from urllib.parse import urljoin

_EXPR = re.compile(r"\{([^{]+)\}")

SPECIAL_VARS = ("_row", "_sourceRow", "_column", "_sourceColumn", "_name")


class BindingError(Exception):
    """Mirror of UriTemplateBindingException."""

    def __init__(self, var: str):
        super().__init__(f"No binding for template variable '{var}'")
        self.var = var


@dataclass(frozen=True)
class CompiledTemplate:
    """Alternating literal / expression parts.

    parts: list of (kind, payload) where kind is 'lit' (payload: str) or
    'expr' (payload: (prefix, (var, ...))) with prefix '' or '#'.
    """

    template: str
    parts: tuple

    @property
    def variables(self) -> tuple:
        out = []
        for kind, payload in self.parts:
            if kind == "expr":
                out.extend(payload[1])
        return tuple(out)

    def resolve(self, lookup: Callable[[str], Optional[str]]) -> str:
        """Resolve to a (possibly relative) IRI string. Raises BindingError
        on a missing/empty binding (UriTemplate.cs:105-117)."""
        out = []
        for kind, payload in self.parts:
            if kind == "lit":
                out.append(payload)
            else:
                prefix, variables = payload
                vals = []
                for v in variables:
                    val = lookup(v)
                    if val is None or val == "":
                        raise BindingError(v)
                    vals.append(val)
                out.append(prefix + ",".join(vals))
        return "".join(out)

    def resolve_absolute(self, base_url: str,
                         lookup: Callable[[str], Optional[str]]) -> str:
        return resolve_against_base(base_url, self.resolve(lookup))


def resolve_against_base(base_url: str, iri: str) -> str:
    """new Uri(baseUri, relative) - RFC 3986 resolution. urljoin matches
    the C# behavior for the http(s) IRIs the test corpus uses; neither
    encodes nor decodes any character. One divergence patched (review
    fix, same as testing/turtle.py): urllib's urljoin drops a trailing
    EMPTY '#' fragment that new Uri(base, rel) keeps - vocabulary IRIs
    ending in '#' must survive."""
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", iri):
        return iri
    out = urljoin(base_url, iri)
    if iri.endswith("#") and not out.endswith("#"):
        out += "#"
    return out


def compile_template(template: str) -> CompiledTemplate:
    parts = []
    pos = 0
    for m in _EXPR.finditer(template):
        if m.start() > pos:
            parts.append(("lit", template[pos:m.start()]))
        expr = m.group(1)
        if expr.startswith("#"):
            parts.append(("expr", ("#", tuple(expr[1:].split(",")))))
        else:
            parts.append(("expr", ("", tuple(expr.split(",")))))
        pos = m.end()
    if pos < len(template):
        parts.append(("lit", template[pos:]))
    return CompiledTemplate(template=template, parts=tuple(parts))
