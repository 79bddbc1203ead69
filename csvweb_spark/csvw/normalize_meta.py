"""CSVW metadata normalization (JSON-LD-ish tree rewriting).

Driver-side re-implementation of
/root/reference/src/DataDock.CsvWeb/Parsing/MetadataNormalizer.cs (317 LoC)
plus the property-classification tables of Parsing/MetadataSpecHelper.cs.
Metadata documents are tiny (KBs), so this is sequential pure Python run
once on the driver; the resulting flat table descriptors are broadcast.

Normalization rewrites (MetadataNormalizer.cs:66-194):
  * @context processing: @base / @language extraction (lines 205-242)
  * EnsureType tagging per object position (50-97)
  * link properties resolved against the base URI
  * object properties dereferenced when given by URL (via resolver)
  * natural-language properties -> {lang: [values]}
  * atomic 'datatype': "x" -> {"base": "x"}
  * URI-template property CURIE expansion via the CSVW context
  * common properties (name contains ':' but not '://',
    MetadataSpecHelper.cs:72-75) -> {@value,@language} object form
"""

from __future__ import annotations

import json
import re
from typing import Callable, Optional
from urllib.parse import urljoin

from .context import CSVW_CONTEXT
from .model import MetadataParseError

ARRAY_PROPERTIES = {"tables", "transformations", "notes", "@context",
                    "foreignKeys", "columns", "lineTerminators"}
LINK_PROPERTIES = {"url", "targetFormat", "scriptFormat", "@id", "resource",
                   "schemaReference"}
URI_TEMPLATE_PROPERTIES = {"aboutUrl", "propertyUrl", "valueUrl"}
COLUMN_REFERENCE_PROPERTIES = {"columnReference", "primaryKey", "rowTitles"}
OBJECT_PROPERTIES = {"reference", "tableSchema", "dialect"}
NATURAL_LANGUAGE_PROPERTIES = {"titles"}
ATOMIC_PROPERTIES = {
    "source", "@type", "null", "lang", "textDirection", "separator", "ordered",
    "default", "datatype", "required",
    "base", "format", "length", "minLength", "maxLength", "minimum", "maximum",
    "minInclusive", "maxInclusive", "minExclusive", "maxExclusive",
    "decimalChar", "groupChar", "pattern",
    "tableDirection", "suppressOutput",
    "@language", "@base",
    "commentPrefix", "doubleQuote", "delimiter", "encoding", "header",
    "headerRowCount", "quoteChar",
    "skipBlankRows", "skipColumns", "skipInitialSpace", "skipRows", "trim",
    "names", "virtual",
}
CSVW_METADATA_CONTEXT = "http://www.w3.org/ns/csvw"

# BCP-47 language tag validation (Parsing/LanguageTag.cs:14-36; the regex is
# the well-known public BCP-47 ABNF transcription).
_LANGTAG_RE = re.compile(
    r"^((en-GB-oed|i-ami|i-bnn|i-default|i-enochian|i-hak|i-klingon|i-lux"
    r"|i-mingo|i-navajo|i-pwn|i-tao|i-tay|i-tsu|sgn-BE-FR|sgn-BE-NL|sgn-CH-DE"
    r"|art-lojban|cel-gaulish|no-bok|no-nyn|zh-guoyu|zh-hakka|zh-min|zh-min-nan"
    r"|zh-xiang)"
    r"|((([A-Za-z]{2,3}(-[A-Za-z]{3}(-[A-Za-z]{3}){0,2})?)|[A-Za-z]{4}"
    r"|[A-Za-z]{5,8})(-[A-Za-z]{4})?(-([A-Za-z]{2}|[0-9]{3}))?"
    r"(-([A-Za-z0-9]{5,8}|[0-9][A-Za-z0-9]{3}))*"
    r"(-[0-9A-WY-Za-wy-z](-[A-Za-z0-9]{2,8})+)*(-x(-[A-Za-z0-9]{1,8})+)?)"
    r"|x(-[A-Za-z0-9]{1,8})+)$"
)


def is_valid_language_tag(tag: str) -> bool:
    return bool(_LANGTAG_RE.match(tag))


def is_common_property(name: str) -> bool:
    return ":" in name and "://" not in name


def load_metadata_json(text: str) -> dict:
    """Parse a metadata JSON document leniently: tolerate a UTF-8 BOM and
    trailing commas (Newtonsoft accepts both; the reference's own fixture
    dateTime.json contains trailing commas)."""
    text = text.lstrip("﻿")
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        cleaned = re.sub(r",(\s*[}\]])", r"\1", text)
        obj = json.loads(cleaned)
    if not isinstance(obj, dict):
        raise MetadataParseError("Expected root of JSON document to be an object.")
    return obj


class MetadataNormalizer:
    def __init__(self, base_uri: str, default_language: Optional[str] = None,
                 json_resolver: Optional[Callable[[str], dict]] = None):
        self.base_uri = base_uri
        self.default_language = default_language
        self.json_resolver = json_resolver
        self.warnings: list[str] = []

    def normalize(self, o: dict) -> dict:
        base, lang = self.base_uri, self.default_language
        if "@context" in o:
            base, lang = self._process_context(o.pop("@context"))
        self._normalize_object(o, base, lang, None)
        o["@context"] = CSVW_METADATA_CONTEXT
        return o

    # -- helpers ------------------------------------------------------------

    def _process_context(self, ctx) -> tuple[str, Optional[str]]:
        if isinstance(ctx, list):
            for item in ctx:
                if isinstance(item, dict):
                    return self._process_context(item)
        if isinstance(ctx, dict):
            extras = set(ctx) - {"@base", "@language"}
            if extras:
                raise MetadataParseError(
                    f"@context objects may only contain @base and @language, "
                    f"found {sorted(extras)}")
            base = self.base_uri
            lang = None
            if "@base" in ctx:
                base = urljoin(base, ctx["@base"])
            if "@language" in ctx:
                language = ctx["@language"]
                if is_valid_language_tag(language):
                    lang = language
                else:
                    self.warnings.append(
                        "The value of the '@language' property must be a valid "
                        "BCP-47 language tag.")
            return base, lang
        return self.base_uri, self.default_language

    def _ensure_type(self, o: dict, ensure: str):
        if "@type" in o:
            if o["@type"] != ensure:
                raise MetadataParseError(
                    f"Expected @type property to be set to '{ensure}', "
                    f"but found '{o['@type']}'")
        else:
            o["@type"] = ensure

    def _normalize_object(self, o: dict, base: str, lang: Optional[str],
                          parent_property: Optional[str]):
        if "tables" in o:
            self._ensure_type(o, "TableGroup")
        if parent_property == "tables" or (parent_property is None and "url" in o):
            self._ensure_type(o, "Table")
        if parent_property == "tableSchema":
            self._ensure_type(o, "Schema")
        if parent_property == "columns":
            self._ensure_type(o, "Column")
        if parent_property == "dialect":
            self._ensure_type(o, "Dialect")
        if parent_property == "transformations":
            self._ensure_type(o, "Template")

        for name in list(o.keys()):
            value = o[name]
            if is_common_property(name) or name == "notes":
                o[name] = self._normalize_common_value(value, base, lang)
            elif name in ARRAY_PROPERTIES:
                if not isinstance(value, list):
                    self.warnings.append(
                        f"Expected property value of '{name}' to be an array.")
                    del o[name]
                else:
                    for item in value:
                        if isinstance(item, dict):
                            self._normalize_object(item, base, lang, name)
            elif name in LINK_PROPERTIES:
                if name == "@id" and isinstance(value, str) and value.startswith("_:"):
                    raise MetadataParseError(
                        "An @id property may not start with the string '_:'")
                if isinstance(value, str):
                    o[name] = urljoin(base, value)
            elif name in OBJECT_PROPERTIES:
                if isinstance(value, str):
                    o[name] = self._resolve_object_reference(value, base, lang, name)
                elif isinstance(value, dict):
                    self._normalize_object(value, base, lang, name)
                else:
                    # W3C: invalid value -> warning, property ignored (an
                    # empty tableSchema is kept so positional-name semantics
                    # know a schema was declared - suite tests 107/130)
                    self.warnings.append(
                        f"Property {name} must be either a URI reference or an object.")
                    if name == "tableSchema":
                        o[name] = {}
                    else:
                        del o[name]
            elif name in NATURAL_LANGUAGE_PROPERTIES:
                if isinstance(value, str):
                    o[name] = {lang or "und": [value]}
                elif isinstance(value, list):
                    o[name] = {lang or "und": value}
                elif not isinstance(value, dict):
                    self.warnings.append(
                        f"Property {name} must be either a string, an array of "
                        "string or an object.")
                    del o[name]
            elif name in ATOMIC_PROPERTIES:
                if isinstance(value, str) and name == "datatype":
                    o[name] = {"base": value}
            elif name in URI_TEMPLATE_PROPERTIES:
                if not isinstance(value, str):
                    self.warnings.append(
                        f"The value of the {name} property must be a string")
                    value = ""
                o[name] = expand_curie(value)

    def _resolve_object_reference(self, href: str, base: str,
                                  lang: Optional[str], prop: str) -> dict:
        uri = urljoin(base, href)
        if self.json_resolver is None:
            raise MetadataParseError(
                f"Cannot dereference '{uri}' for property '{prop}': "
                "no JSON resolver configured")
        obj = self.json_resolver(uri)
        self._normalize_object(obj, uri, lang, prop)
        return obj

    def _normalize_common_value(self, value, base: str, lang: Optional[str]):
        if isinstance(value, list):
            return [self._normalize_common_value(v, base, lang) for v in value]
        if isinstance(value, str):
            ret = {"@value": value}
            if lang:
                ret["@language"] = lang
            return ret
        if isinstance(value, dict):
            if "@value" in value:
                extras = set(value) - {"@value", "@type", "@language"}
                if extras:
                    raise MetadataParseError(
                        f"@value objects may not contain {sorted(extras)}")
                if "@type" in value and "@language" in value:
                    raise MetadataParseError(
                        "@value objects may not have both @type and @language")
                return value
            for name in list(value.keys()):
                if name.startswith("@") and name not in ("@id", "@type"):
                    raise MetadataParseError(
                        f"Invalid keyword property '{name}' in common property value")
                if name == "@id":
                    vid = value[name]
                    if not isinstance(vid, str):
                        # parse error, not a TypeError crash (review fix)
                        raise MetadataParseError(
                            "The value of an '@id' property must be a string")
                    if vid.startswith("_:"):
                        raise MetadataParseError(
                            "An @id property must not start with '_:'")
                    value[name] = expand_curie(vid)
                elif name != "@type":
                    value[name] = self._normalize_common_value(value[name], base, lang)
            return value
        return value


def expand_curie(value: str) -> str:
    """MetadataNormalizer.ResolveId (295-309): expand prefix:suffix via the
    CSVW context unless prefix is '_' or suffix starts with '//'."""
    if ":" in value:
        prefix, suffix = value.split(":", 1)
        if prefix != "_" and not suffix.startswith("//") and prefix in CSVW_CONTEXT:
            expansion = CSVW_CONTEXT[prefix]
            if isinstance(expansion, str):
                return expansion + suffix
    return value


def expand_url(value: str) -> str:
    """Rdf/Converter.ExpandUrl (775-799): direct term lookup first, then
    CURIE expansion; raises on unexpandable values."""
    term = CSVW_CONTEXT.get(value)
    if isinstance(term, str):
        return expand_curie(term) if ":" in term and "://" not in term else term
    if ":" in value:
        prefix, suffix = value.split(":", 1)
        if suffix.startswith("//"):
            return value
        expansion = CSVW_CONTEXT.get(prefix)
        if isinstance(expansion, str):
            return expansion + suffix
    raise MetadataParseError("Unable to expand URL value: " + value)
