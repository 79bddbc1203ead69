"""CSVW metadata JSON -> flat table descriptors.

Driver-side re-implementation of
/root/reference/src/DataDock.CsvWeb/Parsing/JsonMetadataParser.cs (753 LoC):
normalize (normalize_meta.MetadataNormalizer), then walk the normalized tree
into the flattened object model of csvw/model.py with the inheritance chain
Column -> Schema -> Table -> TableGroup resolved eagerly
(Metadata/InheritedPropertyContainer.cs:26-101).

Parity notes vs the reference:
  * column 'name' falls back to titles[defaultLanguage] then titles['und'],
    then '_col.N' (JsonMetadataParser.cs:248-259)
  * names starting with '_' are rejected (lines 314-318)
  * 'default' is only ever parsed on columns; 'required' is recognized but
    never parsed anywhere -> always False (matches reference behavior)
  * dialect parse with defaults + lenient warnings (lines 320-384)
  * numeric-only min/max constraints are parsed then ignored by conversion
"""

from __future__ import annotations

from typing import Callable, Optional
from urllib.parse import urljoin

from .formats import make_format
from .model import (
    Column,
    Datatype,
    Dialect,
    MetadataParseError,
    Table,
    TableGroup,
    DATATYPE_ANNOTATIONS,
)
import re as _re

_VALID_NAME_RE = _re.compile(
    r"^([A-Za-z0-9]|%[0-9A-Fa-f]{2})([A-Za-z0-9._]|%[0-9A-Fa-f]{2})*$")

from .normalize_meta import (
    MetadataNormalizer,
    is_common_property,
    is_valid_language_tag,
    load_metadata_json,
)


def parse_metadata(text: str, base_uri: str,
                   default_language: Optional[str] = None,
                   json_resolver: Optional[Callable[[str], dict]] = None) -> TableGroup:
    """JsonMetadataParser.Parse(TextReader): deserialize -> normalize ->
    object-model parse (JsonMetadataParser.cs:54-67)."""
    root = load_metadata_json(text)
    normalizer = MetadataNormalizer(base_uri, default_language, json_resolver)
    root = normalizer.normalize(root)
    return parse_normalized(root, base_uri, default_language)


def parse_normalized(root: dict, base_uri: str,
                     default_language: Optional[str] = None) -> TableGroup:
    p = _Parser(base_uri, default_language)
    if "tables" in root:
        return p.parse_table_group(root)
    if "url" in root:
        group = TableGroup()
        p.parse_table(group, root)
        p.resolve_group_foreign_keys(group)
        return group
    raise MetadataParseError("Unrecognized root object type")


def _explicit_column_names(schema) -> set:
    """Columns of a raw tableSchema dict carrying an explicit string
    `name` (title-derived names don't count - W3C test104). Shared by
    parse_table and validate_foreign_keys so the two FK validation passes
    cannot drift."""
    if not isinstance(schema, dict):
        return set()
    return {c.get("name") for c in schema.get("columns", [])
            if isinstance(c, dict) and isinstance(c.get("name"), str)}


class _Parser:
    def __init__(self, base_uri: str, default_language: Optional[str]):
        self.base_uri = base_uri
        self.default_language = default_language
        self.warnings: list[str] = []
        self._fk_specs: list = []
        self._explicit_names: dict = {}

    # -- table group ---------------------------------------------------------

    def parse_table_group(self, root: dict) -> TableGroup:
        tables = root.get("tables")
        if not isinstance(tables, list):
            raise MetadataParseError("The value of the 'tables' property must be an array")
        group = TableGroup()
        if "dialect" in root:
            if not isinstance(root["dialect"], dict):
                raise MetadataParseError(
                    "The value of the 'dialect' property must be a JSON object")
            group.dialect = self.parse_dialect(root["dialect"])
        else:
            group.dialect = Dialect()
        group_inherited = self.parse_inherited(root, parent={})
        for item in tables:
            if not isinstance(item, dict):
                raise MetadataParseError("Items in the 'tables' array must be objects")
            self.parse_table(group, item, group_inherited)
        if "@id" in root:
            group.id = self.parse_link(root["@id"], "@id")
        group.common_properties = self.parse_common(root)
        group.notes = self.parse_notes(root)
        self.resolve_group_foreign_keys(group)
        return group

    # -- table ----------------------------------------------------------------

    def parse_table(self, group: TableGroup, root: dict,
                    group_inherited: Optional[dict] = None) -> Table:
        if "url" not in root:
            raise MetadataParseError("Did not find required 'url' property on table object")
        if not isinstance(root["url"], str):
            raise MetadataParseError("The value of the 'url' property must be a string")
        table = Table(url=self.parse_link(root["url"], "url"))
        if "@id" in root:
            table.id = self.parse_link(root["@id"], "@id")
        if "dialect" in root:
            if not isinstance(root["dialect"], dict):
                raise MetadataParseError(
                    "The value of the 'dialect' property must be a JSON object")
            table.dialect = self.parse_dialect(root["dialect"])
        else:
            table.dialect = group.dialect or Dialect()
        table.suppress_output = self.parse_suppress_output(root)
        table_inherited = self.parse_inherited(root, parent=group_inherited or {})

        schema = root.get("tableSchema")
        if schema is not None:
            if not isinstance(schema, dict):
                raise MetadataParseError(
                    "The value of the 'tableSchema' property must be a JSON object")
            schema_inherited = self.parse_inherited(schema, parent=table_inherited)
            table.inherited = schema_inherited
            cols = schema.get("columns")
            if cols is not None:
                if not isinstance(cols, list):
                    raise MetadataParseError(
                        "The value of the 'columns' property must be a JSON array")
                table.columns = []
                seen_names = set()
                seen_virtual = False
                for i, item in enumerate(cols, start=1):
                    if not isinstance(item, dict):
                        raise MetadataParseError(
                            "The items in the 'columns' array must be JSON objects")
                    col = self.parse_column(item, i, schema_inherited)
                    if col.name in seen_names:
                        raise MetadataParseError(
                            f"Duplicate column name '{col.name}'")
                    seen_names.add(col.name)
                    if col.virtual:
                        seen_virtual = True
                    elif seen_virtual:
                        raise MetadataParseError(
                            "Virtual columns must come after all non-virtual columns")
                    table.columns.append(col)
                self.validate_foreign_keys(schema, table)
            rt = schema.get("rowTitles")
            if isinstance(rt, str):
                table.row_titles = [rt]
            elif isinstance(rt, list):
                table.row_titles = [x for x in rt if isinstance(x, str)]
            table.had_schema = True
            # else columns stay None -> inferred from header at convert time
        else:
            table.inherited = table_inherited

        table.common_properties = self.parse_common(root)
        table.notes = self.parse_notes(root)
        group.tables.append(table)
        schema_raw = root.get("tableSchema") or {}
        self._fk_specs.append((table, schema_raw.get("foreignKeys")
                               if isinstance(schema_raw, dict) else None))
        self._explicit_names[table.url] = _explicit_column_names(schema_raw)
        return table

    def validate_foreign_keys(self, schema: dict, table: Table) -> None:
        """Structural validation of foreignKeys (W3C; the reference only
        recognizes the property name, MetadataSpecHelper.cs:11). Source
        columns are checked here; destination resolution happens once the
        whole group is parsed (resolve_group_foreign_keys)."""
        fks = schema.get("foreignKeys")
        if fks is None:
            return
        if not isinstance(fks, list):
            raise MetadataParseError("'foreignKeys' must be an array")
        # a column referenced by a foreign key MUST have an explicit `name`
        # property (title-derived names don't count - W3C test104)
        names = _explicit_column_names(schema)
        for fk in fks:
            if not isinstance(fk, dict):
                # items that are not valid objects are ignored (W3C test097)
                self.warnings.append("Ignoring non-object foreignKeys entry")
                continue
            extras = set(fk) - {"columnReference", "reference"}
            if extras:
                raise MetadataParseError(
                    f"Invalid propert(ies) on foreign key: {sorted(extras)}")
            colref = fk.get("columnReference")
            cols = [colref] if isinstance(colref, str) else colref
            if not isinstance(cols, list) or not cols:
                raise MetadataParseError(
                    "Foreign key requires a 'columnReference'")
            for c in cols:
                if c not in names:
                    raise MetadataParseError(
                        f"Foreign key references unknown column '{c}'")
            ref = fk.get("reference")
            if not isinstance(ref, dict):
                raise MetadataParseError("Foreign key requires a 'reference' object")
            extras = set(ref) - {"resource", "schemaReference", "columnReference"}
            if extras:
                raise MetadataParseError(
                    f"Invalid propert(ies) on foreign key reference: {sorted(extras)}")
            rcolref = ref.get("columnReference")
            rcols = [rcolref] if isinstance(rcolref, str) else rcolref
            if not isinstance(rcols, list) or not rcols:
                raise MetadataParseError(
                    "Foreign key reference requires a 'columnReference'")
            if "resource" not in ref and "schemaReference" not in ref:
                raise MetadataParseError(
                    "Foreign key reference requires 'resource' or 'schemaReference'")

    def resolve_group_foreign_keys(self, group: TableGroup) -> None:
        by_url = {t.url: t for t in group.tables}
        for table, fks in self._fk_specs:
            if not isinstance(fks, list):
                continue
            for fk in fks:
                ref = fk.get("reference") if isinstance(fk, dict) else None
                if not isinstance(ref, dict):
                    continue
                resource = ref.get("resource")
                if resource is None:
                    continue
                if not isinstance(resource, str):
                    # parse error, not a TypeError from urljoin (review fix)
                    raise MetadataParseError(
                        "The value of the 'resource' property must be a string")
                target = by_url.get(urljoin(self.base_uri, resource))
                if target is None:
                    raise MetadataParseError(
                        f"Foreign key references unknown table '{resource}'")
                rcolref = ref.get("columnReference")
                rcols = [rcolref] if isinstance(rcolref, str) else (rcolref or [])
                tnames = self._explicit_names.get(target.url, set())
                for c in rcols:
                    if c not in tnames:
                        raise MetadataParseError(
                            f"Foreign key references unknown column '{c}' "
                            f"in table '{resource}'")

    # -- column ----------------------------------------------------------------

    def parse_column(self, root: dict, column_number: int, parent: dict) -> Column:
        col = Column()
        if "name" in root:
            if not isinstance(root["name"], str):
                self.warnings.append("The value of the 'name' property must be a string")
            elif not _VALID_NAME_RE.match(root["name"]):
                # covers the reference's leading-underscore rule
                # (JsonMetadataParser.cs:314-318) plus the W3C name
                # production; invalid -> warning, titles/positional fallback
                self.warnings.append(
                    f"Column name {root['name']!r} is not a valid name.")
            else:
                col.name = root["name"]
        if "titles" in root:
            col.titles = self.parse_natural_language(root["titles"])
        if "default" in root:
            if not isinstance(root["default"], str):
                self.warnings.append("The value of the 'default' property must be a string")
            else:
                col.default = root["default"]
        if "virtual" in root:
            if not isinstance(root["virtual"], bool):
                self.warnings.append("The value of the 'virtual' property must be a boolean")
            else:
                col.virtual = root["virtual"]
        if col.name is None and col.titles:
            by_lang = {lang: v for lang, v in reversed(col.titles)}
            col.name = by_lang.get(self.default_language) or by_lang.get("und")
        if col.name is None:
            col.name = f"_col.{column_number}"
        col.suppress_output = self.parse_suppress_output(root)

        inherited = self.parse_inherited(root, parent=parent)
        col.about_url = inherited.get("about_url")
        col.property_url = inherited.get("property_url")
        col.value_url = inherited.get("value_url")
        col.datatype = inherited.get("datatype")
        col.lang = inherited.get("lang")
        col.null_values = inherited.get("null_values", ("",))
        col.separator = inherited.get("separator")
        col.ordered = inherited.get("ordered", False)
        if col.default is None:
            col.default = parent.get("default")
        return col

    # -- shared ------------------------------------------------------------------

    def parse_inherited(self, root: dict, parent: dict) -> dict:
        """ParseInheritedProperties (JsonMetadataParser.cs:468-583), with the
        parent chain flattened: a property explicitly present here overrides
        the parent's resolved value. 'null' inherits like the other
        inherited properties (the W3C inherited-property list includes it;
        suite-conformant). NB the reference's own getter can never fall
        back for null (_null is initialized to {""} at every level,
        InheritedPropertyContainer.cs:34,86), a divergence its goldens
        never exercise - this port follows the spec."""
        out = dict(parent)
        if "datatype" in root:
            dt = root["datatype"]
            if isinstance(dt, str):
                # pre-normalization string form
                if dt in DATATYPE_ANNOTATIONS:
                    out["datatype"] = Datatype(base=dt)
                else:
                    self.warnings.append(f"Unsupported base datatype '{dt}'")
            elif isinstance(dt, dict):
                out["datatype"] = self.parse_datatype(dt)
            else:
                raise MetadataParseError(
                    "The value of the 'datatype' property must be a string or a JSON object")
        if "lang" in root:
            if isinstance(root["lang"], str):
                if is_valid_language_tag(root["lang"]):
                    out["lang"] = root["lang"]
                else:
                    self.warnings.append(
                        f"The value '{root['lang']}' is not a valid BCP-47 language tag.")
            else:
                self.warnings.append("The value of the 'lang' property must be a string")
        for prop, key in (("aboutUrl", "about_url"), ("propertyUrl", "property_url"),
                          ("valueUrl", "value_url")):
            if prop in root:
                if not isinstance(root[prop], str):
                    raise MetadataParseError(
                        f"The value of the '{prop}' property must be a string")
                out[key] = root[prop]
        if "null" in root:
            nv = root["null"]
            if isinstance(nv, list):
                out["null_values"] = tuple(str(v) for v in nv)
            elif nv is not None:
                out["null_values"] = (str(nv),)
        if "ordered" in root:
            if isinstance(root["ordered"], bool):
                out["ordered"] = root["ordered"]
            else:
                self.warnings.append(
                    "The value of the 'ordered' property must be a boolean")
        if "required" in root:
            if isinstance(root["required"], bool):
                out["required"] = root["required"]
            else:
                self.warnings.append(
                    "The value of the 'required' property must be a boolean")
        if "separator" in root:
            if isinstance(root["separator"], (str, type(None))):
                out["separator"] = root["separator"]
            else:
                self.warnings.append(
                    "The value of the 'separator' property must be a string")
        return out

    def parse_datatype(self, root: dict) -> Datatype:
        dt = Datatype()
        base = root.get("base", "string")
        if not isinstance(base, str):
            raise MetadataParseError("The value of the 'base' property must be a string")
        if base in DATATYPE_ANNOTATIONS:
            dt.base = base
        else:
            self.warnings.append(f"Unsupported base datatype '{base}'")
            dt.base = "string"
        if "@id" in root:
            vid = root["@id"]
            if not isinstance(vid, str) or vid.startswith("_:"):
                raise MetadataParseError(
                    "The datatype @id must be an IRI and must not start with '_:'")
            if vid in set(DATATYPE_ANNOTATIONS.values()):
                raise MetadataParseError(
                    "The datatype @id must not be the IRI of a built-in datatype")
            dt.id = vid
        if "format" in root:
            from .formats import FormatError
            try:
                dt.format = make_format(dt.base, root["format"])
            except FormatError as ex:
                self.warnings.append(f"Ignoring invalid format: {ex}")
        self._validate_constraints(dt, root)
        return dt

    _STRINGY_BASES = {"string", "normalizedString", "token", "language",
                      "Name", "NMTOKEN", "QName", "anyURI", "xml", "html",
                      "json", "base64Binary", "hexBinary", "binary",
                      "anyAtomicType", "any"}

    def _validate_constraints(self, dt: Datatype, root: dict) -> None:
        """W3C datatype-constraint applicability (negative tests 199-201,
        222-227, 261): length facets apply only to string/binary bases;
        value facets never apply to string bases; min/max bounds must be
        consistent. Constraints are recorded but (like the reference,
        Rdf/Converter.cs:527-531) never enforced on cell values."""
        length_keys = [k for k in ("length", "minLength", "maxLength")
                       if k in root]
        if length_keys and dt.base not in self._STRINGY_BASES:
            raise MetadataParseError(
                f"Length constraints are not applicable to datatype '{dt.base}'")
        def _num(k):
            v = root.get(k)
            return v if isinstance(v, (int, float)) and not isinstance(v, bool) else None
        mn, mx, ln = _num("minLength"), _num("maxLength"), _num("length")
        if mn is not None and mx is not None and mn > mx:
            raise MetadataParseError("minLength must be <= maxLength")
        if ln is not None and ((mn is not None and ln < mn)
                               or (mx is not None and ln > mx)):
            raise MetadataParseError("length must satisfy minLength/maxLength")
        value_keys = [k for k in ("minimum", "maximum", "minInclusive",
                                  "maxInclusive", "minExclusive",
                                  "maxExclusive") if k in root]
        if value_keys and dt.base in self._STRINGY_BASES:
            raise MetadataParseError(
                f"Value constraints are not applicable to datatype '{dt.base}'")
        if "minInclusive" in root and "minExclusive" in root:
            raise MetadataParseError(
                "minInclusive and minExclusive may not both be specified")
        if "maxInclusive" in root and "maxExclusive" in root:
            raise MetadataParseError(
                "maxInclusive and maxExclusive may not both be specified")

        def _cmp_pair(lo_key, hi_key, strict):
            lo, hi = root.get(lo_key), root.get(hi_key)
            if lo is None or hi is None:
                return
            if type(lo) is bool or type(hi) is bool:
                return
            if isinstance(lo, (int, float)) != isinstance(hi, (int, float)):
                return
            if (hi < lo) if not strict else (hi <= lo):
                raise MetadataParseError(
                    f"{hi_key} must be {'>' if strict else '>='} {lo_key}")

        _cmp_pair("minInclusive", "maxInclusive", strict=False)
        _cmp_pair("minInclusive", "maxExclusive", strict=True)
        _cmp_pair("minExclusive", "maxInclusive", strict=True)
        _cmp_pair("minExclusive", "maxExclusive", strict=False)
        for k in length_keys:
            dt.constraints.append((k, root[k]))
        for k in value_keys:
            dt.constraints.append((k, root[k]))

    def parse_dialect(self, root: dict) -> Dialect:
        d = Dialect(
            comment_prefix=self._string(root, "commentPrefix", "#"),
            comment_prefix_explicit="commentPrefix" in root,
            delimiter=self._string(root, "delimiter", ","),
            double_quote=self._bool(root, "doubleQuote", True),
            encoding=self._string(root, "encoding", "utf-8"),
            header=self._bool(root, "header", True),
            line_terminators=tuple(self._strings(root, "lineTerminators",
                                                 ("\r\n", "\n"))),
            quote_char=self._string(root, "quoteChar", '"', allow_null=True),
            skip_blank_rows=self._bool(root, "skipBlankRows", False),
            skip_columns=self._nonneg(root, "skipColumns", 0),
            skip_initial_space=self._bool(root, "skipInitialSpace", False),
            skip_rows=self._nonneg(root, "skipRows", 0),
        )
        d.header_row_count = self._nonneg(root, "headerRowCount", 1 if d.header else 0)
        if "trim" in root:
            t = root["trim"]
            if isinstance(t, bool):
                d.trim = "true" if t else "false"
            elif t in ("true", "false", "start", "end"):
                d.trim = t
            else:
                self.warnings.append(
                    "Expected trim to be one of 'true', 'false', 'start', 'end'.")
                d.trim = "true"
        else:
            d.trim = "start" if d.skip_initial_space else "false"
        try:
            import codecs
            codecs.lookup(d.encoding)
        except LookupError:
            self.warnings.append(
                f"{d.encoding} is not a recognized text encoding. Using 'utf-8'")
            d.encoding = "utf-8"
        return d

    def parse_link(self, token, prop: str) -> str:
        if not isinstance(token, str):
            self.warnings.append(f"Value of property '{prop}' must be a string")
            token = ""
        return urljoin(self.base_uri, token)

    def parse_natural_language(self, tok) -> list:
        ret = []
        if isinstance(tok, str):
            ret.append((self.default_language, tok))
        elif isinstance(tok, dict):
            for lang, v in tok.items():
                if isinstance(v, list):
                    ret.extend((lang, str(item)) for item in v)
                else:
                    ret.append((lang, str(v)))
        elif isinstance(tok, list):
            for item in tok:
                ret.extend(self.parse_natural_language(item))
        return ret

    def parse_suppress_output(self, root: dict) -> bool:
        if "suppressOutput" in root:
            if not isinstance(root["suppressOutput"], bool):
                self.warnings.append(
                    "The value of the 'suppressOutput' property must be a boolean")
                return False
            return root["suppressOutput"]
        return False

    @staticmethod
    def parse_common(root: dict) -> dict:
        return {k: v for k, v in root.items() if is_common_property(k)}

    def parse_notes(self, root: dict):
        if "notes" in root:
            if not isinstance(root["notes"], list):
                raise MetadataParseError("The value of the 'notes' property must be a JSON array")
            return root["notes"]
        return None

    # -- lenient scalar parsing (JsonMetadataParser.cs:386-466) -------------------

    def _string(self, root, name, default, allow_null=False):
        if name in root:
            v = root[name]
            if isinstance(v, str):
                return v
            if allow_null and v is None:
                return None
            self.warnings.append(f"Value of '{name}' must be a string")
        return default

    def _bool(self, root, name, default):
        if name in root:
            v = root[name]
            if isinstance(v, bool):
                return v
            self.warnings.append(f"Value of '{name}' must be a boolean")
        return default

    def _nonneg(self, root, name, default):
        if name in root:
            v = root[name]
            if isinstance(v, int) and not isinstance(v, bool):
                if v >= 0:
                    return v
                self.warnings.append(
                    f"Expected value of '{name}' to be a non-negative integer.")
            else:
                self.warnings.append(f"Value of '{name}' must be an integer")
        return default

    def _strings(self, root, name, default):
        if name not in root:
            return default
        v = root[name]
        if isinstance(v, list):
            return tuple(x for x in v if isinstance(x, str))
        if isinstance(v, str):
            return (v,)
        self.warnings.append(f"Value of '{name}' must be an array of strings or a string")
        return default
