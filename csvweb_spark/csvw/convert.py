"""The csv2rdf conversion kernel: one annotated CSV document -> triples.

Pure-Python, deterministic re-implementation of the row/cell loop of
/root/reference/src/DataDock.CsvWeb/Rdf/Converter.cs:265-471 (W3C csv2rdf
section 4 algorithm).  This kernel is the unit of work of the heterogeneous
Spark path (operators/triples.py::convert_pages runs it per page inside
mapInPandas over Arrow batches); the homogeneous scale path compiles the
same semantics into native Spark column expressions and is tested for
triple-set equality against this kernel.

Triple representation (FIXTURES.md §3): a tuple
    (subj, pred, obj, obj_kind, obj_datatype, obj_lang)
with obj_kind in {'iri', 'literal', 'bnode'} and blank nodes rendered as
deterministic skolem labels '_:...' (graph-isomorphic to the reference's
fresh bnodes; the W3C harness compares blank-node-insensitively,
Tests/CsvwTestCasesSpec.cs:159-168).
"""

from __future__ import annotations

import csv as _csv
import io
from dataclasses import dataclass, field
from typing import Iterator, Optional

from .cells import normalize_cell
from .context import CSVW_NS, RDF_NS, RDF_TYPE
from .formats import FormatError
from .model import (
    Column,
    ConversionError,
    Table,
    TableGroup,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
)
from .normalize_meta import expand_url
from .uritemplate import (
    BindingError,
    CompiledTemplate,
    compile_template,
    resolve_against_base,
)

MODE_STANDARD = "standard"
MODE_MINIMAL = "minimal"

IRI, LITERAL, BNODE = "iri", "literal", "bnode"


@dataclass
class Triple:
    subj: str
    pred: str
    obj: str
    obj_kind: str = LITERAL
    obj_datatype: Optional[str] = None
    obj_lang: Optional[str] = None

    def astuple(self):
        return (self.subj, self.pred, self.obj, self.obj_kind,
                self.obj_datatype, self.obj_lang)


@dataclass
class ConversionResult:
    triples: list = field(default_factory=list)
    errors: list = field(default_factory=list)


def parse_csv_rows(text: str, dialect,
                   apply_default_comment: bool = True,
                   with_positions: bool = False) -> Iterator:
    """CSV records honoring the dialect subset the reference applies
    (Rdf/Converter.cs:491-511): comment prefix, delimiter, blank-row policy.
    Trimming is NOT done here (reference disables reader-level trimming).
    A leading UTF-8 BOM is stripped (C# StreamReader behavior).
    apply_default_comment=False suppresses the reference's implicit '#'
    comment prefix (W3C default dialect has none).

    with_positions=True yields (source_row, record) instead, where
    source_row is the 1-based position in the SOURCE file counting every
    record - including comment lines and skipped blank rows - the W3C
    _sourceRow definition (and the reference's csv.Context.Row, which
    feeds #row= URLs and error messages). NOTE this DELIBERATELY diverges
    from the reference's _sourceRow template binding: Converter.cs:323-329
    binds context.SourceRow = headerRowCount + logical row, which drifts
    from the physical position after any skipped mid-file comment/blank
    row; we follow the spec, so generated IRIs differ from the reference's
    on files with mid-file comments (none of its goldens have any)."""
    if text.startswith("﻿"):
        text = text[1:]
    if not apply_default_comment and not getattr(
            dialect, "comment_prefix_explicit", False):
        comment = None
    else:
        comment = (dialect.comment_prefix or "#")[0]
    quote = ((dialect.quote_char or '"')[0]
             if dialect.quote_char is not None else '"')
    delim = dialect.delimiter or ","
    # comment lines are stripped on the RAW text (CsvHelper AllowComments
    # checks the raw line at a record boundary, so a QUOTED first field
    # starting with the char is data - round-2 review fix: the old check
    # on the parsed field dropped such rows) with quote-state tracking
    # (parity per line - exact for doublequote escaping); their positions
    # still count toward source_row below
    comment_positions: set[int] = set()
    if comment is not None:
        kept, in_quotes, pos = [], False, 0
        for line in text.splitlines(keepends=True):
            if not in_quotes and line.startswith(comment):
                pos += 1
                comment_positions.add(pos)
                continue
            kept.append(line)
            if quote and line.count(quote) % 2 == 1:
                if not in_quotes:
                    pos += 1  # record starts on this line
                in_quotes = not in_quotes
            elif not in_quotes:
                pos += 1
        text = "".join(kept)
    if len(delim) == 1:
        rows = _csv.reader(
            io.StringIO(text, newline=""),
            delimiter=delim,
            quotechar=quote,
            doublequote=True,
            strict=False,
        )
    else:
        # multi-character delimiter: quote-unaware line splitter fallback
        rows = (line.split(delim) for line in text.splitlines())
    pos = 0
    for row in rows:
        pos += 1
        while pos in comment_positions:
            pos += 1
        if not row:  # truly empty line - CsvHelper IgnoreBlankLines default
            continue
        if dialect.skip_blank_rows and all(f == "" for f in row):
            continue
        yield (pos, row) if with_positions else row


def _compiled(template: Optional[str]) -> Optional[CompiledTemplate]:
    return compile_template(template) if template is not None else None


def encode_column_name(name: str) -> str:
    """W3C column-name production: [A-Za-z0-9] first, [A-Za-z0-9._] after,
    everything else uppercase-percent-encoded (how the suite's expected
    graphs render title-derived names). The reference leaves names raw
    (escaping golden) - this is only applied in 'w3c' uri_escaping mode."""
    out = []
    for i, ch in enumerate(name):
        ok = ch.isascii() and (ch.isalnum() or ch == "_" or (i > 0 and ch in "."))
        if ok:
            out.append(ch)
        else:
            out.extend("%%%02X" % b for b in ch.encode("utf-8"))
    return "".join(out)


def _default_datetime_normalize(lit: str, datatype_iri: str) -> str:
    """Converter.NormalizeLiteral's built-in date/dateTime handling
    (Rdf/Converter.cs:577-595): DateTime.Parse + dotNetRDF's XSD render
    formats ('yyyy-MM-ddK' / 'yyyy-MM-ddTHH:mm:ss.ffffffK')."""
    from datetime import datetime

    import re as _re

    s = lit.strip()
    try:
        if datatype_iri == XSD_DATE:
            # already-canonical date (optionally with a timezone): keep
            if _re.match(r"^-?\d{4,}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?$", s):
                return s
            for fmt in ("%m/%d/%Y", "%d %B %Y"):
                try:
                    return datetime.strptime(s, fmt).strftime("%Y-%m-%d")
                except ValueError:
                    continue
            return datetime.fromisoformat(s).strftime("%Y-%m-%d")
        if datatype_iri == XSD_DATETIME:
            d = datetime.fromisoformat(s.replace("Z", "+00:00"))
            base = d.strftime("%Y-%m-%dT%H:%M:%S")
            if d.microsecond:
                base += ("%.6f" % (d.microsecond / 1e6))[1:].rstrip("0")
            if d.tzinfo is not None:
                off = d.utcoffset()
                total = int(off.total_seconds() // 60)
                if total == 0:
                    return base + "Z"
                sign = "+" if total >= 0 else "-"
                return f"{base}{sign}{abs(total) // 60:02d}:{abs(total) % 60:02d}"
            return base
    except ValueError as ex:
        raise ConversionError(str(ex))
    return lit


def normalize_literal(lit: str, column: Column,
                      offset_style: str = "short") -> str:
    """Converter.NormalizeLiteral (577-595)."""
    dt = column.datatype
    if dt is not None and dt.format is not None:
        try:
            from .formats import DateTimeFormat, TimeFormat
            if isinstance(dt.format, (TimeFormat, DateTimeFormat)):
                dt.format.offset_style = offset_style
            return dt.format.normalize(lit)
        except FormatError as ex:
            raise ConversionError(str(ex))
    iri = column.datatype_iri
    if iri in (XSD_DATE, XSD_DATETIME):
        return _default_datetime_normalize(lit, iri)
    if iri == XSD_BOOLEAN:
        # default boolean lexical mapping: 1 -> true, 0 -> false
        if lit == "1":
            return "true"
        if lit == "0":
            return "false"
    return lit


_LEXICAL_RES = {
    "integer": r"[+-]?\d+",
    "long": r"[+-]?\d+", "int": r"[+-]?\d+", "short": r"[+-]?\d+",
    "byte": r"[+-]?\d+", "nonNegativeInteger": r"\+?\d+",
    "positiveInteger": r"\+?\d+", "unsignedLong": r"\+?\d+",
    "unsignedInt": r"\+?\d+", "unsignedShort": r"\+?\d+",
    "unsignedByte": r"\+?\d+", "nonPositiveInteger": r"(-\d+|0+)",
    "negativeInteger": r"-\d+",
    "decimal": r"[+-]?(\d+(\.\d*)?|\.\d+)",
    "double": r"([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[+-]?INF|NaN)",
    "float": r"([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[+-]?INF|NaN)",
    "number": r"([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[+-]?INF|NaN)",
    "boolean": r"(true|false|1|0)",
    "date": r"-?\d{4,}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?",
    "dateTime": r"-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?",
    "datetime": r"-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?",
    "time": r"\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?",
    "gYear": r"-?\d{4,}_TZ", "gMonth": r"--\d{2}_TZ", "gDay": r"---\d{2}_TZ",
    "gYearMonth": r"-?\d{4,}-\d{2}_TZ", "gMonthDay": r"--\d{2}-\d{2}_TZ",
    "duration": r"-?P(?!$)(\d+Y)?(\d+M)?(\d+D)?(T(?!$)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?",
    "dayTimeDuration": r"-?P(?!$)(\d+D)?(T(?!$)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?",
    "yearMonthDuration": r"-?P(?!$)(\d+Y)?(\d+M)?",
}
_TZ_SUFFIX = r"(Z|[+-]\d{2}:\d{2})?"
_LEXICAL_COMPILED = {
    k: __import__("re").compile("^(" + v.replace("_TZ", _TZ_SUFFIX) + ")$")
    for k, v in _LEXICAL_RES.items()}


def lexical_valid(value: str, column: Column) -> bool:
    """W3C cell-parsing step 8 value check: format.IsValid when a format is
    declared, else the base type's lexical space (bases without a rule
    accept everything). The reference skips this entirely
    (ValidateCellValue stub, Rdf/Converter.cs:527-531); implementing it
    aligns emitted datatypes with the W3C suite's expected graphs."""
    dt = column.datatype
    if dt is None:
        return True
    if dt.format is not None:
        try:
            return dt.format.is_valid(value)
        except Exception:
            return False
    rx = _LEXICAL_COMPILED.get(dt.base)
    if rx is not None and rx.match(value) is None:
        return False
    rng = _INTEGER_RANGES.get(dt.base)
    if rng is not None:
        try:
            iv = int(value)
        except ValueError:
            return False
        if not rng[0] <= iv <= rng[1]:
            return False
    return _constraints_satisfied(value, dt)


_INTEGER_RANGES = {
    "byte": (-128, 127), "short": (-32768, 32767),
    "int": (-2**31, 2**31 - 1), "long": (-2**63, 2**63 - 1),
    "unsignedByte": (0, 255), "unsignedShort": (0, 65535),
    "unsignedInt": (0, 2**32 - 1), "unsignedLong": (0, 2**64 - 1),
    "nonNegativeInteger": (0, 10**400), "positiveInteger": (1, 10**400),
    "nonPositiveInteger": (-10**400, 0), "negativeInteger": (-10**400, -1),
}


def _constraints_satisfied(value: str, dt) -> bool:
    """W3C length/value facet checks: violating cells fall back to
    xsd:string (the reference parses but never enforces constraints)."""
    for key, bound in dt.constraints:
        if key in ("length", "minLength", "maxLength"):
            if dt.base in ("hexBinary",):
                n = len(value) // 2
            elif dt.base in ("base64Binary", "binary"):
                import base64 as _b64
                try:
                    n = len(_b64.b64decode(value, validate=True))
                except Exception:
                    return False
            else:
                n = len(value)
            if key == "length" and n != bound:
                return False
            if key == "minLength" and n < bound:
                return False
            if key == "maxLength" and n > bound:
                return False
        else:
            if isinstance(bound, (int, float)) and not isinstance(bound, bool):
                try:
                    v = float(value)
                except ValueError:
                    continue
            else:
                v = value  # ISO dates/times compare lexically
                bound = str(bound)
            if key in ("minimum", "minInclusive") and v < bound:
                return False
            if key == "minExclusive" and v <= bound:
                return False
            if key in ("maximum", "maxInclusive") and v > bound:
                return False
            if key == "maxExclusive" and v >= bound:
                return False
    return True


def make_literal(value: str, column: Column,
                 suppress_string_datatype: bool = False,
                 offset_style: str = "short") -> Triple:
    """Converter.CreateLiteralNode (533-559) - returns a Triple shell with
    only the object fields populated; invalid-for-datatype values fall back
    to xsd:string (W3C; see lexical_valid)."""
    iri = column.datatype_iri
    if iri == XSD_STRING:
        if column.lang:
            return Triple("", "", value, LITERAL, None, column.lang)
        if suppress_string_datatype:
            return Triple("", "", value, LITERAL, None, None)
    if iri != XSD_STRING and not lexical_valid(value, column):
        return Triple("", "", value, LITERAL, XSD_STRING, None)
    value = normalize_literal(value, column, offset_style)
    return Triple("", "", value, LITERAL, iri, None)


class PageConverter:
    """Converts one annotated table (one page's CSV payload).

    Blank-node labels are deterministic skolem ids scoped by `bnode_scope`
    (empty for single-table runs; the Spark paths pass a per-url scope so
    labels are globally unique across a trillion-page corpus)."""

    def __init__(self, mode: str = MODE_MINIMAL, bnode_scope: str = "",
                 suppress_string_datatype: bool = False,
                 uri_escaping: str = "reference"):
        self.mode = mode
        self.scope = bnode_scope
        self.suppress_string_datatype = suppress_string_datatype
        # 'reference': no percent-encoding anywhere (UriTemplate.cs and the
        # escaping golden); 'w3c': encode column names in default predicates
        # and template-substituted values per the CSVW spec
        self.uri_escaping = uri_escaping
        self._bnode_counter = 0

    def _offset_style(self) -> str:
        return "full" if self.uri_escaping == "w3c" else "short"

    def _fresh_bnode(self, hint: str) -> str:
        self._bnode_counter += 1
        return f"_:{self.scope}{hint}{self._bnode_counter}"

    # -- public API -----------------------------------------------------------

    def convert_table_group(self, group: TableGroup,
                            csv_texts: dict) -> ConversionResult:
        """ConvertAsync(TableGroup) (Rdf/Converter.cs:227-263).
        csv_texts maps table url -> CSV text."""
        result = ConversionResult()
        if not group.tables:
            result.errors.append(
                "The CSV metadata must contain at least one table definition.")
            return result
        group_node = None
        if self.mode == MODE_STANDARD:
            group_node = group.id if group.id else self._fresh_bnode("g")
            result.triples.append(Triple(group_node, RDF_TYPE,
                                         CSVW_NS + "TableGroup", IRI))
            # common properties / notes are standard-mode only (minimal
            # mode emits cell triples exclusively; suite test237)
            self._emit_common_properties(result, group_node,
                                         group.common_properties)
            if getattr(group, "notes", None):
                # W3C 4.2 step 3: group notes emit like table notes
                # (round-2 review fix: parsed but never emitted)
                self._emit_common_property(result, group_node,
                                           CSVW_NS + "note", group.notes)
        for table in group.tables:
            if table.suppress_output:
                continue
            text = csv_texts[table.url]
            self.convert_table(table, text, result, group_node)
        return result

    def convert_table(self, table: Table, text: str,
                      result: Optional[ConversionResult] = None,
                      group_node: Optional[str] = None) -> ConversionResult:
        """Convert(Table, TextReader) (Rdf/Converter.cs:265-471)."""
        if result is None:
            result = ConversionResult()
        table_node = None
        if self.mode == MODE_STANDARD:
            table_node = table.id if table.id else self._fresh_bnode("t")
            if group_node is not None:
                result.triples.append(Triple(group_node, CSVW_NS + "table",
                                             table_node,
                                             IRI if table.id else BNODE))
            result.triples.append(Triple(table_node, RDF_TYPE,
                                         CSVW_NS + "Table", IRI))
            result.triples.append(Triple(table_node, CSVW_NS + "url",
                                         table.url, IRI))
            self._emit_common_properties(result, table_node,
                                         table.common_properties)
            if table.notes:
                self._emit_common_property(result, table_node,
                                           CSVW_NS + "note", table.notes)

        dialect = table.dialect
        header_rows = dialect.effective_header_row_count()
        rows = parse_csv_rows(text, dialect,
                              apply_default_comment=(self.uri_escaping
                                                     != "w3c"),
                              with_positions=True)

        # names come from the FIRST header row (Converter.cs:300-305 reads
        # the header then skips the extras; round-2 review fix: the loop
        # kept the LAST)
        header_record = None
        for k in range(header_rows):
            rec = next(rows, None)
            if k == 0 and rec is not None:
                header_record = rec[1]

        columns = table.columns
        if columns is None:
            if header_rows > 0 and header_record is not None:
                positional = (self.uri_escaping == "w3c"
                              and getattr(table, "had_schema", False))
                seen = set()
                columns = []
                for i, name in enumerate(header_record, start=1):
                    if not positional:
                        # reference-mode duplicate-header dedup; positional
                        # _col.N naming makes every header distinct, and
                        # deduping on the TITLE there would misalign names
                        # against record indexes (round-2 review fix)
                        if name in seen:
                            continue
                        seen.add(name)
                    col = table.make_inferred_column(name, i)
                    if positional:
                        col.titles = [(None, name)]
                        col.name = f"_col.{i}"
                    columns.append(col)
            else:
                columns = []
        # working copy - default columns may be appended for overflow cells
        columns = list(columns)

        about_tpl = [_compiled(c.about_url) for c in columns]
        prop_tpl = [_compiled(c.property_url) for c in columns]
        value_tpl = [_compiled(c.value_url) for c in columns]

        logical_row = 0
        for source_row, record in rows:
            # source_row is the record's physical position in the file
            # (comment/blank rows counted - W3C _sourceRow; deliberate
            # divergence from the reference's header_rows + logical_row
            # binding, see parse_csv_rows docstring)
            logical_row += 1

            row_node = None
            if self.mode == MODE_STANDARD:
                row_node = self._fresh_bnode("r")
                result.triples.append(Triple(table_node, CSVW_NS + "row",
                                             row_node, BNODE))
                result.triples.append(Triple(row_node, RDF_TYPE,
                                             CSVW_NS + "Row", IRI))
                result.triples.append(Triple(row_node, CSVW_NS + "rownum",
                                             str(logical_row), LITERAL,
                                             XSD_INTEGER))
                result.triples.append(Triple(row_node, CSVW_NS + "url",
                                             f"{table.url}#row={source_row}",
                                             IRI))

            if self.mode == MODE_STANDARD and table.row_titles and row_node:
                # 4.6.6: row titles -> (R, csvw:title, tv) per titled column
                for rt_name in table.row_titles:
                    for i, col in enumerate(columns):
                        if col.name == rt_name and i < len(record):
                            cell = normalize_cell(record[i], col)
                            if cell.value is not None:
                                result.triples.append(Triple(
                                    row_node, CSVW_NS + "title", cell.value,
                                    LITERAL,
                                    None if col.lang else XSD_STRING,
                                    col.lang))
            s_def = f"_:{self.scope}sd{logical_row}"
            source_col_ix = dialect.skip_columns
            source_count = len(record)
            col_ix = 0
            while source_col_ix < source_count or col_ix < len(columns):
                if col_ix >= len(columns):
                    c = table.make_inferred_column(None, col_ix + 1)
                    columns.append(c)
                    about_tpl.append(_compiled(c.about_url))
                    prop_tpl.append(_compiled(c.property_url))
                    value_tpl.append(_compiled(c.value_url))
                c = columns[col_ix]
                if c.suppress_output:
                    col_ix += 1
                    source_col_ix += 1
                    continue

                ctx = _BindContext(table, columns, record, dialect,
                                   logical_row, source_row,
                                   col_ix + 1, source_col_ix + 1, c.name)
                try:
                    self._convert_cell(result, table, c, record, col_ix, ctx,
                                       s_def, row_node,
                                       about_tpl[col_ix], prop_tpl[col_ix],
                                       value_tpl[col_ix])
                # broad catch is reference parity (Converter.cs
                # catch(Exception) around the per-cell loop); expected
                # types are ConversionError and BindingError
                except Exception as ex:
                    result.errors.append(
                        f"Conversion error at row {source_row}, column "
                        f"'{c.name}'. {ex}")
                col_ix += 1
                source_col_ix += 1
        return result

    # -- internals --------------------------------------------------------------

    def _convert_cell(self, result, table, c, record, col_ix, ctx,
                      s_def, row_node, about_tpl, prop_tpl, value_tpl):
        # 4.6.8.1 subject
        if about_tpl is None:
            s, s_kind = s_def, BNODE
        else:
            s = self._resolve_template(table, about_tpl, ctx)
            s_kind = IRI
            if s is None:
                # null subject -> triple construction fails -> cell error
                raise ConversionError("Cannot resolve aboutUrl template")
        if self.mode == MODE_STANDARD and row_node is not None:
            result.triples.append(Triple(row_node, CSVW_NS + "describes",
                                         s, s_kind))
        # 4.6.8.3 predicate
        if prop_tpl is None:
            name = c.name or ""
            if self.uri_escaping == "w3c":
                name = encode_column_name(name)
            p = resolve_against_base(table.url, "#" + name)
        else:
            p = self._resolve_template(table, prop_tpl, ctx)
            if p is None:
                raise ConversionError("Cannot resolve propertyUrl template")
        if value_tpl is not None:
            # 4.6.8.4 object from valueUrl; unresolvable -> no triple, no error
            o = self._resolve_template(table, value_tpl, ctx)
            if o is not None:
                result.triples.append(Triple(s, p, o, IRI))
            return
        raw = record[col_ix] if col_ix < len(record) else None
        if c.virtual:
            cell = normalize_cell(c.default, c)
        else:
            cell = normalize_cell(raw if raw is not None else c.default, c)
        if cell.is_list and cell.value_list is not None:
            values = [v for v in cell.value_list if v is not None]
            if c.ordered:
                # 4.6.8.5: ordered list -> rdf:List (TODO in the reference)
                if not values:
                    result.triples.append(Triple(
                        s, p, RDF_NS + "nil", IRI))
                else:
                    nodes = [self._fresh_bnode("l") for _ in values]
                    result.triples.append(Triple(s, p, nodes[0], BNODE))
                    for i, (node, v) in enumerate(zip(nodes, values)):
                        lit = make_literal(v, c, self.suppress_string_datatype,
                                           self._offset_style())
                        result.triples.append(Triple(
                            node, RDF_NS + "first", lit.obj, LITERAL,
                            lit.obj_datatype, lit.obj_lang))
                        nxt = nodes[i + 1] if i + 1 < len(nodes) else None
                        result.triples.append(Triple(
                            node, RDF_NS + "rest",
                            nxt if nxt else RDF_NS + "nil",
                            BNODE if nxt else IRI))
            else:
                for v in values:
                    lit = make_literal(v, c, self.suppress_string_datatype,
                                       self._offset_style())
                    result.triples.append(Triple(s, p, lit.obj, LITERAL,
                                                 lit.obj_datatype, lit.obj_lang))
        elif not cell.is_list and cell.value is not None:
            lit = make_literal(cell.value, c, self.suppress_string_datatype,
                               self._offset_style())
            result.triples.append(Triple(s, p, lit.obj, LITERAL,
                                         lit.obj_datatype, lit.obj_lang))

    def _resolve_template(self, table, tpl: CompiledTemplate, ctx) -> Optional[str]:
        """ResolveTemplate (597-609): binding failure -> None."""
        lookup = ctx.lookup
        if self.uri_escaping == "w3c":
            from urllib.parse import quote

            def lookup(var, _inner=ctx.lookup):
                v = _inner(var)
                return quote(v, safe="-._~!$&'()*+,;=:@/") if v is not None else None
        try:
            iri = tpl.resolve(lookup)
        except BindingError:
            return None
        return resolve_against_base(table.url, iri)

    # -- common properties (T3/T4, Rdf/Converter.cs:638-765) ---------------------

    def _emit_common_properties(self, result, subject, props: dict):
        for name, value in (props or {}).items():
            pred = expand_url(name)
            self._emit_common_property(result, subject, pred, value)

    def _emit_common_property(self, result, subject, predicate, value):
        subj = subject if subject is not None else self._fresh_bnode("cp")
        if isinstance(value, list):
            for item in value:
                self._emit_common_property(result, subject, predicate, item)
        elif isinstance(value, dict):
            if "@value" in value:
                lit = str(value["@value"])
                if "@type" in value:
                    result.triples.append(Triple(subj, predicate, lit, LITERAL,
                                                 expand_url(value["@type"])))
                elif "@language" in value:
                    result.triples.append(Triple(subj, predicate, lit, LITERAL,
                                                 None, value["@language"]))
                else:
                    result.triples.append(Triple(subj, predicate, lit, LITERAL,
                                                 XSD_STRING))
            else:
                if "@id" in value:
                    node, kind = value["@id"], IRI
                else:
                    node, kind = self._fresh_bnode("cp"), BNODE
                result.triples.append(Triple(subj, predicate, node, kind))
                t = value.get("@type")
                if t is not None:
                    for tv in (t if isinstance(t, list) else [t]):
                        result.triples.append(Triple(node, RDF_TYPE,
                                                     expand_url(str(tv)), IRI))
                for pname, pval in value.items():
                    if not pname.startswith("@"):
                        self._emit_common_property(result, node,
                                                   expand_url(pname), pval)
        elif isinstance(value, bool):
            result.triples.append(Triple(subj, predicate,
                                         "true" if value else "false",
                                         LITERAL, XSD_BOOLEAN))
        elif isinstance(value, int):
            result.triples.append(Triple(subj, predicate, str(value),
                                         LITERAL, XSD_INTEGER))
        elif isinstance(value, float):
            result.triples.append(Triple(subj, predicate, f"{value:E}",
                                         LITERAL, XSD_DOUBLE))
        else:
            result.triples.append(Triple(subj, predicate, str(value),
                                         LITERAL, XSD_STRING))


class _BindContext:
    """Template variable binding (Converter.ResolveProperty, 611-627):
    specials _row/_sourceRow/_column/_sourceColumn/_name; otherwise the RAW
    cell value of the named column (null-list checked, NOT whitespace
    normalized), fetched at skipColumns + schema index."""

    __slots__ = ("table", "columns", "record", "dialect", "row", "source_row",
                 "column", "source_column", "name")

    def __init__(self, table, columns, record, dialect, row, source_row,
                 column, source_column, name):
        self.table = table
        self.columns = columns
        self.record = record
        self.dialect = dialect
        self.row = row
        self.source_row = source_row
        self.column = column
        self.source_column = source_column
        self.name = name

    def lookup(self, var: str) -> Optional[str]:
        if var == "_row":
            return str(self.row)
        if var == "_sourceRow":
            return str(self.source_row)
        if var == "_column":
            return str(self.column)
        if var == "_sourceColumn":
            return str(self.source_column)
        if var == "_name":
            return self.name
        for i, col in enumerate(self.columns):
            if col.name is not None and col.name == var:
                src_ix = self.dialect.skip_columns + i
                v = self.record[src_ix] if src_ix < len(self.record) else None
                if v is not None and v in col.null_values:
                    return None
                return v
        raise ConversionError(
            f"Could not find a column named {var} in the CSV metadata.")
