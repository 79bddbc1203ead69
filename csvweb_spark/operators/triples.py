"""Triple extraction over a pages DataFrame - the engine's flagship operator.

Input (BASELINE.json input_hint): an Iceberg/parquet table of
Common-Crawl-style web pages (url:string, warc_ts:timestamp, html:binary,
text:string, lang:string).  Output: a triples DataFrame
(url, row, subj, pred, obj, obj_kind, obj_datatype, obj_lang).

Two execution paths, both semantically equal to the Python kernel in
csvw/convert.py (asserted by tests/test_spark_triples.py):

1. `convert_table_group_spark` - the HOMOGENEOUS scale path: one CSVW table
   descriptor applied to billions of pages of the same shape.
   Stage A (narrow, the only Python): `mapInPandas` batches of pages ->
   (url, row, vals array<string>) via the dialect-aware CSV reader.
   Stage B (narrow, all JVM): per-column CSVW semantics compiled ONCE on the
   driver into Catalyst expressions - whitespace normalization
   (translate/regexp_replace), default/null handling (coalesce/when/isin),
   URI-template expansion (concat of literals and null-checked raw cell
   refs), list splitting (split + transform + filter), literal datatype
   constants - producing one array<struct> of triples per row, flattened and
   exploded in a single whole-stage-codegen pass.  No shuffle anywhere:
   pages in -> triples out is a pure narrow pipeline, so it scales linearly
   with executors and parquet split count.
   Format-driven lexical normalization (date/time/number patterns), the one
   part Catalyst can't express, runs as a vectorized Arrow pandas UDF over
   only the affected columns' exploded triples.

2. `convert_pages_spark` - the HETEROGENEOUS path: per-page metadata
   (sidecar join on url-derived keys per the reference's discovery order,
   Rdf/Converter.cs:141-207), executed by the Python kernel per page inside
   `mapInPandas` with an executor-local parsed-metadata cache.

Reference semantics being re-expressed: Rdf/Converter.cs:265-471 (row/cell
loop), CellParser.cs:53-149, UriTemplate.cs:30-118.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import Column as SparkColumn, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, LongType, StringType, StructField, StructType,
)

from ..csvw.cells import normalize_cell
from ..csvw.context import CSVW_NS, RDF_TYPE
from ..csvw.convert import (
    MODE_MINIMAL, MODE_STANDARD, PageConverter, parse_csv_rows,
)
from ..csvw.formats import FormatError
from ..csvw.model import (
    Column, Table, TableGroup,
    RETAINS_LEADING_TRAILING_WS, RETAINS_LEADING_TRAILING_WS_IN_LIST,
    RETAINS_LINE_ENDINGS, XSD_DATE, XSD_DATETIME, XSD_INTEGER, XSD_STRING,
)
from ..csvw.uritemplate import SPECIAL_VARS, compile_template

TRIPLE_FIELDS = ["subj", "pred", "obj", "obj_kind", "obj_datatype", "obj_lang"]

ROWS_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("row", LongType()),
    StructField("src_row", LongType()),
    StructField("vals", ArrayType(StringType())),
])

TRIPLES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("row", LongType()),
    StructField("subj", StringType()),
    StructField("pred", StringType()),
    StructField("obj", StringType()),
    StructField("obj_kind", StringType()),
    StructField("obj_datatype", StringType()),
    StructField("obj_lang", StringType()),
])


# --------------------------------------------------------------------------
# Stage A: pages -> cell rows (the only Python on the homogeneous path)
# --------------------------------------------------------------------------


def extract_rows(pages_df: DataFrame, table: Table) -> DataFrame:
    """Parse each page's CSV payload into (url, row, vals) rows.

    Narrow mapInPandas: each Arrow batch of pages is expanded page by page
    with the C-speed csv module; the per-page logical row index is assigned
    here (deterministic, no global sort - SURVEY.md §4.2 item 3)."""
    dialect = table.dialect
    header_rows = dialect.effective_header_row_count()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, rows_out, srcs_out, vals_out = [], [], [], []
            for url, text in zip(pdf["url"], pdf["text"]):
                if text is None:
                    continue
                it = parse_csv_rows(text, dialect, with_positions=True)
                for _ in range(header_rows):
                    next(it, None)
                n_data = 0
                for i, (pos, rec) in enumerate(it, start=1):
                    urls.append(url)
                    rows_out.append(i)
                    srcs_out.append(pos)
                    vals_out.append(rec)
                    n_data = i
                if n_data == 0:
                    # sentinel for a page with ZERO data rows (header-only
                    # / all rows skipped): row 0 carries no cells but lets
                    # standard mode emit the Table/TableGroup scaffolding
                    # the kernel emits before its row loop (review fix:
                    # row==1-gated statics vanished for empty tables)
                    urls.append(url)
                    rows_out.append(0)
                    srcs_out.append(0)
                    vals_out.append([])
            if urls:  # empty frames infer wrong dtypes for Arrow
                yield pd.DataFrame({"url": urls, "row": rows_out,
                                    "src_row": srcs_out, "vals": vals_out})

    return pages_df.select("url", "text").mapInPandas(gen, ROWS_SCHEMA)


def infer_columns(table: Table, sample_text: str) -> list[Column]:
    """Header-based schema inference (Rdf/Converter.cs:512-525) done once on
    the driver from a sample page (homogeneous corpus => one header)."""
    it = parse_csv_rows(sample_text, table.dialect)
    header = None
    for k in range(table.dialect.effective_header_row_count()):
        rec = next(it, None)
        if k == 0:  # names come from the FIRST header row (kernel parity)
            header = rec
    cols, seen = [], set()
    if header:
        for i, name in enumerate(header, start=1):
            if name in seen:
                continue
            seen.add(name)
            cols.append(table.make_inferred_column(name, i))
    return cols


# --------------------------------------------------------------------------
# Stage B: compiled CSVW semantics as Catalyst expressions
# --------------------------------------------------------------------------


def _ws_normalize(col: SparkColumn, base: str) -> SparkColumn:
    """CellParser.cs:69-79 as JVM expressions."""
    if base not in RETAINS_LINE_ENDINGS:
        col = F.translate(col, "\r\n\t", "   ")
    if base not in RETAINS_LEADING_TRAILING_WS:
        col = F.regexp_replace(
            F.regexp_replace(col, r"^\s+|\s+$", ""), r"\s+", " ")
    return col


def _null_to_none(col: SparkColumn, null_values: tuple) -> SparkColumn:
    if not null_values:
        return col
    return F.when(col.isin(*[F.lit(v) for v in null_values]), F.lit(None)).otherwise(col)


class _PlanContext:
    """Per-(table, page-set) compile context."""

    def __init__(self, table: Table, columns: list[Column], mode: str,
                 scope_by_url: bool):
        self.table = table
        self.columns = columns
        self.mode = mode
        self.header_rows = table.dialect.effective_header_row_count()
        self.skip_columns = table.dialect.skip_columns
        # bnode scope: per-url prefix for multi-page corpora so skolem labels
        # are globally unique; empty for single-table parity with the kernel
        if scope_by_url:
            self.scope = F.concat(F.lit("p"), F.substring(F.md5(F.col("url")), 1, 10))
        else:
            self.scope = F.lit("")
        self.url = F.col("url")
        self.row = F.col("row")
        # physical source-file record position (comment/blank rows counted)
        self.src_row = F.col("src_row")

    # -- raw cell access -----------------------------------------------------

    def raw_cell(self, ix: int) -> SparkColumn:
        # record[colIx], 1-based; try_element_at returns NULL out of range
        # (plain element_at THROWS under ANSI mode - short/ragged records
        # and the row-0 sentinel's empty vals must read as missing cells)
        return F.try_element_at(F.col("vals"), F.lit(ix + 1))

    def raw_cell_for_binding(self, name: str) -> SparkColumn:
        """Template variable -> RAW cell at skipColumns + schema index with
        the named column's null-list check (Converter.cs:611-627)."""
        for i, c in enumerate(self.columns):
            if c.name == name:
                v = F.try_element_at(F.col("vals"),
                                     F.lit(self.skip_columns + i + 1))
                return _null_to_none(v, c.null_values)
        raise KeyError(f"Could not find a column named {name} in the CSV metadata.")

    def binding(self, var: str, col_number: int, source_col_number: int,
                name: Optional[str]) -> SparkColumn:
        if var == "_row":
            return self.row.cast("string")
        if var == "_sourceRow":
            return self.src_row.cast("string")
        if var == "_column":
            return F.lit(str(col_number))
        if var == "_sourceColumn":
            return F.lit(str(source_col_number))
        if var == "_name":
            return F.lit(name)
        return self.raw_cell_for_binding(var)

    # -- URI templates ---------------------------------------------------------

    def template_expr(self, template: str, col_number: int,
                      source_col_number: int, name: Optional[str]) -> SparkColumn:
        """Compiled template -> concat expression; NULL when any binding is
        missing/empty (UriTemplate.cs:105-117) - the caller suppresses the
        triple, matching ResolveTemplate's null (Converter.cs:597-609)."""
        compiled = compile_template(template)
        try:
            pieces, guards = self._template_pieces(
                compiled, col_number, source_col_number, name)
        except KeyError:
            # unknown column variable: every row errors in the reference ->
            # every triple suppressed here
            return F.lit(None).cast("string")
        expr = F.concat(*pieces) if pieces else F.lit("")
        expr = self._absolutize(template, expr)
        for g in guards:
            expr = F.when(g.isNull() | (g == ""), F.lit(None)).otherwise(expr)
        return expr

    def _template_pieces(self, compiled, col_number, source_col_number, name):
        pieces, guards = [], []
        for kind, payload in compiled.parts:
            if kind == "lit":
                pieces.append(F.lit(payload))
            else:
                prefix, variables = payload
                if prefix:
                    pieces.append(F.lit(prefix))
                for j, v in enumerate(variables):
                    if j:
                        pieces.append(F.lit(","))
                    b = self.binding(v, col_number, source_col_number, name)
                    guards.append(b)
                    pieces.append(b)
        return pieces, guards

    def _absolutize(self, template: str, expr: SparkColumn) -> SparkColumn:
        """Relative template -> resolve against the page url at plan time
        (Converter.cs:602). The template's static prefix tells us which RFC
        3986 case applies; page urls are plain hierarchical http(s) IRIs."""
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", template):
            return expr
        if template.startswith("#") or template == "":
            return F.concat(self.url, expr)
        if template.startswith("/"):
            authority = F.regexp_extract(self.url, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)
            return F.concat(authority, expr)
        if template.startswith("{"):
            # dynamic start: may expand to an absolute IRI - decide per row
            base_dir = F.regexp_replace(self.url, r"[^/]*$", "")
            return F.when(expr.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), expr) \
                    .otherwise(F.concat(base_dir, expr))
        base_dir = F.regexp_replace(self.url, r"[^/]*$", "")
        return F.concat(base_dir, expr)

    def predicate_expr(self, c: Column, col_number: int,
                       source_col_number: int) -> SparkColumn:
        if c.property_url is None:
            # tableUrl + '#' + name (Converter.cs:409-411)
            return F.concat(self.url, F.lit("#" + (c.name or "")))
        return self.template_expr(c.property_url, col_number,
                                  source_col_number, c.name)

    def subject_expr(self, c: Column, col_number: int,
                     source_col_number: int) -> tuple[SparkColumn, SparkColumn]:
        if c.about_url is None:
            subj = F.concat(F.lit("_:"), self.scope, F.lit("sd"),
                            self.row.cast("string"))
            return subj, F.lit("bnode")
        return (self.template_expr(c.about_url, col_number,
                                   source_col_number, c.name),
                F.lit("iri"))


_STRUCT_ARRAY_T = ("array<struct<subj:string,pred:string,obj:string,"
                   "obj_kind:string,obj_datatype:string,obj_lang:string,"
                   "col_ix:int>>")


def _empty_arr() -> SparkColumn:
    return F.array().cast(_STRUCT_ARRAY_T)


def _triple_struct(subj, pred, obj, kind, dtype, lang, col_ix) -> SparkColumn:
    return F.struct(
        subj.alias("subj"), pred.alias("pred"), obj.alias("obj"),
        (kind if isinstance(kind, SparkColumn) else F.lit(kind)).alias("obj_kind"),
        (dtype if isinstance(dtype, SparkColumn) else F.lit(dtype)).alias("obj_datatype"),
        (lang if isinstance(lang, SparkColumn) else F.lit(lang)).alias("obj_lang"),
        F.lit(col_ix).alias("col_ix"),
    )


def _jvm_lexical_fallback(c: Column) -> bool:
    """True when this column's W3C step-8 lexical check compiles to pure
    JVM expressions (see _typed_literal_exprs). Columns with a format,
    date/dateTime defaults, or metadata value/length constraints take the
    pandas-UDF normalizer path instead (needs_norm in compile_triples),
    which calls the kernel's own lexical_valid/normalize_literal."""
    return (c.datatype is not None
            and c.datatype.format is None
            and not c.datatype.constraints
            and not (c.datatype_iri == XSD_STRING and c.lang)
            and c.datatype_iri not in (None, XSD_STRING, XSD_DATE,
                                       XSD_DATETIME))


def _typed_literal_exprs(value: SparkColumn, c: Column):
    """W3C cell-parsing step-8 lexical check as codegen'd JVM expressions
    (kernel: convert.py lexical_valid + normalize_literal): invalid values
    keep the raw literal retyped xsd:string; booleans get the default
    '1'/'0' -> 'true'/'false' lexical map. Returns (obj_expr, dtype_expr).

    Shares the kernel's own regex table (_LEXICAL_RES -- the patterns are
    Java-regex compatible) and integer ranges, so the two paths cannot
    drift."""
    from ..csvw.convert import _INTEGER_RANGES, _LEXICAL_RES, _TZ_SUFFIX

    base = c.base
    rx = _LEXICAL_RES.get(base)
    rng = _INTEGER_RANGES.get(base)
    if rx is None and rng is None:
        return value, F.lit(c.datatype_iri)  # no lexical rule: accept all
    valid = (value.rlike("^(" + rx.replace("_TZ", _TZ_SUFFIX) + ")$")
             if rx is not None else F.lit(True))
    if rng is not None:
        lo, hi = rng
        if -10**38 < lo and hi < 10**38:
            # bounded types (byte..unsignedLong): decimal(38,0) compare;
            # overflow -> null -> invalid, which is also correct
            d = value.cast("decimal(38,0)")
            valid = valid & d.isNotNull() & (d >= F.lit(lo)) & (d <= F.lit(hi))
        else:
            # sign-constrained unbounded integers: the base regex already
            # enforces the sign; exclude the zero forms the regex admits
            if lo == 1:
                valid = valid & ~value.rlike(r"^\+?0+$")
            if hi == -1:
                valid = valid & ~value.rlike(r"^-0+$")
    obj = value
    if base == "boolean":
        obj = (F.when(~valid, value)
               .when(value == "1", F.lit("true"))
               .when(value == "0", F.lit("false"))
               .otherwise(value))
    dtype = F.when(valid, F.lit(c.datatype_iri)).otherwise(F.lit(XSD_STRING))
    return obj, dtype


def _cell_triples_expr(ctx: _PlanContext, c: Column, i: int,
                       subj, subj_kind: str, pred,
                       value=None, obj=None) -> SparkColumn:
    """array<struct> of the triples one cell contributes (possibly empty) -
    the Spark mirror of Converter.cs:394-455. `subj`/`pred`/`value`/`obj`
    are pre-materialized column references (common subexpressions are
    computed once in a projection stage so the generated code stays small -
    inlining them repeatedly made whole-stage codegen pathologically
    large)."""
    guard_sp = subj.isNull() | pred.isNull()

    extras = []
    if ctx.mode == MODE_STANDARD:
        row_node = F.col("_rownode")
        extras.append(
            F.when(subj.isNull(), _empty_arr()).otherwise(F.array(_triple_struct(
                row_node, F.lit(CSVW_NS + "describes"), subj, subj_kind,
                F.lit(None).cast("string"), F.lit(None).cast("string"), i))))

    if c.value_url is not None:
        main = F.when(guard_sp | obj.isNull(), _empty_arr()).otherwise(
            F.array(_triple_struct(subj, pred, obj, "iri", None, None, i)))
        return F.concat(*extras, main) if extras else main

    base = c.base
    is_string_lang = (c.datatype_iri == XSD_STRING and c.lang)
    dtype = None if is_string_lang else c.datatype_iri
    lang = c.lang if is_string_lang else None

    if c.virtual:
        # constant value every row: run the kernel's own literal
        # constructor at plan time (full parity: lexical fallback, boolean
        # map, format normalization -- convert.py make_literal)
        from ..csvw.convert import make_literal
        cell = normalize_cell(c.default, c)
        values = cell.value_list if cell.is_list else (
            [cell.value] if cell.value is not None else [])
        values = [v for v in (values or []) if v is not None]
        lits = [make_literal(v, c) for v in values]
        structs = [_triple_struct(subj, pred, F.lit(t.obj), "literal",
                                  t.obj_datatype, t.obj_lang, i)
                   for t in lits]
        main = (F.when(guard_sp, _empty_arr()).otherwise(F.array(*structs))
                if structs else _empty_arr())
        return F.concat(*extras, main) if extras else main

    jvm_fallback = _jvm_lexical_fallback(c)

    def lit_struct(v: SparkColumn) -> SparkColumn:
        if jvm_fallback:
            obj_v, dtype_v = _typed_literal_exprs(v, c)
            return _triple_struct(subj, pred, obj_v, "literal", dtype_v,
                                  lang, i)
        return _triple_struct(subj, pred, v, "literal", dtype, lang, i)

    if c.separator is not None:
        # `value` is the whole-value-null-checked pre-split scalar
        arr = F.split(value, re.escape(c.separator), -1)
        if base not in RETAINS_LEADING_TRAILING_WS_IN_LIST:
            arr = F.transform(arr, lambda t: F.regexp_replace(t, r"^\s+|\s+$", ""))
        if c.default is not None:
            arr = F.transform(arr, lambda t: F.when(t == "", F.lit(c.default)).otherwise(t))
        else:
            arr = F.transform(arr, lambda t: F.when(t == "", F.lit(None)).otherwise(t))
        arr = F.transform(arr, lambda t: _null_to_none(t, c.null_values))
        arr = F.filter(arr, lambda t: t.isNotNull())
        main = F.when(guard_sp | value.isNull(), _empty_arr()).otherwise(
            F.transform(arr, lit_struct))
    else:
        main = F.when(guard_sp | value.isNull(), _empty_arr()).otherwise(
            F.array(lit_struct(value)))
    return F.concat(*extras, main) if extras else main


def _scalar_value_expr(ctx: _PlanContext, c: Column, i: int) -> SparkColumn:
    """The normalized, null-checked cell value (or, for separator columns,
    the whole-value-null-checked pre-split scalar)."""
    raw = ctx.raw_cell(i)
    if c.default is not None:
        raw = F.coalesce(raw, F.lit(c.default))  # GetField ?? c.Default
    s = _ws_normalize(raw, c.base)
    if c.default is not None:
        s = F.when(s == "", F.lit(c.default)).otherwise(s)
    else:
        s = F.when(s == "", F.lit(None)).otherwise(s)
    # separator: 5.1 whole-value null check BEFORE split (CellParser.cs:92-96)
    # scalar: step-7 null check
    return _null_to_none(s, c.null_values)


def _row_scaffolding_exprs(ctx: _PlanContext) -> list[SparkColumn]:
    """Standard-mode per-row and (row==1-gated) per-table triples
    (Rdf/Converter.cs:267-290,337-368), over pre-materialized node columns."""
    row_node = F.col("_rownode")
    table_node = F.col("_tnode")
    table_kind = "iri" if ctx.table.id else "bnode"
    group_node = F.col("_gnode")
    none = F.lit(None).cast("string")

    per_row = F.when(ctx.row >= 1, F.array(
        _triple_struct(table_node, F.lit(CSVW_NS + "row"), row_node,
                       "bnode", None, None, -1),
        _triple_struct(row_node, F.lit(RDF_TYPE), F.lit(CSVW_NS + "Row"),
                       "iri", None, None, -1),
        _triple_struct(row_node, F.lit(CSVW_NS + "rownum"),
                       ctx.row.cast("string"), "literal",
                       F.lit(XSD_INTEGER), none, -1),
        _triple_struct(row_node, F.lit(CSVW_NS + "url"),
                       F.concat(ctx.url, F.lit("#row="),
                                ctx.src_row.cast("string")),
                       "iri", None, None, -1),
    )).otherwise(_empty_arr())
    # row 1, or the row-0 sentinel of a zero-data-row page
    per_table = F.when(ctx.row <= 1, F.array(
        _triple_struct(group_node, F.lit(RDF_TYPE),
                       F.lit(CSVW_NS + "TableGroup"), "iri", None, None, -1),
        _triple_struct(group_node, F.lit(CSVW_NS + "table"), table_node,
                       table_kind, None, None, -1),
        _triple_struct(table_node, F.lit(RDF_TYPE), F.lit(CSVW_NS + "Table"),
                       "iri", None, None, -1),
        _triple_struct(table_node, F.lit(CSVW_NS + "url"), ctx.url,
                       "iri", None, None, -1),
    )).otherwise(_empty_arr())
    statics = _static_metadata_triples(ctx, table_node, "iri" if ctx.table.id
                                       else "bnode", group_node)
    return [per_table, per_row] + ([statics] if statics is not None else [])


def _static_metadata_triples(ctx: _PlanContext, table_node, table_kind,
                             group_node) -> Optional[SparkColumn]:
    """Common properties + notes (T3/T4, Rdf/Converter.cs:638-765,652-658):
    computed once on the driver by the kernel, emitted per page gated on
    row==1 with bnode labels re-scoped per page."""
    sentinel_t, sentinel_g, sentinel_b = "\x00T", "\x00G", "_:\x00B"
    kern = PageConverter(mode=MODE_STANDARD, bnode_scope="\x00B")
    from ..csvw.convert import ConversionResult
    res = ConversionResult()
    # group-level common properties live on the TableGroup; per-page we only
    # re-emit table-level ones (group props would duplicate per page)
    kern._emit_common_properties(res, sentinel_t, ctx.table.common_properties)
    if ctx.table.notes:
        kern._emit_common_property(res, sentinel_t, CSVW_NS + "note",
                                   ctx.table.notes)
    if not res.triples:
        return None

    def term(value: str, is_obj_kind: Optional[str] = None) -> SparkColumn:
        if value == sentinel_t:
            return table_node
        if value == sentinel_g:
            return group_node
        if value.startswith(sentinel_b):
            return F.concat(F.lit("_:"), ctx.scope, F.lit("b" + value[len(sentinel_b):]))
        return F.lit(value)

    structs = []
    for t in res.triples:
        structs.append(_triple_struct(
            term(t.subj), F.lit(t.pred),
            term(t.obj) if t.obj_kind in ("iri", "bnode") else F.lit(t.obj),
            t.obj_kind, t.obj_datatype, t.obj_lang, -1))
    # row 1, or the row-0 sentinel of a zero-data-row page
    return F.when(ctx.row <= 1, F.array(*structs)).otherwise(_empty_arr())


_NORM_RESULT_TYPE = StructType([
    StructField("norm", StringType()),
    StructField("err", StringType()),
    StructField("fallback", BooleanType()),
])


def _make_norm_one(c: Column):
    """Per-value lexical normalization for one format column, mirroring
    the kernel's cell semantics EXACTLY (it calls the same functions):

    * lexically INVALID value (kernel csvw/convert.py:320, W3C cell-parsing
      step 8) -> (raw, err=None, fallback=True): the triple survives with
      the raw value retyped xsd:string;
    * valid value whose normalization RAISES (e.g. '2024-02-31T12:00:00'
      passes the dateTime lexical regex, fromisoformat rejects it) ->
      (None, str(ex), False): triple dropped + error side-output, the
      kernel's loop-level capture (convert.py:496-499, reference
      Rdf/Converter.cs:456-461);
    * valid + normalizable -> (normalized, None, False)."""
    is_string = c.datatype_iri == XSD_STRING

    from ..csvw.convert import lexical_valid, normalize_literal
    from ..csvw.model import ConversionError

    def norm_one(v):
        if v is None:
            return (None, None, False)
        if is_string:
            # kernel: string literals (incl. lang) bypass validity checks;
            # string-base formats normalize as identity
            return (v, None, False)
        if not lexical_valid(v, c):
            return (v, None, True)
        try:
            # the kernel's own dispatcher: format / boolean lexical map /
            # default date+dateTime rendering (convert.py:176-198)
            return (normalize_literal(v, c), None, False)
        except (FormatError, ConversionError, ValueError) as ex:
            return (None, str(ex), False)

    return norm_one


def _format_normalizer_dispatch_udf(norm_cols):
    """ONE Arrow-vectorized normalizer for ALL format/constraint columns,
    dispatching per col_ix inside the worker. Review fix: the round-1
    per-column F.when chain looked conditional, but Spark extracts every
    CaseWhen-branch UDF into its own UNCONDITIONAL ArrowEvalPython node -
    k format columns paid k full Arrow passes over the exploded triples.
    This single UDF is one pass regardless of k; rows of other columns
    pass through unchanged (still vectorized per unique value)."""
    fns = {i: _make_norm_one(c) for i, c in norm_cols}

    @F.pandas_udf(_NORM_RESULT_TYPE)
    def norm(obj: pd.Series, col_ix: pd.Series) -> pd.DataFrame:
        out = pd.DataFrame({
            "norm": obj,
            "err": pd.Series([None] * len(obj), index=obj.index,
                             dtype=object),
            "fallback": pd.Series(False, index=obj.index),
        })
        for i in col_ix.unique():
            fn = fns.get(int(i))
            if fn is None:
                continue
            mask = (col_ix == int(i)) & obj.notna()
            if not mask.any():
                continue
            # vectorize via unique-value mapping (pages repeat lexical forms)
            uniq = {v: fn(v) for v in obj[mask].unique()}
            mapped = obj[mask].map(lambda v: uniq[v])
            out.loc[mask, "norm"] = mapped.map(lambda t: t[0])
            out.loc[mask, "err"] = mapped.map(lambda t: t[1])
            out.loc[mask, "fallback"] = mapped.map(lambda t: t[2])
        return out

    # deterministic in truth, but marked otherwise so Catalyst neither
    # duplicates the Arrow eval into the downstream null-filter nor re-runs
    # it per referencing expression (one ArrowEvalPython node in the plan)
    return norm.asNondeterministic()


def compile_triples(rows_df: DataFrame, table: Table, columns: list[Column],
                    mode: str = MODE_MINIMAL,
                    scope_by_url: bool = True) -> DataFrame:
    """Stage B: (url, row, vals) -> triples, single narrow JVM pass."""
    triples, _errors = compile_triples_with_errors(
        rows_df, table, columns, mode, scope_by_url)
    return triples


ERRORS_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("row", LongType()),
    StructField("col_ix", LongType()),
    StructField("col_name", StringType()),
    StructField("message", StringType()),
])


def compile_triples_with_errors(
        rows_df: DataFrame, table: Table, columns: list[Column],
        mode: str = MODE_MINIMAL,
        scope_by_url: bool = True) -> tuple[DataFrame, DataFrame]:
    """Stage B: (url, row, vals) -> (triples, cell-error side-output).

    The error DataFrame carries (url, row, col_ix, col_name, message) for
    every cell whose lexical form fails its declared format/datatype --
    the same events the Python kernel appends to ConversionResult.errors
    (csvw/convert.py:496-499; reference Rdf/Converter.cs:456-461 Progress
    +Errors channel). message reproduces the kernel's wording, including
    its 1-based SOURCE row (logical row + header rows). Both outputs share
    one lazy plan; materializing both costs one extra scan unless the
    caller persists the common prefix.

    Common subexpressions (bnode scope, subjects, predicates, normalized
    values) are materialized as columns in two projection stages before the
    flatten/explode, keeping the generated whole-stage code small (naive
    inlining produced multi-second janino compiles)."""
    ctx = _PlanContext(table, columns, mode, scope_by_url)

    # stage 1: scope column
    df = rows_df.select("url", "row", "src_row", "vals",
                        ctx.scope.alias("_scope"))
    ctx.scope = F.col("_scope")

    # stage 2: shared terms
    per_col_specials = {"_column", "_sourceColumn", "_name"}
    prep: dict[str, SparkColumn] = {}
    subj_shared: dict = {}
    refs: dict[int, dict] = {}
    for i, c in enumerate(columns):
        if c.suppress_output:
            continue
        coln, srcn = i + 1, ctx.skip_columns + i + 1
        if c.about_url is None:
            key = ("__default__",)
        else:
            tvars = compile_template(c.about_url).variables
            key = (c.about_url,
                   i if any(v in per_col_specials for v in tvars) else None)
        if key not in subj_shared:
            name = f"_s{len(subj_shared)}"
            subj, _kind = ctx.subject_expr(c, coln, srcn)
            prep[name] = subj
            subj_shared[key] = name
        r = {"subj": subj_shared[key],
             "kind": "bnode" if c.about_url is None else "iri"}
        prep[f"_p{i}"] = ctx.predicate_expr(c, coln, srcn)
        r["pred"] = f"_p{i}"
        if c.value_url is not None:
            prep[f"_o{i}"] = ctx.template_expr(c.value_url, coln, srcn, c.name)
            r["obj"] = f"_o{i}"
        elif not c.virtual:
            prep[f"_v{i}"] = _scalar_value_expr(ctx, c, i)
            r["value"] = f"_v{i}"
        refs[i] = r
    if mode == MODE_STANDARD:
        prep["_rownode"] = F.concat(F.lit("_:"), ctx.scope, F.lit("r"),
                                    ctx.row.cast("string"))
        prep["_tnode"] = (F.lit(table.id) if table.id
                          else F.concat(F.lit("_:"), ctx.scope, F.lit("t")))
        prep["_gnode"] = F.concat(F.lit("_:"), ctx.scope, F.lit("g"))
    df = df.select("url", "row", "src_row", "_scope",
                   *[v.alias(k) for k, v in prep.items()])

    # stage 3: per-cell triple arrays -> flatten -> explode
    arrays = []
    if mode == MODE_STANDARD:
        arrays.extend(_row_scaffolding_exprs(ctx))
    for i, c in enumerate(columns):
        if i not in refs:
            continue
        r = refs[i]
        # row-0 sentinels (zero-data-row pages) emit NO cell triples -
        # non-virtual cells are null anyway, but virtual/constant-template
        # columns would otherwise fabricate a row the kernel never saw
        arrays.append(F.when(ctx.row >= 1, _cell_triples_expr(
            ctx, c, i, F.col(r["subj"]), r["kind"], F.col(r["pred"]),
            value=F.col(r["value"]) if "value" in r else None,
            obj=F.col(r["obj"]) if "obj" in r else None))
            .otherwise(_empty_arr()))
    exploded = (
        df
        .select("url", "row", "src_row",
                F.explode(F.flatten(F.array(*arrays))).alias("t"))
        .select("url", "row", "src_row", "t.*")
    )
    # post-explode format normalization (only the affected columns pay)
    needs_norm = [
        (i, c) for i, c in enumerate(columns)
        if not c.virtual and c.value_url is None and (
            (c.datatype is not None and (c.datatype.format is not None
                                         or c.datatype.constraints))
            or c.datatype_iri in (XSD_DATE, XSD_DATETIME))
    ]
    if not needs_norm:
        empty_errors = rows_df.sparkSession.createDataFrame([], ERRORS_SCHEMA)
        return exploded.drop("col_ix", "src_row"), empty_errors

    dispatch = _format_normalizer_dispatch_udf(needs_norm)
    # non-literal rows (standard-mode describes/scaffolding IRIs) dispatch
    # as col_ix -1 -> pass-through, preserving the old literal-only guard
    normed = exploded.withColumn(
        "_n", dispatch(F.col("obj"),
                       F.when(F.col("obj_kind") == "literal",
                              F.col("col_ix")).otherwise(F.lit(-1))))
    # kernel wording: csvw/convert.py error capture (source row = the
    # physical record position, comment/blank rows counted - W3C spec
    # choice, deliberately diverging from the reference's header+logical
    # binding; see parse_csv_rows docstring)
    name_expr = F.lit(None).cast("string")
    for i, c in needs_norm:
        name_expr = F.when(F.col("col_ix") == i, F.lit(c.name or "")) \
                     .otherwise(name_expr)
    errors = (normed.filter(F.col("_n.err").isNotNull())
              .select("url", "row", F.col("col_ix").cast("long").alias("col_ix"),
                      name_expr.alias("col_name"),
                      F.concat(F.lit("Conversion error at row "),
                               F.col("src_row").cast("string"),
                               F.lit(", column '"), name_expr, F.lit("'. "),
                               F.col("_n.err")).alias("message")))
    # W3C step-8 fallback: lexically invalid values keep the raw literal but
    # retype to xsd:string (and drop any lang) -- kernel convert.py:320-321
    triples = (normed
               .withColumn("obj", F.col("_n.norm"))
               .withColumn("obj_datatype",
                           F.when(F.col("_n.fallback"), F.lit(XSD_STRING))
                            .otherwise(F.col("obj_datatype")))
               .withColumn("obj_lang",
                           F.when(F.col("_n.fallback"),
                                  F.lit(None).cast("string"))
                            .otherwise(F.col("obj_lang")))
               .filter(F.col("obj").isNotNull())
               .drop("col_ix", "_n", "src_row"))
    return triples, errors


def convert_table_group_spark(pages_df: DataFrame, table: Table,
                              mode: str = MODE_MINIMAL,
                              columns: Optional[list[Column]] = None,
                              scope_by_url: bool = True,
                              sample_text: Optional[str] = None) -> DataFrame:
    """Homogeneous scale path: one table descriptor, N pages.

    When the schema must be inferred from the header, pass `sample_text` (or
    let this read ONE page via .first() - driver-side, constant cost)."""
    triples, _errors = convert_table_group_spark_with_errors(
        pages_df, table, mode, columns, scope_by_url, sample_text)
    return triples


def convert_table_group_spark_with_errors(
        pages_df: DataFrame, table: Table,
        mode: str = MODE_MINIMAL,
        columns: Optional[list[Column]] = None,
        scope_by_url: bool = True,
        sample_text: Optional[str] = None) -> tuple[DataFrame, DataFrame]:
    """convert_table_group_spark plus the per-cell error side-output
    (see compile_triples_with_errors)."""
    cols = columns if columns is not None else table.columns
    if cols is None:
        if sample_text is None:
            first = pages_df.select("text").filter(F.col("text").isNotNull()).first()
            sample_text = first["text"] if first else ""
        cols = infer_columns(table, sample_text)
    rows = extract_rows(pages_df, table)
    return compile_triples_with_errors(rows, table, cols, mode, scope_by_url)


# --------------------------------------------------------------------------
# Heterogeneous path: per-page metadata via the Python kernel
# --------------------------------------------------------------------------


@lru_cache(maxsize=256)
def _parse_meta_cached(metadata_json: str, base_uri: str):
    from ..csvw.parse_meta import parse_metadata
    return parse_metadata(metadata_json, base_uri)


def convert_pages_spark(pages_df: DataFrame, mode: str = MODE_MINIMAL,
                        metadata_col: str = "metadata_json") -> DataFrame:
    """Pages with per-page CSVW metadata sidecar column -> triples.

    mapInPandas over Arrow batches; metadata parsing is cached per distinct
    document per executor (typical web corpora have few distinct schemas).
    Bnode labels are scoped by a url digest -> globally unique."""
    import hashlib
    import json

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ["url", "row", *TRIPLE_FIELDS]}
            for url, text, meta in zip(pdf["url"], pdf["text"], pdf[metadata_col]):
                if text is None:
                    continue
                if meta is None:
                    # json.dumps, not interpolation: crawled urls can
                    # contain quotes/backslashes (review fix)
                    meta = json.dumps({"url": url})
                group = _parse_meta_cached(meta, url)
                scope = "p" + hashlib.md5(url.encode()).hexdigest()[:10]
                conv = PageConverter(mode=mode, bnode_scope=scope)
                # per-page table: the descriptor's url is overridden by the
                # page url only when the descriptor used a relative url
                texts = {t.url: text for t in group.tables}
                result = conv.convert_table_group(group, texts)
                for t in result.triples:
                    out["url"].append(url)
                    out["row"].append(0)
                    for k, v in zip(TRIPLE_FIELDS, t.astuple()):
                        out[k].append(v)
            if out["url"]:  # empty frames infer wrong dtypes for Arrow
                yield pd.DataFrame(out)

    cols = ["url", "text", metadata_col]
    return pages_df.select(*cols).mapInPandas(gen, TRIPLES_SCHEMA)


def discover_metadata_keys(url_col: SparkColumn) -> list[SparkColumn]:
    """Metadata discovery as deterministic key derivation (S3,
    Rdf/Converter.cs:141-207): '{url}-metadata.json' then sibling
    'csv-metadata.json'. At scale this drives an equi-join of pages against
    a metadata sidecar table instead of per-url HTTP probing."""
    sibling = F.concat(F.regexp_replace(url_col, r"[^/]*$", ""),
                       F.lit("csv-metadata.json"))
    return [F.concat(url_col, F.lit("-metadata.json")), sibling]


def join_metadata_sidecar(pages_df: DataFrame, meta_df: DataFrame) -> DataFrame:
    """Left-join pages to a (meta_url, metadata_json) sidecar table via the
    derived discovery keys, broadcast when small (driver hints it)."""
    keys = discover_metadata_keys(F.col("url"))
    p = pages_df.withColumn("_k1", keys[0]).withColumn("_k2", keys[1])
    m = F.broadcast(meta_df.select(F.col("meta_url"), F.col("metadata_json")))
    j1 = p.join(m.withColumnRenamed("metadata_json", "_m1"),
                p["_k1"] == m["meta_url"], "left").drop("meta_url")
    m2 = F.broadcast(meta_df.select(F.col("meta_url").alias("_mu2"),
                                    F.col("metadata_json").alias("_m2")))
    j2 = j1.join(m2, j1["_k2"] == m2["_mu2"], "left")
    return (j2.withColumn("metadata_json", F.coalesce("_m1", "_m2"))
              .drop("_k1", "_k2", "_m1", "_m2", "_mu2"))
