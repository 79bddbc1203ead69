"""N-Triples serialization of the triples DataFrame.

Reference counterpart: DataDock/csvweb emits RDF through dotNetRDF's
formatting handlers (Rdf/Converter.cs:235-238 wires the conversion into
Turtle/N-Triples writers); this module closes the export gap Spark-first:
serialization is a pure JVM column expression over the
(subj, pred, obj, obj_kind, obj_datatype, obj_lang) triples DataFrame --
no UDF, no shuffle -- so a 10^12-triple export is one narrow codegen'd
projection straight into the text sink (`to_ntriples(df).write.text(...)`).

Conventions (canonical N-Triples):
* terms starting with "_:" are blank-node labels, everything else is an
  IRI rendered <...>;
* literal escapes: backslash, quote, LF, CR, TAB (other chars pass through
  as UTF-8, which canonical N-Triples permits);
* xsd:string-typed literals serialize as plain literals (the same
  plain-literal == xsd:string identification the reference's comparer
  applies, Tests/CsvwTestCasesSpec.cs:173-190).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

_ESCAPES = (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
            ("\r", "\\r"), ("\t", "\\t"))


def escape_literal(c: Column) -> Column:
    """N-Triples literal escaping as a chain of JVM replace()s (backslash
    first, so later escapes aren't double-escaped)."""
    for src, dst in _ESCAPES:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


def _term(c: Column) -> Column:
    return F.when(c.startswith("_:"), c) \
            .otherwise(F.concat(F.lit("<"), c, F.lit(">")))


def _nt_object(obj: Column, obj_kind: Column, obj_datatype: Column,
               obj_lang: Column) -> Column:
    """The object term in N-Triples/N-Quads form - ONE definition shared
    by ntriple_line and to_nquads (escaping, @lang, ^^<dt>, the
    xsd:string-as-plain-literal rule)."""
    lit = F.concat(F.lit('"'), escape_literal(obj), F.lit('"'))
    typed = F.when(
        obj_lang.isNotNull(),
        F.concat(lit, F.lit("@"), obj_lang)
    ).when(
        obj_datatype.isNotNull() & (obj_datatype != XSD_STRING),
        F.concat(lit, F.lit("^^<"), obj_datatype, F.lit(">"))
    ).otherwise(lit)
    return F.when(obj_kind == F.lit("literal"), typed).otherwise(_term(obj))


def ntriple_line(subj: Column, pred: Column, obj: Column, obj_kind: Column,
                 obj_datatype: Column, obj_lang: Column) -> Column:
    """One N-Triples line (without trailing newline) as a pure column
    expression."""
    o = _nt_object(obj, obj_kind, obj_datatype, obj_lang)
    return F.concat(_term(subj), F.lit(" "), _term(pred), F.lit(" "),
                    o, F.lit(" ."))


def to_ntriples(df: DataFrame) -> DataFrame:
    """Triples DataFrame -> single-column ('line') N-Triples DataFrame.

    Write with `.write.text(path)` (one file per partition; at scale,
    repartition by output-shard key first if a fixed shard count is
    needed)."""
    return df.select(ntriple_line(
        F.col("subj"), F.col("pred"), F.col("obj"), F.col("obj_kind"),
        F.col("obj_datatype"), F.col("obj_lang")).alias("line"))


def to_nquads(df: DataFrame, graph_col: str = "url") -> DataFrame:
    """Triples DataFrame -> N-Quads lines with `graph_col` as the named
    graph - provenance-preserving export (every triple tagged with the
    page it came from, the natural graph partitioning of a web-scale KG).
    Rows with a NULL graph serialize as plain triples (default graph),
    which is valid N-Quads. Same narrow pure-column projection as
    to_ntriples."""
    o = _nt_object(F.col("obj"), F.col("obj_kind"), F.col("obj_datatype"),
                   F.col("obj_lang"))
    g = F.when(F.col(graph_col).isNotNull(),
               F.concat(F.lit(" "), _term(F.col(graph_col)))) \
         .otherwise(F.lit(""))
    return df.select(F.concat(
        _term(F.col("subj")), F.lit(" "), _term(F.col("pred")), F.lit(" "),
        o, g, F.lit(" .")).alias("line"))


# --------------------------------------------------------------------------
# Turtle (the reference's primary output format: Rdf/Converter.cs:235-238
# wires conversion into dotNetRDF's CompressingTurtleWriter; golden files
# under Tests/data are .ttl)
# --------------------------------------------------------------------------

XSD_NS = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
CSVW_NS = "http://www.w3.org/ns/csvw#"

TURTLE_DEFAULT_PREFIXES = {"rdf": RDF_NS, "xsd": XSD_NS, "csvw": CSVW_NS}

# Conservative PN_LOCAL subset: Turtle 1.1 allows far more (leading digits,
# dots, %-escapes, \-escapes), but anything outside this set is simply left
# as <iri> - always-valid output beats maximal compression.
_PN_LOCAL_SAFE = "^[A-Za-z_][A-Za-z0-9_-]*$"


def compact_iri(c: Column, prefixes: dict) -> Column:
    """IRI column -> prefixed name where the IRI starts with a registered
    namespace and the remainder is a conservatively-safe PN_LOCAL;
    otherwise <iri>. Pure codegen'd CASE chain (prefix maps are a handful
    of entries, constant-folded); earlier prefixes win on overlap."""
    out = F.concat(F.lit("<"), c, F.lit(">"))
    for p, ns in reversed(list(prefixes.items())):
        local = c.substr(F.lit(len(ns) + 1), F.length(c))
        out = F.when(c.startswith(ns) & local.rlike(_PN_LOCAL_SAFE),
                     F.concat(F.lit(p + ":"), local)).otherwise(out)
    return out


def _turtle_term(c: Column, prefixes: dict) -> Column:
    return F.when(c.startswith("_:"), c).otherwise(compact_iri(c, prefixes))


def _ttl_object(obj: Column, obj_kind: Column, obj_datatype: Column,
                obj_lang: Column, prefixes: dict) -> Column:
    """The object term in Turtle form (datatype IRIs compacted) - ONE
    definition shared by the flat and grouped writers."""
    lit = F.concat(F.lit('"'), escape_literal(obj), F.lit('"'))
    typed = F.when(
        obj_lang.isNotNull(),
        F.concat(lit, F.lit("@"), obj_lang)
    ).when(
        obj_datatype.isNotNull() & (obj_datatype != XSD_STRING),
        F.concat(lit, F.lit("^^"), compact_iri(obj_datatype, prefixes))
    ).otherwise(lit)
    return F.when(obj_kind == F.lit("literal"), typed) \
            .otherwise(_turtle_term(obj, prefixes))


def _ttl_pred(pred: Column, prefixes: dict) -> Column:
    return F.when(pred == F.lit(RDF_NS + "type"), F.lit("a")) \
            .otherwise(_turtle_term(pred, prefixes))


def turtle_line(subj: Column, pred: Column, obj: Column, obj_kind: Column,
                obj_datatype: Column, obj_lang: Column,
                prefixes: dict) -> Column:
    """One Turtle statement (subject-per-line; the grouped ';'/',' form is
    a compression nicety, not a semantic one - emitting one statement per
    triple keeps serialization an embarrassingly-parallel projection with
    no subject-grouping shuffle). String escapes are the N-Triples set,
    valid in Turtle quoted literals."""
    o = _ttl_object(obj, obj_kind, obj_datatype, obj_lang, prefixes)
    p = _ttl_pred(pred, prefixes)
    return F.concat(_turtle_term(subj, prefixes), F.lit(" "), p, F.lit(" "),
                    o, F.lit(" ."))


def _turtle_po(prefixes: dict) -> tuple[Column, Column]:
    """(predicate term, object term) columns over the standard triple
    column names - the grouped writer's view onto the shared renderers."""
    o = _ttl_object(F.col("obj"), F.col("obj_kind"), F.col("obj_datatype"),
                    F.col("obj_lang"), prefixes)
    return _ttl_pred(F.col("pred"), prefixes), o


def to_turtle_grouped(df: DataFrame,
                      prefixes: dict | None = None) -> DataFrame:
    """Subject-grouped Turtle (the ';' predicate-list shape of the
    reference's CompressingTurtleWriter): one text block per subject,
    predicates/objects sorted for determinism. One shuffle on the subject
    term - the grouping a compacting writer fundamentally needs; use
    `to_turtle` when a shuffle-free export matters more than compactness.
    Returns a single-column ('block') DataFrame; prepend
    `turtle_header(prefixes)` when writing."""
    prefixes = TURTLE_DEFAULT_PREFIXES if prefixes is None else prefixes
    p, o = _turtle_po(prefixes)
    s = _turtle_term(F.col("subj"), prefixes)
    rows = df.select(s.alias("_s"),
                     F.concat(p, F.lit(" "), o).alias("_po"))
    return (rows.groupBy("_s")
            .agg(F.array_sort(F.collect_set("_po")).alias("_pos"))
            .select(F.concat(
                F.col("_s"), F.lit(" "),
                F.concat_ws(" ;\n    ", F.col("_pos")),
                F.lit(" .")).alias("block")))


def turtle_header(prefixes: dict) -> str:
    """The @prefix preamble - driver-side constant text, prepended to each
    output file (or written as a sidecar part-00000)."""
    return "".join(f"@prefix {p}: <{ns}> .\n" for p, ns in prefixes.items())


def write_turtle(df: DataFrame, path: str, prefixes: dict | None = None,
                 grouped: bool = False) -> None:
    """Materialize a Turtle export: body part-files via the distributed
    text sink + a `_prefixes.ttl` sidecar holding the @prefix header
    (written through the plans/fs adapter, so hdfs://s3a:// targets work).
    Concatenating sidecar + parts yields one valid Turtle document;
    parts are also individually parseable against the sidecar."""
    from ..plans.fs import fs_for

    prefixes = TURTLE_DEFAULT_PREFIXES if prefixes is None else prefixes
    body = (to_turtle_grouped(df, prefixes) if grouped
            else to_turtle(df, prefixes))
    body.write.mode("overwrite").text(path)
    fs = fs_for(path, df.sparkSession)
    fs.write_text_atomic(fs.join(path, "_prefixes.ttl"),
                         turtle_header(prefixes),
                         fs.join(path, "._prefixes.ttl.tmp"))


def write_ntriples(df: DataFrame, path: str) -> None:
    """Materialize an N-Triples export (no header needed - pure
    distributed text write)."""
    to_ntriples(df).write.mode("overwrite").text(path)


def to_turtle(df: DataFrame, prefixes: dict | None = None) -> DataFrame:
    """Triples DataFrame -> single-column ('line') Turtle body DataFrame
    (statements only; prepend `turtle_header(prefixes)` when writing).
    Like to_ntriples this is one narrow codegen'd projection - no UDF, no
    shuffle - so a 10^12-triple Turtle export streams straight to the
    text sink."""
    prefixes = TURTLE_DEFAULT_PREFIXES if prefixes is None else prefixes
    return df.select(turtle_line(
        F.col("subj"), F.col("pred"), F.col("obj"), F.col("obj_kind"),
        F.col("obj_datatype"), F.col("obj_lang"), prefixes).alias("line"))


# --------------------------------------------------------------------------
# N-Triples / N-Quads PARSING (RDF ingest) - the inverse of to_ntriples /
# to_nquads, so an exported KG (or any external canonical N-Triples dump)
# loads back into the engine's triple schema. The reference consumes RDF
# through dotNetRDF's parsers (DataDock loads emitted graphs back into a
# store); here ingest is a pure JVM projection: structure via
# regexp_extract, literal unescaping via a split/transform/rejoin trick -
# no UDF, no shuffle, one narrow codegen'd pass over the text scan.
# --------------------------------------------------------------------------

# one N-Triples statement: subject (IRI or bnode), predicate (IRI),
# object term (everything up to the closing " ."). The quad grammar
# additionally requires a fourth graph term - an IRI or (round-4
# review: the spec allows it) a BLANK NODE label; it is tried FIRST so
# the graph term can never be confused with the object (a triple line
# `<s> <p> <o> .` cannot match the quad grammar - its object group
# would have to be empty - while a quad line always does). The bnode
# graph charset is the tight PN_CHARS-ish set, NOT \S+: a greedy \S+
# would let a literal OBJECT ending in `_:x"` false-match as a quad.
# Whitespace per canonical N-Triples/N-Quads (single spaces).
_NT_BNODE = r"_:[A-Za-z0-9_.\-]+"
_NT_LINE = r'^(<[^>]*>|_:\S+) (<[^>]*>) (.+) \.$'
_NQ_LINE = (r'^(<[^>]*>|_:\S+) (<[^>]*>) (.+) '
            r'(<[^>]*>|' + _NT_BNODE + r') \.$')
# literal object: quoted body with escapes, then @lang or ^^<dtype>
_NT_LITERAL = r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?$'


def _obj_term(line: Column) -> Column:
    """The object term under whichever grammar matches (quad first)."""
    return (F.when(line.rlike(_NQ_LINE),
                   F.regexp_extract(line, _NQ_LINE, 3))
            .otherwise(F.regexp_extract(line, _NT_LINE, 3)))


def _valid_statement(line: Column) -> Column:
    """Line-level validity shared by parse_ntriples (keep) and
    invalid_ntriples (flag): the statement grammar must match AND the
    object term must be a well-formed IRI, bnode label or literal -
    `(.+)` alone would silently ingest garbage objects as 'iri'
    (round-4 review)."""
    obj = _obj_term(line)
    return line.rlike(_NT_LINE) & (
        obj.rlike(r'^<[^>]*>$')
        | obj.rlike('^' + _NT_BNODE + '$')
        | obj.rlike(_NT_LITERAL))


def _strip_angles(c: Column) -> Column:
    return F.regexp_replace(c, r"^<|>$", "")


def unescape_literal(c: Column) -> Column:
    """Single-pass-correct N-Triples literal unescaping in pure JVM
    expressions: split on the two-character sequence \\\\ (escaped
    backslash) first - inside each segment every remaining backslash
    begins exactly one of \\n \\r \\t \\" (valid canonical N-Triples has
    no other sequences), so the per-segment replace chain is
    unambiguous - then rejoin the segments with a literal backslash.
    This is the exact inverse of escape_literal for all inputs (no
    sentinel character, no double-unescape hazard)."""
    seg = F.split(c, r"\\\\", -1)
    fixed = F.transform(seg, lambda s: F.replace(
        F.replace(F.replace(F.replace(s, F.lit('\\"'), F.lit('"')),
                            F.lit("\\n"), F.lit("\n")),
                  F.lit("\\r"), F.lit("\r")),
        F.lit("\\t"), F.lit("\t")))
    return F.array_join(fixed, "\\")


def parse_ntriples(lines: DataFrame, col: str = "line",
                   keep_graph: bool = False) -> DataFrame:
    """N-Triples (or N-Quads, with `keep_graph=True`) lines -> the
    engine's triple schema (subj, pred, obj, obj_kind, obj_datatype,
    obj_lang[, graph]).

    Inverse conventions of to_ntriples: plain literals load with a NULL
    datatype (the xsd:string == plain-literal identification), "_:"
    terms keep their label as-is with obj_kind='bnode' for objects
    (subjects stay bare labels, exactly what _term() re-serializes),
    malformed lines (no grammar match) are DROPPED - filter them out of
    `lines` first via `invalid_ntriples` if an ingest audit is needed.

    Scale shape: regexp_extract + the unescape expressions are all
    narrow JVM codegen over the text scan - a 10^12-line load never
    shuffles and never leaves the JVM."""
    line = F.col(col)
    is_quad = line.rlike(_NQ_LINE)

    def grp(n, quad_n=None):
        return F.when(is_quad, F.regexp_extract(line, _NQ_LINE,
                                                quad_n or n)) \
                .otherwise(F.regexp_extract(line, _NT_LINE, n))

    subj_t = grp(1)
    pred_t = grp(2)
    obj_t = grp(3)
    graph_t = F.when(is_quad, F.regexp_extract(line, _NQ_LINE, 4)) \
               .otherwise(F.lit(""))
    is_lit = obj_t.startswith('"')
    is_bnode = obj_t.startswith("_:")
    lit_body = F.regexp_extract(obj_t, _NT_LITERAL, 1)
    lit_lang = F.regexp_extract(obj_t, _NT_LITERAL, 2)
    lit_dtype = F.regexp_extract(obj_t, _NT_LITERAL, 3)
    out = (lines
           .filter(_valid_statement(line))
           .select(
               F.when(subj_t.startswith("_:"), subj_t)
                .otherwise(_strip_angles(subj_t)).alias("subj"),
               _strip_angles(pred_t).alias("pred"),
               F.when(is_lit, unescape_literal(lit_body))
                .when(is_bnode, obj_t)
                .otherwise(_strip_angles(obj_t)).alias("obj"),
               F.when(is_lit, F.lit("literal"))
                .when(is_bnode, F.lit("bnode"))
                .otherwise(F.lit("iri")).alias("obj_kind"),
               F.when(is_lit & (lit_dtype != ""), lit_dtype)
                .otherwise(F.lit(None).cast("string")).alias("obj_datatype"),
               F.when(is_lit & (lit_lang != ""), lit_lang)
                .otherwise(F.lit(None).cast("string")).alias("obj_lang"),
               F.when(graph_t != "", _strip_angles(graph_t))
                .otherwise(F.lit(None).cast("string")).alias("graph")))
    return out if keep_graph else out.drop("graph")


def invalid_ntriples(lines: DataFrame, col: str = "line") -> DataFrame:
    """Ingest audit: the lines parse_ntriples would drop (no grammar
    match), excluding blank lines and comments. No silent caps: run this
    alongside a load and alert on count() > 0."""
    line = F.col(col)
    return lines.filter(~_valid_statement(line)
                        & (F.trim(line) != "")
                        & ~F.trim(line).startswith("#"))


# --------------------------------------------------------------------------
# canonical blank-node labeling (URDNA2015-class guarantees, own wire
# format) + per-graph content fingerprints
# --------------------------------------------------------------------------


def _canon_labels_py(quads: list) -> dict:
    """Canonical labels for the blank nodes of ONE graph (list of
    (s, p, o) with blank terms prefixed '_:'): hash-refinement
    canonical labeling - first-degree hashes (each quad serialized
    with the node as '_:a', other bnodes '_:z', sorted, md5), then
    WL-style refinement over bnode-bnode adjacency, then deterministic
    individuation for automorphic classes. Same guarantees URDNA2015
    gives (isomorphic graphs -> identical canonical QUADS; the
    per-input-label mapping inside an automorphism orbit is chosen by
    smallest original label, which cannot change the canonical quad
    multiset by definition of an orbit) - but NOT wire-compatible
    with the W3C algorithm's hash inputs, documented as such."""
    import hashlib

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    bnodes = sorted({t for s, p, o in quads for t in (s, o)
                     if isinstance(t, str) and t.startswith("_:")})
    if not bnodes:
        return {}

    def first_degree(b):
        forms = []
        for s, p, o in quads:
            if s == b or o == b:
                def ser(x):
                    if x == b:
                        return "_:a"
                    if isinstance(x, str) and x.startswith("_:"):
                        return "_:z"
                    return x if x is not None else ""
                forms.append(f"{ser(s)} {p} {ser(o)}")
        return md5("\n".join(sorted(forms)))

    h = {b: first_degree(b) for b in bnodes}
    nbrs = {b: [] for b in bnodes}
    for s, p, o in quads:
        if s in nbrs and o in nbrs and s != o:
            nbrs[s].append(("s", p, o))
            nbrs[o].append(("o", p, s))

    def refine():
        nonlocal h
        for _ in range(len(bnodes)):
            n_classes = len(set(h.values()))
            h = {b: md5(h[b] + "|" + "\n".join(sorted(
                f"{d}:{p}:{h[n]}" for d, p, n in nbrs[b])))
                for b in bnodes}
            if len(set(h.values())) == n_classes:
                break

    refine()
    for _ in range(len(bnodes)):
        classes = {}
        for b in bnodes:
            classes.setdefault(h[b], []).append(b)
        tied = sorted((hh, bs) for hh, bs in classes.items()
                      if len(bs) > 1)
        if not tied:
            break
        # individuate the smallest member of the smallest tied class
        pick = min(tied[0][1])
        h[pick] = md5(h[pick] + "!")
        refine()
    order = sorted(bnodes, key=lambda b: (h[b], b))
    return {b: f"_:c14n{i}" for i, b in enumerate(order)}


def canonicalize_blank_labels(df: DataFrame,
                              graph_col: str = "url") -> DataFrame:
    """Rewrite every graph's blank-node labels to their canonical
    '_:c14n<i>' form - the cross-run / cross-engine graph identity
    the conversion pipeline's deterministic-but-arbitrary skolem ids
    cannot give: two isomorphic page graphs (same facts, different
    bnode label accidents) canonicalize to IDENTICAL rows, enabling
    exact graph-level dedup, diffs and fingerprints. Schema preserved.

    Scale shape: graphs are PAGE-sized (the group key is the page
    url), so per-graph Python labeling in applyInPandas is the
    legitimate Python case - per-group work is bounded by page size,
    never corpus size; only bnode-bearing groups pay (others pass
    through a cheap JVM filter path)."""
    import pandas as pd
    from pyspark.sql.window import Window

    has_b = (F.col("subj").startswith("_:")
             | F.col("obj").startswith("_:"))
    marked = df.withColumn(
        "_hasb", F.max(has_b.cast("int")).over(
            Window.partitionBy(graph_col)))
    clean = marked.where(F.col("_hasb") == 0).drop("_hasb")
    dirty = marked.where(F.col("_hasb") == 1).drop("_hasb")
    cols = df.columns

    def relabel(pdf: pd.DataFrame) -> pd.DataFrame:
        quads = list(zip(pdf["subj"], pdf["pred"], pdf["obj"]))
        lab = _canon_labels_py(quads)
        if lab:
            pdf = pdf.assign(
                subj=[lab.get(s, s) for s in pdf["subj"]],
                obj=[lab.get(o, o) for o in pdf["obj"]])
        return pdf[cols]

    out_dirty = (dirty.groupBy(graph_col)
                 .applyInPandas(relabel, df.schema))
    return clean.unionByName(out_dirty)


def graph_fingerprints(df: DataFrame,
                       graph_col: str = "url") -> DataFrame:
    """(graph, graph_md5, n_quads): content fingerprint of each
    graph's CANONICAL quad set - md5 over the sorted canonical
    N-Triples lines, so isomorphic graphs fingerprint identically
    (label accidents canceled by canonicalize_blank_labels) and any
    fact change flips the hash. The graph-level sibling of
    sketches.table_fingerprint: dedup mirrored pages by meaning,
    verify a re-extraction reproduced every page graph, diff crawls
    at page granularity. One groupBy after the canonical rewrite;
    lines sort WITHIN each page group (bounded), never globally."""
    canon = canonicalize_blank_labels(df, graph_col)
    line = ntriple_line(
        F.col("subj"), F.col("pred"), F.col("obj"),
        F.col("obj_kind") if "obj_kind" in df.columns
        else F.lit("iri"),
        F.col("obj_datatype") if "obj_datatype" in df.columns
        else F.lit(None).cast("string"),
        F.col("obj_lang") if "obj_lang" in df.columns
        else F.lit(None).cast("string"))
    return (canon.select(F.col(graph_col).alias("graph"),
                         line.alias("_l"))
            .groupBy("graph")
            .agg(F.md5(F.concat_ws(
                "\n", F.array_sort(F.collect_list("_l"))))
                .alias("graph_md5"),
                F.count(F.lit(1)).cast("long").alias("n_quads")))
