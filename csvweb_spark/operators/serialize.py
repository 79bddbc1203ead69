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


def ntriple_line(subj: Column, pred: Column, obj: Column, obj_kind: Column,
                 obj_datatype: Column, obj_lang: Column) -> Column:
    """One N-Triples line (without trailing newline) as a pure column
    expression."""
    lit = F.concat(F.lit('"'), escape_literal(obj), F.lit('"'))
    typed = F.when(
        obj_lang.isNotNull(),
        F.concat(lit, F.lit("@"), obj_lang)
    ).when(
        obj_datatype.isNotNull() & (obj_datatype != XSD_STRING),
        F.concat(lit, F.lit("^^<"), obj_datatype, F.lit(">"))
    ).otherwise(lit)
    o = F.when(obj_kind == F.lit("literal"), typed).otherwise(_term(obj))
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
