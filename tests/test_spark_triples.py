"""Spark triple-extraction parity: compiled Catalyst path == Python kernel
== reference goldens, on the 13 golden conversions plus multi-page runs."""

import pytest

from csvweb_spark.csvw.convert import MODE_MINIMAL, MODE_STANDARD, PageConverter
from csvweb_spark.csvw.parse_meta import parse_metadata
from csvweb_spark.operators.triples import (
    convert_pages_spark,
    convert_table_group_spark,
    join_metadata_sidecar,
)
from csvweb_spark.testing.turtle import diff_report, graphs_isomorphic, parse_turtle
from tests.conftest import have_reference, reference_fixture

pytestmark = pytest.mark.skipif(
    not have_reference(), reason="reference fixture corpus not available")

BASE = "http://example.org/metadata.json"

GOLDENS = [
    ("valid-table-1.json", "countries.csv", "valid-table-1-out.ttl"),
    ("valid-table-2.json", "countries.csv", "valid-table-2-out.ttl"),
    ("valid-table-3.json", "countries.csv", "valid-table-3-out.ttl"),
    ("valid-table-4.json", "countries.csv", "valid-table-4-out.ttl"),
    ("valid-table-5.json", "countries.csv", "valid-table-5-out.ttl"),
    ("valid-table-6.json", "countries.csv", "valid-table-6-out.ttl"),
    ("valid-table-7.json", "countries.csv", "valid-table-7-out.ttl"),
    ("valid-table-suppressed-columns.json", "countries.csv",
     "valid-table-suppressed-columns-out.ttl"),
    ("empty_column.metadata.json", "empty_column.csv", "empty_column.out.ttl"),
    ("escaping.metadata.json", "escaping.csv", "escaping.out.ttl"),
    ("valid-table-9.json", "countries.csv", "valid-table-9-out.ttl"),
    ("virtual-column-with-default-1.json", "countries.csv",
     "virtual-column-with-default-1-out.ttl"),
    ("dateTime.json", "dateTime.csv", "dateTime.ttl"),
]


def _pages(spark, url, text):
    return spark.createDataFrame([(url, text)], "url string, text string")


def _collect_triples(df):
    return [(r.subj, r.pred, r.obj, r.obj_kind, r.obj_datatype, r.obj_lang)
            for r in df.collect()]


@pytest.mark.parametrize("meta_name,csv_name,ttl_name", GOLDENS)
def test_spark_compiled_path_matches_goldens(spark, meta_name, csv_name, ttl_name):
    group = parse_metadata(reference_fixture(meta_name), BASE)
    table = group.tables[0]
    pages = _pages(spark, table.url, reference_fixture(csv_name))
    out = convert_table_group_spark(pages, table, mode=MODE_MINIMAL,
                                    scope_by_url=False)
    actual = _collect_triples(out)
    expected = parse_turtle(reference_fixture(ttl_name))
    assert graphs_isomorphic(actual, expected), diff_report(actual, expected)


@pytest.mark.parametrize("meta_name,csv_name", [
    ("valid-table-3.json", "countries.csv"),
    ("valid-table-5.json", "countries.csv"),
    ("dateTime.json", "dateTime.csv"),
])
def test_spark_standard_mode_matches_kernel(spark, meta_name, csv_name):
    group = parse_metadata(reference_fixture(meta_name), BASE)
    table = group.tables[0]
    csv_text = reference_fixture(csv_name)
    pages = _pages(spark, table.url, csv_text)
    out = convert_table_group_spark(pages, table, mode=MODE_STANDARD,
                                    scope_by_url=False)
    actual = _collect_triples(out)
    kern = PageConverter(mode=MODE_STANDARD).convert_table_group(
        group, {table.url: csv_text})
    expected = [t.astuple() for t in kern.triples]
    assert graphs_isomorphic(actual, expected), diff_report(actual, expected)


def test_spark_heterogeneous_path_matches_goldens(spark):
    """convert_pages_spark: per-page metadata, several distinct schemas in
    one DataFrame; each page's triples must match its golden."""
    rows = []
    expected_all = {}
    for meta_name, csv_name, ttl_name in GOLDENS[:6]:
        group = parse_metadata(reference_fixture(meta_name), BASE)
        url = group.tables[0].url + "?case=" + meta_name
        # rebase the metadata on a per-case url by injecting the raw json
        rows.append((url, reference_fixture(csv_name),
                     reference_fixture(meta_name)))
        expected_all[url] = parse_turtle(reference_fixture(ttl_name))
    pages = spark.createDataFrame(
        rows, "url string, text string, metadata_json string")
    out = convert_pages_spark(pages, mode=MODE_MINIMAL)
    by_url = {}
    for r in out.collect():
        by_url.setdefault(r.url, []).append(
            (r.subj, r.pred, r.obj, r.obj_kind, r.obj_datatype, r.obj_lang))
    assert set(by_url) == set(expected_all)
    for url, actual in by_url.items():
        assert graphs_isomorphic(actual, expected_all[url]), \
            url + "\n" + diff_report(actual, expected_all[url])


def test_multi_page_scale_shape(spark):
    """Many pages, one schema: triples per page, bnode labels scoped by url
    (globally unique), pipeline stays shuffle-free."""
    group = parse_metadata(reference_fixture("valid-table-1.json"), BASE)
    table = group.tables[0]
    text = reference_fixture("countries.csv")
    pages = spark.createDataFrame(
        [(f"http://example.org/p/{i:04d}.csv", text) for i in range(40)],
        "url string, text string")
    out = convert_table_group_spark(pages, table, mode=MODE_MINIMAL,
                                    scope_by_url=True, sample_text=text)
    rows = out.collect()
    assert len(rows) == 40 * 3 * 4  # 40 pages x 3 rows x 4 cells
    subjects = {r.subj for r in rows}
    assert len(subjects) == 40 * 3  # scoped default-subject bnodes
    # shuffle-free plan: no Exchange operator
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_metadata_sidecar_join(spark):
    pages = spark.createDataFrame(
        [("http://x.org/a.csv", "h\n1"), ("http://x.org/b.csv", "h\n2"),
         ("http://x.org/c.csv", "h\n3")],
        "url string, text string")
    meta = spark.createDataFrame(
        [("http://x.org/a.csv-metadata.json", '{"url":"a.csv"}'),
         ("http://x.org/csv-metadata.json", '{"url":"sibling.csv"}')],
        "meta_url string, metadata_json string")
    joined = join_metadata_sidecar(pages, meta).collect()
    by_url = {r.url: r.metadata_json for r in joined}
    assert by_url["http://x.org/a.csv"] == '{"url":"a.csv"}'
    # b and c fall back to the sibling csv-metadata.json
    assert by_url["http://x.org/b.csv"] == '{"url":"sibling.csv"}'
    assert by_url["http://x.org/c.csv"] == '{"url":"sibling.csv"}'


def test_byte_identity_invariant(spark):
    """input_hint per-row invariant: the extraction pipeline must not mutate
    the page text - re-serializing parsed rows with the same dialect yields
    the original bytes for canonical CSV pages."""
    import csv as _csv
    import io

    from csvweb_spark.csvw.convert import parse_csv_rows
    from csvweb_spark.csvw.model import Dialect

    text = "a,b\n1,hello world\n2,\"quote,comma\"\n"
    rows = list(parse_csv_rows(text, Dialect()))
    buf = io.StringIO()
    w = _csv.writer(buf, lineterminator="\n")
    w.writerows(rows)
    assert buf.getvalue() == text


def test_compiled_error_side_output_matches_kernel(spark):
    """E1 parity: the compiled path's error side-channel carries the same
    per-cell errors (same messages, same count) the kernel records in
    ConversionResult.errors (reference Rdf/Converter.cs:456-461), and the
    surviving triples are identical in both paths -- including the W3C
    step-8 fallback (format-invalid value kept as an xsd:string literal,
    NOT an error) vs. the true error case (lexically valid dateTime that
    normalization rejects)."""
    from csvweb_spark.csvw.formats import DateFormat
    from csvweb_spark.csvw.model import Column, Datatype, Table
    from csvweb_spark.operators.triples import (
        convert_table_group_spark_with_errors)

    t = Table(url="http://ex.org/t.csv")
    about = "http://ex.org/r/{k}"
    fmt_dt = Datatype(base="date")
    fmt_dt.format = DateFormat("M/d/yyyy")
    t.columns = [
        Column(name="k", about_url=about,
               property_url="http://ex.org/def/k",
               datatype=Datatype(base="integer")),
        Column(name="d", about_url=about,
               property_url="http://ex.org/def/d", datatype=fmt_dt),
        Column(name="ts", about_url=about,
               property_url="http://ex.org/def/ts",
               datatype=Datatype(base="dateTime")),
    ]
    csv_text = ("k,d,ts\n"
                "1,2/3/2001,2001-02-03T04:05:06\n"
                "2,13/40/2099,2024-02-31T12:00:00\n"   # d: fallback; ts: error
                "3,not-a-date,2002-01-01T00:00:00\n"   # d: fallback
                "4,4/5/2002,2023-06-31T01:02:03\n")    # ts: error
    pages = _pages(spark, t.url, csv_text)
    triples, errors = convert_table_group_spark_with_errors(
        pages, t, scope_by_url=False)
    err_rows = errors.collect()

    kern = PageConverter().convert_table(t, csv_text)
    assert len(kern.errors) == 2  # the two impossible dateTimes
    assert sorted(r.message for r in err_rows) == sorted(kern.errors)
    assert sorted((r.row, r.col_ix, r.col_name) for r in err_rows) == \
        [(2, 2, "ts"), (4, 2, "ts")]
    actual = _collect_triples(triples)
    expected = [tr.astuple() for tr in kern.triples]
    # fallback triples present with xsd:string in BOTH paths
    from csvweb_spark.testing.turtle import XSD as _X
    assert ("http://ex.org/r/2", "http://ex.org/def/d", "13/40/2099",
            "literal", _X + "string", None) in actual
    assert graphs_isomorphic(actual, expected), diff_report(actual, expected)


def test_ntriples_roundtrip(spark):
    """to_ntriples output parses back (N-Triples is a Turtle subset) to an
    isomorphic graph -- escape-heavy literals, lang tags, bnodes, typed
    literals, IRI objects."""
    from csvweb_spark.operators.serialize import to_ntriples
    from csvweb_spark.testing.turtle import XSD

    rows = [
        ("http://e/s1", "http://e/p", 'he said "hi"\n\tback\\slash',
         "literal", XSD + "string", None),
        ("http://e/s1", "http://e/p2", "bonjour", "literal", None, "fr"),
        ("_:b0", "http://e/p3", "42", "literal", XSD + "integer", None),
        ("http://e/s2", "http://e/p4", "_:b0", "bnode", None, None),
        ("http://e/s2", "http://e/p5", "http://e/o", "iri", None, None),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string, "
              "obj_datatype string, obj_lang string")
    text = "\n".join(r.line for r in to_ntriples(df).collect())
    parsed = parse_turtle(text)
    assert graphs_isomorphic(parsed, rows), diff_report(parsed, rows)


def test_ntriples_of_compiled_conversion_roundtrip(spark):
    """End-to-end: compiled conversion -> N-Triples text -> parse -> same
    graph as the conversion emitted."""
    from csvweb_spark.operators.serialize import to_ntriples

    group = parse_metadata(reference_fixture("valid-table-1.json"), BASE)
    table = group.tables[0]
    pages = _pages(spark, table.url, reference_fixture("countries.csv"))
    out = convert_table_group_spark(pages, table, mode=MODE_MINIMAL,
                                    scope_by_url=False)
    expected = _collect_triples(out)
    text = "\n".join(r.line for r in to_ntriples(out).collect())
    parsed = parse_turtle(text)
    assert graphs_isomorphic(parsed, expected), diff_report(parsed, expected)


def test_turtle_roundtrip_and_compaction(spark):
    """to_turtle output parses back to an isomorphic graph, and prefix
    compaction is conservative: safe locals compact to p:local (incl.
    ^^xsd:integer datatypes and 'a' for rdf:type), unsafe locals (dots,
    leading digits) stay <iri>."""
    from csvweb_spark.operators.serialize import to_turtle
    from csvweb_spark.testing.turtle import RDF_TYPE, XSD

    rows = [
        ("http://e/s1", "http://e/p", 'he said "hi"\n\tback\\slash',
         "literal", XSD + "string", None),
        ("http://e/s1", RDF_TYPE, "http://e/ns#Thing", "iri", None, None),
        ("_:b0", "http://e/ns#count", "42", "literal", XSD + "integer", None),
        ("http://e/s2", "http://e/ns#ref", "_:b0", "bnode", None, None),
        ("http://e/s2", "http://e/ns#v1.2", "x", "literal", None, None),
        ("http://e/s2", "http://e/ns#0bad", "y", "literal", None, "en"),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string, "
              "obj_datatype string, obj_lang string")
    prefixes = {"xsd": XSD, "ns": "http://e/ns#"}
    lines = [r.line for r in to_turtle(df, prefixes).collect()]
    body = "\n".join(lines)
    assert any(" a ns:Thing ." in ln for ln in lines)
    assert any('"42"^^xsd:integer' in ln for ln in lines)
    assert any(" ns:count " in ln for ln in lines)
    # unsafe locals ('v1.2' has a dot, '0bad' leads with a digit) stay IRIs
    assert any("<http://e/ns#v1.2>" in ln for ln in lines)
    assert any("<http://e/ns#0bad>" in ln for ln in lines)
    from csvweb_spark.operators.serialize import turtle_header
    text = turtle_header(prefixes) + body
    parsed = parse_turtle(text)
    assert graphs_isomorphic(parsed, rows), diff_report(parsed, rows)


def test_turtle_grouped_roundtrip(spark):
    """The ';'-grouped writer parses back to the same graph as the flat
    writer (grouping is pure syntax), including the golden conversion."""
    from csvweb_spark.operators.serialize import (to_turtle,
                                                  to_turtle_grouped,
                                                  turtle_header)
    from csvweb_spark.testing.turtle import XSD

    group = parse_metadata(reference_fixture("valid-table-1.json"), BASE)
    table = group.tables[0]
    pages = _pages(spark, table.url, reference_fixture("countries.csv"))
    out = convert_table_group_spark(pages, table, mode=MODE_MINIMAL,
                                    scope_by_url=False)
    prefixes = {"xsd": XSD, "ex": "http://example.org/"}
    flat = parse_turtle(turtle_header(prefixes) + "\n".join(
        r.line for r in to_turtle(out, prefixes).collect()))
    grouped = parse_turtle(turtle_header(prefixes) + "\n".join(
        r.block for r in to_turtle_grouped(out, prefixes).collect()))
    assert graphs_isomorphic(grouped, flat), diff_report(grouped, flat)
    expected = parse_turtle(reference_fixture("valid-table-1-out.ttl"))
    assert graphs_isomorphic(grouped, expected), \
        diff_report(grouped, expected)


def test_write_turtle_sink_with_prefix_sidecar(spark, tmp_path):
    """write_turtle materializes body parts + a _prefixes.ttl sidecar;
    sidecar + parts concatenate to a parseable, isomorphic document -
    through BOTH the local and the Hadoop (file://) fs adapters."""
    import glob

    from csvweb_spark.operators.serialize import write_turtle
    from csvweb_spark.testing.turtle import XSD

    rows = [("http://e/s1", "http://e/ns#p", "42", "literal",
             XSD + "integer", None),
            ("http://e/s1", "http://e/ns#q", "http://e/o", "iri",
             None, None)]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string, "
              "obj_datatype string, obj_lang string")
    prefixes = {"xsd": XSD, "ns": "http://e/ns#"}
    for scheme, grouped in (("", False), ("file://", True)):
        out = str(tmp_path / f"ttl{'_h' if scheme else ''}")
        write_turtle(df, scheme + out, prefixes, grouped=grouped)
        with open(f"{out}/_prefixes.ttl") as f:
            text = f.read()
        for part in sorted(glob.glob(f"{out}/part-*")):
            with open(part) as f:
                text += f.read()
        parsed = parse_turtle(text)
        assert graphs_isomorphic(parsed, rows), diff_report(parsed, rows)


def test_turtle_matches_reference_golden(spark):
    """The reference's primary output format: conversion -> to_turtle ->
    parse must be isomorphic to the reference's own golden .ttl
    (ConverterSpec.cs:22-36; dotNetRDF Turtle writer at
    Rdf/Converter.cs:235-238)."""
    from csvweb_spark.operators.serialize import to_turtle
    from csvweb_spark.testing.turtle import XSD

    for meta, csvf, golden in [
            ("valid-table-1.json", "countries.csv", "valid-table-1-out.ttl"),
            ("escaping.metadata.json", "escaping.csv", "escaping.out.ttl")]:
        group = parse_metadata(reference_fixture(meta), BASE)
        table = group.tables[0]
        pages = _pages(spark, table.url, reference_fixture(csvf))
        out = convert_table_group_spark(pages, table, mode=MODE_MINIMAL,
                                        scope_by_url=False)
        prefixes = {"xsd": XSD, "ex": "http://example.org/"}
        text = ("@prefix xsd: <" + XSD + "> .\n@prefix ex: "
                "<http://example.org/> .\n"
                + "\n".join(r.line for r in to_turtle(out, prefixes)
                            .collect()))
        parsed = parse_turtle(text)
        expected = parse_turtle(reference_fixture(golden))
        assert graphs_isomorphic(parsed, expected), \
            diff_report(parsed, expected)


def test_compiled_lexical_fallback_matches_kernel(spark):
    """W3C step-8 for PLAIN typed columns (no format): invalid lexical
    forms keep the raw value retyped xsd:string; booleans get the 1/0 ->
    true/false map; bounded integer types range-check. The compiled JVM
    guard (_typed_literal_exprs) must agree with the kernel exactly."""
    from csvweb_spark.csvw.model import Column, Datatype, Table
    from csvweb_spark.operators.triples import convert_table_group_spark

    t = Table(url="http://ex.org/t.csv")
    about = "http://ex.org/r/{k}"
    t.columns = [
        Column(name="k", about_url=about,
               property_url="http://ex.org/def/k",
               datatype=Datatype(base="integer")),
        Column(name="n", about_url=about,
               property_url="http://ex.org/def/n",
               datatype=Datatype(base="integer")),
        Column(name="b", about_url=about,
               property_url="http://ex.org/def/b",
               datatype=Datatype(base="byte")),
        Column(name="f", about_url=about,
               property_url="http://ex.org/def/f",
               datatype=Datatype(base="boolean")),
        Column(name="d", about_url=about,
               property_url="http://ex.org/def/d",
               datatype=Datatype(base="double")),
    ]
    csv_text = ("k,n,b,f,d\n"
                "1,42,127,1,3.5e2\n"      # all valid (bool 1 -> true)
                "2,abc,300,TRUE,NaN\n"    # invalid int, byte range, bool
                "3,-7,-128,false,not-a-number\n"
                "4,+05,0,0,-INF\n")
    pages = _pages(spark, t.url, csv_text)
    out = convert_table_group_spark(pages, t, scope_by_url=False)
    actual = _collect_triples(out)
    kern = PageConverter().convert_table(t, csv_text)
    expected = [tr.astuple() for tr in kern.triples]
    assert graphs_isomorphic(actual, expected), diff_report(actual, expected)
    from csvweb_spark.testing.turtle import XSD as _X
    got = {(s.rsplit('/', 1)[-1], p.rsplit('/', 1)[-1]): (o, dt)
           for s, p, o, kk, dt, _l in actual}
    assert got[("1", "f")] == ("true", _X + "boolean")
    assert got[("2", "n")] == ("abc", _X + "string")
    assert got[("2", "b")] == ("300", _X + "string")
    assert got[("2", "f")] == ("TRUE", _X + "string")
    assert got[("2", "d")] == ("NaN", _X + "double")
    assert got[("4", "f")] == ("false", _X + "boolean")


def test_compiled_constraint_columns_match_kernel(spark):
    """W3C value/length facet checks on columns with CONSTRAINTS but no
    format: round-2 regression found in review - such columns took
    neither the JVM step-8 guard nor the normalizer path, so the compiled
    path emitted typed literals the kernel retypes to xsd:string."""
    from csvweb_spark.csvw.model import Column, Datatype, Table
    from csvweb_spark.operators.triples import convert_table_group_spark

    t = Table(url="http://ex.org/c.csv")
    about = "http://ex.org/r/{k}"
    t.columns = [
        Column(name="k", about_url=about,
               property_url="http://ex.org/def/k",
               datatype=Datatype(base="integer")),
        Column(name="m", about_url=about,
               property_url="http://ex.org/def/m",
               datatype=Datatype(base="integer",
                                 constraints=[("minimum", 10)])),
        Column(name="s", about_url=about,
               property_url="http://ex.org/def/s",
               datatype=Datatype(base="string",
                                 constraints=[("maxLength", 3)])),
    ]
    csv_text = ("k,m,s\n"
                "1,15,ab\n"     # all satisfied
                "2,5,abcd\n"    # m below minimum, s over maxLength
                "3,abc,xyz\n")  # m lexically invalid
    pages = _pages(spark, t.url, csv_text)
    out = convert_table_group_spark(pages, t, scope_by_url=False)
    actual = _collect_triples(out)
    kern = PageConverter().convert_table(t, csv_text)
    expected = [tr.astuple() for tr in kern.triples]
    assert graphs_isomorphic(actual, expected), diff_report(actual, expected)
    from csvweb_spark.testing.turtle import XSD as _X
    got = {(s.rsplit('/', 1)[-1], p.rsplit('/', 1)[-1]): (o, dt)
           for s, p, o, kk, dt, _l in actual}
    assert got[("1", "m")] == ("15", _X + "integer")
    assert got[("2", "m")] == ("5", _X + "string")
    assert got[("3", "m")] == ("abc", _X + "string")


def test_comment_semantics_and_physical_source_row(spark):
    """CsvHelper comment semantics + W3C physical _sourceRow (round-2
    review fixes): a QUOTED first field starting with '#' is data, a raw
    comment line is skipped but still counts toward the source row, and
    kernel == compiled."""
    from csvweb_spark.csvw.model import Column, Table
    from csvweb_spark.operators.triples import convert_table_group_spark

    t = Table(url="http://ex.org/s.csv")
    about = "http://ex.org/r/{n}"
    t.columns = [
        Column(name="n", about_url=about,
               property_url="http://ex.org/def/n"),
        Column(name="sr", about_url=about,
               property_url="http://ex.org/def/sr",
               value_url="http://ex.org/src/{_sourceRow}"),
    ]
    csv_text = ('n,sr\n'
                '1,a\n'
                '# a raw comment line\n'
                '"#2",b\n'
                '3,c\n')
    pages = _pages(spark, t.url, csv_text)
    out = convert_table_group_spark(pages, t, scope_by_url=False)
    actual = _collect_triples(out)
    kern = PageConverter().convert_table(t, csv_text)
    expected = [tr.astuple() for tr in kern.triples]
    assert graphs_isomorphic(actual, expected), diff_report(actual, expected)
    subjects = {s for s, *_ in actual}
    assert "http://ex.org/r/#2" in subjects      # quoted '#' field kept
    src_objs = {o for _s, p, o, *_ in actual
                if p == "http://ex.org/def/sr"}
    # physical rows: header=1, '1'=2, comment=3 (skipped), '#2'=4, '3'=5
    assert src_objs == {"http://ex.org/src/2", "http://ex.org/src/4",
                        "http://ex.org/src/5"}


def test_multi_header_names_come_from_first_row(spark):
    """headerRowCount=2: inferred column names come from the FIRST header
    row (Converter.cs:300-305), kernel and compiled alike."""
    from csvweb_spark.csvw.model import Table
    from csvweb_spark.operators.triples import infer_columns

    t = Table(url="http://ex.org/h.csv")
    t.dialect.header_row_count = 2
    csv_text = "A,B\nunits,kg\n1,2\n"
    cols = infer_columns(t, csv_text)
    assert [c.name for c in cols] == ["A", "B"]
    kern = PageConverter().convert_table(t, csv_text)
    preds = {p for _s, p, *_ in (tr.astuple() for tr in kern.triples)}
    assert preds == {f"{t.url}#A", f"{t.url}#B"}
    objs = {o for _s, _p, o, *_ in (tr.astuple() for tr in kern.triples)}
    assert objs == {"1", "2"}  # both header rows consumed, one data row


def test_empty_table_standard_mode_scaffolding(spark):
    """A header-only page (zero data rows) must still emit the standard-
    mode Table/TableGroup scaffolding the kernel emits before its row
    loop (round-2 review fix: row==1-gated statics vanished); minimal
    mode must stay empty; virtual columns must not fabricate rows."""
    from csvweb_spark.csvw.convert import MODE_STANDARD
    from csvweb_spark.csvw.model import Column, Table
    from csvweb_spark.operators.triples import convert_table_group_spark

    t = Table(url="http://ex.org/e.csv")
    about = "http://ex.org/r/{k}"
    t.columns = [
        Column(name="k", about_url=about,
               property_url="http://ex.org/def/k"),
        Column(name="v", virtual=True, about_url="http://ex.org/const",
               property_url="http://ex.org/def/v",
               value_url="http://ex.org/always"),
    ]
    pages = _pages(spark, t.url, "k,x\n")  # header only
    out = convert_table_group_spark(pages, t, mode=MODE_STANDARD,
                                    scope_by_url=False)
    actual = _collect_triples(out)
    from csvweb_spark.csvw.model import TableGroup
    group = TableGroup()
    group.tables = [t]
    kern = PageConverter(mode=MODE_STANDARD).convert_table_group(
        group, {t.url: "k,x\n"})
    expected = [tr.astuple() for tr in kern.triples]
    assert graphs_isomorphic(actual, expected), diff_report(actual, expected)
    preds = {p for _s, p, *_ in actual}
    assert "http://www.w3.org/ns/csvw#url" in preds  # scaffolding present
    assert "http://ex.org/def/v" not in preds        # no fabricated rows
    # minimal mode: an empty table emits nothing at all
    assert convert_table_group_spark(pages, t, scope_by_url=False).count() == 0


def test_parity_fuzz_corpus(spark):
    """Adversarial cell-value corpus - quoted quotes, embedded commas and
    newlines, comment-char-leading fields (quoted and raw), unicode,
    padded/empty cells, integer edge forms, short (ragged) rows - the
    compiled path must agree with the kernel page by page. This is the
    cheap standing fuzz harness: extend `tricky` when a new class of
    input shows up."""
    import csv as _c
    import io as _io

    from csvweb_spark.csvw.model import Column, Datatype, Table
    from csvweb_spark.operators.triples import convert_table_group_spark

    tricky = ['1', 'abc', '', '  ', '"q"', 'a,b', '#lead', 'x\ny',
              'né', '0', '-5', 'true', '99999999999999999999', '+7',
              ' pad ', 'a;b', "quote'", 'NaN', '3.14', 'ab\t', '☃']
    pages = []
    for i, v in enumerate(tricky):
        buf = _io.StringIO()
        w = _c.writer(buf, lineterminator="\n")
        w.writerow(["k", "v", "n"])
        w.writerow([str(i), v, "42"])
        w.writerow([str(i + 100), v + "2", v])
        text = buf.getvalue()
        if i % 3 == 0:
            text += f"{i + 200},solo\n"          # short / ragged row
        if i % 4 == 0:
            text += "# raw comment line\n"       # skipped, counts position
        pages.append((f"http://f/{i}.csv", text))

    def cols():
        about = "http://f/r/{k}"
        return [
            Column(name="k", about_url=about,
                   property_url="http://f/def/k"),
            Column(name="v", about_url=about,
                   property_url="http://f/def/v"),
            Column(name="n", about_url=about,
                   property_url="http://f/def/n",
                   datatype=Datatype(base="integer")),
        ]

    t = Table(url="http://f/0.csv")
    t.columns = cols()
    df = spark.createDataFrame(pages, "url string, text string")
    out = convert_table_group_spark(df, t, scope_by_url=True)
    got = {}
    for r in out.collect():
        got.setdefault(r.url, []).append(
            (r.subj, r.pred, r.obj, r.obj_kind, r.obj_datatype, r.obj_lang))
    for url, text in pages:
        kt = Table(url=url)
        kt.columns = cols()
        kern = PageConverter().convert_table(kt, text)
        expected = [tr.astuple() for tr in kern.triples]
        actual = got.get(url, [])
        assert graphs_isomorphic(actual, expected), \
            f"{url}: " + diff_report(actual, expected)


def test_parse_ntriples_engine_roundtrip(spark):
    """parse_ntriples is the exact inverse of to_ntriples on the
    engine's own serializations: escape-heavy literals (incl. literal
    backslash-n, trailing backslash, IRI-lookalike text inside quotes),
    lang tags, typed literals, bnodes both positions, IRI objects. The
    xsd:string datatype loads back as NULL (plain-literal rule)."""
    from csvweb_spark.operators.serialize import parse_ntriples, to_ntriples
    from csvweb_spark.testing.turtle import XSD

    rows = [
        ("http://e/s1", "http://e/p", 'he said "hi"\n\tback\\slash',
         "literal", XSD + "string", None),
        ("http://e/s1", "http://e/p2", "bonjour", "literal", None, "fr"),
        ("_:b0", "http://e/p3", "42", "literal", XSD + "integer", None),
        ("http://e/s2", "http://e/p4", "_:b0", "bnode", None, None),
        ("http://e/s2", "http://e/p5", "http://e/o", "iri", None, None),
        ("http://e/s3", "http://e/p6", "\\n not a newline", "literal",
         None, None),
        ("http://e/s3", "http://e/p7", "ends with \\", "literal",
         None, None),
        ("http://e/s3", "http://e/p8", 'fake " <http://e/g> " quad',
         "literal", None, None),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string, "
              "obj_datatype string, obj_lang string")
    back = parse_ntriples(to_ntriples(df))
    got = sorted(tuple(r) for r in back.collect())
    exp = sorted((s, p, o, k, None if dt == XSD + "string" else dt, lg)
                 for s, p, o, k, dt, lg in rows)
    assert got == exp


def test_parse_nquads_roundtrip_and_audit(spark):
    """Quad grammar takes precedence (the graph term is never confused
    with an IRI object); NULL graphs round-trip as default-graph lines;
    invalid_ntriples flags only genuinely malformed non-comment lines."""
    from csvweb_spark.operators.serialize import (invalid_ntriples,
                                                  parse_ntriples, to_nquads)

    rows = [
        ("http://e/s1", "http://e/p", "http://e/o", "iri", None, None,
         "http://e/g1"),
        ("http://e/s2", "http://e/p", "plain", "literal", None, None,
         None),
        ("http://e/s3", "http://e/p", "tagged", "literal", None, "en",
         "http://e/g2"),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string, "
              "obj_datatype string, obj_lang string, url string")
    back = parse_ntriples(to_nquads(df), keep_graph=True)
    got = sorted(tuple(r) for r in back.collect())
    exp = sorted((s, p, o, k, dt, lg, g)
                 for s, p, o, k, dt, lg, g in rows)
    assert got == exp
    # graph column dropped by default; triple fields intact
    assert parse_ntriples(to_nquads(df)).columns == \
        ["subj", "pred", "obj", "obj_kind", "obj_datatype", "obj_lang"]

    lines = spark.createDataFrame(
        [("<a> <b> .",),            # missing object -> malformed
         ("# comment",), ("",), ("   ",),
         ("<s> <p> <o> .",), ("<s> <p> <o> <g> .",)], "line string")
    bad = [r.line for r in invalid_ntriples(lines).collect()]
    assert bad == ["<a> <b> ."]
    # malformed lines are dropped, valid ones parse
    assert parse_ntriples(lines).count() == 2


def test_parse_ntriples_adversarial_literal_roundtrip(spark):
    """Deterministic adversarial corpus over the escape-relevant
    alphabet (backslash runs, quotes, control whitespace, IRI-lookalike
    text, unicode): serialize -> parse must be the identity on every
    literal. One Spark job for the whole corpus."""
    import random

    from csvweb_spark.operators.serialize import parse_ntriples, to_ntriples

    rng = random.Random(42)
    alphabet = list('\\"\n\r\t <>._:@^|ab0é中') + ["\\\\", '\\"', "\\n"]
    corpus = ["".join(rng.choice(alphabet)
                      for _ in range(rng.randrange(0, 40)))
              for _ in range(500)]
    rows = [(f"http://s/{i}", "http://p", lit, "literal", None, None)
            for i, lit in enumerate(corpus)]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind string, "
              "obj_datatype string, obj_lang string")
    back = {r.subj: r.obj for r in parse_ntriples(to_ntriples(df)).collect()}
    assert len(back) == len(rows)
    for i, lit in enumerate(corpus):
        assert back[f"http://s/{i}"] == lit, (i, repr(lit))


def test_chunk_documents_token_coverage_property(spark):
    """Chunking invariants over a deterministic random corpus, checked
    against an independent Python reference: every token is covered,
    chunk starts are exactly the stride grid clipped to the text, and
    reconstruction matches slice-by-slice."""
    import random

    from csvweb_spark.operators.text import chunk_documents

    rng = random.Random(7)
    docs, expected = [], {}
    for doc_id in range(120):
        n = rng.randrange(0, 50)
        toks = [f"t{doc_id}_{j}" for j in range(n)]
        docs.append((doc_id, " ".join(toks)))
        w, s = 7, 4
        if n == 0:
            continue
        last = max(0, -(-(n - w) // s)) if n > w else 0
        expected[doc_id] = [
            (ix, toks[ix * s: ix * s + w]) for ix in range(last + 1)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, window=7, stride=4).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_ix, r.n_tokens, r.chunk_text))
    assert set(got) == set(expected)
    for doc_id, exp_chunks in expected.items():
        actual = sorted(got[doc_id])
        assert len(actual) == len(exp_chunks), doc_id
        covered = set()
        for (ix, toks_exp), (aix, ntok, text) in zip(exp_chunks, actual):
            assert aix == ix and ntok == len(toks_exp)
            assert text == " ".join(toks_exp), (doc_id, ix)
            covered.update(toks_exp)
        # every token of the document appears in at least one chunk
        n = len([t for t in docs[doc_id][1].split(" ") if t])
        assert covered == {f"t{doc_id}_{j}" for j in range(n)}


def test_parse_nquads_bnode_graph_and_object_validation(spark):
    """REGRESSION (round-4 review): (a) a quad whose GRAPH label is a
    blank node must parse as a quad, not fold the label into the
    object; (b) a literal object ending in an _:x-shaped token must NOT
    false-match the quad grammar; (c) garbage object terms are flagged
    by invalid_ntriples and dropped by parse_ntriples, never silently
    ingested as IRIs."""
    from csvweb_spark.operators.serialize import (invalid_ntriples,
                                                  parse_ntriples)
    rows = [
        ('<http://s> <http://p> "lit" _:g .',),          # bnode graph
        ('<http://s> <http://p> <http://o> _:g2 .',),    # bnode graph
        ('<http://s> <http://p> "text _:x" .',),         # literal, no quad
        ('<http://s> <http://p> garbage term .',),       # invalid object
        ('<http://s> <http://p> "ok" <http://g> .',),    # iri graph quad
    ]
    lines = spark.createDataFrame(rows, "line string")
    out = parse_ntriples(lines, keep_graph=True).collect()
    got = {(r.subj, r.obj, r.obj_kind, r.graph) for r in out}
    assert got == {
        ("http://s", "lit", "literal", "_:g"),
        ("http://s", "http://o", "iri", "_:g2"),
        ("http://s", "text _:x", "literal", None),
        ("http://s", "ok", "literal", "http://g"),
    }
    bad = [r.line for r in invalid_ntriples(lines).collect()]
    assert bad == ['<http://s> <http://p> garbage term .']
