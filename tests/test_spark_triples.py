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
