"""HTML <table> detection + extraction (north_star: tabular content from
the html:binary payload) and embedded-CSV dialect sniffing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from csvweb_spark.sources.html_tables import (
    _table_to_csv, detect_tabular, extract_html_tables, html_pages_from_table,
    parse_html_tables, sniff_csv_dialect)


# ---------------------------------------------------------------------------
# pure-Python parser
# ---------------------------------------------------------------------------


def test_parse_basic_table_entities_whitespace():
    h = ("<table><tr><th>a</th><th>b &amp; c</th></tr>"
         "<tr><td> 1 </td><td>x<br>y</td></tr></table>")
    assert parse_html_tables(h) == [[["a", "b & c"], ["1", "x y"]]]


def test_parse_colspan_nested_script():
    h = """<body><script>var t='<table>bogus';</script>
    <table><tr><th colspan="2">ab</th><th>c</th></tr>
    <tr><td>1</td><td>2</td><td>3</td></tr>
    <tr><td>only</td></tr>
    <tr><td>outer<table><tr><td>in1</td></tr><tr><td>in2</td></tr></table></td>
        <td>o2</td><td>o3</td></tr>
    </table></body>"""
    ts = parse_html_tables(h)
    assert len(ts) == 2
    outer, inner = ts
    assert outer[0] == ["ab", "ab", "c"]          # colspan repeats the cell
    assert outer[2] == ["only"]                   # ragged row preserved
    assert outer[3][0] == "outer"                 # nested text excluded
    assert inner == [["in1"], ["in2"]]
    csv_text, n_rows, n_cols = _table_to_csv(outer)
    assert (n_rows, n_cols) == (4, 3)
    assert "only,,\n" in csv_text                 # padded to header width


def test_parse_malformed_never_throws():
    assert parse_html_tables("<table><tr><td>x") == [[["x"]]]
    assert parse_html_tables("<tr><td>orphan</td></tr>") == []
    assert parse_html_tables("") == []


def test_sniff_csv_dialect():
    assert sniff_csv_dialect("a,b,c\n1,2,3\n4,5,6\n") == ","
    assert sniff_csv_dialect("a;b\n1;2\n") == ";"
    assert sniff_csv_dialect("a\tb\tc\n1\t2\t3\n") == "\t"
    assert sniff_csv_dialect('"x,y";b\n1;2\n') == ";"   # quote-aware
    assert sniff_csv_dialect("just prose.\nanother line\n") is None
    assert sniff_csv_dialect("one line only") is None
    assert sniff_csv_dialect("") is None


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


@pytest.fixture()
def nation_like(spark):
    rows = [(i, f"NATION_{i} & co", i % 5) for i in range(12)]
    return spark.createDataFrame(
        rows, "n_nationkey int, n_name string, n_regionkey int")


def test_extract_html_tables_roundtrip(spark, nation_like):
    """HTML-rendered pages -> extracted CSV text must convert to the same
    triples as the direct CSV rendering (lossless round-trip incl. escaped
    entities)."""
    from csvweb_spark.csvw.model import Column, Datatype, Table
    from csvweb_spark.operators.triples import convert_table_group_spark
    from csvweb_spark.sources.pages import pages_from_table

    cols = ["n_nationkey", "n_name", "n_regionkey"]
    hpages = html_pages_from_table(nation_like, F.lit(0),
                                   "http://ex.org/n.csv", cols, "n_nationkey")
    extracted = extract_html_tables(hpages)
    got = extracted.collect()
    assert len(got) == 1 and got[0]["n_rows"] == 13 and got[0]["n_cols"] == 3

    t = Table(url="http://ex.org/n.csv")
    about = "http://ex.org/n/{n_nationkey}"
    t.columns = [
        Column(name="n_nationkey", about_url=about,
               datatype=Datatype(base="integer")),
        Column(name="n_name", about_url=about),
        Column(name="n_regionkey", about_url=about,
               datatype=Datatype(base="integer")),
    ]
    via_html = convert_table_group_spark(
        extracted, t, scope_by_url=False).select("subj", "pred", "obj")
    via_csv = convert_table_group_spark(
        pages_from_table(nation_like, F.lit(0), "http://ex.org/n.csv",
                         cols, "n_nationkey"),
        t, scope_by_url=False).select("subj", "pred", "obj")
    assert via_html.exceptAll(via_csv).count() == 0
    assert via_csv.exceptAll(via_html).count() == 0
    assert via_csv.count() == 36


def test_extract_min_rows_drops_layout_tables(spark):
    pages = spark.createDataFrame(
        [("http://p/1", None,
          b"<table><tr><td>nav</td></tr></table>"
          b"<table><tr><th>h</th></tr><tr><td>v</td></tr></table>",
          None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    out = extract_html_tables(pages).collect()
    assert len(out) == 1
    assert out[0]["table_index"] == 1   # document-order index preserved


def test_detect_tabular_classification(spark, nation_like):
    h = html_pages_from_table(nation_like, F.lit(0), "http://p/h.html",
                              ["n_nationkey", "n_name"], "n_nationkey")
    mixed = h.unionByName(spark.createDataFrame(
        [("http://p/c.csv", None, None, "a,b\n1,2\n3,4\n", "en"),
         ("http://p/t.txt", None, None, "prose line one.\nand two\n", "en"),
         ("http://p/empty", None, None, None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string"))
    got = {r["url"]: r for r in detect_tabular(mixed).collect()}
    assert got["http://p/h.html"]["content_kind"] == "html_table"
    assert got["http://p/h.html"]["n_html_tables"] == 1
    assert got["http://p/c.csv"]["content_kind"] == "csv"
    assert got["http://p/c.csv"]["csv_delimiter"] == ","
    assert got["http://p/t.txt"]["content_kind"] == "none"
    assert got["http://p/empty"]["content_kind"] == "none"
