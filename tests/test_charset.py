"""Charset sniffing + decode (sources/charset.py): BOM precedence,
meta prescan in both forms, WHATWG label aliasing (latin-1/ascii ->
windows-1252), utf-8 validity fallback, cp1252 translate fidelity
(including the 5 undefined bytes), and NULL safety."""

import pytest
from pyspark.sql import functions as F

from csvweb_spark.sources.charset import decode_html, decode_pages, \
    sniff_charset


def _decode_all(spark, blobs):
    df = spark.createDataFrame([(b,) for b in blobs], "html binary")
    rows = df.select(decode_html(F.col("html")).alias("s"),
                     sniff_charset(F.col("html")).alias("c")).collect()
    return [(r["s"], r["c"]) for r in rows]


def test_bom_precedence_and_strip(spark):
    # utf-8 BOM beats a LYING meta declaration, and is stripped
    body = '<meta charset="windows-1252">Café'
    blob = b"\xef\xbb\xbf" + body.encode("utf-8")
    [(s, c)] = _decode_all(spark, [blob])
    assert (s, c) == (body, "utf-8")


def test_utf16_boms_exact(spark):
    le = b"\xff\xfe" + "Café €".encode("utf-16-le")
    be = b"\xfe\xff" + "Café €".encode("utf-16-be")
    out = _decode_all(spark, [le, be])
    assert out[0] == ("Café €", "utf-16le")
    assert out[1] == ("Café €", "utf-16be")


def test_meta_charset_both_forms_and_aliases(spark):
    t = "<html><head>{m}</head><body>Caf\xe9 ’ok’</body></html>"
    plain = t.format(m='<meta charset="windows-1252">')
    httpeq = t.format(m='<meta http-equiv="Content-Type" '
                        'content="text/html; charset=iso-8859-1">')
    bare = t.format(m="<meta charset=latin1>")
    blobs = [s.encode("cp1252") for s in (plain, httpeq, bare)]
    for s, c in _decode_all(spark, blobs):
        assert c == "windows-1252"
        assert "Café ’ok’" in s  # 0x92 decoded as cp1252, not C1


def test_unlabelled_valid_utf8_and_fallback(spark):
    valid = "<p>naïve — café</p>".encode("utf-8")
    # undeclared cp1252 bytes: invalid as utf-8 -> cp1252 fallback
    raw = b"<p>caf\xe9 \x80 q\x92s \x81end</p>"
    out = _decode_all(spark, [valid, raw])
    assert out[0] == ("<p>naïve — café</p>", "utf-8")
    s, c = out[1]
    assert c == "windows-1252"
    # defined points translate; undefined 0x81 stays the C1 control
    assert "café € q’s \x81end" in s


def test_lying_utf8_label_falls_back(spark):
    lying = b'<meta charset="utf-8"><p>caf\xe9</p>'  # latin-1 bytes
    [(s, c)] = _decode_all(spark, [lying])
    assert (s, c) == ('<meta charset="utf-8"><p>café</p>',
                      "windows-1252")


def test_utf16_label_without_bom(spark):
    body = '<meta charset="utf-16">x'
    blob = body.encode("utf-16-le")
    [(s, c)] = _decode_all(spark, [blob])
    assert c == "utf-16le" and s.endswith("x")


def test_null_html_stays_null(spark):
    df = spark.createDataFrame([(None,), (b"ok",)], "html binary")
    rows = (decode_pages(df).select("html_str", "charset")
            .orderBy(F.col("html_str").asc_nulls_first()).collect())
    assert rows[0]["html_str"] is None and rows[0]["charset"] is None
    assert rows[1]["html_str"] == "ok" and rows[1]["charset"] == "utf-8"


def test_prescan_window_is_1024_bytes(spark):
    # a declaration PAST the window is ignored -> validity sniff wins
    late = (b"<!--" + b"x" * 1100 + b'--><meta charset="utf-16le">ok')
    [(s, c)] = _decode_all(spark, [late])
    assert c == "utf-8" and s.endswith("ok")


def test_compose_with_html_text(spark):
    from csvweb_spark.sources.webtext import extract_page_text
    page = ('<html><head><meta charset="windows-1252"><title>T</title>'
            "</head><body><p>caf\xe9 – €9</p></body></html>")
    df = spark.createDataFrame(
        [("http://x/", page.encode("cp1252"))], "url string, html binary")
    out = extract_page_text(
        decode_pages(df).drop("html").withColumnRenamed(
            "html_str", "html"))
    assert out.collect()[0]["text"] == "café – €9"


# ---------------------------------------------------------------- mojibake


def test_fix_mojibake_families(spark):
    from csvweb_spark.sources.charset import (add_mojibake_repair,
                                              fix_mojibake)
    import pyspark.sql.functions as F
    rows = [
        (1, "caf\u00c3\u00a9 r\u00c3\u00a9sum\u00c3\u00a9",
         "caf\u00e9 r\u00e9sum\u00e9"),
        (2, "plain caf\u00e9 text", "plain caf\u00e9 text"),  # untouched
        (3, "\u00e4\u00b8\u00ad\u00e6\u2013\u2021",
         "\u4e2d\u6587"),                       # CJK mojibake
        (4, "\u00e2\u20ac\u0153q\u00e2\u20ac\u009d",
         "\u201cq\u201d"),                      # curly quotes (incl 0x9D)
        (5, "\u65e5\u672c\u8a9e text", "\u65e5\u672c\u8a9e text"),
        (6, "", ""),
        (7, None, None),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in rows],
                               "id long, text string")
    out = {r.id: (r.text_fixed, r.text_fixed_applied)
           for r in add_mojibake_repair(df).collect()}
    for i, _, want in rows:
        assert out[i][0] == want, (i, out[i])
    assert [i for i, (_, ap) in sorted(out.items()) if ap] == [1, 3, 4]
    # double-encoded mojibake repairs with two applications
    dbl = "caf\u00c3\u0192\u00c2\u00a9"      # 'cafe'+acute, twice
    d2 = spark.createDataFrame([(dbl,)], "text string")
    once = fix_mojibake(F.col("text"))
    got = d2.select(fix_mojibake(once).alias("t")).collect()[0].t
    assert got == "caf\u00e9"
