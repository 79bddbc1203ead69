"""Tabular-content detection + HTML <table> extraction from web pages.

north_star: "vectorized Arrow/pandas UDFs detect and parse tabular content
(HTML <table> and embedded CSV) from trillion-row Iceberg web-page scans".
Pages carry two payloads (BASELINE.json input_hint): `html:binary` (raw
page bytes, may contain <table> markup) and `text:string` (extracted text,
may be embedded CSV).  This module:

* `parse_html_tables(html)`  - pure-Python stdlib parser (html.parser) that
  returns every <table> as a list-of-rows; handles th/td, thead/tbody/tfoot,
  colspan (cell repeated), nested tables (inner table lifted out as its own
  table, its text excluded from the outer cell), character entities.
* `extract_html_tables(pages)` - mapInPandas over the binary column: one
  output row per (page, table) with the table re-rendered as RFC-4180 CSV
  text, so the downstream CSVW conversion consumes HTML- and CSV-sourced
  tables through one code path.  Narrow (no shuffle); Arrow-batched.
* `sniff_csv_dialect(text)` / `detect_tabular(pages)` - embedded-CSV
  detection: pick the delimiter in {, ; \\t |} giving the most consistent
  column count over the first lines; classify each page as
  html_table / csv / none.

Scale: both operators are per-page map work - the 10^12-page scan stays
embarrassingly parallel, bounded by input splits.  Malformed HTML never
throws; pages with no tables emit nothing (mapInPandas generators skip
empty batches - never yield an empty pandas frame, dtype inference breaks
Arrow).

Reference parity: the reference resolves a URL to one CSV stream
(DefaultResolver.cs:24-28) and has no HTML path; this is new scope from the
north_star, normalized INTO the reference's CSV model.
"""

from __future__ import annotations

import csv as _csv
import io
from html.parser import HTMLParser
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DELIMS = [",", ";", "\t", "|"]

HTML_TABLES_SCHEMA = ("url string, warc_ts timestamp, lang string, "
                      "table_index int, n_rows int, n_cols int, text string")


class _TableBuilder:
    __slots__ = ("rows", "row", "cell", "in_cell", "pending_span")

    def __init__(self):
        self.rows: list[list[str]] = []
        self.row: Optional[list[str]] = None
        self.cell: Optional[list[str]] = None
        self.in_cell = False
        self.pending_span = 1


class _TablesParser(HTMLParser):
    """Collect every <table> as rows of cell strings. Nested tables become
    separate tables (document order: outer first); their text does not leak
    into the enclosing cell."""

    _SKIP = {"script", "style"}

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[str]]] = []
        self.stack: list[_TableBuilder] = []
        self._skip_depth = 0

    # -- structure ---------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1
            return
        if tag == "table":
            t = _TableBuilder()
            self.stack.append(t)
            self.tables.append(t.rows)
            return
        if not self.stack:
            return
        t = self.stack[-1]
        if tag == "tr":
            self._close_row(t)
            t.row = []
        elif tag in ("td", "th"):
            self._close_cell(t)
            if t.row is None:
                t.row = []
            t.cell = []
            t.in_cell = True
            span = 1
            for k, v in attrs:
                if k == "colspan" and v and v.strip().isdigit():
                    span = max(1, min(int(v.strip()), 1000))
            t.pending_span = span
        elif tag == "br" and t.in_cell:
            t.cell.append(" ")

    def handle_endtag(self, tag):
        if tag in self._SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "table":
            if self.stack:
                t = self.stack.pop()
                self._close_row(t)
            return
        if not self.stack:
            return
        t = self.stack[-1]
        if tag == "tr":
            self._close_row(t)
        elif tag in ("td", "th"):
            self._close_cell(t)

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self.stack and self.stack[-1].in_cell:
            self.stack[-1].cell.append(data)

    # -- helpers -----------------------------------------------------------
    @staticmethod
    def _close_cell(t: _TableBuilder):
        if t.in_cell:
            text = " ".join("".join(t.cell).split())
            t.row.extend([text] * t.pending_span)
            t.cell, t.in_cell, t.pending_span = None, False, 1

    @classmethod
    def _close_row(cls, t: _TableBuilder):
        cls._close_cell(t)
        if t.row is not None:
            t.rows.append(t.row)
            t.row = None


def parse_html_tables(html: str) -> list[list[list[str]]]:
    """All <table>s in the document as rows-of-cells (non-empty only)."""
    p = _TablesParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # malformed markup: keep whatever was collected
    while p.stack:  # unclosed <table>: flush its pending row/cell
        _TablesParser._close_row(p.stack.pop())
    return [rows for rows in p.tables if rows]


def _table_to_csv(rows: list[list[str]]) -> tuple[str, int, int]:
    """Render as RFC-4180 CSV with the HEADER row's width as the schema:
    short body rows pad, over-wide body rows (colspan repetition etc.)
    truncate. Review fix: padding everything to the MAX width let one
    wide body row append unnamed empty columns to the header, which
    downstream schema inference turned into blank column names."""
    width = len(rows[0])
    buf = io.StringIO()
    w = _csv.writer(buf, lineterminator="\n")
    for r in rows:
        w.writerow((r + [""] * (width - len(r)))[:width])
    return buf.getvalue(), len(rows), width


def extract_html_tables(pages: DataFrame, html_col: str = "html",
                        min_rows: int = 2) -> DataFrame:
    """One row per (page, table): the table re-rendered as CSV `text`.
    Tables with fewer than `min_rows` rows (no data under the header) are
    layout noise and dropped."""
    cols = ["url", "warc_ts", "lang", html_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "warc_ts": [], "lang": [], "table_index": [],
                   "n_rows": [], "n_cols": [], "text": []}
            for url, ts, lang, raw in zip(pdf["url"], pdf["warc_ts"],
                                          pdf["lang"], pdf[html_col]):
                if raw is None:
                    continue
                if isinstance(raw, (bytes, bytearray)):
                    html = bytes(raw).decode("utf-8", errors="replace")
                else:
                    html = str(raw)
                for i, rows in enumerate(parse_html_tables(html)):
                    if len(rows) < min_rows or not rows[0]:
                        # cell-less header (<tr></tr> noise) would emit a
                        # zero-column CSV of bare newlines
                        continue
                    text, n_rows, n_cols = _table_to_csv(rows)
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["lang"].append(lang)
                    out["table_index"].append(i)
                    out["n_rows"].append(n_rows)
                    out["n_cols"].append(n_cols)
                    out["text"].append(text)
            if out["url"]:
                yield pd.DataFrame(out)

    return pages.select(*cols).mapInPandas(gen, HTML_TABLES_SCHEMA)


# ---------------------------------------------------------------------------
# embedded-CSV detection
# ---------------------------------------------------------------------------


def sniff_csv_dialect(text: str, max_lines: int = 20) -> Optional[str]:
    """Best delimiter in {, ; \\t |}, or None if the text isn't tabular:
    the winner must give >=2 columns with a consistent count on >=90% of
    sampled lines (quote-aware via the csv module)."""
    if not text:
        return None
    lines = [ln for ln in text.splitlines()[:max_lines] if ln.strip()]
    if len(lines) < 2:
        return None
    best, best_cols = None, 1
    for d in _DELIMS:
        try:
            counts = [len(r) for r in _csv.reader(lines, delimiter=d)]
        except Exception:
            continue
        if not counts:
            continue
        mode = max(set(counts), key=counts.count)
        if mode < 2:
            continue
        consistent = sum(1 for c in counts if c == mode) / len(counts)
        if consistent >= 0.9 and mode > best_cols:
            best, best_cols = d, mode
    return best


def detect_tabular(pages: DataFrame, html_col: str = "html",
                   text_col: str = "text") -> DataFrame:
    """Classify each page: content_kind in ('html_table','csv','none'),
    plus n_html_tables and csv_delimiter. HTML wins when both are present
    (the text payload of a table-bearing page is usually its flattening)."""
    schema = ("url string, content_kind string, n_html_tables int, "
              "csv_delimiter string")
    cols = ["url", html_col, text_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, kinds, counts, delims = [], [], [], []
            for url, raw, text in zip(pdf["url"], pdf[html_col],
                                      pdf[text_col]):
                n_tables = 0
                if raw is not None:
                    html = (bytes(raw).decode("utf-8", errors="replace")
                            if isinstance(raw, (bytes, bytearray))
                            else str(raw))
                    n_tables = sum(
                        1 for t in parse_html_tables(html) if len(t) >= 2)
                delim = sniff_csv_dialect(text) if text else None
                urls.append(url)
                counts.append(n_tables)
                delims.append(delim)
                kinds.append("html_table" if n_tables else
                             ("csv" if delim else "none"))
            if urls:
                yield pd.DataFrame({"url": urls, "content_kind": kinds,
                                    "n_html_tables": counts,
                                    "csv_delimiter": delims})

    return pages.select(*cols).mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# deterministic HTML-page synthesis (tests/bench input; no crawled corpus)
# ---------------------------------------------------------------------------


def _render_html_table(pdf: pd.DataFrame, columns: list[str]) -> str:
    from html import escape
    parts = ["<html><head><title>t</title></head><body>",
             "<p>preamble text, not a table</p>", "<table>", "<tr>"]
    parts += [f"<th>{escape(str(c))}</th>" for c in columns]
    parts.append("</tr>")
    for row in pdf[columns].itertuples(index=False):
        parts.append("<tr>")
        parts += ["<td>{}</td>".format(
            escape("" if v is None else str(v))) for v in row]
        parts.append("</tr>")
    parts += ["</table>", "</body></html>"]
    return "".join(parts)


def html_pages_from_table(df: DataFrame, page_key, url_template: str,
                          columns: list[str], order_by: str) -> DataFrame:
    """Mirror of sources.pages.pages_from_table that renders each page as an
    HTML document with one <table> (entity-escaped), stored in the binary
    `html` column - the html-extraction test/bench input."""
    from .pages import PAGES_SCHEMA

    def make_page(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort")
        html = _render_html_table(pdf, columns).encode("utf-8")
        return pd.DataFrame({
            "url": [url_template.format(key=key[0])],
            "warc_ts": [pd.Timestamp("2026-01-01")],
            "html": [html],
            "text": [None],
            "lang": ["en"],
        })

    keyed = df.withColumn("_pk", page_key)
    return keyed.groupBy("_pk").applyInPandas(make_page, PAGES_SCHEMA)
