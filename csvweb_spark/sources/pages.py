"""Pages-table synthesis and readers.

The pipeline input is an Iceberg/parquet table of web pages
(url, warc_ts, html, text, lang) per BASELINE.json input_hint.  In this
sandbox there is no crawled corpus, so pages are synthesized
deterministically (FIXTURES.md §1) from the driver-provided tables:

* `pages_from_documents` - each group of N consecutive documents becomes one
  CSV page (multi-row payload, csv-quoted), the bench/throughput input.
* `pages_from_table` - render any small DataFrame as CSV pages keyed by a
  page-group expression; used by the oracle queries so DuckDB can recompute
  the expected triples from the same source rows.

Rendering happens distributed (applyInPandas per page group) - no
driver-side collect.
"""

from __future__ import annotations

import csv as _csv
import io

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _render_csv(pdf: pd.DataFrame, columns: list[str]) -> str:
    buf = io.StringIO()
    w = _csv.writer(buf, lineterminator="\n")
    w.writerow(columns)
    for row in pdf[columns].itertuples(index=False):
        w.writerow(["" if v is None else v for v in row])
    return buf.getvalue()


def pages_from_table(df: DataFrame, page_key, url_template: str,
                     columns: list[str], order_by: str) -> DataFrame:
    """Render rows of `df` as CSV pages, one page per distinct `page_key`.

    url_template receives the page key via {key}. Rows within a page are
    ordered by `order_by` so page text is deterministic."""
    def make_page(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort")
        text = _render_csv(pdf, columns)
        url = url_template.format(key=key[0])
        return pd.DataFrame({
            "url": [url],
            "warc_ts": [pd.Timestamp("2026-01-01")],
            "html": [None],
            "text": [text],
            "lang": ["en"],
        })

    keyed = df.withColumn("_pk", page_key)
    return keyed.groupBy("_pk").applyInPandas(make_page, PAGES_SCHEMA)


def pages_from_documents(spark: SparkSession, sf_dir: str,
                         docs_per_page: int = 10) -> DataFrame:
    """Bench input: documents -> CSV pages of `docs_per_page` rows each with
    columns (doc_id, lang, source, n_chars, text) - text is csv-quoted, so
    the page exercises quoting/escaping in the extraction stage."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pages_from_table(
        docs,
        page_key=(F.col("doc_id") / docs_per_page).cast("long"),
        url_template="http://pages.example.org/docs/{key}.csv",
        columns=["doc_id", "lang", "source", "n_chars", "text"],
        order_by="doc_id",
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
