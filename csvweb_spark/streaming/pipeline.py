"""Structured Streaming front-end for the CSVW pipeline.

The reference 'streams' only in the single-threaded iterator sense
(Rdf/Converter.cs:326); here the same conversion runs incrementally over an
unbounded pages source:

* `stream_triples` - readStream(pages dir) -> the SAME compiled conversion
  plan as the batch path (narrow mapInPandas + JVM expressions work
  unchanged under micro-batching) -> parquet sink with checkpoint.
  `trigger(availableNow=True)` drains the backlog and stops - the batch-
  parity mode used by tests; omit for continuous tailing.
* `stream_page_stats` - watermarked sliding-window aggregation over
  warc_ts (pages/sec per crawl window, late data tolerated up to the
  watermark) - the standard late-data pattern for crawl-time metrics.

Checkpointing gives exactly-once sink semantics per micro-batch; this is
the Structured-Streaming complement to the snapshot/manifest resume model
in plans/lineage.py.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..csvw.convert import MODE_MINIMAL
from ..csvw.model import Table
from ..operators.triples import compile_triples, extract_rows

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: Optional[int] = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_triples(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str, table: Table,
                   mode: str = MODE_MINIMAL, available_now: bool = True):
    """Start the streaming conversion; returns the StreamingQuery."""
    pages = read_pages_stream(spark, input_dir)
    rows = extract_rows(pages, table)
    triples = compile_triples(rows, table, table.columns, mode=mode,
                              scope_by_url=True)
    writer = (triples.writeStream
              .format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_page_stats(spark: SparkSession, input_dir: str,
                      window: str = "1 hour", slide: Optional[str] = None,
                      watermark: str = "10 minutes") -> DataFrame:
    """Watermarked windowed page counts by lang - returns the streaming
    DataFrame (caller picks the sink; tests use a memory sink)."""
    pages = read_pages_stream(spark, input_dir)
    w = (F.window("warc_ts", window, slide) if slide
         else F.window("warc_ts", window))
    return (pages
            .withWatermark("warc_ts", watermark)
            .groupBy(w.alias("win"), "lang")
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.sum(F.length("text")).alias("n_chars")))
