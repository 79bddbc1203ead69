"""Materialization with per-partition lineage manifests + resumability
(north_rule: 'resumable from checkpoint with per-partition lineage +
metrics'; reference counterpart: the all-or-nothing EndRdf(ok) success gate,
Rdf/Converter.cs:262 - re-expressed as snapshot-style commits).

Model (Iceberg-snapshot-like, over plain parquet so it runs in-sandbox; on
a real cluster swap `write_partitioned` internals for
df.writeTo(table).append() and read manifests from the Iceberg snapshot
metadata instead):

* output is partitioned by a deterministic `part_key` derived from the
  input (url hash bucket) - NOT by Spark task id, so retries/resumes land
  in the same logical partition;
* each run writes data files under data/part_key=K/ plus one manifest row
  per partition (row count, triple count, min/max url, content hash) into
  _manifests/<run_id>.json, written ONLY after the data write succeeds -
  the manifest is the commit record;
* `resume_filter` anti-joins the input against committed partition keys so
  a restarted job re-processes only uncommitted buckets;
* `observe_metrics` attaches df.observe counters (the Spark-native
  equivalent of the reference's IProgress reporting every 50 rows,
  Rdf/Converter.cs:332-335).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

N_BUCKETS_DEFAULT = 64


def with_part_key(df: DataFrame, url_col: str = "url",
                  n_buckets: int = N_BUCKETS_DEFAULT) -> DataFrame:
    """Deterministic partition key: url-hash bucket (uniform, stable across
    runs - the resume unit)."""
    return df.withColumn("part_key", F.pmod(F.xxhash64(url_col), F.lit(n_buckets)))


def observe_metrics(df: DataFrame, name: str = "triples") -> tuple[DataFrame, Observation]:
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows"),
                      F.approx_count_distinct("url").alias("urls")), obs


def committed_partitions(output_dir: str) -> set[int]:
    mdir = os.path.join(output_dir, "_manifests")
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for fn in os.listdir(mdir):
        if fn.endswith(".json"):
            with open(os.path.join(mdir, fn)) as f:
                manifest = json.load(f)
            for p in manifest.get("partitions", []):
                done.add(int(p["part_key"]))
    return done


def resume_filter(df: DataFrame, output_dir: str, url_col: str = "url",
                  n_buckets: int = N_BUCKETS_DEFAULT) -> DataFrame:
    """Drop rows whose partition bucket is already committed (restart path)."""
    done = committed_partitions(output_dir)
    keyed = with_part_key(df, url_col, n_buckets)
    if not done:
        return keyed
    return keyed.filter(~F.col("part_key").isin(sorted(done)))


def write_partitioned(df: DataFrame, output_dir: str, url_col: str = "url",
                      n_buckets: int = N_BUCKETS_DEFAULT,
                      run_id: Optional[str] = None) -> dict:
    """Write df partitioned by part_key + commit a lineage manifest.

    Returns the manifest dict. The data write happens first; the manifest
    (the commit record) is written only on success, so a crashed run leaves
    uncommitted data that a resume overwrites (dynamic partition
    overwrite)."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    run_id = run_id or f"run-{int(time.time() * 1000)}"
    keyed = df if "part_key" in df.columns else with_part_key(df, url_col, n_buckets)

    stats = (keyed.groupBy("part_key")
             .agg(F.count(F.lit(1)).alias("rows"),
                  F.approx_count_distinct(url_col).alias("urls"),
                  F.min(url_col).alias("min_url"),
                  F.max(url_col).alias("max_url"),
                  F.coalesce(F.sum(F.crc32(F.concat_ws("\x00", *[
                      F.coalesce(F.col(c).cast("string"), F.lit(""))
                      for c in df.columns if c != "part_key"]))), F.lit(0))
                  .alias("content_sum"))
             .collect())

    (keyed.write.mode("overwrite")
     .partitionBy("part_key")
     .parquet(os.path.join(output_dir, "data")))

    manifest = {
        "run_id": run_id,
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_buckets": n_buckets,
        "partitions": [
            {"part_key": r["part_key"], "rows": r["rows"], "urls": r["urls"],
             "min_url": r["min_url"], "max_url": r["max_url"],
             "content_sum": int(r["content_sum"])}
            for r in sorted(stats, key=lambda r: r["part_key"])
        ],
        "total_rows": int(sum(r["rows"] for r in stats)),
    }
    mdir = os.path.join(output_dir, "_manifests")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".{run_id}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(mdir, f"{run_id}.json"))
    return manifest


def write_resumable(df: DataFrame, output_dir: str, url_col: str = "url",
                    n_buckets: int = N_BUCKETS_DEFAULT) -> dict:
    """resume_filter + write_partitioned in one call: processes only
    uncommitted buckets and commits their manifests."""
    remaining = resume_filter(df, output_dir, url_col, n_buckets)
    return write_partitioned(remaining, output_dir, url_col, n_buckets)
