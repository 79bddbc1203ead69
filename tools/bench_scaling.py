"""Scaling-efficiency evidence (BASELINE.json north_rule: >=0.8 throughput
scaling efficiency between N and 4N executors).

No real cluster exists in this sandbox, so the criterion is evidenced by
running the IDENTICAL job at two parallelism levels on the same machine and
input: local[8] (N) vs local[32] (4N), per BASELINE.md's reporting
convention (efficiency = throughput(4N) / (4 x throughput(N))).

Each level runs in its own subprocess (fresh JVM - no warm-cache bleed);
the input pages parquet is materialized once beforehand. The flagship job
is the compiled CSVW triple-extraction pipeline (shuffle-free narrow plan,
the shape that must scale linearly).

Usage: python tools/bench_scaling.py [sf_dir] [replication]
Writes SCALING.md and prints one JSON line.
"""

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from bench import docs_table_spec
from csvweb_spark.operators.triples import convert_table_group_spark

cpus = int(sys.argv[1])
pages_path = sys.argv[2]
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(cpus * 2))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(pages_path)
n_pages = pages.count()
table = docs_table_spec()
# warm-up (untimed): codegen + python workers
convert_table_group_spark(pages.limit(8), table, scope_by_url=True).count()
best = None
for _ in range(2):
    t0 = time.time()
    n_triples = convert_table_group_spark(pages, table, scope_by_url=True).count()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({{"cpus": cpus, "sec": round(best, 3), "n_pages": n_pages,
                   "n_triples": n_triples}}))
"""


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replication = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # materialize the input once: documents -> csv pages, replicated with
    # distinct urls so the run is long enough for per-core work to dominate
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from csvweb_spark.sources.pages import pages_from_documents

    tmp = tempfile.mkdtemp(prefix="scaling_pages_")
    pages_path = os.path.join(tmp, "pages")
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    base = pages_from_documents(spark, sf_dir, docs_per_page=10)
    reps = None
    for i in range(replication):
        r = base.withColumn("url", F.concat(F.lit(f"http://r{i}."),
                                            F.col("url")))
        reps = r if reps is None else reps.unionByName(r)
    reps.repartition(64).write.mode("overwrite").parquet(pages_path)
    n_docs_equiv = spark.read.parquet(
        f"{sf_dir}/documents.parquet").count() * replication
    spark.stop()

    results = {}
    runner = RUNNER.format(repo=repo)
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, "-c", runner, str(cpus), pages_path],
            capture_output=True, text=True, timeout=1800)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        results[cpus]["docs_per_sec"] = round(
            n_docs_equiv / results[cpus]["sec"], 1)

    thr8, thr32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = round(thr32 / (4 * thr8), 4)
    summary = {
        "metric": "scaling_efficiency_8_to_32",
        "value": eff,
        "unit": "ratio",
        "n_docs": n_docs_equiv,
        "local8": results[8],
        "local32": results[32],
        "sf": sf_dir,
    }
    print(json.dumps(summary))

    with open(os.path.join(repo, "SCALING.md"), "w") as f:
        f.write(f"""# Scaling efficiency evidence (N -> 4N)

BASELINE.json north_rule requires >=0.8 throughput scaling efficiency
between N and 4N executors. No multi-node cluster exists in this sandbox,
so per BASELINE.md:24-26 the same job runs at two parallelism levels on
identical input (fresh JVM per level, warm-up excluded, best of 2 runs).

Job: compiled CSVW triple-extraction (`convert_table_group_spark`) over
{results[8]['n_pages']} synthesized CSV pages ({n_docs_equiv} document rows,
{results[8]['n_triples']} triples emitted) from `{sf_dir}` documents
replicated x{replication}. The plan is a shuffle-free narrow pipeline
(mapInPandas csv parse -> codegen'd expression stage), so scaling is bounded
only by input-split parallelism and per-core throughput.

| level | cores | wall (s) | docs/sec |
|---|---|---|---|
| N | 8 | {results[8]['sec']} | {thr8} |
| 4N | 32 | {results[32]['sec']} | {thr32} |

**efficiency = throughput(4N) / (4 x throughput(N)) = {eff}**
(target >= 0.8)
""")
    return 0 if eff >= 0.8 else 1


if __name__ == "__main__":
    sys.exit(main())
