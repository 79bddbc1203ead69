"""spark-submit entry point for the end-to-end knowledge-graph pipeline.

BASELINE.json north_rule: "run via spark-submit --py-files on a
multi-executor cluster".  This script is the job file; `csvweb_spark` ships
as a zip via --py-files (see tools/submit.sh, which packages and launches):

    python -m zipfile -c /tmp/csvweb_spark.zip csvweb_spark
    spark-submit --master local[8] --py-files /tmp/csvweb_spark.zip \
        tools/submit_kg.py --sf-dir /root/testdata/sf0.001 --out /tmp/kg

On a real cluster only --master/--deploy-mode change; the job itself makes
no local[*] assumptions (no driver-side collect of data, all I/O through
the executors, resumable via per-bucket lineage manifests).

Stages (csvweb_spark/pipeline.py): extraction -> CSVW conversion ->
entity linking (broadcast alias dict) -> connected-components
canonicalization -> materialize with per-partition lineage manifests.
The alias dictionary is synthesized deterministically from the corpus'
`source` values - a handful of hub entities shared by many documents, the
skew shape the north_star calls out (wikipedia.org-style hubs).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def docs_table_spec():
    from csvweb_spark.csvw.model import Column, Datatype, Table
    t = Table(url="http://pages.example.org/docs.csv")
    about = "http://pages.example.org/doc/{doc_id}"
    t.columns = [
        Column(name="doc_id", about_url=about,
               datatype=Datatype(base="integer")),
        Column(name="lang", about_url=about),
        Column(name="source", about_url=about),
        Column(name="n_chars", about_url=about,
               datatype=Datatype(base="integer")),
        Column(name="text", about_url=about),
    ]
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--docs-per-page", type=int, default=10)
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args()

    spark = (SparkSession.builder.appName("csvweb-kg-construct")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # imports resolved from the --py-files zip on executors and driver
    from csvweb_spark.pipeline import build_knowledge_graph, synth_aliases
    from csvweb_spark.sources.pages import pages_from_documents

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    pages = pages_from_documents(spark, args.sf_dir,
                                 docs_per_page=args.docs_per_page)
    aliases = synth_aliases(docs)

    result = build_knowledge_graph(spark, pages, docs_table_spec(), aliases,
                                   args.out, n_buckets=args.buckets)
    print(json.dumps({
        "job": "kg_construct",
        "sf_dir": args.sf_dir,
        "out": args.out,
        "triples_committed": result["triples"]["total_rows"],
        "entities_committed": result["entities"]["total_rows"],
        "buckets_committed": len(result["triples"]["partitions"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
