"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count + sorted-column value multiset hash.

Usage: python tools/check_oracles.py [--json OUT.json] [sf_dir] [query ...]

--json writes the per-query verdicts in the driver's CORRECTNESS_r{N}
record shape (rows/schema/hash match booleans + row counts + err), so a
full-surface run can be committed as a per-round receipt for the
queries past the driver's 50-entry recording cap (round-4 review
item #10).
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return ""
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records = {}

    from pyspark.sql import SparkSession
    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "6g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            records[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None,
                             "err": f"spark error: {ex}"}
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            records[name] = {"rows_match": len(srows) >= 0,
                             "schema_match": None, "hash_match": None,
                             "spark_rows": len(srows), "oracle_rows": None,
                             "err": None, "note": "rows-only (no oracle)"}
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            records[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(srows),
                             "oracle_rows": None,
                             "err": f"duckdb error: {ex}"}
            continue
        ok_count = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = (frame_hash([tuple(r) for r in srows], scols)
                   == frame_hash(orows, ocols))
        status = "OK  " if (ok_count and ok_schema and ok_hash) else "FAIL"
        records[name] = {"rows_match": ok_count, "schema_match": ok_schema,
                         "hash_match": ok_hash, "spark_rows": len(srows),
                         "oracle_rows": len(orows), "err": None}
        print(f"{status}  {name}: spark={len(srows)} duck={len(orows)} "
              f"schema={'=' if ok_schema else sorted(scols)!r}"
              f"{'==' if ok_schema else sorted(ocols)!r} hash="
              f"{'match' if ok_hash else 'MISMATCH'} [{time.time()-t0:.1f}s]")
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_count and ok_schema:
                sset = {tuple(norm_cell(v) for v in r) for r in
                        (tuple(r[scols.index(c)] for c in sorted(scols))
                         for r in (tuple(x) for x in srows))}
                oset = {tuple(norm_cell(v) for v in r) for r in
                        (tuple(r[ocols.index(c)] for c in sorted(ocols))
                         for r in orows)}
                for d in list(sset - oset)[:3]:
                    print("    spark-only:", d)
                for d in list(oset - sset)[:3]:
                    print("    duck-only: ", d)
    print("\n%d failures: %s" % (len(failures), failures))
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(records),
                       "n_failures": len(failures),
                       "results": records}, f, indent=2)
        print(f"wrote {json_out}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
