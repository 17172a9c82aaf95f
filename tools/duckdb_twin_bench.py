#!/usr/bin/env python3
"""Per-query DuckDB twin timings, for the Spark-vs-DuckDB ratio table.

Usage: python3 tools/duckdb_twin_bench.py <sfDir> <oracle_sql.json> [runs]

Times every oracle SQL (min of `runs`, default 3) in DuckDB over the sfDir
parquet tables and prints one JSON line {query: seconds}. Driver-side
tooling only (duckdb is the oracle's engine, not a library dependency of
the Scala build).
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, runs=3, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    out = {}
    for name in sorted(oracle):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            con.sql(oracle[name]).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
    print(json.dumps({"sf": sf_dir, "runs": runs, "total": round(sum(out.values()), 3),
                      "queries": out}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None)
