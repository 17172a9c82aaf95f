#!/usr/bin/env python3
"""Per-query DuckDB twin timings, for the Spark-vs-DuckDB ratio table.

Usage: python3 tools/duckdb_twin_bench.py <sfDir> <oracle_sql.json> [runs] [only] [maxSecs]

Times every oracle SQL (min of `runs`, default 3; one run suffices past
5 s) in DuckDB over the sfDir parquet tables and prints one JSON line
{query: seconds}. Queries are interrupted at `maxSecs` (default 600) and
recorded under "timeouts" with the floor value maxSecs — at the ×10
clique fixture some recursive-CTE twins run unbounded (>40 min observed),
and "DuckDB exceeded the budget where Spark takes seconds" is the honest
record, an open-ended wait is not a benchmark. Any OTHER DuckDB failure
(binder error, missing table, OOM) lands under "errors" and exits 1 —
broken oracle SQL must fail loudly, never read as "slow" (ADVICE r13).
Driver-side tooling only
(duckdb is the oracle's engine, not a library dependency of the Scala
build).
"""
import json
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, runs=3, only=None, max_secs=600.0):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    out = {}
    timeouts = []
    errors = {}
    for name in sorted(oracle):
        best = None
        timed_out = False
        err = None
        for r in range(runs):
            timer = threading.Timer(max_secs, con.interrupt)
            timer.start()
            t0 = time.perf_counter()
            try:
                con.sql(oracle[name]).fetchall()
                dt = time.perf_counter() - t0
            except duckdb.Error as e:
                # Only the budget interrupt is a timeout (ADVICE r13): a
                # binder error / missing table / OOM must fail LOUDLY under
                # "errors", not be silently recorded as a 600 s "slow"
                # query — the elapsed-time check distinguishes them even
                # when the interrupt surfaces as a generic duckdb.Error.
                if (time.perf_counter() - t0 >= max_secs
                        or isinstance(e, duckdb.InterruptException)):
                    # interrupted at the budget: record the budget as the
                    # FLOOR of the true time (ratio tables read it as >=)
                    dt = max_secs
                    timed_out = True
                else:
                    err = f"{type(e).__name__}: {e}"
                    break
            finally:
                timer.cancel()
            best = dt if best is None else min(best, dt)
            # one run suffices for slow queries: window noise is a floor
            # phenomenon, irrelevant at tens-of-seconds scale, and a 500 s
            # recursive-CTE twin at sf1 must not run `runs` times
            if dt > 5.0:
                break
        if err is not None:
            errors[name] = err[:300]
            print(f"[twin] {name} ERROR {err}", file=sys.stderr, flush=True)
            continue
        out[name] = round(best, 4)
        if timed_out:
            timeouts.append(name)
        print(f"[twin] {name} {best:.3f}s{' TIMEOUT' if timed_out else ''}",
              file=sys.stderr, flush=True)
    print(json.dumps({"sf": sf_dir, "runs": runs, "total": round(sum(out.values()), 3),
                      "max_secs": max_secs, "timeouts": timeouts,
                      "errors": errors, "queries": out}))
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         set(sys.argv[4].split(",")) if len(sys.argv) > 4 and sys.argv[4] else None,
         float(sys.argv[5]) if len(sys.argv) > 5 else 600.0)
