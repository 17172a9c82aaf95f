#!/usr/bin/env python3
"""Twin dtype lint: fail any oracle twin whose OUTPUT columns type as
HUGEINT or DECIMAL under DuckDB.

The driver's comparator hashes typed values and normalizes integer widths
only up to 64 bits (r10 evidence: INTEGER-vs-BIGINT twins pass, the only
two HUGEINT twins were the only two hash-fails). A HUGEINT/DECIMAL output
can never match a Spark parquet column, so it is a guaranteed driver
hash-fail regardless of values — lint it out before the driver sees it.

Uses DESCRIBE (binder only, no execution), so linting all twins at
sf0.001 is sub-second.

Usage: python3 tools/twin_lint.py <sfDir> <oracle_sql.json>
Exit 0 = clean; exit 1 = at least one twin has a banned output type.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    n_bad = 0
    for name in sorted(oracle):
        try:
            desc = con.sql("DESCRIBE " + oracle[name]).fetchall()
        except Exception as e:
            n_bad += 1
            print(f"LINT-FAIL(describe) {name}: {e}")
            continue
        bad = [(c, t) for c, t, *_ in desc
               if any(t.startswith(b) for b in BANNED)]
        if bad:
            n_bad += 1
            cols = ", ".join(f"{c}: {t}" for c, t in bad)
            print(f"LINT-FAIL(dtype) {name}: {cols} — wrap in "
                  f"CAST(... AS BIGINT/DOUBLE); the driver comparator "
                  f"cannot normalize these")
    print(f"{len(oracle) - n_bad} clean, {n_bad} flagged")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
