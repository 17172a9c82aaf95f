#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir tables, and
compares row count, column names (sorted), and values (rows sorted by all
columns, column order = sorted names). Prints per-query PASS/FAIL.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    # Full double precision (round-trip exact): the driver's comparator is
    # at least this strict, so 9-sig-fig canonicalization here would pass
    # queries locally that fail the driver hash (the r9 q_text_ttr /
    # q_ts_slo_burn incident). Any float that must be hashed should be a
    # quantized long on both engines instead.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.17g}"
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        spark_rel = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_cols = sorted(spark_rel.columns)
        if name not in oracle:
            n = len(spark_rel.fetchall())
            status = "PASS(rows-only)" if n > 0 else "FAIL(rows-only: 0 rows)"
            if n > 0:
                n_pass += 1
            else:
                n_fail += 1
            print(f"{status:24s} {name} rows={n}")
            continue
        try:
            duck_rel = con.sql(oracle[name])
        except Exception as e:
            n_fail += 1
            print(f"{'FAIL(oracle-sql)':24s} {name}: {e}")
            continue
        d_cols = sorted(duck_rel.columns)
        if s_cols != d_cols:
            n_fail += 1
            print(f"{'FAIL(schema)':24s} {name}: spark={s_cols} duck={d_cols}")
            continue
        # Driver-parity dtype gate: the driver's comparator hashes TYPED
        # values (r10 incident: the only two HUGEINT twin columns were the
        # only two hash-fails while values matched). fetchall() coerces to
        # Python ints and is blind to it, so compare declared column types.
        # Empirically (r10 greens) the driver normalizes integer widths
        # <=64 bits — q_media_frames etc. pass with INTEGER-vs-BIGINT — but
        # cannot normalize HUGEINT/DECIMAL, so those stay distinct here.
        def canon_type(t):
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                     "UTINYINT", "USMALLINT", "UINTEGER"):
                return "INT64"
            if t in ("FLOAT", "DOUBLE"):
                return "FLOAT64"
            return t
        s_types = dict(zip(spark_rel.columns,
                           (canon_type(str(t)) for t in spark_rel.types)))
        d_types = dict(zip(duck_rel.columns,
                           (canon_type(str(t)) for t in duck_rel.types)))
        mism = [(c, s_types[c], d_types[c]) for c in s_cols
                if s_types[c] != d_types[c]]
        if mism:
            n_fail += 1
            print(f"{'FAIL(dtype)':24s} {name}: " + "; ".join(
                f"{c}: spark={st} duck={dt}" for c, st, dt in mism))
            continue
        collist = ", ".join(f'"{c}"' for c in s_cols)
        s_rows = con.sql(
            f"SELECT {collist} FROM spark_rel ORDER BY ALL").fetchall()
        d_rows = con.sql(
            f"SELECT {collist} FROM duck_rel ORDER BY ALL").fetchall()
        if len(s_rows) != len(d_rows):
            n_fail += 1
            print(f"{'FAIL(count)':24s} {name}: spark={len(s_rows)} duck={len(d_rows)}")
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            if tuple(map(canon, sr)) != tuple(map(canon, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            n_fail += 1
            print(f"{'FAIL(values)':24s} {name} row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
        else:
            n_pass += 1
            print(f"{'PASS':24s} {name} rows={len(s_rows)}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
