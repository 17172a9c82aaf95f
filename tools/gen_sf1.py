#!/usr/bin/env python3
"""Scale-study data: deterministic 10x replication of sf0.1 -> "sf1".

Driver-side tooling only (the judged library is the Scala build; this
exists to measure how Spark-vs-DuckDB ratios move with scale, PERF_r06).

Replica r in 0..9 shifts every surrogate key by r * (max_key + 1) so
joins stay consistent and cardinalities scale 10x; dimension tables
(region, nation) are shared. Text/embedding payloads replicate verbatim
— exact-duplicate structure inflates the dedup-family workload
superlinearly (every doc sits in a 10-clique); both engines process the
identical data, so ratios stay apples-to-apples, but absolute dedup
times are a duplication stress case, not an organic corpus. Events are
replicated via pyarrow, which preserves the source fixture's physical
`ts` type byte-for-byte whatever it is (int64 TIMESTAMP(NANOS) through
r6, TIMESTAMP_NTZ micros from r7) — the Spark loader (Tables.events)
branches on the scanned schema, so sf1 keeps the same semantics as the
fixture it was replicated from.

Usage: python3 tools/gen_sf1.py [src_dir] [dst_dir]
"""
import shutil
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPLICAS = 10

# table -> columns to shift (key -> base taken from that key's max+1)
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}

# key column -> the table that owns it (for the max)
OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    bases = {}
    for key, (table, col) in OWNER.items():
        bases[key] = con.sql(
            f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]

    for t in ["region", "nation"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

    for t, cols in SHIFTS.items():
        if t == "events":
            continue  # pyarrow below (nanos preservation)
        selects = []
        src_cols = [c[0] for c in con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        for r in range(REPLICAS):
            exprs = ", ".join(
                f"{c} + {r * bases[c]} AS {c}" if c in cols else c
                for c in src_cols)
            selects.append(f"SELECT {exprs} FROM '{SRC}/{t}.parquet'")
        con.sql(f"COPY ({' UNION ALL '.join(selects)}) TO '{DST}/{t}.parquet' "
                f"(FORMAT PARQUET)")
        print(t, con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0])

    ev = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for r in range(REPLICAS):
        cols = {}
        for name in ev.schema.names:
            col = ev.column(name)
            if name in SHIFTS["events"]:
                col = pc.add(col, r * bases[name])
            cols[name] = col
        parts.append(pa.table(cols))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/events.parquet",
                   coerce_timestamps=None, version="2.6")
    print("events", out.num_rows)


if __name__ == "__main__":
    main()
