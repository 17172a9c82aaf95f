#!/usr/bin/env python3
"""Weak-scaling events corpus: N user-width replicas, constant density.

Driver-side tooling only (like gen_sf1.py / gen_docs_scale.py). Replica
r shifts user_id and event_id; ts / event_type / value / props are
verbatim, so the time window, per-user event density, session shape,
and funnel structure are EXACTLY the source fixture's — the corpus just
has N times the users, which is how production event volume actually
grows. Per-user operators (sessionize, funnels, transitions, paths)
should scale linearly; time-bucket rollups keep their output width and
grow only in per-bucket input.

pyarrow preserves the physical ts type byte-for-byte (the gen_sf1
stance — Tables.events branches on the scanned schema). Every other
sf-dir table is copied verbatim so non-events queries still resolve.

Usage: python3 tools/gen_events_scale.py <src_sf_dir> <dst_dir> <replicas>
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC, DST, N = sys.argv[1], sys.argv[2], int(sys.argv[3])

COPY = ["region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings"]


def main():
    os.makedirs(DST, exist_ok=True)
    src = pq.read_table(f"{SRC}/events.parquet")
    eb = pc.max(src.column("event_id")).as_py() + 1
    ub = pc.max(src.column("user_id")).as_py() + 1
    chunks = []
    for r in range(N):
        t = src
        t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                         pc.add(t.column("event_id"), r * eb))
        t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                         pc.add(t.column("user_id"), r * ub))
        chunks.append(t)
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{DST}/events.parquet")
    for name in COPY:
        p = f"{SRC}/{name}.parquet"
        if os.path.exists(p):
            shutil.copyfile(p, f"{DST}/{name}.parquet")
    print("events", out.num_rows, "users x", N)


if __name__ == "__main__":
    main()
