#!/usr/bin/env python3
"""Weak-scaling embeddings: N replicas with per-replica dimension rotation.

Companion to gen_docs_scale.py (driver-side tooling only). Replica r
shifts vec_id by r*idBase and cyclically rotates the 64 dims by r —
an orthogonal transform, so every within-replica distance, norm,
cluster and near-dup relation is preserved EXACTLY while replicas are
geometrically unrelated. True near-dup mass therefore grows linearly
with N (constant density); any pair-candidate structure that grows
faster is an operator defect, which is the point of the study.

idBase defaults to the matching documents table's max(doc_id)+1 so the
vec_id <-> doc_id contract (TESTDATA) survives replication when both
generators use the same replica count.

Usage: python3 tools/gen_vec_scale.py <src_sf_dir> <dst_dir> <replicas> [idBase]
"""
import sys

import duckdb

SRC, DST, N = sys.argv[1], sys.argv[2], int(sys.argv[3])


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    if len(sys.argv) > 4:
        base = int(sys.argv[4])
    else:
        base = con.sql(
            f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'").fetchone()[0]
    dims = con.sql(
        f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    selects = []
    for r in range(N):
        s = r % dims
        rot = ("embedding" if s == 0 else
               f"embedding[{s + 1}:{dims}] || embedding[1:{s}]")
        selects.append(
            f"SELECT vec_id + {r * base} AS vec_id, "
            f"{rot} AS embedding, label "
            f"FROM '{SRC}/embeddings.parquet'")
    con.sql(f"COPY ({' UNION ALL '.join(selects)}) TO "
            f"'{DST}/embeddings.parquet' (FORMAT PARQUET)")
    print("embeddings", con.sql(
        f"SELECT count(*), len(first(embedding)) FROM '{DST}/embeddings.parquet'"
    ).fetchone())


if __name__ == "__main__":
    main()
