#!/usr/bin/env python3
"""Weak-scaling corpus for the text/dedup packs: N disjoint replicas.

Driver-side tooling only (like gen_sf1.py). gen_sf1's verbatim text
replication puts every doc in an N-clique, so dedup work grows
QUADRATICALLY with N — a duplication stress case, not a scaling test.
This generator keeps duplication density CONSTANT: replica r shifts
doc_id and prefixes every token with `r{r}` (a per-replica vocabulary),
so within-replica near/exact-dup structure is preserved exactly while
NOTHING is shared across replicas. Operator work should then scale
linearly with N — the weak-scaling evidence a 100 TB deployment wants.

Only documents.parquet (and a verbatim embeddings.parquet copy, so
vector queries still resolve) is written: the text/dedup packs read
nothing else.

Usage: python3 tools/gen_docs_scale.py <src_sf_dir> <dst_dir> <replicas>
"""
import shutil
import sys

import duckdb

SRC, DST, N = sys.argv[1], sys.argv[2], int(sys.argv[3])


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    base = con.sql(
        f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'").fetchone()[0]
    selects = []
    for r in range(N):
        tag = f"r{r}"
        selects.append(
            f"SELECT doc_id + {r * base} AS doc_id, "
            f"'{tag}' || replace(text, ' ', ' {tag}') AS text, "
            f"lang, source, "
            f"n_chars + {len(tag)} * len(string_split(text, ' ')) AS n_chars "
            f"FROM '{SRC}/documents.parquet'")
    con.sql(f"COPY ({' UNION ALL '.join(selects)}) TO "
            f"'{DST}/documents.parquet' (FORMAT PARQUET)")
    shutil.copyfile(f"{SRC}/embeddings.parquet", f"{DST}/embeddings.parquet")
    print("documents", con.sql(
        f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0])


if __name__ == "__main__":
    main()
