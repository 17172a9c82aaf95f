#!/usr/bin/env python3
"""Verify a graft-written SQLite log db with a REAL SQLite.

Usage: python3 tools/check_sqlite.py <db> <expected_rows> <expected_digest>

Checks, in order:
 1. PRAGMA integrity_check == 'ok' (validates every b-tree page, cell,
    overflow chain, AND index-vs-table consistency);
 2. schema: the reference's CREATE TABLE/INDEX statements verbatim
    (logsqlite src/logger.rs:146-147);
 3. row count;
 4. content digest: md5 over '<rowid>,<ts>,' + message bytes in rowid
    order — the Scala test computes the same from its input rows;
 5. the ts index is actually used for a range query (EXPLAIN QUERY PLAN
    mentions idx_ts).

Prints OK on success; exits 1 with a diagnostic otherwise.
"""
import hashlib
import sqlite3
import sys


def main(db, expected_rows, expected_digest):
    con = sqlite3.connect(db)
    ic = con.execute("PRAGMA integrity_check").fetchall()
    if ic != [("ok",)]:
        print(f"FAIL integrity_check: {ic[:10]}")
        return 1
    schema = dict(con.execute(
        "SELECT name, sql FROM sqlite_master ORDER BY name").fetchall())
    if schema.get("logs") != "CREATE TABLE logs (ts NUMBER, message BLOB)":
        print(f"FAIL schema table: {schema.get('logs')!r}")
        return 1
    if schema.get("idx_ts") != "CREATE INDEX idx_ts ON logs(ts)":
        print(f"FAIL schema index: {schema.get('idx_ts')!r}")
        return 1
    n = con.execute("SELECT count(*) FROM logs").fetchone()[0]
    if n != int(expected_rows):
        print(f"FAIL rows: got {n} want {expected_rows}")
        return 1
    h = hashlib.md5()
    for rowid, ts, msg in con.execute(
            "SELECT rowid, ts, message FROM logs ORDER BY rowid"):
        h.update(f"{rowid},{ts},".encode())
        h.update(msg if msg is not None else b"")
    if h.hexdigest() != expected_digest:
        print(f"FAIL digest: got {h.hexdigest()} want {expected_digest}")
        return 1
    if n > 0:
        plan = " ".join(str(r) for r in con.execute(
            "EXPLAIN QUERY PLAN SELECT * FROM logs WHERE ts > 0 AND ts < 5"))
        if "idx_ts" not in plan:
            print(f"FAIL index not used: {plan}")
            return 1
        # spot-check the index path returns the same rows as a table scan
        a = con.execute(
            "SELECT rowid FROM logs WHERE +ts >= (SELECT min(ts) FROM logs) "
            "ORDER BY rowid").fetchall()
        b = con.execute(
            "SELECT rowid FROM logs INDEXED BY idx_ts "
            "WHERE ts >= (SELECT min(ts) FROM logs) ORDER BY rowid").fetchall()
        if a != b:
            print(f"FAIL index/table row mismatch: {len(a)} vs {len(b)}")
            return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
