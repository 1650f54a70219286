#!/usr/bin/env python3
"""Exact result comparison between two graft.Verify output dirs.

Used by the constrained-memory resilience run (round-9 verdict item
3): the same queries are materialized once at the default heap and
once at the reduced heap, and this proves the row multisets are
IDENTICAL — i.e. memory pressure (spill) changes performance, never
results. EXCEPT ALL in both directions is multiset difference, so
duplicate rows are compared faithfully.

Usage: compare_runs.py DIR_A DIR_B [query ...]
Exit 0 iff every compared query matches.
"""
import sys
import duckdb
from pathlib import Path


def main():
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    # graft.Verify lays out one DIRECTORY of parquet files per query
    names = sys.argv[3:] or sorted(
        p.name for p in a.iterdir()
        if p.is_dir() and (b / p.name).is_dir())
    con = duckdb.connect()
    bad = 0
    for name in names:
        pa, pb = str(a / name), str(b / name)
        na = con.execute(f"SELECT count(*) FROM read_parquet('{pa}/*.parquet')").fetchone()[0]
        nb = con.execute(f"SELECT count(*) FROM read_parquet('{pb}/*.parquet')").fetchone()[0]
        d1 = con.execute(
            f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pa}/*.parquet') "
            f"EXCEPT ALL SELECT * FROM read_parquet('{pb}/*.parquet'))").fetchone()[0]
        d2 = con.execute(
            f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pb}/*.parquet') "
            f"EXCEPT ALL SELECT * FROM read_parquet('{pa}/*.parquet'))").fetchone()[0]
        ok = na == nb and d1 == 0 and d2 == 0
        bad += 0 if ok else 1
        print(f"[{'PASS' if ok else 'FAIL'}] {name}: rows {na}/{nb}, diff {d1}+{d2}")
    print(f"\n{len(names) - bad}/{len(names)} identical")
    sys.exit(0 if bad == 0 else 1)


if __name__ == "__main__":
    main()
