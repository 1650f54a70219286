#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark result) and runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over views of the
sfDir tables. Compares: column names (sorted), row count, and values
(rows sorted by all columns). Exact match required; floats compared
exactly first, with a 1e-9 relative fallback reported as FLOAT-NEAR.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA mismatch: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT mismatch: spark={len(a)} duck={len(b)}"
    problems = []
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"DTYPE {c}: spark={a[c].dtype} duck={b[c].dtype}")
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float); bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                near = np.isclose(av.fillna(0), bv.fillna(0), rtol=1e-9, atol=1e-12) | both_nan
                if near.all():
                    problems.append(f"FLOAT-NEAR {c} ({int((~eq).sum())} rows differ in last ulps)")
                else:
                    i = int(np.argmax(~near.values))
                    problems.append(f"VALUE {c}: row{i} spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
        else:
            try:
                eq = (av == bv) | (av.isna() & bv.isna())
            except Exception:
                eq = av.astype(str) == bv.astype(str)
            if not eq.all():
                i = int(np.argmax(~eq.values))
                problems.append(f"VALUE {c}: row{i} spark={av.iloc[i]!r} duck={bv.iloc[i]!r} "
                                f"(types {av.dtype}/{bv.dtype})")
    return "; ".join(problems) if problems else None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO-OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = f"rows-only ({len(spark_df)} rows)"
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        diff = compare(name, spark_df, duck_df)
        results[name] = diff if diff else "OK"
    bad = 0
    for name in sorted(results):
        r = results[name]
        flag = "PASS" if r == "OK" else ("INFO" if r.startswith("rows-only") else "FAIL")
        if flag == "FAIL":
            bad += 1
        print(f"[{flag}] {name}: {r}")
    print(f"\n{len(results) - bad}/{len(results)} ok")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
