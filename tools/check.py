#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir]

Reads each Verify-written parquet result and the oracle_sql.json, runs the
oracle in DuckDB over views named after the test tables, sorts columns by
name (as the driver does), and compares shape, dtypes, and values exactly.
"""
import sys, os, json, math
import duckdb
import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # Safety net: re-sort rows by every scalar column so a query whose
    # ORDER BY isn't a total order flakes deterministically here rather
    # than passing by luck. List-typed cells are unhashable → excluded.
    keys = [c for c in df.columns
            if not df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any()]
    if keys:
        df = df.sort_values(keys, kind="mergesort").reset_index(drop=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None:
            return a == b
        return len(a) == len(b) and all(cmp_cell(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b

n_pass = n_fail = n_noracle = 0
for name in sorted(os.listdir(OUT)):
    d = os.path.join(OUT, name)
    if not os.path.isdir(d):
        continue
    got = canon(con.sql(f"SELECT * FROM '{d}/*.parquet'").df())
    if name not in oracle:
        n_noracle += 1
        print(f"  [rows-only] {name}: rows={len(got)}" + (" FAIL(empty)" if len(got) == 0 else ""))
        continue
    try:
        exp = canon(con.sql(oracle[name]).df())
    except Exception as e:
        n_fail += 1
        print(f"✗ {name}: ORACLE SQL ERROR: {str(e)[:200]}")
        continue
    probs = []
    if list(got.columns) != list(exp.columns):
        probs.append(f"columns got={list(got.columns)} exp={list(exp.columns)}")
    elif len(got) != len(exp):
        probs.append(f"rows got={len(got)} exp={len(exp)}")
    else:
        for c in got.columns:
            if str(got[c].dtype) != str(exp[c].dtype):
                probs.append(f"dtype[{c}] got={got[c].dtype} exp={exp[c].dtype}")
        gv, ev = got.values, exp.values
        bad = 0
        for i in range(len(got)):
            for j in range(len(got.columns)):
                if not cmp_cell(gv[i][j], ev[i][j]):
                    if bad < 3:
                        probs.append(f"value[{i},{got.columns[j]}] got={gv[i][j]!r} exp={ev[i][j]!r}")
                    bad += 1
        if bad:
            probs.append(f"total bad cells: {bad}")
    if probs:
        n_fail += 1
        print(f"✗ {name}:")
        for p in probs[:8]:
            print(f"    {p}")
    else:
        n_pass += 1
        print(f"✓ {name} ({len(got)} rows)")

print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
sys.exit(1 if n_fail else 0)
