#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare (order-insensitively, and
order-sensitively for information) with the parquet the Verify main dumped.

Usage: check_oracle.py [sfdir] [verify_outdir]
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no Spark output")
        n_fail += 1
        continue
    got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns differ: oracle={list(exp.columns)} spark={list(got.columns)}")
        n_fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: row counts differ: oracle={len(exp)} spark={len(got)}")
        n_fail += 1
        continue
    # exact compare in row order, then sorted
    def canon(df):
        return df.fillna("\x00NULL").astype(str)
    ordered_eq = canon(exp).equals(canon(got))
    se = canon(exp).sort_values(by=list(exp.columns)).reset_index(drop=True)
    sg = canon(got).sort_values(by=list(got.columns)).reset_index(drop=True)
    sorted_eq = se.equals(sg)
    if sorted_eq:
        tag = "PASS" if ordered_eq else "PASS(sorted-only; row order differs)"
        print(f"{tag} {name} ({len(exp)} rows)")
        n_pass += 1
    else:
        print(f"FAIL {name}: values differ")
        diff = (se != sg)
        bad = diff.any(axis=1)
        idx = se.index[bad][:5]
        for i in idx:
            print(f"  row {i}: oracle={se.loc[i].to_dict()}")
            print(f"          spark ={sg.loc[i].to_dict()}")
        n_fail += 1
print(f"\n{n_pass} pass / {n_fail} fail")
sys.exit(1 if n_fail else 0)
