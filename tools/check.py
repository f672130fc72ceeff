#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev loop only; the shipped
library is pure Scala). Runs graft.Verify output against DuckDB oracles.

Usage:
  python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01 [query ...]

Compares, per query: schema (column names), row count, and exact values after
sorting columns by name and rows by all columns — the strictest plausible
version of the driver's hash compare.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    con = duckdb.connect()
    return con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()

def canon(df):
    df = df[sorted(df.columns)]
    # normalize dtypes for compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else str(v))
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    names = [d for d in sorted(os.listdir(outdir))
             if os.path.isdir(os.path.join(outdir, d))]
    for name in names:
        if only and name not in only:
            continue
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracle:
            print(f"PASS(rows-only) {name}: rows={len(got)}" +
                  ("  ** EMPTY **" if len(got) == 0 else ""))
            n_pass += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}"); n_fail += 1; continue
        bad = []
        for c in g.columns:
            if not g[c].equals(e[c]):
                neq = (g[c] != e[c])
                # tolerate NaN==NaN
                if pd.api.types.is_float_dtype(g[c]):
                    neq &= ~(g[c].isna() & e[c].isna())
                if neq.any():
                    i = int(np.argmax(neq.values))
                    bad.append((c, i, g[c].iloc[i], e[c].iloc[i], int(neq.sum())))
        if bad:
            print(f"FAIL {name}: value mismatches {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(g)}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
