#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each Verify output
parquet, run the matching oracle SQL in DuckDB over the same sf tables,
compare row/schema/values (columns sorted by name, rows sorted).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints vs floats for compare: round floats
    for c in df.columns:
        if df[c].dtype.kind == 'f':
            df[c] = df[c].round(9)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name}: value mismatch: {str(ex).splitlines()[-1][:200]}")
            # show first differing rows
            neq = (g != e) & ~(g.isna() & e.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print(f"  spark : {g.loc[i].to_dict()}")
                print(f"  oracle: {e.loc[i].to_dict()}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
