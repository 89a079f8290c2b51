#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each Verify output
parquet, run the matching oracle SQL in DuckDB over the same sf tables,
compare row/schema/values (columns sorted by name, rows sorted).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os, struct, math
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
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cell_bytes(v):
    """Byte-exact cell representation: floats pack to IEEE-754 so -0.0 vs
    0.0 (and any sub-tolerance drift) differ, like the driver's hash."""
    if isinstance(v, float):
        if math.isnan(v):
            return b"<NaN>"
        return struct.pack("<d", v)
    if v is None or v is pd.NA or (isinstance(v, float) and math.isnan(v)):
        return b"<null>"
    return repr(v).encode()

def dtype_kind_mismatches(g, e):
    """Columns whose pandas dtype KIND differs between Spark and oracle
    (e.g. int64 vs float64). The driver's hash distinguishes 0 from 0.0,
    so an int-vs-float column is a guaranteed driver hash-fail even when
    every value compares equal after coercion — the r15 sft_pack_masked
    escape (DuckDB HUGEINT '//' result -> pandas float64 vs Spark int64).
    'i' and 'u' are treated as the same kind (both integer)."""
    norm = lambda k: 'i' if k == 'u' else k
    return [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
            if norm(g[c].dtype.kind) != norm(e[c].dtype.kind)]

def byte_mismatches(g, e):
    """Return list of (row, col, spark_val, oracle_val) cells whose byte
    representations differ (floats compared as exact IEEE-754 bytes)."""
    bad = []
    for c in g.columns:
        gs, es = g[c], e[c]
        if gs.dtype.kind == 'f' or es.dtype.kind == 'f':
            for i, (a, b) in enumerate(zip(gs, es)):
                fa = float(a) if pd.notna(a) else float('nan')
                fb = float(b) if pd.notna(b) else float('nan')
                if cell_bytes(fa) != cell_bytes(fb):
                    bad.append((i, c, a, b))
        else:
            neq = ~((gs == es) | (gs.isna() & es.isna()))
            for i in neq[neq].index:
                bad.append((i, c, gs[i], es[i]))
    return bad

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
        # Dtype-KIND gate first: an int-vs-float column hashes differently
        # on the driver (0 vs 0.0) even if values coerce equal — fail it
        # here before any value comparison can paper over it.
        kind_bad = dtype_kind_mismatches(g, e)
        if kind_bad:
            c, gd, ed = kind_bad[0]
            print(f"FAIL {name}: dtype-kind mismatch: col {c} spark={gd} oracle={ed}"
                  + (f" (+{len(kind_bad)-1} more cols)" if len(kind_bad) > 1 else ""))
            n_fail += 1
            continue
        # Gate is BYTE-EXACT like the driver's hash: floats compared as
        # IEEE-754 bytes, so -0.0 vs 0.0 or 1e-12 drift FAIL here too.
        bad = byte_mismatches(g, e)
        if not bad:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            i, c, a, b = bad[0]
            # diagnose: tolerance-equal but byte-different (the signed-zero
            # / sub-tolerance class the old rtol gate used to pass)
            tol_ok = True
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
            except AssertionError:
                tol_ok = False
            kind = "BYTE mismatch (tolerance-equal!)" if tol_ok else "value mismatch"
            print(f"FAIL {name}: {kind}: {len(bad)} cells, first row {i} col {c}")
            print(f"  spark : {g.loc[i].to_dict()}")
            print(f"  oracle: {e.loc[i].to_dict()}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
