#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet in <verifyOutDir>/<name>/, runs the oracle SQL
from oracle_sql.json in DuckDB over the same parquet tables, sorts columns
by name and rows by all values, and compares cell-by-cell (exact for
ints/strings, tiny epsilon report for floats).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    return con, oracle

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con, oracle = load(sf_dir, out_dir)
    results = {}
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_RESULT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA: spark={list(g.columns)} duck={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWS: spark={len(g)} duck={len(e)}"
            continue
        bad = None
        for c in g.columns:
            gv, ev = g[c].to_numpy(), e[c].to_numpy()
            # The driver hash-compares exact value renderings: an int64
            # column on one side vs float64 on the other (e.g. DuckDB
            # HUGEINT sum() -> pandas float64) hashes "1" vs "1.0" and
            # fails even when isclose() passes. Treat as a hard error.
            if np.issubdtype(gv.dtype, np.integer) != np.issubdtype(ev.dtype, np.integer):
                bad = f"COL {c}: dtype class mismatch spark={gv.dtype} duck={ev.dtype} (driver hash would fail)"
                break
            if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(ev.dtype, np.floating):
                gv = gv.astype(float); ev = ev.astype(float)
                m = ~(np.isclose(gv, ev, rtol=0, atol=0, equal_nan=True))
                exact_bad = int(m.sum())
                m2 = ~(np.isclose(gv, ev, rtol=1e-9, atol=1e-9, equal_nan=True))
                if m2.sum() > 0:
                    i = int(np.argmax(m2))
                    bad = f"COL {c}: {m2.sum()} mismatches (exact-bad {exact_bad}), e.g. {gv[i]} vs {ev[i]}"
                    break
                elif exact_bad > 0:
                    bad = bad or f"COL {c}: {exact_bad} non-bit-exact (within 1e-9) WARN"
            else:
                if not (pd.Series(gv).astype(object) == pd.Series(ev).astype(object)).all():
                    neq = (pd.Series(gv).astype(object) != pd.Series(ev).astype(object))
                    i = int(neq.idxmax())
                    bad = f"COL {c}: value mismatch e.g. row{i}: {gv[i]} vs {ev[i]}"
                    break
        results[name] = bad or f"OK ({len(g)} rows)"
    for k, v in results.items():
        print(f"{k:24s} {v}")
    nbad = sum(1 for v in results.values() if not v.startswith('OK'))
    print(f"== {len(results)-nbad}/{len(results)} OK ==")
    sys.exit(1 if nbad else 0)

if __name__ == "__main__":
    main()
