#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
Scala library never depends on this).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sf dir
tables, and compares row count, sorted-by-name columns, and values.
"""
import json
import sys

import duckdb
import pandas as pd
import glob
import os

def load_result(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return duckdb.sql(
        f"SELECT * FROM read_parquet({files!r})").df()

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        got = load_result(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(got, want)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

def compare(got, want):
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        return False, f"columns differ: spark={gc} oracle={wc}"
    if len(got) != len(want):
        return False, f"row count differs: spark={len(got)} oracle={len(want)}"
    g, w = got[gc].reset_index(drop=True), want[wc].reset_index(drop=True)
    for c in gc:
        gv, wv = g[c], w[c]
        # The driver hashes VALUES, so an int64 column vs a float64
        # column (e.g. DuckDB returning HUGEINT for sum(BIGINT), which
        # pandas renders as float64) hash-mismatches even when every
        # value compares equal (12 == 12.0). Reproduce that sensitivity
        # here: a float/integer KIND mismatch is a failure — cast the
        # oracle SQL (round 11's p4 lesson).
        g_num = gv.dtype.kind in "iu"
        w_num = wv.dtype.kind in "iu"
        g_flt = gv.dtype.kind == "f"
        w_flt = wv.dtype.kind == "f"
        if (g_num and w_flt) or (g_flt and w_num):
            return False, (f"dtype kind mismatch col={c}: spark={gv.dtype} "
                           f"oracle={wv.dtype} (driver hash would differ)")
        for i in range(len(gv)):
            a, b = gv.iloc[i], wv.iloc[i]
            if not eq(a, b):
                return False, f"value mismatch col={c} row={i}: spark={a!r} oracle={b!r} (dtypes {gv.dtype}/{wv.dtype})"
    return True, ""

def eq(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    if pd.isna(a) or pd.isna(b):
        return False
    if isinstance(a, float) or isinstance(b, float):
        return a == b  # driver hashes values — require exact
    if hasattr(a, "__len__") and not isinstance(a, str):
        return list(a) == list(b)
    return a == b

if __name__ == "__main__":
    main()
