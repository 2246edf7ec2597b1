#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: compare each Verify
parquet dump against its DuckDB oracle SQL on the same tables.

Usage: python3 scripts/check.py <sf_dir> <verify_out_dir>
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical cell rendering mirroring the driver's hash: integer widths
    collapse, but int vs float stays distinct (123456 != 123456.0)."""
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if pd.isna(v) if np.isscalar(v) or v is None else False:
        return "NULL"
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    return str(v)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no spark result at {res_dir}")
            n_bad += 1
            continue
        try:
            got = pd.read_parquet(res_dir)
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark result: {e}")
            n_bad += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns spark={list(g.columns)} duck={list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows spark={len(g)} duck={len(e)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in g.columns:
            a, b = g[c], e[c]
            # Driver-strict: the gate hashes canonical string forms, so an
            # int64 123456 vs float64 123456.0 is a mismatch. Compare
            # canonical renderings (int width normalized, int vs float not).
            av = a.map(canon).values
            bv = b.map(canon).values
            same = av == bv
            if not bool(np.all(same)):
                i = int(np.argmin(same))
                bad_cols.append((c, i, a.iloc[i], b.iloc[i]))
        if bad_cols:
            c, i, av, bv = bad_cols[0]
            print(f"FAIL  {name}: {len(bad_cols)} col(s) differ; first {c}[{i}]: "
                  f"spark={av!r} duck={bv!r}")
            n_bad += 1
        else:
            print(f"ok    {name} ({len(g)} rows)")
            n_ok += 1
    missing = [k for k in oracle if not os.path.isdir(os.path.join(out_dir, k))]
    print(f"\n{n_ok} ok, {n_bad} failed" + (f", missing dumps: {missing}" if missing else ""))
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
