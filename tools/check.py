#!/usr/bin/env python3
"""Local differential check: Spark Verify output vs DuckDB oracle.

Mimics the driver's correctness gate (CORRECTNESS_r{N}.json): runs each
oracle_sql.json query in DuckDB over the same sf parquet tables and
compares with the parquet the Spark side wrote. Columns sorted by name,
rows sorted by all columns, exact value compare (so any float ULP drift
shows up here before the driver sees it).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        # dtype-kind gate: the driver's hash is type-sensitive across kinds
        # (DuckDB HUGEINT from bare sum() arrives as float/object and fails
        # there even when values coerce equal in pandas) but tolerates
        # integer width (int8/int32 vs int64 hash identically) — mirror that
        def kind(d):
            s = str(d)
            return "int" if s.startswith(("int", "uint")) else s
        dt_bad = [(c, str(got[c].dtype), str(exp[c].dtype))
                  for c in got.columns if kind(got[c].dtype) != kind(exp[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype kind mismatch (spark vs duck): {dt_bad}")
            n_fail += 1
            continue
        try:
            g = got.astype(object)
            e = exp.astype(object)
            # None/NaN on both sides is a match (pandas != treats it as NaN)
            mismatch = (g != e) & ~(got.isnull() & exp.isnull())
            bad = mismatch.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print(f"FAIL {name}: {int(bad.sum())} mismatched rows; first at {i}:")
                print("  spark:", got.iloc[i].to_dict())
                print("  duck :", exp.iloc[i].to_dict())
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: compare error: {e}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
