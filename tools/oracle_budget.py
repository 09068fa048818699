#!/usr/bin/env python3
"""Oracle cost pre-flight (round-13 verdict item 1).

Round 13's new graph-family oracles cost minutes each in DuckDB (q135
188.7 s — un-materialized CTEs inlined exponentially through iterated
rounds), which blew the driver's correctness harness to an empty
CORRECTNESS_r13.json. Two rounds of work became invisible because an
oracle was slow, not wrong.

This tool times every oracle_sql.json entry in DuckDB over the given sf
tables and exits nonzero when any single oracle exceeds PER_QUERY_BUDGET
seconds or the suite exceeds TOTAL_BUDGET — run it after every new
oracle (it is part of the new-query checklist) and before ending a
round.

Usage: python3 tools/oracle_budget.py <verify_out_dir_or_oracle_json> <sf_dir>
"""
import sys, os, json, time
import duckdb

PER_QUERY_BUDGET = 10.0   # seconds — driver gate headroom per oracle
TOTAL_BUDGET = 120.0      # seconds — whole-suite DuckDB ceiling

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    src, sfdir = sys.argv[1], sys.argv[2]
    path = src if src.endswith(".json") else os.path.join(src, "oracle_sql.json")
    oracle = json.load(open(path))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    total = 0.0
    over = []
    timed = []
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
        except Exception as e:
            print(f"ERROR {name}: {e}")
            over.append((name, -1.0))
            continue
        dt = time.time() - t0
        total += dt
        timed.append((name, dt))
        if dt > PER_QUERY_BUDGET:
            over.append((name, dt))
    timed.sort(key=lambda x: -x[1])
    print(f"total={total:.1f}s over {len(timed)} oracles "
          f"(budget {TOTAL_BUDGET:.0f}s total / {PER_QUERY_BUDGET:.0f}s each)")
    print("slowest:", ", ".join(f"{n}={t:.1f}s" for n, t in timed[:8]))
    if over:
        for n, t in over:
            print(f"OVER-BUDGET {n}: {t:.1f}s" if t >= 0 else f"BROKEN {n}")
        sys.exit(1)
    if total > TOTAL_BUDGET:
        print(f"OVER-BUDGET total: {total:.1f}s > {TOTAL_BUDGET:.0f}s")
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
