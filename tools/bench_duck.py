#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB over a given sf dir — the ≤2x baseline
the BENCH gate compares against (developer tooling; see BASELINE.md).

Usage: python3 tools/bench_duck.py <sfDir> <verifyOutDir-with-oracle_sql.json>
"""
import json, os, sys, time
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import view_select


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS {view_select(sf_dir, t)}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            times[name] = time.time() - t0
        except Exception as e:
            print(f"FAIL {name}: {e}", file=sys.stderr)
            times[name] = -1.0
    total = sum(v for v in times.values() if v >= 0)
    print(json.dumps({"metric": "duckdb_total", "value": total,
                      "unit": "sec", "queries": times, "sf": sf_dir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
