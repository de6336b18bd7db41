#!/usr/bin/env python3
"""Long-budget oracle re-check for queries that exceeded the in-gate
timeout (the bench/ORACLE_sf{1,2}_r1x.txt pattern): run each named oracle
SQL in DuckDB with NO timeout and a capped thread count, save the result
to <outDir>/oracle_<name>.parquet with wall-clock timing, and — if the
Spark dump for the query is present — compare with check_oracle's logic.

Usage:
  python3 tools/oracle_longrun.py <sfDir> <verifyOutDir> <q1> [q2 ...]

<verifyOutDir> needs oracle_sql.json; per-query Spark parquet dirs are
optional (absent -> the oracle result is saved for a later compare).
Developer tooling only — the engine itself is the Scala library.
"""
import json, os, sys, time
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import rows_match, view_select


def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('GRAFT_DUCK_THREADS', '8')}")
    if os.environ.get("GRAFT_DUCK_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
    con.execute(f"SET temp_directory='/tmp/duck_longrun_tmp_{os.getpid()}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS {view_select(sf_dir, t)}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    rc = 0
    for name in names:
        sql = oracle[name]
        t0 = time.time()
        try:
            dst = f"{out_dir}/oracle_{name}.parquet"
            con.execute(
                f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
            dt = time.time() - t0
        except Exception as e:
            print(f"FAIL {name}: oracle error after {time.time()-t0:.0f}s: {e}",
                  flush=True)
            rc = 1
            continue
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
            print(f"SAVED {name} ({n} rows, duckdb {dt:.0f}s) — no spark dump "
                  "present, compare later", flush=True)
            continue
        want_rel = con.sql(f"SELECT * FROM '{dst}'")
        want_cols = list(want_rel.columns)
        want = want_rel.fetchall()
        got_rel = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        got_cols = list(got_rel.columns)
        got = got_rel.fetchall()
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} vs {sorted(want_cols)}",
                  flush=True)
            rc = 1
            continue
        w_idx = [want_cols.index(c) for c in sorted(want_cols)]
        g_idx = [got_cols.index(c) for c in sorted(got_cols)]
        ok, why = rows_match([[r[i] for i in g_idx] for r in got],
                             [[r[i] for i in w_idx] for r in want])
        if ok:
            print(f"ok   {name} ({len(got)} rows, duckdb {dt:.0f}s)", flush=True)
        else:
            print(f"FAIL {name}: {why}", flush=True)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
