#!/usr/bin/env python3
"""Compare-only pass for saved expansion-law predictions: when
oracle_expand.py ran BEFORE (or concurrently with) the Spark dump, its
predictions were SAVED (oracle_<q>.parquet) without a compare. This
re-runs just the chunked lockstep compare for every saved prediction
whose Spark dump now exists — without redoing the prediction COPYs.

Usage: python3 tools/expand_compare.py <saveDir> <verifyOutDir> [q ...]
(Developer tooling only — the engine itself is the Scala library.)
"""
import os, sys
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_expand import compare_with_spark

def main(save_dir, out_dir, names):
    con = duckdb.connect()
    # Per-pid spill dir (r13 ADVICE): a concurrent shard sharing DuckDB's
    # default temp dir can be aborted when the other process exits and
    # unlinks the spill files — same fix as check_oracle/oracle_longrun.
    con.execute(f"SET temp_directory='/tmp/duck_expand_tmp_{os.getpid()}'")
    if os.environ.get("GRAFT_DUCK_THREADS"):
        con.execute(f"SET threads={os.environ['GRAFT_DUCK_THREADS']}")
    if os.environ.get("GRAFT_DUCK_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
    saved = sorted(f[len("oracle_"):-len(".parquet")]
                   for f in os.listdir(save_dir)
                   if f.startswith("oracle_") and f.endswith(".parquet"))
    if names:
        saved = [q for q in saved if q in set(names)]
    ok = True
    for q in saved:
        # _SUCCESS, not isdir (r13 ADVICE): the dump dir exists as soon as
        # Spark starts committing, so a concurrent still-running Verify
        # would otherwise feed a partially committed dump into the compare
        # and report a spurious FAIL (gate_waves stages on the same marker).
        if not os.path.exists(f"{out_dir}/{q}/_SUCCESS"):
            print(f"SAVED {q} — spark dump still missing", flush=True)
            ok = False
            continue
        ok &= compare_with_spark(con, q, out_dir,
                                 f"{save_dir}/oracle_{q}.parquet")
    con.close()
    return ok

if __name__ == "__main__":
    sys.exit(0 if main(sys.argv[1], sys.argv[2], sys.argv[3:]) else 1)
