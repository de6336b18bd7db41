#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executing SparkEntry.oracleSql over the same parquet tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(Developer tooling only — the engine itself is the Scala library.)

Strict mode (GRAFT_ORACLE_STRICT=1, the round_end.sh default): additionally
fail any query whose OUTPUT schema contains a DECIMAL or HUGEINT column on
either side. Round 11 proved the driver's hash is representation-sensitive
for decimals: q_ivf_train emitted DECIMAL(38,0) with bit-identical values in
both engines and still hashed red (CORRECTNESS_r11). Value-level equality of
decimals therefore cannot prove driver-hash equality locally — the only safe
local policy is "no decimal-typed output columns at all" (keep exact decimal
arithmetic INTERNAL; emit BIGINT when it fits, DOUBLE or VARCHAR otherwise).
"""
import atexit, glob, json, math, os, shutil, sys, threading
import duckdb

def norm(v):
    if isinstance(v, float):
        return v
    return v

def rows_match(a, b, tol=1e-6):
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    for i, (ra, rb) in enumerate(zip(a, b)):
        if len(ra) != len(rb):
            return False, f"row {i}: width {len(ra)} vs {len(rb)}"
        for va, vb in zip(ra, rb):
            if isinstance(va, float) or isinstance(vb, float):
                if va is None and vb is None:
                    continue
                if va is None or vb is None:
                    return False, f"row {i}: {va!r} vs {vb!r}"
                if math.isnan(va) and math.isnan(vb):
                    continue
                if abs(va - vb) > tol * max(1.0, abs(va), abs(vb)):
                    return False, f"row {i}: {va!r} vs {vb!r}"
            else:
                if str(va) != str(vb):
                    return False, f"row {i}: {va!r} vs {vb!r}"
    return True, ""

def view_select(sf_dir, t):
    """SELECT body for table t under sf_dir, handling all three layouts:
    single parquet file (driver testdata), flat part-file directory
    (pre-r13 ScaleUp replicas), and hive date-partitioned events
    (events.parquet/event_date=.../part-*, the r13 ScaleUp default) —
    the partition column is dropped so every layout presents the same
    schema, mirroring graft.Tables."""
    p = f"{sf_dir}/{t}.parquet"
    if not os.path.isdir(p):
        return f"SELECT * FROM '{p}'"
    if any(e.startswith("event_date=") for e in os.listdir(p)):
        return ("SELECT * EXCLUDE (event_date) FROM read_parquet("
                f"'{p}/*/*.parquet', hive_partitioning = true)")
    return f"SELECT * FROM '{p}/*.parquet'"


def _connect(sf_dir):
    con = duckdb.connect()
    # scale-rung hygiene: DuckDB defaults to 80% of RAM and all cores —
    # cap both when sharing the host with Spark/other gates (unset = default)
    if os.environ.get("GRAFT_DUCK_THREADS"):
        con.execute(f"SET threads={os.environ['GRAFT_DUCK_THREADS']}")
    if os.environ.get("GRAFT_DUCK_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
    # per-process temp dir: two concurrent gate shards sharing one spill
    # dir abort each other (DuckDB unlinks the whole dir's files on exit).
    # A crashed/OOM-killed shard leaves multi-GB spill files behind
    # (r13 ADVICE): remove our own dir at exit, and sweep any sibling dir
    # whose owning pid is dead — liveness-checked so live shards are safe.
    tmp = f"/tmp/duck_gate_tmp_{os.getpid()}"
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    # Sweep covers the expand/compare spill dirs too (they register the
    # same atexit but an OOM-kill skips atexit — r14 ADVICE). Non-integer
    # suffixes are SKIPPED, not deleted (they are not ours to reclaim),
    # and a dir whose pid reads alive but is >1 day stale is reclaimed
    # anyway — a recycled PID otherwise pins a dead shard's spill forever.
    import time as _time
    for d in (glob.glob("/tmp/duck_gate_tmp_*")
              + glob.glob("/tmp/duck_expand_tmp_*")):
        try:
            pid = int(d.rsplit("_", 1)[1])
        except ValueError:
            continue
        try:
            os.kill(pid, 0)                        # raises if pid is dead
            alive = True
        except ProcessLookupError:
            alive = False
        except PermissionError:
            alive = True                           # alive, different user
        try:
            # Staleness must consider the dir's ENTRIES, not just the dir:
            # directory mtime only moves on entry create/delete, so a >1-day
            # run still appending to early-created spill files reads "stale"
            # by dir mtime alone and would lose its temp mid-query to any
            # concurrently started gate (r15 ADVICE). Use the max mtime over
            # the dir and everything in it.
            mt = os.path.getmtime(d)
            for root, _dirs, files in os.walk(d):
                for f in files:
                    try:
                        mt = max(mt, os.path.getmtime(os.path.join(root, f)))
                    except OSError:
                        pass                       # file vanished mid-walk
            stale = _time.time() - mt > 86400
        except OSError:
            continue                               # vanished concurrently
        if not alive or stale:
            shutil.rmtree(d, ignore_errors=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS {view_select(sf_dir, t)}")
    return con




def _reconnect(sf_dir, name):
    """Reconnect after an OOM/IO failure poisoned the connection. The dying
    connection can hold its memory briefly past close() — a bare _connect
    here OOM'd and killed the whole gate (observed at the x300 rung), so
    retry with a backoff to let the allocator drain."""
    import gc, time as _t
    for delay in (0, 5, 20, 60):
        _t.sleep(delay)
        gc.collect()
        try:
            con = _connect(sf_dir)
            print(f"[gate] reconnected after {name} failure", flush=True)
            return con
        except Exception as e:
            print(f"[gate] reconnect attempt failed ({e}); retrying",
                  flush=True)
    raise RuntimeError(f"could not reconnect after {name}")

def main(sf_dir, out_dir):
    con = _connect(sf_dir)
    strict = os.environ.get("GRAFT_ORACLE_STRICT", "") not in ("", "0")
    # Run-identity header: printed first so a later GRAFT_ORACLE_RESUME can
    # verify the prior log came from the SAME gate configuration — a stale
    # log from another sfDir/outDir/strict setting must not greenlight
    # queries into the merged total.
    ident = f"[gate] sfDir={sf_dir} outDir={out_dir} strict={int(strict)}"
    print(ident, flush=True)
    # Opt-in per-oracle-query wall clock (seconds): the sf1 scale-stress
    # replicas make a handful of DuckDB oracle CTEs quadratic in clone
    # multiplicity (inverted-index self-joins); a timeout records them as
    # ORACLE-TIMEOUT instead of hanging the gate. Unset (the driver's
    # path) → no timer, behavior unchanged.
    timeout_s = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)
    n_timeout = 0
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    # GRAFT_ORACLE_RESUME=<prior log>: skip queries that prior run already
    # printed `ok` for (crash/OOM recovery on the multi-hour scale rungs);
    # they count into n_ok so the final line reflects the merged run.
    resumed = set()
    resume_log = os.environ.get("GRAFT_ORACLE_RESUME")
    if resume_log and os.path.exists(resume_log):
        prior = open(resume_log).read().splitlines()
        prior_ident = next((l for l in prior if l.startswith("[gate] ")), None)
        if prior_ident is not None and prior_ident != ident:
            print(f"[resume] REFUSED: prior log identity mismatch\n"
                  f"  prior: {prior_ident}\n  this:  {ident}")
        else:
            if prior_ident is None:
                # pre-header logs (r12 and earlier) carry no identity line;
                # honor them but say so — the operator must vouch manually
                print(f"[resume] WARNING: {resume_log} has no [gate] header; "
                      "cannot verify it matches this sfDir/outDir/strict")
            for line in prior:
                if line.startswith("ok   "):
                    resumed.add(line.split()[1])
            print(f"[resume] skipping {len(resumed)} queries already ok in "
                  f"{resume_log}: {' '.join(sorted(resumed))}")
    # GRAFT_ORACLE_SKIP=q_a,q_b : queries adjudicated OUTSIDE this gate
    # (e.g. the recursive-CTE family at clone rungs where the oracle is
    # single-node infeasible and tools/oracle_expand.py carries the exact
    # compare). Reported per-line so the gate output can't read as green
    # silence; they are NOT counted ok.
    skip = set(filter(None, os.environ.get(
        "GRAFT_ORACLE_SKIP", "").split(",")))
    n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in resumed:
            n_ok += 1
            continue
        if name in skip:
            print(f"SKIP {name}: adjudicated externally (oracle_expand)")
            n_skip += 1
            continue
        # done flag guards the timer callback: without it, a timer firing in
        # the gap between query completion and timer.cancel() would
        # interrupt() an idle connection and spuriously kill the NEXT
        # statement; and a real SQL error racing the timer would be
        # misreported as a timeout (we additionally require the exception to
        # BE duckdb's interrupt to count as one).
        timer, fired, done = None, [], threading.Event()
        if timeout_s > 0:
            def _interrupt(done=done, fired=fired):
                if not done.is_set():
                    fired.append(1)
                    con.interrupt()
            timer = threading.Timer(timeout_s, _interrupt)
            timer.start()
        interrupt_exc = getattr(duckdb, "InterruptException", ())
        try:
            # materialize the oracle INSIDE DuckDB (spillable temp table)
            # instead of fetchall into Python: two 15M-row fetchalls held
            # simultaneously OOM'd the sf10 gate run
            con.execute(f"CREATE OR REPLACE TEMP TABLE __want AS ({sql})")
            desc = con.sql("DESCRIBE __want").fetchall()
            want_cols = [r[0] for r in desc]
            want_types = {r[0]: str(r[1]) for r in desc}
            done.set()
        except Exception as e:
            done.set()
            is_interrupt = (isinstance(e, interrupt_exc)
                            or "INTERRUPT" in str(e).upper())
            if fired and is_interrupt:
                print(f"ORACLE-TIMEOUT {name}: oracle exceeded {timeout_s:.0f}s")
                n_timeout += 1
            else:
                print(f"FAIL {name}: oracle SQL error: {e}")
                n_bad += 1
            # an OOM'd/IO-failed query can poison the connection's memory
            # state (observed: every later query failing tiny allocations)
            # — reconnect so one heavy oracle cannot cascade the gate
            if "Out of Memory" in str(e) or "IO Error" in str(e):
                try:
                    con.close()
                except Exception:
                    pass
                con = _reconnect(sf_dir, name)
            continue
        finally:
            done.set()
            if timer is not None:
                timer.cancel()
        try:
            # second cursor so the spark side streams independently of the
            # connection streaming __want (temp tables are con-local, the
            # parquet is not)
            gcur = con.cursor()
            got_rel = gcur.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = list(got_rel.columns)
            got_types = {c: str(t) for c, t in zip(got_cols, got_rel.types)}
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_bad += 1
            if "Out of Memory" in str(e):
                try:
                    con.close()
                except Exception:
                    pass
                con = _reconnect(sf_dir, name)
            continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} vs oracle {sorted(want_cols)}")
            n_bad += 1
            continue
        # The driver's hash is TYPE-sensitive at the family level: a DuckDB
        # HUGEINT sum vs a Spark BIGINT hash-mismatches even with identical
        # values (CORRECTNESS_r06: q_pagerank et al), while ordinary integer
        # width differences (row_number INTEGER vs BIGINT) hash equal. So
        # compare type FAMILIES, with HUGEINT deliberately outside the safe
        # integer family so that class of drift is caught locally.
        def family(t):
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
                return "int"
            if t in ("FLOAT", "DOUBLE"):
                return "float"
            return t  # HUGEINT, DECIMAL(..), VARCHAR, DATE, ... exact
        type_diffs = [
            f"{c}: spark {got_types[c]} vs oracle {want_types[c]}"
            for c in want_cols
            if family(got_types[c]) != family(want_types[c])]
        if type_diffs:
            print(f"FAIL {name}: column types differ: " + "; ".join(type_diffs))
            n_bad += 1
            continue
        # Strict: decimal-typed OUTPUT columns are driver-hash hazards even
        # when both sides agree on type and value (r11 q_ivf_train: both
        # DECIMAL(38,0), bit-identical rows, driver hash red). Forbid them.
        if strict:
            hazards = [
                f"{c}: spark {got_types[c]} / oracle {want_types[c]}"
                for c in want_cols
                if any(t.startswith("DECIMAL") or t == "HUGEINT"
                       for t in (got_types[c], want_types[c]))]
            if hazards:
                print(f"FAIL {name}: strict: decimal/hugeint output column "
                      "is not driver-hash-stable: " + "; ".join(hazards))
                n_bad += 1
                continue
        # driver sorts columns by name before hashing; emulate by reordering.
        # Lockstep CHUNKED compare — peak Python memory is 2 x CHUNK rows,
        # independent of result size.
        w_idx = [want_cols.index(c) for c in sorted(want_cols)]
        g_idx = [got_cols.index(c) for c in sorted(got_cols)]
        CHUNK = 200000
        want_rel = con.sql("SELECT * FROM __want")
        ok, why, n_rows = True, "", 0
        while True:
            want = want_rel.fetchmany(CHUNK)
            got = got_rel.fetchmany(CHUNK)
            if not want and not got:
                break
            if len(want) != len(got):
                ok, why = False, (f"row count differs at offset {n_rows} "
                                  f"(+{len(got)} spark vs +{len(want)} oracle)")
                break
            ok, why = rows_match(
                [[r[i] for i in g_idx] for r in got],
                [[r[i] for i in w_idx] for r in want])
            if not ok:
                why = f"at chunk offset {n_rows}: {why}"
                break
            n_rows += len(want)
        con.execute("DROP TABLE IF EXISTS __want")
        gcur.close()
        if ok:
            print(f"ok   {name} ({n_rows} rows)")
            n_ok += 1
        else:
            print(f"FAIL {name}: {why}")
            n_bad += 1
    if n_skip:
        print(f"== note: {n_skip} externally-adjudicated skip(s)")
    if n_timeout:
        print(f"== {n_ok} ok, {n_bad} fail, {n_timeout} oracle-timeout")
        # timed-out oracles are UNVERIFIED, not passed: exit 2 (distinct
        # from 1 = hard fail) so a gate script can't treat the run as green
        # without explicitly adjudicating the timeouts.
        print(f"WARNING: {n_timeout} oracle(s) timed out and are unverified",
              file=sys.stderr)
    else:
        print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else (2 if n_timeout else 0)

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
