#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executing SparkEntry.oracleSql over the same parquet tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(Developer tooling only — the engine itself is the Scala library.)
"""
import json, math, sys
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

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want_rel = con.sql(sql)
            want_cols = list(want_rel.columns)
            want_types = {c: str(t) for c, t in zip(want_cols, want_rel.types)}
            want = want_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = list(got_rel.columns)
            got_types = {c: str(t) for c, t in zip(got_cols, got_rel.types)}
            got = got_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_bad += 1
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
        # driver sorts columns by name before hashing; emulate by reordering
        w_idx = [want_cols.index(c) for c in sorted(want_cols)]
        g_idx = [got_cols.index(c) for c in sorted(got_cols)]
        want_r = [[r[i] for i in w_idx] for r in want]
        got_r = [[r[i] for i in g_idx] for r in got]
        ok, why = rows_match(got_r, want_r)
        if ok:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
        else:
            print(f"FAIL {name}: {why}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
