#!/usr/bin/env python3
"""Assemble bench/ZIPF_SLOPE_r16.json from the three focused cap-sweep
bench runs (SCALEUP_ZIPF_CAP 100 / 300 / 1000 at x100, same total rows):
per cap, the dedup pair family's wall + output rows, plus the wall/rows
ratio — the committed evidence that the hot-family cost is bounded by
OUTPUT pair volume (sum C(m_i,2) cliques + sum m_a*m_b cross), not by
any quadratic scan. Usage:
  python3 tools/zipf_slope.py <cap100.json> <cap300.json> <cap1000.json>
Developer tooling only — the engine itself is the Scala library.
"""
import json, sys

caps = [100, 300, 1000]
runs = [json.loads(open(p).read()) for p in sys.argv[1:4]]
out = {"metric": "zipf_pair_slope", "factor": 100,
       "note": ("x100 Zipf corpora at cap 100/300/1000 (cap 100 = the "
                "degenerate uniform anchor; higher caps concentrate clone "
                "multiplicity into hot families, growing sum C(m_i,2)). "
                "Same total rows per corpus; walls are a focused "
                "SPARK_GRAFT_ONLY pair-family run, best-of-2 warm; rows "
                "from an untimed count pass."),
       "caps": {}}
qs = sorted(runs[0]["rows"])
for cap, d in zip(caps, runs):
    qmap = {}
    for q in qs:
        wall = None
        # focused stdout carries only the 12-slowest map + sorted vec;
        # with 10 queries all appear in "queries"
        wall = d["queries"].get(q)
        qmap[q] = {"sec": wall, "rows": d["rows"][q]}
    out["caps"][str(cap)] = {
        "total_sec": d["value"], "cpu_ms_total": d["cpu_ms_total"],
        "queries": qmap}
# slope summary on the family's heavy pair emitters: wall ratio vs
# output-row ratio, cap 1000 over cap 100
heavy = [q for q in qs if runs[0]["rows"][q] > 1000000]
summ = {}
for q in heavy:
    r0, r2 = runs[0], runs[2]
    try:
        summ[q] = {
            "rows_x": round(r2["rows"][q] / r0["rows"][q], 3),
            "wall_x": round(r2["queries"][q] / r0["queries"][q], 3)}
    except (KeyError, ZeroDivisionError, TypeError):
        pass
out["slope_cap1000_over_cap100"] = summ
json.dump(out, open("bench/ZIPF_SLOPE_r16.json", "w"), indent=1)
print("written bench/ZIPF_SLOPE_r16.json")
for q, s in summ.items():
    print(f"{q:26s} rows x{s['rows_x']:<7} wall x{s['wall_x']}")
