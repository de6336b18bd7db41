#!/usr/bin/env python3
"""Merge the sf30 gate/expansion/longrun logs into bench/ORACLE_sf30_r{N}.txt.

Reads the repo-persisted copies under bench/gates/sf30/ (the /tmp originals
do not survive the session reaper — VERDICT r14 #3). Unions ok lines across
ALL gate waves and their _prev resume logs (the r14 draft read only wave A
and undercounted 140 vs 146 — VERDICT r14 "What's wrong" (a)).

Precedence per query: in-gate > law > longrun, first matching line wins
within a tier. Usage:
    python3 tools/merge_oracle_sf30.py [bench/ORACLE_sf30_r15.txt]
Prints the tally either way; writes the artifact only when a path is given.
"""
import glob, json, os, sys

D = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench", "gates", "sf30")
GATE_LOGS = sorted(glob.glob(os.path.join(D, "gate_sf30*gate_log*.txt")))
LAW_LOGS = [os.path.join(D, f) for f in
            ("expand_sf30.log", "expand_compare_sf30.log", "lift_sf30.log",
             "sweep_sf30.log", "textlift_sf30.log")]
LONG_LOGS = sorted(glob.glob(os.path.join(D, "longrun*.log")))
oracle = json.load(open(os.path.join(D, "oracle_sql.json")))

TIER_RANK = {"in-gate": 0, "law": 1, "longrun": 2}
status = {}   # name -> (tag, line)

def put(name, tag, line):
    if name not in oracle:
        return
    if name not in status or TIER_RANK[tag] < TIER_RANK[status[name][0]]:
        status[name] = (tag, line.strip())

def scan(paths, tag):
    for f in paths:
        if not os.path.exists(f):
            continue
        for line in open(f):
            if line.startswith("ok   "):
                put(line.split()[1], tag, line)

scan(GATE_LOGS, "in-gate")
scan(LAW_LOGS, "law")
scan(LONG_LOGS, "longrun")

missing = sorted(set(oracle) - set(status))
n = {t: sum(1 for tag, _ in status.values() if tag == t) for t in TIER_RANK}
print(f"TALLY: {len(status)}/{len(oracle)} ok "
      f"(in-gate {n['in-gate']}, expansion-law {n['law']}, "
      f"longrun {n['longrun']})")
if missing:
    print("MISSING:", " ".join(missing))
if len(sys.argv) > 1:
    with open(sys.argv[1], "w") as out:
        out.write(open(os.path.join(D, "oracle_sf30_header.txt")).read())
        out.write(f"\n## merged per-query status "
                  f"({len(status)}/{len(oracle)} ok: in-gate {n['in-gate']}, "
                  f"expansion-law {n['law']}, longrun {n['longrun']})\n")
        for q in sorted(oracle):
            if q in status:
                tag, line = status[q]
                out.write(f"{line}   [{tag}]\n")
            else:
                out.write(f"MISSING {q}\n")
    print(f"wrote {sys.argv[1]}")
