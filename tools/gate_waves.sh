#!/usr/bin/env bash
# Overlap the scale-rung DuckDB gate with a still-running graft.Verify
# dump: stage the COMPLETED query dirs (_SUCCESS present) into a symlink
# dir with a matching filtered oracle_sql.json, and run check_oracle.py
# there, resuming ok lines across waves. The staged outDir path is
# constant, so the [gate] identity header stays valid for resume.
#
#   tools/gate_waves.sh <sfDir> <verifyOutDir> <stageDir> <skipList>
#
# Developer tooling only — the engine itself is the Scala library.
set -euo pipefail
SF=$1; SRC=$2; STAGE=$3; SKIP=${4:-}
mkdir -p "$STAGE"
for d in "$SRC"/*/; do
  q=$(basename "$d")
  [ -f "$d/_SUCCESS" ] && [ ! -e "$STAGE/$q" ] && ln -s "$d" "$STAGE/$q"
done
python3 - "$SRC" "$STAGE" <<'EOF'
import json, os, sys
src, stage = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{src}/oracle_sql.json"))
done = {d for d in os.listdir(stage) if os.path.isdir(f"{stage}/{d}")}
json.dump({k: v for k, v in oracle.items() if k in done},
          open(f"{stage}/oracle_sql.json", "w"))
print(f"[waves] staged {len(done & set(oracle))} of {len(oracle)} queries")
EOF
# cumulative log: each wave resumes every ok line from ALL prior waves
# (the [gate] identity header repeats identically; resume reads the first)
LOG="$STAGE/gate_log.txt"
PREV="$STAGE/gate_log_prev.txt"
[ -f "$LOG" ] && cp "$LOG" "$PREV"
GRAFT_ORACLE_STRICT=1 \
GRAFT_ORACLE_TIMEOUT=${GRAFT_ORACLE_TIMEOUT:-1800} \
GRAFT_ORACLE_RESUME=${PREV} \
GRAFT_ORACLE_SKIP="$SKIP" \
GRAFT_DUCK_THREADS=${GRAFT_DUCK_THREADS:-10} \
GRAFT_DUCK_MEM=${GRAFT_DUCK_MEM:-20g} \
  python3 tools/check_oracle.py "$SF" "$STAGE" | tee -a "$LOG"
