#!/usr/bin/env bash
# One-shot reproduce of the sf1 scale-stress evidence (COVERAGE.md rounds
# 9-10 section). Run from the repo root. Takes ~40 min end to end
# (DuckDB's long-budget re-check of the quadratic oracles dominates if
# enabled). Developer tooling only — the engine itself is the Scala lib.
set -euo pipefail
SF1=${SF1:-target/sf1}
FACTOR=${FACTOR:-10}
BASE=${BASE:-/root/testdata/sf0.1}

echo "== 1/4 generate ${FACTOR}x replicas: $BASE -> $SF1"
sbt -batch "runMain graft.ScaleUp $BASE $SF1 $FACTOR"

echo "== 2/4 bench at scale (full JSON -> bench/BENCH_sf1.json)"
SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_BENCH_OUT=bench/BENCH_sf1.json \
  sbt -batch "runMain graft.Bench" | grep '"metric"' | sed 's/^\[info\] //'

echo "== 3/4 scale-aware shuffle gate (exits 1 on unadjudicated flips)"
sbt -batch "runMain graft.ShuffleCount $SF1 \
  src/test/resources/shuffle_budget.tsv \
  src/test/resources/shuffle_blessed_sf1.tsv"

echo "== 4/4 type-strict oracle at scale (timeouts recorded, exit 2)"
OUT=${OUT:-/tmp/verify_sf1}
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF1 $OUT"
GRAFT_ORACLE_TIMEOUT=${GRAFT_ORACLE_TIMEOUT:-120} \
  python3 tools/check_oracle.py "$SF1" "$OUT" || rc=$?
# rc=2 means some oracles timed out (the quadratic-CTE graph family at
# clone multiplicity) — adjudicate per bench/ORACLE_sf1_r10.txt: re-check
# with no timeout, or use the clone-blowup invariants for q_pagerank.
exit ${rc:-0}
