#!/usr/bin/env bash
# Round-end evidence target: one command that reproduces every gate the
# round must ship green, in dependency order, failing fast on the first
# red. The r9 failure mode (an evidence artifact silently missing at
# snapshot time) becomes a tooling guarantee instead of a discipline one.
#
#   tools/round_end.sh            # test + verify/oracle(sf0.01) + bench(sf0.1)
#   SCALE_DIRS="target/sf1 target/sf2" tools/round_end.sh   # + scale gates
#
# Developer tooling only — the engine itself is the Scala library.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 sbt test (includes shuffle-budget, BNL, window, pruning nets)"
sbt -batch test

echo "== 2/4 Verify + type-strict oracle at sf0.01 (the driver's gate)"
OUT=${OUT:-/tmp/verify_round_end}
rm -rf "$OUT"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
# STRICT: also fail decimal/hugeint-typed output columns — value-level
# equality of decimals cannot prove driver-hash equality (r11 q_ivf_train).
GRAFT_ORACLE_STRICT=1 python3 tools/check_oracle.py /root/testdata/sf0.01 "$OUT"

echo "== 3/4 contract bench at sf0.1 (refreshes the committed BENCH_FULL.json)"
# Refreshing the committed artifact is an EXPLICIT act: Bench's default
# output is a timestamped file under target/bench/, so ad-hoc runs can
# never clobber this one (r13 verdict #3).
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=BENCH_FULL.json \
  sbt -batch "runMain graft.Bench" \
  | grep '"metric"' | sed 's/^\[info\] //'

echo "== 4/4 scale-aware shuffle gates (set SCALE_DIRS to enable)"
for d in ${SCALE_DIRS:-}; do
  sf=$(basename "$d")
  blessed="src/test/resources/shuffle_blessed_${sf}.tsv"
  echo "--- gate at $d (blessed: $blessed)"
  sbt -batch "runMain graft.ShuffleCount $d \
    src/test/resources/shuffle_budget.tsv $blessed" >/dev/null
done
echo "round_end: ALL GREEN"
