#!/usr/bin/env bash
# Full local replica of the driver's round gate, in order:
#   1. compile + the ScalaTest/ScalaCheck suite
#   2. Verify dump at sf0.01 -> DuckDB compare (every entry must PASS)
#   3. oracle result-type lint (HUGEINT/DECIMAL guard)
#   4. (optional, SELFCHECK_BENCH=1) the sf0.1 bench with the one-line
#      JSON result
# Usage: scripts/selfcheck.sh [sfDir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${SELFCHECK_OUT:-/tmp/graft_selfcheck}

echo "== 1/4 compile + test =="
sbt -batch test

echo "== 2/4 verify + compare ($SF) =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify $SF $OUT"
python3 scripts/compare.py "$SF" "$OUT"

echo "== 3/4 oracle type lint =="
sbt -batch "runMain graft.Verify --sql-only $OUT"
python3 scripts/compare.py --lint-only "$SF" "$OUT/oracle_sql.json"

if [[ "${SELFCHECK_BENCH:-0}" == "1" ]]; then
  echo "== 4/4 bench (sf0.1) =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"
else
  echo "== 4/4 bench skipped (set SELFCHECK_BENCH=1 to run) =="
fi
echo "== selfcheck green =="
