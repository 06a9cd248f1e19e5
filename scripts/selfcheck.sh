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
# clean first so stale reports from deleted suites can't linger: after the
# run, report count == live suite count
rm -rf target/test-reports
sbt -batch test

echo "== 2/4 verify + compare ($SF) =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify $SF $OUT"
python3 scripts/compare.py "$SF" "$OUT"

echo "== 3/4 oracle type lint =="
sbt -batch "runMain graft.Verify --sql-only $OUT"
python3 scripts/compare.py --lint-only "$SF" "$OUT/oracle_sql.json"

if [[ "${SELFCHECK_SF1:-0}" == "1" ]]; then
  echo "== sf1 full-suite correctness gate (10x fixture) =="
  # partition-count-dependent behavior (multi-row-group scans, window
  # ties, union-find fallbacks, stream state redistribution) that the
  # single-row-group sf0.01 fixture cannot exercise. The fixture is the
  # deterministic 10x derivation ScaleBench builds (backfilled dims).
  SF1=${SELFCHECK_SF1_DIR:-/root/repo/testdata_sf1}
  if [[ ! -d "$SF1/supplier.parquet" ]]; then
    SPARK_GRAFT_SCALE_ONLY=none SPARK_DRIVER_MEM=16g \
      sbt -batch "runMain graft.ScaleBench"
  fi
  OUT1="${SELFCHECK_OUT:-/tmp/graft_selfcheck}_sf1"
  # Four correctness classes close all 219 entries (SF1_CORRECTNESS.md;
  # 219 = 218 from r16 + q_minhash_staged, r17):
  #   row-exact      — 211 entries, DuckDB oracle on the sf1 tables;
  #   aggregate-exact — q_join_nullsafe (its ~4.6e9-row null block is the
  #                    semantics of nulls_are_equal; count + exact integral
  #                    sums, HUGEINT on the oracle side);
  #   invariant      — q_minhash_dedup / q_minhash_staged /
  #                    q_dedup_cluster / q_keep_best (DuckDB's replica of
  #                    the banded pipeline is quadratic: >70 GB spill at
  #                    sf1) via graft.InvariantCheck:
  #                    independent-formulation re-derivations (staged ==
  #                    single-pass identity), checked exactly.
  # q_cosine_dup / q_semdedup / q_semdedup_probes stay row-exact ONLY at
  # the base fixture; at sf1 they are approximate BY DESIGN (banded miss /
  # cell-local semantics — the ×10 embedding derivation's ±0.025
  # perturbed copies create natural near-threshold pairs, so the
  # collinear-only oracle constructions stop being exhaustive).
  # q_cosine_dup's sf1 recall is gated by Sf1RecallSpec (ANN +
  # cosineDupPairs gates on the perturbed 10x geometry); the semDeDup
  # entries have NO sf1-scale recall gate — their quality is gated only
  # at the base fixture by SemDedupSplitRecallSpec (split-recall +
  # monotonicity: probed drops ⊇ probes=0 drops).
  SF1_AGG="q_join_nullsafe"
  SF1_INV="q_minhash_dedup,q_minhash_staged,q_dedup_cluster,q_keep_best"
  SF1_RECALL="q_cosine_dup,q_semdedup,q_semdedup_probes"
  SPARK_GRAFT_SKIP="$SF1_AGG,$SF1_INV,$SF1_RECALL" \
    SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_DRIVER_MEM=48g \
    bash scripts/run_verify_sf1.sh "$SF1" "$OUT1"
  GRAFT_COMPARE_SKIP="$SF1_AGG,$SF1_INV,$SF1_RECALL" \
    python3 scripts/compare.py "$SF1" "$OUT1"
  SPARK_GRAFT_AGG=1 SPARK_GRAFT_ONLY="$SF1_AGG" \
    SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_DRIVER_MEM=48g \
    bash scripts/run_verify_sf1.sh "$SF1" "${OUT1}_agg"
  GRAFT_COMPARE_ONLY="$SF1_AGG" GRAFT_COMPARE_AGG="$SF1_AGG" \
    python3 scripts/compare.py "$SF1" "${OUT1}_agg"
  GRAFT_MAIN=graft.InvariantCheck SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    bash scripts/run_verify_sf1.sh "$SF1"
  sbt -batch "testOnly graft.Sf1RecallSpec"
fi

if [[ "${SELFCHECK_BENCH:-0}" == "1" ]]; then
  echo "== 4/4 bench (sf0.1) =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
    | tee /tmp/graft_bench_out.log
  # Skew gate: the honest (untrimmed) per-run max is always PRINTED, but
  # the gate fails only when the TRIMMED max breaches the 2x bar — the
  # honest max over full-suite runs includes invocation-wide GC/load
  # (attributed via gc_sec in bench_full.json), not plan skew.
  python3 - <<'PYEOF'
import json, sys
line = None
for l in open('/tmp/graft_bench_out.log'):
    l = l.strip()
    if l.startswith('[info] '):
        l = l[len('[info] '):]
    if l.startswith('{"metric"'):
        line = l
if line is None:
    print('FAIL: no bench JSON line found'); sys.exit(1)
qs = json.loads(line).get('queries', {})
bad = []
for k in sorted(qs):
    if k.endswith('_ratio_max_trim'):
        trim, honest = qs[k], qs.get(k[:-len('_trim')])
        print(f'skew {k[:-len("_ratio_max_trim")]}: trim={trim} honest_max={honest}')
        if trim > 2.0:
            bad.append(k)
if bad:
    print(f'FAIL: trimmed skew ratio breached the 2x bar: {bad}'); sys.exit(1)
print('skew gate OK (trim <= 2x; honest max reported above)')
PYEOF
else
  echo "== 4/4 bench skipped (set SELFCHECK_BENCH=1 to run) =="
fi
echo "== selfcheck green =="
