#!/usr/bin/env bash
# Round-artifact hygiene (VERDICT r13 "Next round" #2) — run once at the
# end of a round, BEFORE the driver's own catch-all commit, so the round's
# artifacts land deliberately instead of as leftovers.
#
# Convention (also noted in README "Round artifacts & bench records"):
#   * Driver outputs are committed VERBATIM every round:
#       BENCH_r<N>.json CORRECTNESS_r<N>.json VERDICT.md ADVICE.md
#       LEAKCHECK.json COPYCHECK.json PROGRESS.jsonl BASELINE.{md,json}
#   * bench_summary.json is the QUIET-BOX canonical perf record. The
#     driver's per-round bench overwrites it through a window that has
#     historically been load-contaminated (r12: loadavg to 25; r13: same).
#     If the working-tree bench_full.json shows a contaminated window
#     (max 1-min loadavg > GRAFT_LOAD_MAX, default 10), the tracked
#     bench_summary.json is restored from HEAD so the quiet record stays
#     canonical; otherwise the new record is kept. Per-query comparisons
#     across rounds use MINS, not medians (bench-contention discipline).
#
# Usage: scripts/commit_round.sh <round-number> [--no-commit]
set -euo pipefail
cd "$(dirname "$0")/.."

N=${1:?usage: scripts/commit_round.sh <round-number> [--no-commit]}
LOAD_MAX=${GRAFT_LOAD_MAX:-10}

# 1. bench_summary.json: keep quiet-box canonical.
if ! git diff --quiet -- bench_summary.json 2>/dev/null; then
  VERDICT=$(python3 - "$LOAD_MAX" "${GRAFT_LOAD_MAX_SWEEP:-27}" <<'EOF'
import json, re, sys
try:
    full = json.load(open("bench_full.json"))
    # The synthetic sweep families run 32 threads flat-out for minutes at
    # the bench tail, which alone drives 1-min loadavg to ~22 (measured
    # r14: entry queries 8.99 max, sweeps 22.3 on an otherwise idle box).
    # Sweeps therefore get a RAISED threshold (expected self-load 22.3 +
    # margin, default 27) rather than an exemption — external load landing
    # during the sweep tail still trips the gate, while the sweeps' own
    # 32-thread churn does not. Entry queries keep the strict threshold.
    sweep = re.compile(
        r"^q_(countsum_|quantile_\d|pjoin_|limitkeys_|noise_"
        r"|map_5m|flatmap_5m|pubjoin_)")
    strict, raised = float(sys.argv[1]), float(sys.argv[2])
    mx_e = max((v for k, vs in full.get("loadavg_1m", {}).items()
                if not sweep.match(k) for v in vs), default=0.0)
    mx_s = max((v for k, vs in full.get("loadavg_1m", {}).items()
                if sweep.match(k) for v in vs), default=0.0)
    print("contaminated" if (mx_e > strict or mx_s > raised) else "quiet")
    print(f"max 1-min loadavg: entry {mx_e:.2f} (limit {strict}), "
          f"sweep {mx_s:.2f} (limit {raised})", file=sys.stderr)
except Exception as e:
    # no/unreadable full dump -> cannot certify quiet; keep the old record
    print("contaminated")
    print(f"bench_full.json unreadable ({e}); keeping HEAD record",
          file=sys.stderr)
EOF
)
  if [[ "$VERDICT" == "contaminated" ]]; then
    echo "bench_summary.json: working-tree record ran under load" \
         "(or window unverifiable) -> restoring quiet-box canonical from HEAD"
    git checkout -- bench_summary.json
  else
    echo "bench_summary.json: working-tree record certified quiet -> keeping"
  fi
fi

# 2. Stage every round artifact that exists (driver outputs verbatim).
ARTS=(BENCH_r$(printf '%02d' "$N").json CORRECTNESS_r$(printf '%02d' "$N").json
      VERDICT.md ADVICE.md LEAKCHECK.json COPYCHECK.json PROGRESS.jsonl
      BASELINE.md BASELINE.json bench_summary.json)
STAGED=()
for f in "${ARTS[@]}"; do
  [[ -e "$f" ]] && git add "$f" && STAGED+=("$f")
done

if git diff --cached --quiet; then
  echo "nothing to commit — round $N artifacts already recorded"
  exit 0
fi

echo "staged: ${STAGED[*]}"
if [[ "${2:-}" == "--no-commit" ]]; then
  echo "--no-commit: left staged for review"
else
  git commit -m "round $N artifacts (driver outputs verbatim; bench_summary kept quiet-box canonical)"
fi
