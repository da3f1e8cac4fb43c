#!/bin/bash
# One-command round gate (VERDICT r13 #7): every number a ROUND<N> doc
# cites comes out of THIS script's tracked artifacts — "persisted at
# HEAD" by construction, not discipline.
#
# Usage: tools/round_gate.sh <round> [steps]
#   round  round number, e.g. 14 — artifacts land in docs/artifacts/r<N>/
#   steps  comma list from {test,gate,sf1,bench}; default all.
#     test   sbt test (full suite) -> sbt_test.log
#     gate   Verify at sf0.01 + full DuckDB sweep -> gate_sweep_results.json
#     sf1    Verify at tmp/sf1 + full DuckDB sweep (300 s/row cap)
#            -> sweep_sf1_results.json   (needs tmp/sf1; see FIXTURES.md)
#     bench  graft.Bench at sf0.1 -> bench_result.json (self-labels
#            authoritative from the load gate; run on a QUIET box)
#
# Env passthrough: SPARK_GRAFT_BENCH_REPS etc. work as usual. The sf1
# sweep exports SPARK_GRAFT_TOPK_SKETCH=8192 (q134's exactness guard
# prescribes width ∝ n; 8192 is the guard-named sf1 width — see
# docs/ROUND13.md §4).
set -uo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/round_gate.sh <round> [steps]}"
STEPS="${2:-test,gate,sf1,bench}"
ART="docs/artifacts/r${ROUND}"
mkdir -p "$ART" tmp
RC=0

has_step() { case ",$STEPS," in *",$1,"*) return 0;; *) return 1;; esac; }

echo "[round_gate] round $ROUND steps=$STEPS -> $ART"

if has_step test; then
  echo "[round_gate] sbt test ..."
  # OracleSmokeSpec's per-query DuckDB cap defaults to 30 s, sized for
  # a quiet box; a concurrent decade sweep tripped it in r15 (load
  # timeout, not a code failure — passed alone). Scale it here so the
  # gate's verdict tracks the code, not the box's moment.
  ORACLE_SMOKE_TIMEOUT_S="${ORACLE_SMOKE_TIMEOUT_S:-90}" \
    sbt -batch test > "$ART/sbt_test.log" 2>&1
  T=$?
  tail -4 "$ART/sbt_test.log"
  echo "[round_gate] sbt test EXIT=$T (log: $ART/sbt_test.log)"
  [ $T -ne 0 ] && RC=1
fi

if has_step gate; then
  echo "[round_gate] sf0.01 gate: Verify + full oracle sweep ..."
  rm -rf tmp/gate_verify
  tools/jrun.sh graft.Verify /root/testdata/sf0.01 tmp/gate_verify \
    > tmp/gate_verify.log 2>&1
  V=$?
  echo "[round_gate] Verify EXIT=$V (log: tmp/gate_verify.log)"
  [ $V -ne 0 ] && RC=1
  python3 tools/oracle_sweep.py tmp/gate_verify /root/testdata/sf0.01 300 \
    | tee "$ART/gate_sweep.log" | tail -3
  S=$?
  cp tmp/gate_verify/sweep_results.json "$ART/gate_sweep_results.json"
  [ $S -ne 0 ] && RC=1
fi

if has_step sf1; then
  if [ ! -d tmp/sf1 ]; then
    echo "[round_gate] SKIP sf1: tmp/sf1 missing (build with ScaleReplicate)"
  else
    echo "[round_gate] sf1 sweep: Verify + full oracle sweep ..."
    rm -rf tmp/verify_sf1_gate
    SPARK_GRAFT_TOPK_SKETCH=8192 \
      tools/jrun.sh graft.Verify /root/repo/tmp/sf1 tmp/verify_sf1_gate \
      > tmp/verify_sf1_gate.log 2>&1
    V=$?
    echo "[round_gate] sf1 Verify EXIT=$V (log: tmp/verify_sf1_gate.log)"
    [ $V -ne 0 ] && RC=1
    python3 tools/oracle_sweep.py tmp/verify_sf1_gate /root/repo/tmp/sf1 300 \
      | tee "$ART/sf1_sweep.log" | tail -3
    S=$?
    cp tmp/verify_sf1_gate/sweep_results.json "$ART/sweep_sf1_results.json"
    [ $S -ne 0 ] && RC=1
  fi
fi

if has_step bench; then
  echo "[round_gate] bench at sf0.1 ..."
  tools/jrun.sh graft.Bench > "$ART/bench_stdout.log" 2>&1
  B=$?
  [ $B -ne 0 ] && RC=1
  if [ -f tmp/bench_result.json ]; then
    # preserve a differing prior artifact instead of clobbering it: a
    # non-authoritative run (e.g. the calibration gate firing on a hot
    # box) is evidence, and the fixed name lost r15's first such catch
    if [ -f "$ART/bench_result.json" ] && \
       ! cmp -s tmp/bench_result.json "$ART/bench_result.json"; then
      mv "$ART/bench_result.json" "$ART/bench_result_$(date +%s).json"
    fi
    cp tmp/bench_result.json "$ART/bench_result.json"
    python3 - "$ART/bench_result.json" <<'EOF'
import json, sys
j = json.load(open(sys.argv[1]))
print(f"[round_gate] bench: median_total={j['headline_median_total']} "
      f"min_total={j['headline_min_total']} "
      f"authoritative={j['authoritative']} "
      f"delta_median={j.get('delta_median_total_pct')}% "
      f"vs {j.get('prev_artifact')}")
EOF
  fi
  echo "[round_gate] bench EXIT=$B (artifact: $ART/bench_result.json)"
fi

echo "[round_gate] DONE rc=$RC (artifacts under $ART)"
exit $RC
