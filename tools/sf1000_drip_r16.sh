#!/bin/bash
# Round-16 fourth-decade DRIP (VERDICT r15 #3 + #4): adds to the r15
# selected sf1000 sweep (a) q69's FULL-corpus oracle replay at a raised
# cap — the registry's only non-green sweep row — and (b) the q01/q02/
# q13 full-scan lineitem family the r15 skip list held back.
#
# Stages (same build→sweep→delete discipline as tools/sf1000_sweep.sh;
# each stage assumes the previous one's fixture deletions):
#   docs      build tmp/sf1000/documents.parquet (×10⁴ of sf0.1, 50M
#             docs), run engine q69 UNSAMPLED (knob unset — the banded
#             path at its true scale), then launch the DuckDB replay in
#             the background at a 14400 s cap (r15's 2400 s cap is the
#             row's recorded timeout; docs/ROUND16.md §6 profiles why a
#             CTE rewrite cannot shave the dominant linear fingerprint
#             pass, so the raised cap IS the verdict's chosen path).
#   lineitem  build the 8-column pruned keyed lineitem fixture
#             (q01+q02+q13's exact read set; STRIDE_MULT=30 keeps real
#             keys at 4.5e10 — 13× past the 2⁶³/2654435761 overflow
#             line), run q01/q13 UNSAMPLED (6-row / 1-row outputs) and
#             q02 at mod=100 (unsampled q02 emits ~215.7M rows — past
#             the hash-compare harness's ~13M-row practical ceiling, so
#             q02 joins the decade-pin family; see Relational.scala).
#   merge     wait on the q69 background replay, then merge all lanes
#             into docs/artifacts/r16/sweep_sf1000_results.json.
#
# Usage: tools/sf1000_drip_r16.sh [stage]   stage ∈ {docs,lineitem,merge}
set -uo pipefail
cd "$(dirname "$0")/.."

SF=tmp/sf1000
ART=docs/artifacts/r16
mkdir -p "$ART" tmp
FULL=tmp/verify_sf1000_full    # q69 unsampled + q01/q13 (knob unset)
M100=tmp/verify_sf1000_m100    # q02 at mod=100
Q69_PID_FILE=tmp/sf1000_q69_replay.pid

export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_VERIFY_PARTS=32

STAGE="${1:-all}"
has() { [ "$STAGE" = all ] || [ "$STAGE" = "$1" ]; }

if has docs; then
  echo "[drip16] docs: build fixture (documents only, x10000)"
  SPARK_GRAFT_REPLICATE_NO_SHUFFLE=1 \
    tools/jrun.sh graft.examples.ScaleReplicate /root/testdata/sf0.1 "$SF" \
    10000 documents > tmp/drip16_build_docs.log 2>&1 || exit 1
  df -B1G / | tail -1
  echo "[drip16] docs: engine q69 UNSAMPLED (knob unset)"
  rm -rf "$FULL"
  tools/jrun.sh graft.Verify "$SF" "$FULL" q69_simhash_neardup \
    > tmp/drip16_verify_q69.log 2>&1 || exit 1
  echo "[drip16] docs: q69 oracle replay in background (cap 14400 s)"
  nohup python3 tools/oracle_sweep.py "$FULL" "$SF" 14400 q69_simhash_neardup \
    > tmp/drip16_sweep_q69.log 2>&1 &
  echo "$!" > "$Q69_PID_FILE"
  echo "[drip16] q69 replay pid $(cat $Q69_PID_FILE)"
fi

if has lineitem; then
  echo "[drip16] lineitem: build 8-col pruned keyed fixture (x10000, stride x30)"
  SPARK_GRAFT_REPLICATE_NO_SHUFFLE=1 \
  SPARK_GRAFT_REPLICATE_LINEITEM_KEYED=1 \
  SPARK_GRAFT_REPLICATE_STRIDE_MULT=30 \
  SPARK_GRAFT_REPLICATE_LINEITEM_COLS=l_orderkey,l_linenumber,l_quantity,l_extendedprice,l_discount,l_returnflag,l_linestatus,l_shipdate \
    tools/jrun.sh graft.examples.ScaleReplicate /root/testdata/sf0.1 "$SF" \
    10000 lineitem > tmp/drip16_build_lineitem.log 2>&1 || exit 1
  df -B1G / | tail -1
  echo "[drip16] lineitem: engine q01/q13 UNSAMPLED"
  tools/jrun.sh graft.Verify "$SF" "$FULL" q01_pricing_summary,q13_describe \
    > tmp/drip16_verify_li.log 2>&1 || exit 1
  echo "[drip16] lineitem: engine q02 at mod=100"
  rm -rf "$M100"
  SPARK_GRAFT_SWEEP_SAMPLE_MOD=100 \
    tools/jrun.sh graft.Verify "$SF" "$M100" q02_filter_project \
    > tmp/drip16_verify_q02.log 2>&1 || exit 1
  echo "[drip16] lineitem: oracle sweeps (caps 3600 s)"
  python3 tools/oracle_sweep.py "$FULL" "$SF" 3600 \
    q01_pricing_summary,q13_describe > tmp/drip16_sweep_li.log 2>&1
  tail -3 tmp/drip16_sweep_li.log
  python3 tools/oracle_sweep.py "$M100" "$SF" 3600 q02_filter_project \
    > tmp/drip16_sweep_q02.log 2>&1
  tail -2 tmp/drip16_sweep_q02.log
fi

if has merge; then
  if [ -f "$Q69_PID_FILE" ]; then
    Q69_PID="$(cat "$Q69_PID_FILE")"
    if kill -0 "$Q69_PID" 2>/dev/null; then
      echo "[drip16] merge: waiting on q69 replay (pid $Q69_PID) ..."
      while kill -0 "$Q69_PID" 2>/dev/null; do sleep 30; done
    fi
    rm -f "$Q69_PID_FILE"
  fi
  python3 - <<'PYEOF'
import json, os
art = "docs/artifacts/r16"
out = json.load(open(f"{art}/sweep_sf1000_results.json"))
# Lanes this drip adds on top of the carried-forward r15 rows:
#   verify_sf1000_full  q69 unsampled (supersedes r15's 2400 s timeout
#                       row if green), q01/q13 unsampled
#   verify_sf1000_m100  q02 at mod=100, keyed "@mod100" like r15's
#                       q69/q87 pinned twins
for path, suffix in [
        ("tmp/verify_sf1000_full/sweep_results.json", ""),
        ("tmp/verify_sf1000_m100/sweep_results.json", "@mod100")]:
    if os.path.exists(path):
        for k, v in json.load(open(path)).items():
            key = k + suffix
            # a raised-cap retry supersedes a recorded timeout row
            if v.get("status") == "ok" or out.get(key, {}).get("status") != "ok":
                out[key] = v
with open(f"{art}/sweep_sf1000_results.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
ok = sum(1 for v in out.values() if v.get("status") == "ok")
print(f"[drip16] merged: {ok} ok of {len(out)} -> {art}/sweep_sf1000_results.json")
for k, v in sorted(out.items()):
    print(f"  {k:30s} {v.get('status'):8s} {v.get('secs')}s rows={v.get('rows')}")
PYEOF
fi
