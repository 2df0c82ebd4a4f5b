#!/bin/bash
# Round-5 TPU queue (the FINAL round's hardware plan, VERDICT r4 "Next
# round" #1/#3/#5/#6/#7):
#   5a  end-stage assault #3 (near-miss + sub-stage pins) — relaunch
#       loop until scripts/R5A_DONE (each phase is ckpt-resumable)
#   5b  monkey brachiation seed-2, FULL 2200+700 schedule — relaunch
#       loop until scripts/R5B_DONE
#   5c  Child3D targeted learning session
#   5d  kernel-vs-oracle drift at horizon scale (parity replay gates)
#   4j  capacity ladder (512,512) — ONLY if 5a left stage-8 < 8
#   5e  roofline: double-buffered BlockSpecs bench
# Sequential — ONE JAX process at a time (axon claim wedge, ROADMAP.md
# infra notes). Each stage runs under `timeout` with a per-stage
# MOCCA_QUEUE_DEADLINE so in-script guards truncate before the hard
# kill. Whole queue self-terminates by GLOBAL_DEADLINE so the driver's
# round-end bench.py finds the chip free.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
T0=$(date +%s)
GLOBAL_BUDGET=${GLOBAL_BUDGET:-23400}   # 6.5 h default
GLOBAL_DEADLINE=$((T0 + GLOBAL_BUDGET))
LOG=scripts/round5b_queue.log

left() { echo $((GLOBAL_DEADLINE - $(date +%s))); }

run_stage() {
  local name=$1 script=$2 budget=$3
  local l
  l=$(left)
  if [ "$l" -lt 120 ]; then
    echo "QUEUE skip $name: ${l}s left" >>"$LOG"
    return
  fi
  if [ ! -f "$script" ]; then
    echo "QUEUE skip $name: $script missing" >>"$LOG"
    return
  fi
  if [ "$budget" -gt "$l" ]; then budget=$l; fi
  echo "QUEUE start $name budget=${budget}s $(date -u +%T)" >>"$LOG"
  MOCCA_QUEUE_DEADLINE=$(($(date +%s) + budget - 60)) \
    timeout -k 30 "$budget" python "$script" >>"$LOG" 2>&1
  echo "QUEUE done $name rc=$? $(date -u +%T)" >>"$LOG"
}

echo "QUEUE begin $(date -u +%T) global_budget=${GLOBAL_BUDGET}s" >"$LOG"

# --- 5a: end-stage assault, relaunch until done (cap ~3.3h) ---
SPENT5A_CAP=$((T0 + 12000))
while [ ! -f scripts/R5A_DONE ] && [ "$(date +%s)" -lt "$SPENT5A_CAP" ] \
      && [ "$(left)" -gt 1500 ]; do
  run_stage 5a scripts/tpu_round5a_endstage3.py 7200
done

# --- 5b: monkey seed-2 full schedule, relaunch until done ---
SPENT5B_CAP=$(($(date +%s) + 9000))
while [ ! -f scripts/R5B_DONE ] && [ "$(date +%s)" -lt "$SPENT5B_CAP" ] \
      && [ "$(left)" -gt 900 ]; do
  run_stage 5b scripts/tpu_round5b_monkey_s2.py 6000
done

# --- 5c: Child3D real result ---
run_stage 5c scripts/tpu_round5c_child3d.py 2400

# --- 5d: kernel-vs-oracle drift at horizon scale ---
run_stage 5d scripts/tpu_round5d_drift.py 1500

# --- 4j: capacity ladder, only if the stage-8 bar is still unmet ---
if python - <<'EOF'
import json, sys
best = 0.0
try:
    for line in open("scripts/tpu_round5a_results.jsonl"):
        r = json.loads(line)
        if r.get("phase") == "eval" and r.get("stage") == 8 \
           and r.get("ep_end_steps_mean") is not None:
            best = max(best, r["ep_end_steps_mean"])
except FileNotFoundError:
    pass
sys.exit(0 if best < 8.0 else 1)   # rc 0 -> run 4j
EOF
then
  run_stage 4j scripts/tpu_round4j_capacity.py 3600
else
  echo "QUEUE skip 4j: stage-8 bar met by 5a" >>"$LOG"
fi

# --- 5e: roofline double-buffer bench ---
run_stage 5e scripts/tpu_round5e_roofline.py 1200

echo "QUEUE end $(date -u +%T)" >>"$LOG"
