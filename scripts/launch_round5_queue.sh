#!/bin/bash
# Round-5 TPU queue: 4f2 drift-control probe -> 4i monkey seed-2
# (compressed) -> 4k every-family-learns sweep. Sequential — ONE JAX
# process at a time (axon claim wedge, see ROADMAP.md infra notes).
#
# Each stage runs under `timeout` with a per-stage MOCCA_QUEUE_DEADLINE
# so the in-script guards truncate gracefully before the hard kill.
# The whole queue self-terminates by GLOBAL_DEADLINE so the driver's
# round-end bench.py never finds the chip claimed.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
T0=$(date +%s)
GLOBAL_BUDGET=${GLOBAL_BUDGET:-2640}   # 44 min default
GLOBAL_DEADLINE=$((T0 + GLOBAL_BUDGET))
LOG=scripts/round5_queue.log

run_stage() {
  local name=$1 script=$2 budget=$3
  local now left
  now=$(date +%s)
  left=$((GLOBAL_DEADLINE - now))
  if [ "$left" -lt 120 ]; then
    echo "QUEUE skip $name: ${left}s left" >>"$LOG"
    return
  fi
  if [ "$budget" -gt "$left" ]; then budget=$left; fi
  echo "QUEUE start $name budget=${budget}s $(date -u +%T)" >>"$LOG"
  MOCCA_QUEUE_DEADLINE=$(($(date +%s) + budget - 60)) \
    timeout -k 30 "$budget" python "$script" >>"$LOG" 2>&1
  echo "QUEUE done $name rc=$? $(date -u +%T)" >>"$LOG"
}

echo "QUEUE begin $(date -u +%T) global_budget=${GLOBAL_BUDGET}s" >"$LOG"
run_stage 4f2 scripts/tpu_round4f2_ko_control.py 480
run_stage 4i  scripts/tpu_round4i_monkey_s2.py  1900
run_stage 4k  scripts/tpu_round4k_family_sweep.py 3600
echo "QUEUE end $(date -u +%T)" >>"$LOG"
