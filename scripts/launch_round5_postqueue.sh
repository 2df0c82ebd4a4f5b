#!/bin/bash
# Round-5 post-queue TPU work, launched after launch_round5b_queue.sh
# self-terminates:
#   4j  capacity ladder (512,512) relaunch — the in-queue attempt was
#       killed by the stall watchdog at 480 s during its first
#       (512,512)+b4096 compile (>8 min of legitimate silence). Here
#       STALL_S=900 and the budget is sized so the pipeline completes
#       and the frontier dwell truncates gracefully at the in-script
#       deadline (evals are labeled frontier_finished=false).
#   5f  monkey seed follow-up: seed-2 main extended to 4500 u + fresh
#       annealed ft; seed-3 fresh at the true 3e schedule (2500+800).
# Self-terminates by GLOBAL_DEADLINE so the driver's bench finds the
# chip free.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
T0=$(date +%s)
GLOBAL_BUDGET=${GLOBAL_BUDGET:-13200}   # 3h40m default
GLOBAL_DEADLINE=$((T0 + GLOBAL_BUDGET))
LOG=scripts/round5_postqueue.log
HB=scripts/tpu_queue_heartbeat
STALL_S=${STALL_S:-900}

left() { echo $((GLOBAL_DEADLINE - $(date +%s))); }
mtime() { stat -c %Y "$1" 2>/dev/null || echo 0; }

run_stage() {
  local name=$1 script=$2 budget=$3 results=$4
  local l start pid now hb rs newest
  l=$(left)
  if [ "$l" -lt 300 ]; then
    echo "PQ skip $name: ${l}s left" >>"$LOG"
    return 1
  fi
  if [ "$budget" -gt "$l" ]; then budget=$l; fi
  start=$(date +%s)
  echo "PQ start $name budget=${budget}s $(date -u +%T)" >>"$LOG"
  MOCCA_QUEUE_DEADLINE=$((start + budget - 60)) \
    timeout -k 30 "$budget" python "$script" >>"$LOG" 2>&1 &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    hb=$(mtime "$HB"); rs=$(mtime "$results")
    newest=$start
    [ "$hb" -gt "$newest" ] && newest=$hb
    [ "$rs" -gt "$newest" ] && newest=$rs
    if [ $((now - newest)) -gt "$STALL_S" ]; then
      echo "PQ watchdog kill $name: no progress ${STALL_S}s" >>"$LOG"
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  echo "PQ done $name rc=$? $(date -u +%T)" >>"$LOG"
}

echo "PQ begin $(date -u +%T) global_budget=${GLOBAL_BUDGET}s" >"$LOG"

# 4j first (VERDICT priority #1's capacity fallback), with a retry for
# a genuine early wedge (no results-file growth at all)
N0=$(wc -l <scripts/tpu_round4j_results.jsonl 2>/dev/null || echo 0)
for _ in 1 2; do
  if [ -f scripts/tpu_round4j_results.jsonl ] && \
     tail -n +$((N0 + 1)) scripts/tpu_round4j_results.jsonl \
       | grep -q '"phase": "session_done"'; then break; fi
  run_stage 4j scripts/tpu_round4j_capacity.py 6600 \
    scripts/tpu_round4j_results.jsonl || break
done

# 5f monkey follow-up
N0F=$(wc -l <scripts/tpu_round5f_results.jsonl 2>/dev/null || echo 0)
for _ in 1 2; do
  if [ -f scripts/tpu_round5f_results.jsonl ] && \
     tail -n +$((N0F + 1)) scripts/tpu_round5f_results.jsonl \
       | grep -q '"phase": "session_done"'; then break; fi
  run_stage 5f scripts/tpu_round5f_monkey_followup.py 4800 \
    scripts/tpu_round5f_results.jsonl || break
done

# 5e roofline retry if the in-queue attempts were watchdog-killed
# during their long first compiles (no session_done in the file yet)
# 5e2 only runs arms missing a bench row, and gates equivalence at
# the real kernel batch (the 5e check at B=1024 could not engage tiles
# >1024)
if ! python -c "
import json,sys
n=0
for l in open('scripts/tpu_round5e_results.jsonl'):
    r=json.loads(l)
    if r.get('phase')=='bench' and 'env_steps_per_s' in r: n+=1
sys.exit(0 if n>=6 else 1)" 2>/dev/null; then
  run_stage 5e2 scripts/tpu_round5e2_roofline.py 1800 \
    scripts/tpu_round5e_results.jsonl
fi

echo "PQ end $(date -u +%T)" >>"$LOG"
