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
#
# Sequential — ONE JAX process at a time (axon claim wedge, ROADMAP.md
# infra notes). Each stage runs under `timeout` with a per-stage
# MOCCA_QUEUE_DEADLINE so in-script guards truncate before the hard
# kill, AND under a stall watchdog: the documented claim-wedge failure
# mode is a process that blocks forever at its first device op with ~0%
# CPU after printing only the axon warning — the watchdog kills the
# stage when neither the heartbeat file nor its results JSONL has
# advanced for STALL_S, and the per-stage retry loop relaunches it
# (2-3 kill+retry cycles over ~20 min is the observed recovery).
# Whole queue self-terminates by GLOBAL_DEADLINE so the driver's
# round-end bench.py finds the chip free.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
T0=$(date +%s)
GLOBAL_BUDGET=${GLOBAL_BUDGET:-23400}   # 6.5 h default
GLOBAL_DEADLINE=$((T0 + GLOBAL_BUDGET))
LOG=scripts/round5b_queue.log
HB=scripts/tpu_queue_heartbeat
STALL_S=480

left() { echo $((GLOBAL_DEADLINE - $(date +%s))); }

mtime() { stat -c %Y "$1" 2>/dev/null || echo 0; }

run_stage() {
  # run_stage <name> <script> <budget_s> <results_jsonl>
  local name=$1 script=$2 budget=$3 results=$4
  local l start pid now hb rs newest
  l=$(left)
  if [ "$l" -lt 120 ]; then
    echo "QUEUE skip $name: ${l}s left" >>"$LOG"
    return 1
  fi
  if [ ! -f "$script" ]; then
    echo "QUEUE skip $name: $script missing" >>"$LOG"
    return 1
  fi
  if [ "$budget" -gt "$l" ]; then budget=$l; fi
  start=$(date +%s)
  echo "QUEUE start $name budget=${budget}s $(date -u +%T)" >>"$LOG"
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
      echo "QUEUE watchdog kill $name: no progress ${STALL_S}s (wedge)" \
        >>"$LOG"
      kill "$pid" 2>/dev/null
      sleep 10
      kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  echo "QUEUE done $name rc=$? $(date -u +%T)" >>"$LOG"
}

echo "QUEUE begin $(date -u +%T) global_budget=${GLOBAL_BUDGET}s" >"$LOG"

# --- 5a: end-stage assault, relaunch until done (cap ~3.3h) ---
CAP5A=$((T0 + 12000))
while [ ! -f scripts/R5A_DONE ] && [ "$(date +%s)" -lt "$CAP5A" ] \
      && [ "$(left)" -gt 1500 ]; do
  run_stage 5a scripts/tpu_round5a_endstage3.py 7200 \
    scripts/tpu_round5a_results.jsonl
done

# --- 5b: monkey seed-2 full schedule, relaunch until done ---
CAP5B=$(($(date +%s) + 9000))
while [ ! -f scripts/R5B_DONE ] && [ "$(date +%s)" -lt "$CAP5B" ] \
      && [ "$(left)" -gt 900 ]; do
  run_stage 5b scripts/tpu_round5b_monkey_s2.py 6000 \
    scripts/tpu_round5b_results.jsonl
done

# --- 5c: Child3D real result (retry wedges up to 3×) ---
N0C=$(wc -l <scripts/tpu_round5c_results.jsonl 2>/dev/null || echo 0)
for _ in 1 2 3; do
  if [ -f scripts/tpu_round5c_results.jsonl ] && \
     tail -n +$((N0C + 1)) scripts/tpu_round5c_results.jsonl \
       | grep -q '"phase": "session_done"'; then break; fi
  run_stage 5c scripts/tpu_round5c_child3d.py 2400 \
    scripts/tpu_round5c_results.jsonl || break
done

# --- 5d: kernel-vs-oracle drift at horizon scale ---
N0D=$(wc -l <scripts/tpu_round5d_results.jsonl 2>/dev/null || echo 0)
for _ in 1 2 3; do
  if [ -f scripts/tpu_round5d_results.jsonl ] && \
     tail -n +$((N0D + 1)) scripts/tpu_round5d_results.jsonl \
       | grep -q '"phase": "session_done"'; then break; fi
  run_stage 5d scripts/tpu_round5d_drift.py 1500 \
    scripts/tpu_round5d_results.jsonl || break
done

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
  run_stage 4j scripts/tpu_round4j_capacity.py 3600 \
    scripts/tpu_round4j_results.jsonl
else
  echo "QUEUE skip 4j: stage-8 bar met by 5a" >>"$LOG"
fi

# --- 5e: roofline double-buffer bench ---
N0E=$(wc -l <scripts/tpu_round5e_results.jsonl 2>/dev/null || echo 0)
for _ in 1 2; do
  if [ -f scripts/tpu_round5e_results.jsonl ] && \
     tail -n +$((N0E + 1)) scripts/tpu_round5e_results.jsonl \
       | grep -q '"phase": "session_done"'; then break; fi
  run_stage 5e scripts/tpu_round5e_roofline.py 1200 \
    scripts/tpu_round5e_results.jsonl || break
done

echo "QUEUE end $(date -u +%T)" >>"$LOG"
