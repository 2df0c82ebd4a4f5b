#!/bin/bash
# Round-4a watchdog launcher: the orient-obs ALLSTEPS pipeline.
# Same stall watchdog as queue 3/4 — kill (exact PID only) on stall;
# global end pinned at first launch via MOCCA_QUEUE_END so a restart
# cannot extend the claim past the round's bench window.
#
# Advisor r3 #5 fix: the pipeline touches scripts/tpu_queue_heartbeat
# every training update (and during evals/bench), and the watchdog keys
# on the NEWEST of {results file, heartbeat} — a healthy run paying a
# long jit compile between 50-update emit points is no longer killed.
#
# MOCCA_SEED (default 1) selects the pipeline seed; results and the done
# sentinel are per-seed so a seed-2 session can follow seed-1.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
SEED=${MOCCA_SEED:-1}
export MOCCA_SEED=$SEED
LOG=scripts/tpu_queue5_s${SEED}.log
RES=scripts/tpu_round4a_s${SEED}_results.jsonl
HB=scripts/tpu_queue_heartbeat
DONE_SENTINEL=scripts/QUEUE5_DONE_s${SEED}
if [ -z "$MOCCA_QUEUE_END" ]; then
  export MOCCA_QUEUE_END=$(( $(date +%s) + ${MOCCA_QUEUE_HOURS:-4} * 3600 ))
fi
echo "QUEUE5 seed $SEED global end: $MOCCA_QUEUE_END ($(date -d @$MOCCA_QUEUE_END))" >> $LOG

for i in $(seq 1 20); do
  if [ "$(date +%s)" -ge "$MOCCA_QUEUE_END" ]; then
    echo "QUEUE5: past global end — stopping $(date)" >> $LOG; exit 0
  fi
  if grep -q '"session_done".*"ok": true' $RES 2>/dev/null; then
    echo "QUEUE5: session already done $(date)" >> $LOG
    touch $DONE_SENTINEL; exit 0
  fi
  echo "QUEUE5 launch attempt $i $(date)" >> $LOG
  MOCCA_QUEUE_DEADLINE=$(( MOCCA_QUEUE_END - 300 )) \
    python scripts/tpu_round3m_orient_pipeline.py >> $LOG 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 120
    NOW=$(date +%s)
    NEWEST=0
    [ -f "$RES" ] && NEWEST=$(stat -c %Y "$RES")
    if [ -f "$HB" ]; then
      HBT=$(stat -c %Y "$HB")
      [ "$HBT" -gt "$NEWEST" ] && NEWEST=$HBT
    fi
    AGE=$((NOW-NEWEST)); ALIVE=$((NOW-START))
    if [ $ALIVE -gt 1200 ] && [ $AGE -gt 900 ]; then
      echo "WATCHDOG: stall (alive=${ALIVE}s, age=${AGE}s) — killing $PID $(date)" >> $LOG
      kill $PID 2>/dev/null; sleep 10; kill -9 $PID 2>/dev/null
      break
    fi
    if [ $NOW -ge $MOCCA_QUEUE_END ]; then
      echo "WATCHDOG: global end reached — killing $PID $(date)" >> $LOG
      kill $PID 2>/dev/null; sleep 10; kill -9 $PID 2>/dev/null
      exit 0
    fi
  done
  wait $PID 2>/dev/null
  if grep -q '"session_done".*"ok": true' $RES 2>/dev/null; then
    echo "QUEUE5: ALL DONE $(date)" >> $LOG
    touch $DONE_SENTINEL; exit 0
  fi
  sleep 90
done
