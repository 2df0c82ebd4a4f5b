#!/bin/bash
# Round-3m watchdog launcher: the orient-obs ALLSTEPS pipeline.
# Fresh container — no other queue holds the TPU claim. Same stall
# watchdog as queue 3/4: kill (exact PID only) when the results file is
# >15 min old while the process has lived >20 min; global end pinned at
# first launch via MOCCA_QUEUE_END so a restart cannot extend the claim
# past the round's bench window.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_queue5.log
RES=scripts/tpu_round3m_results.jsonl
if [ -z "$MOCCA_QUEUE_END" ]; then
  export MOCCA_QUEUE_END=$(( $(date +%s) + ${MOCCA_QUEUE_HOURS:-4} * 3600 ))
fi
echo "QUEUE5 global end: $MOCCA_QUEUE_END ($(date -d @$MOCCA_QUEUE_END))" >> $LOG

for i in $(seq 1 20); do
  if [ "$(date +%s)" -ge "$MOCCA_QUEUE_END" ]; then
    echo "QUEUE5: past global end — stopping $(date)" >> $LOG; exit 0
  fi
  if grep -q '"session_done".*"ok": true' $RES 2>/dev/null; then
    echo "QUEUE5: session already done $(date)" >> $LOG
    touch scripts/QUEUE5_DONE; exit 0
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
    touch scripts/QUEUE5_DONE; exit 0
  fi
  sleep 90
done
