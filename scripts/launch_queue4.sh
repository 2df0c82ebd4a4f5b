#!/bin/bash
# Round-3 queue-4 watchdog launcher (3f split-impulse + 3g high-stage ft).
# Waits for queue 3 to release the TPU claim (QUEUE3_DONE or its global
# end), then runs tpu_queue4.py under the same stall watchdog as queue 3:
# kill when the newest results file is >15 min old while the process has
# lived >20 min. Global end pinned at FIRST launch via MOCCA_QUEUE_END.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_queue4.log
if [ -z "$MOCCA_QUEUE_END" ]; then
  export MOCCA_QUEUE_END=$(( $(date +%s) + ${MOCCA_QUEUE_HOURS:-4} * 3600 ))
fi
echo "QUEUE4 global end: $MOCCA_QUEUE_END ($(date -d @$MOCCA_QUEUE_END))" >> $LOG

# wait for queue 3 (claim release takes 5-15 min after its process dies)
while [ ! -f scripts/QUEUE3_DONE ]; do
  if ! pgrep -f tpu_queue3.py > /dev/null 2>&1; then
    echo "QUEUE4: queue3 process gone without DONE marker $(date)" >> $LOG
    break
  fi
  sleep 60
done
echo "QUEUE4: queue3 finished, waiting 60s for claim release $(date)" >> $LOG
sleep 60

for i in $(seq 1 20); do
  if [ "$(date +%s)" -ge "$MOCCA_QUEUE_END" ]; then
    echo "QUEUE4: past global end — stopping $(date)" >> $LOG; exit 0
  fi
  echo "QUEUE4 launch attempt $i $(date)" >> $LOG
  python scripts/tpu_queue4.py >> $LOG 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 120
    NOW=$(date +%s)
    NEWEST=0
    for f in scripts/tpu_round3[fghijk]_results.jsonl; do
      [ -f "$f" ] && M=$(stat -c %Y "$f") && [ "$M" -gt "$NEWEST" ] && NEWEST=$M
    done
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
  if [ -f scripts/QUEUE4_DONE ]; then echo "ALL DONE $(date)" >> $LOG; exit 0; fi
  sleep 90
done
