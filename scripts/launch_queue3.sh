#!/bin/bash
# Round-3 watchdog launcher: restart the queue on exit and on hard stalls
# (no results-file write for 25 min while the process lives). The global
# end time is fixed at FIRST launch so restarts don't extend the budget.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_queue3.log
if [ -z "$MOCCA_QUEUE_END" ]; then
  export MOCCA_QUEUE_END=$(( $(date +%s) + ${MOCCA_QUEUE_HOURS:-9} * 3600 ))
fi
echo "QUEUE3 global end: $MOCCA_QUEUE_END ($(date -d @$MOCCA_QUEUE_END))" >> $LOG
for i in $(seq 1 40); do
  if [ "$(date +%s)" -ge "$MOCCA_QUEUE_END" ]; then
    echo "QUEUE3: past global end — stopping $(date)" >> $LOG; exit 0
  fi
  echo "QUEUE3 launch attempt $i $(date)" >> $LOG
  python scripts/tpu_queue3.py >> $LOG 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 120
    NOW=$(date +%s)
    NEWEST=0
    for f in scripts/tpu_round3*_results.jsonl; do
      [ -f "$f" ] && M=$(stat -c %Y "$f") && [ "$M" -gt "$NEWEST" ] && NEWEST=$M
    done
    AGE=$((NOW-NEWEST)); ALIVE=$((NOW-START))
    if [ $ALIVE -gt 1200 ] && [ $AGE -gt 900 ]; then
      echo "WATCHDOG: stall (alive=${ALIVE}s, results age=${AGE}s) — killing $PID $(date)" >> $LOG
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
  if [ -f scripts/QUEUE3_DONE ]; then echo "ALL DONE $(date)" >> $LOG; exit 0; fi
  sleep 90
done
