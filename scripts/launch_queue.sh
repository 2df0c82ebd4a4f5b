#!/bin/bash
# Watchdog launcher for the TPU queue: restart on exit (backend-unavailable
# waits ~25 min then fails) and on hard stalls (no results-file write for
# 25 min while the process lives — the 2f-style axon tunnel freeze).
cd /root/repo
# Package is not pip-installed in a fresh workspace; `python scripts/x.py`
# puts scripts/ (not the repo root) on sys.path. PREPEND: the inherited
# PYTHONPATH carries /root/.axon_site, which registers the axon TPU plugin.
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_queue.log
for i in $(seq 1 40); do
  echo "QUEUE launch attempt $i $(date)" >> $LOG
  python scripts/tpu_queue.py >> $LOG 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 120
    NOW=$(date +%s)
    NEWEST=0
    for f in scripts/tpu_round2*_results.jsonl; do
      [ -f "$f" ] && M=$(stat -c %Y "$f") && [ "$M" -gt "$NEWEST" ] && NEWEST=$M
    done
    AGE=$((NOW-NEWEST)); ALIVE=$((NOW-START))
    if [ $ALIVE -gt 2100 ] && [ $AGE -gt 1500 ]; then
      echo "WATCHDOG: stall (alive=${ALIVE}s, results age=${AGE}s) — killing $PID $(date)" >> $LOG
      kill $PID 2>/dev/null; sleep 10; kill -9 $PID 2>/dev/null
      break
    fi
  done
  wait $PID 2>/dev/null
  if grep -q "QUEUE DONE" $LOG; then echo "ALL DONE $(date)" >> $LOG; exit 0; fi
  sleep 90
done
