#!/bin/bash
# Round-4 chain, part 5: after chain4 (4f perf matrix)
# finishes, run the 4g mixed-suite + terrain-transfer session. Same wedge watchdog.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_chain4e.log
echo "CHAIN4E start $(date)" >> $LOG

END_WAIT=$(( $(date +%s) + 4 * 3600 ))
while [ ! -f scripts/CHAIN4D_DONE ]; do
  if [ "$(date +%s)" -ge "$END_WAIT" ]; then
    echo "CHAIN4E: chain3 never finished — running 4g anyway $(date)" >> $LOG
    break
  fi
  sleep 60
done
echo "CHAIN4E: proceeding to 4g $(date)" >> $LOG
sleep 240   # claim release

for i in 1 2 3; do
  echo "CHAIN4E: 4g attempt $i $(date)" >> $LOG
  MOCCA_QUEUE_DEADLINE=$(( $(date +%s) + 110 * 60 )) \
    timeout 7200 python scripts/tpu_round4g_mixed_terrain.py >> $LOG 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    NOW=$(date +%s); NEWEST=0
    [ -f scripts/tpu_round4g_results.jsonl ] && NEWEST=$(stat -c %Y scripts/tpu_round4g_results.jsonl)
    if [ -f scripts/tpu_queue_heartbeat ]; then
      HBT=$(stat -c %Y scripts/tpu_queue_heartbeat)
      [ "$HBT" -gt "$NEWEST" ] && NEWEST=$HBT
    fi
    AGE=$((NOW-NEWEST)); ALIVE=$((NOW-START))
    if [ $ALIVE -gt 720 ] && [ $AGE -gt 720 ]; then
      echo "CHAIN4E: wedge/stall (alive=${ALIVE}s age=${AGE}s) — kill $PID $(date)" >> $LOG
      kill $PID 2>/dev/null
      break
    fi
  done
  wait $PID 2>/dev/null
  if grep -q '"session_done".*"ok": true' scripts/tpu_round4g_results.jsonl 2>/dev/null; then
    echo "CHAIN4E: 4g done $(date)" >> $LOG
    touch scripts/CHAIN4E_DONE
    exit 0
  fi
  sleep 240
done
echo "CHAIN4E: exhausted retries $(date)" >> $LOG
