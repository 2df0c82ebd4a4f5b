#!/bin/bash
# Round-4 chain, part 6: after chain5 (4g mixed+terrain)
# finishes, run the 4h end-stage assault #2. Same wedge watchdog.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_chain4f.log
echo "CHAIN4F start $(date)" >> $LOG

END_WAIT=$(( $(date +%s) + 4 * 3600 ))
while [ ! -f scripts/CHAIN4E_DONE ]; do
  if [ "$(date +%s)" -ge "$END_WAIT" ]; then
    echo "CHAIN4F: chain3 never finished — running 4h anyway $(date)" >> $LOG
    break
  fi
  sleep 60
done
echo "CHAIN4F: proceeding to 4h $(date)" >> $LOG
sleep 240   # claim release

for i in 1 2 3; do
  echo "CHAIN4F: 4h attempt $i $(date)" >> $LOG
  MOCCA_QUEUE_DEADLINE=$(( $(date +%s) + 150 * 60 )) \
    timeout 9600 python scripts/tpu_round4h_endstage2.py >> $LOG 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    NOW=$(date +%s); NEWEST=0
    [ -f scripts/tpu_round4h_results.jsonl ] && NEWEST=$(stat -c %Y scripts/tpu_round4h_results.jsonl)
    if [ -f scripts/tpu_queue_heartbeat ]; then
      HBT=$(stat -c %Y scripts/tpu_queue_heartbeat)
      [ "$HBT" -gt "$NEWEST" ] && NEWEST=$HBT
    fi
    AGE=$((NOW-NEWEST)); ALIVE=$((NOW-START))
    if [ $ALIVE -gt 720 ] && [ $AGE -gt 720 ]; then
      echo "CHAIN4F: wedge/stall (alive=${ALIVE}s age=${AGE}s) — kill $PID $(date)" >> $LOG
      kill $PID 2>/dev/null
      break
    fi
  done
  wait $PID 2>/dev/null
  if grep -q '"session_done".*"ok": true' scripts/tpu_round4h_results.jsonl 2>/dev/null; then
    echo "CHAIN4F: 4h done $(date)" >> $LOG
    touch scripts/CHAIN4F_DONE
    exit 0
  fi
  sleep 240
done
echo "CHAIN4F: exhausted retries $(date)" >> $LOG
