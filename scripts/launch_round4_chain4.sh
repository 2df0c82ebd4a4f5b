#!/bin/bash
# Round-4 chain, part 4: after chain3 (4d push + 4e seed-2 frontier)
# finishes, run the 4f solver-sweep perf matrix. Same wedge watchdog.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_chain4d.log
echo "CHAIN4D start $(date)" >> $LOG

END_WAIT=$(( $(date +%s) + 4 * 3600 ))
while [ ! -f scripts/CHAIN4C_DONE ]; do
  if [ "$(date +%s)" -ge "$END_WAIT" ]; then
    echo "CHAIN4D: chain3 never finished — running 4f anyway $(date)" >> $LOG
    break
  fi
  sleep 60
done
echo "CHAIN4D: proceeding to 4f $(date)" >> $LOG
sleep 240   # claim release

for i in 1 2 3; do
  echo "CHAIN4D: 4f attempt $i $(date)" >> $LOG
  MOCCA_QUEUE_DEADLINE=$(( $(date +%s) + 80 * 60 )) \
    timeout 5400 python scripts/tpu_round4f_perf.py >> $LOG 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    NOW=$(date +%s); NEWEST=0
    [ -f scripts/tpu_round4f_results.jsonl ] && NEWEST=$(stat -c %Y scripts/tpu_round4f_results.jsonl)
    if [ -f scripts/tpu_queue_heartbeat ]; then
      HBT=$(stat -c %Y scripts/tpu_queue_heartbeat)
      [ "$HBT" -gt "$NEWEST" ] && NEWEST=$HBT
    fi
    AGE=$((NOW-NEWEST)); ALIVE=$((NOW-START))
    if [ $ALIVE -gt 720 ] && [ $AGE -gt 720 ]; then
      echo "CHAIN4D: wedge/stall (alive=${ALIVE}s age=${AGE}s) — kill $PID $(date)" >> $LOG
      kill $PID 2>/dev/null
      break
    fi
  done
  wait $PID 2>/dev/null
  if grep -q '"session_done".*"ok": true' scripts/tpu_round4f_results.jsonl 2>/dev/null; then
    echo "CHAIN4D: 4f done $(date)" >> $LOG
    touch scripts/CHAIN4D_DONE
    exit 0
  fi
  sleep 240
done
echo "CHAIN4D: exhausted retries $(date)" >> $LOG
