#!/bin/bash
# Round-4 chain, part 7: after chain6 (4h end-stage #2)
# finishes, run the 4i monkey seed-2 pipeline. Same wedge watchdog.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_chain4g.log
echo "CHAIN4G start $(date)" >> $LOG

END_WAIT=$(( $(date +%s) + 4 * 3600 ))
while [ ! -f scripts/CHAIN4F_DONE ]; do
  if [ "$(date +%s)" -ge "$END_WAIT" ]; then
    echo "CHAIN4G: chain3 never finished — running 4i anyway $(date)" >> $LOG
    break
  fi
  sleep 60
done
echo "CHAIN4G: proceeding to 4i $(date)" >> $LOG
sleep 240   # claim release

for i in 1 2 3; do
  echo "CHAIN4G: 4i attempt $i $(date)" >> $LOG
  MOCCA_QUEUE_DEADLINE=$(( $(date +%s) + 115 * 60 )) \
    timeout 7500 python scripts/tpu_round4i_monkey_s2.py >> $LOG 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    NOW=$(date +%s); NEWEST=0
    [ -f scripts/tpu_round4i_results.jsonl ] && NEWEST=$(stat -c %Y scripts/tpu_round4i_results.jsonl)
    if [ -f scripts/tpu_queue_heartbeat ]; then
      HBT=$(stat -c %Y scripts/tpu_queue_heartbeat)
      [ "$HBT" -gt "$NEWEST" ] && NEWEST=$HBT
    fi
    AGE=$((NOW-NEWEST)); ALIVE=$((NOW-START))
    if [ $ALIVE -gt 720 ] && [ $AGE -gt 720 ]; then
      echo "CHAIN4G: wedge/stall (alive=${ALIVE}s age=${AGE}s) — kill $PID $(date)" >> $LOG
      kill $PID 2>/dev/null
      break
    fi
  done
  wait $PID 2>/dev/null
  if grep -q '"session_done".*"ok": true' scripts/tpu_round4i_results.jsonl 2>/dev/null; then
    echo "CHAIN4G: 4i done $(date)" >> $LOG
    touch scripts/CHAIN4G_DONE
    exit 0
  fi
  sleep 240
done
echo "CHAIN4G: exhausted retries $(date)" >> $LOG
