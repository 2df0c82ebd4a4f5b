#!/bin/bash
# Round-4 chain, part 8: after chain7 (4i monkey seed-2)
# finishes, run the 4f2 kernel-oracle control probe, then a bench.py confirmation. Same wedge watchdog.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_chain4h.log
echo "CHAIN4H start $(date)" >> $LOG

END_WAIT=$(( $(date +%s) + 4 * 3600 ))
while [ ! -f scripts/CHAIN4G_DONE ]; do
  if [ "$(date +%s)" -ge "$END_WAIT" ]; then
    echo "CHAIN4H: chain3 never finished — running 4f2 anyway $(date)" >> $LOG
    break
  fi
  sleep 60
done
echo "CHAIN4H: proceeding to 4f2 $(date)" >> $LOG
sleep 240   # claim release

for i in 1 2 3; do
  echo "CHAIN4H: 4f2 attempt $i $(date)" >> $LOG
  MOCCA_QUEUE_DEADLINE=$(( $(date +%s) + 30 * 60 )) \
    timeout 2400 python scripts/tpu_round4f2_ko_control.py >> $LOG 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    NOW=$(date +%s); NEWEST=0
    [ -f scripts/tpu_round4f2_results.jsonl ] && NEWEST=$(stat -c %Y scripts/tpu_round4f2_results.jsonl)
    if [ -f scripts/tpu_queue_heartbeat ]; then
      HBT=$(stat -c %Y scripts/tpu_queue_heartbeat)
      [ "$HBT" -gt "$NEWEST" ] && NEWEST=$HBT
    fi
    AGE=$((NOW-NEWEST)); ALIVE=$((NOW-START))
    if [ $ALIVE -gt 720 ] && [ $AGE -gt 720 ]; then
      echo "CHAIN4H: wedge/stall (alive=${ALIVE}s age=${AGE}s) — kill $PID $(date)" >> $LOG
      kill $PID 2>/dev/null
      break
    fi
  done
  wait $PID 2>/dev/null
  if grep -q '"session_done".*"ok": true' scripts/tpu_round4f2_results.jsonl 2>/dev/null; then
    echo "CHAIN4H: 4f2 done $(date)" >> $LOG
    touch scripts/CHAIN4H_DONE
    break
  fi
  sleep 240
done
echo "CHAIN4H: exhausted retries $(date)" >> $LOG

# final headline confirmation with the driver's own contract
sleep 240
timeout 900 python bench.py >> scripts/tpu_chain4h.log 2>&1
echo "CHAIN4H: bench.py confirmation appended $(date)" >> scripts/tpu_chain4h.log
