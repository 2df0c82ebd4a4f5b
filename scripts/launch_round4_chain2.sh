#!/bin/bash
# Round-4 chain, part 2: after the seed-2 orient pipeline finishes,
# run the 4c stage-5/6 frontier-dwell session (continues from seed-1's
# hs checkpoint; attacks the stage-5 consistency gap against the >=8
# bar). Retries on the post-exit TPU-claim wedge seen twice this round.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_chain4b.log
echo "CHAIN4B start $(date)" >> $LOG

END_WAIT=$(( $(date +%s) + 5 * 3600 ))
while [ ! -f scripts/QUEUE5_DONE_s2 ]; do
  if [ "$(date +%s)" -ge "$END_WAIT" ]; then
    echo "CHAIN4B: seed-2 never finished — running 4c anyway $(date)" >> $LOG
    break
  fi
  sleep 60
done
echo "CHAIN4B: proceeding to 4c $(date)" >> $LOG
sleep 180   # claim release

for i in 1 2 3 4; do
  echo "CHAIN4B: 4c attempt $i $(date)" >> $LOG
  MOCCA_QUEUE_DEADLINE=$(( $(date +%s) + 105 * 60 )) \
    timeout 7000 python scripts/tpu_round4c_frontier.py >> $LOG 2>&1 &
  PID=$!
  # wedge watchdog: no results-file/heartbeat movement for 12 min while
  # alive kills the attempt (the claim-wedge signature is total silence)
  START=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    NOW=$(date +%s); NEWEST=0
    [ -f scripts/tpu_round4c_results.jsonl ] && NEWEST=$(stat -c %Y scripts/tpu_round4c_results.jsonl)
    if [ -f scripts/tpu_queue_heartbeat ]; then
      HBT=$(stat -c %Y scripts/tpu_queue_heartbeat)
      [ "$HBT" -gt "$NEWEST" ] && NEWEST=$HBT
    fi
    AGE=$((NOW-NEWEST)); ALIVE=$((NOW-START))
    if [ $ALIVE -gt 720 ] && [ $AGE -gt 720 ]; then
      echo "CHAIN4B: wedge/stall (alive=${ALIVE}s age=${AGE}s) — kill $PID $(date)" >> $LOG
      kill $PID 2>/dev/null
      break
    fi
  done
  wait $PID 2>/dev/null
  if grep -q '"session_done".*"ok": true' scripts/tpu_round4c_results.jsonl 2>/dev/null; then
    echo "CHAIN4B: 4c done $(date)" >> $LOG
    touch scripts/CHAIN4B_DONE
    exit 0
  fi
  sleep 240
done
echo "CHAIN4B: exhausted retries $(date)" >> $LOG
