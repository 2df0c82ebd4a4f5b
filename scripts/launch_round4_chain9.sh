#!/bin/bash
# Round-4 chain, part 9: after chain8 (4f2 probe + bench.py confirmation)
# fully finishes, run 4j (capacity experiment) then 4k (family sweep).
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_chain4i.log
echo "CHAIN4I start $(date)" >> $LOG

END_WAIT=$(( $(date +%s) + 5 * 3600 ))
while ! grep -q 'bench.py confirmation appended' scripts/tpu_chain4h.log 2>/dev/null; do
  if [ "$(date +%s)" -ge "$END_WAIT" ]; then
    echo "CHAIN4I: chain8 never finished — proceeding anyway $(date)" >> $LOG
    break
  fi
  sleep 60
done
echo "CHAIN4I: proceeding $(date)" >> $LOG
sleep 240   # claim release

run_leg () {  # $1 tag, $2 script, $3 results file, $4 minutes, $5 attempts
  local TAG=$1 SCRIPT=$2 RES=$3 MIN=$4 TRIES=$5
  for i in $(seq 1 "$TRIES"); do
    echo "CHAIN4I: $TAG attempt $i $(date)" >> $LOG
    MOCCA_QUEUE_DEADLINE=$(( $(date +%s) + MIN * 60 )) \
      timeout $(( MIN * 60 + 600 )) python "$SCRIPT" >> $LOG 2>&1 &
    local PID=$!
    local START=$(date +%s)
    while kill -0 $PID 2>/dev/null; do
      sleep 60
      local NOW=$(date +%s) NEWEST=0
      [ -f "$RES" ] && NEWEST=$(stat -c %Y "$RES")
      if [ -f scripts/tpu_queue_heartbeat ]; then
        local HBT=$(stat -c %Y scripts/tpu_queue_heartbeat)
        [ "$HBT" -gt "$NEWEST" ] && NEWEST=$HBT
      fi
      local AGE=$((NOW-NEWEST)) ALIVE=$((NOW-START))
      if [ $ALIVE -gt 720 ] && [ $AGE -gt 720 ]; then
        echo "CHAIN4I: $TAG wedge/stall (alive=${ALIVE}s age=${AGE}s) — kill $PID $(date)" >> $LOG
        kill $PID 2>/dev/null
        break
      fi
    done
    wait $PID 2>/dev/null
    if grep -q '"session_done".*"ok": true' "$RES" 2>/dev/null; then
      echo "CHAIN4I: $TAG done $(date)" >> $LOG
      return 0
    fi
    sleep 240
  done
  echo "CHAIN4I: $TAG exhausted retries $(date)" >> $LOG
  return 1
}

run_leg 4j scripts/tpu_round4j_capacity.py scripts/tpu_round4j_results.jsonl 150 3
sleep 240
run_leg 4k scripts/tpu_round4k_family_sweep.py scripts/tpu_round4k_results.jsonl 90 2
touch scripts/CHAIN4I_DONE
echo "CHAIN4I end $(date)" >> $LOG
