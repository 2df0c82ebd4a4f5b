#!/bin/bash
# Round-4 chain, part 3: 4d progressive frontier push (stages 6->9,
# seed-1 lineage) then 4e seed-2 frontier replication. Same wedge
# watchdog as chain2: the TPU claim can wedge a fresh process into
# silent backend-init hangs after a previous process exits.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_chain4c.log
echo "CHAIN4C start $(date)" >> $LOG

run_leg () {  # $1 tag, $2 script, $3 results file, $4 minutes, $5 attempts
  local TAG=$1 SCRIPT=$2 RES=$3 MIN=$4 TRIES=$5
  for i in $(seq 1 "$TRIES"); do
    echo "CHAIN4C: $TAG attempt $i $(date)" >> $LOG
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
        echo "CHAIN4C: $TAG wedge/stall (alive=${ALIVE}s age=${AGE}s) — kill $PID $(date)" >> $LOG
        kill $PID 2>/dev/null
        break
      fi
    done
    wait $PID 2>/dev/null
    if grep -q '"session_done".*"ok": true' "$RES" 2>/dev/null; then
      echo "CHAIN4C: $TAG done $(date)" >> $LOG
      return 0
    fi
    sleep 240   # claim release before retry
  done
  echo "CHAIN4C: $TAG exhausted retries $(date)" >> $LOG
  return 1
}

run_leg 4d scripts/tpu_round4d_push.py scripts/tpu_round4d_results.jsonl 180 4
sleep 240
run_leg 4e scripts/tpu_round4e_s2frontier.py scripts/tpu_round4e_results.jsonl 110 3
touch scripts/CHAIN4C_DONE
echo "CHAIN4C end $(date)" >> $LOG
