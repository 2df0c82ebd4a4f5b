#!/bin/bash
# Round-4 TPU chain: after the seed-1 orient pipeline finishes,
#   1. run the 3j train-cost decomposition (the rows lost when round 3's
#      container recycled — locates the stepper's 2.8 s/update vs the
#      walker's 0.37 s/update inside the SAME learner),
#   2. launch the seed-2 orient pipeline (VERDICT r2 weak #8: two seeds
#      on the headline ALLSTEPS row).
# One JAX process at a time on this box; a dead process frees the TPU
# claim after 5-15 min, so each stage retries on failure with a backoff.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
LOG=scripts/tpu_chain4.log
echo "CHAIN4 start $(date)" >> $LOG

# -- stage 0: wait for seed-1 (give up after 6 h — something is wrong then)
END_WAIT=$(( $(date +%s) + 6 * 3600 ))
while [ ! -f scripts/QUEUE5_DONE_s1 ]; do
  if [ "$(date +%s)" -ge "$END_WAIT" ]; then
    echo "CHAIN4: seed-1 never finished — aborting $(date)" >> $LOG
    exit 1
  fi
  sleep 60
done
echo "CHAIN4: seed-1 done $(date)" >> $LOG
sleep 120   # let the claim release

# -- stage 1: 3j decomposition (bounded: 40 min deadline inside the script)
for i in 1 2 3; do
  echo "CHAIN4: decomp attempt $i $(date)" >> $LOG
  MOCCA_QUEUE_DEADLINE=$(( $(date +%s) + 40 * 60 )) \
    timeout 3000 python scripts/tpu_round3j_decomp.py >> $LOG 2>&1
  RC=$?
  if [ $RC -eq 0 ]; then break; fi
  echo "CHAIN4: decomp rc=$RC — retry after claim release" >> $LOG
  sleep 300
done
sleep 120

# -- stage 2: seed-2 pipeline (its own watchdog loop; 4 h window)
echo "CHAIN4: launching seed-2 $(date)" >> $LOG
MOCCA_QUEUE_HOURS=4 MOCCA_SEED=2 bash scripts/launch_queue5.sh
echo "CHAIN4: done $(date)" >> $LOG
