#!/bin/bash
# Retry launcher: the axon TPU claim frees 5-15 min after the previous
# process dies; the session script asserts backend==tpu and exits fast
# if the claim is still held. Retry until it sticks.
cd /root/repo
for i in $(seq 1 30); do
  echo "launch attempt $i $(date)" >> scripts/tpu_round2h.log
  python scripts/tpu_round2h.py >> scripts/tpu_round2h.log 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then echo "DONE rc=0 $(date)" >> scripts/tpu_round2h.log; exit 0; fi
  # failed (claim held or crash) — if it ran >10 min treat as real crash and stop
  echo "attempt $i rc=$rc $(date)" >> scripts/tpu_round2h.log
  sleep 90
done
