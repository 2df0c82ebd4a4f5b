"""Run the round-2 TPU session scripts sequentially in ONE process.

One process = one axon claim for the whole queue (claim churn is 5-15 min
per process death — memory: batch all TPU work). Each script is
independently resumable (checkpoint-backed), so a watchdog restart of this
queue re-runs cheaply. Order: 2i (option-matrix benches, ~45 min, highest
information) → 2h (finish cont2 + evals + config-5 row + monkey rebalance)
→ 2j (ALLSTEPS v4 floor-scheduled long run).
"""

import runpy
import sys
import time
import traceback

t0 = time.time()

# Probe the backend ONCE up front: if the axon service is down this blocks
# ~25 min then raises — exit nonzero so the launcher retries the whole
# queue instead of burning a 25-min wait per script.
import jax

try:
    backend = jax.default_backend()
except Exception:
    traceback.print_exc()
    print("QUEUE: backend unavailable — exiting for launcher retry", flush=True)
    sys.exit(1)
if backend != "tpu":
    print(f"QUEUE: backend is {backend!r}, not tpu — exiting", flush=True)
    sys.exit(1)

# 2i (option matrix) and 2m (pretrain3 regen) completed earlier this round.
# 2j was ABANDONED: its floor schedule annealed exploration away before the
# 2m sprinter pretrain discovered any stone (u750: steps_reached 1.0,
# entropy 3.5 and dropping) — 2n replaces it with a better-gated pretrain
# and the validated constant-floor recipe under the new solver defaults.
# 2h's phase A (cont2 resume) will no-op on the missing checkpoint and fall
# through to its independent config-5 and monkey phases.
# 2o/2p (bench polish + b4096 fixed-cost decomposition) moved ahead of the
# remaining learning runs: they inform the driver-headline bench directly.
for script in ("scripts/tpu_round2n_newdefaults.py",
               "scripts/tpu_round2o_polish.py",
               "scripts/tpu_round2p_overhead.py",
               "scripts/tpu_round2h.py",
               "scripts/tpu_round2k.py",
               "scripts/tpu_round2q_steppercont.py"):
    print(f"QUEUE: starting {script} at t={time.time()-t0:.0f}s", flush=True)
    try:
        runpy.run_path(script)
    except Exception:
        traceback.print_exc()
        print(f"QUEUE: {script} FAILED", flush=True)
        # a dead backend mid-run poisons the process — bail for a fresh one
        sys.exit(1)
print(f"QUEUE DONE in {time.time()-t0:.0f}s", flush=True)
