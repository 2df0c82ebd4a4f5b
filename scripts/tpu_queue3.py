"""Round-3 TPU queue: run the session scripts sequentially in ONE process.

One process = one axon claim (claim churn is 5-15 min per process death).
Each script is checkpoint-resumable, so a watchdog restart re-runs cheaply.
Per-script deadlines (MOCCA_QUEUE_DEADLINE, absolute epoch) keep the big
ALLSTEPS session from starving the monkey session; the global end comes
from MOCCA_QUEUE_END (epoch seconds) or defaults to now + 9 h.

Order: 3a (post-change benches + grounded rows, ~45 min, informs
everything) → 3b (ALLSTEPS pipeline ×2 recipes ×2 seeds, the round's
centerpiece) → 3c (monkey swing chains).
"""

import json
import os
import runpy
import sys
import time
import traceback

t0 = time.time()
GLOBAL_END = float(os.environ.get("MOCCA_QUEUE_END", t0 + 9 * 3600))

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


def deadline_for(script):
    now = time.time()
    if script.endswith("3a_bench.py"):
        return min(now + 50 * 60, GLOBAL_END - 3.2 * 3600)
    if script.endswith("3b_allsteps.py"):
        return GLOBAL_END - 1.2 * 3600          # monkey trains fast (1.4M/s)
    if script.endswith("3c_monkey.py") or script.endswith("3e_monkey2.py"):
        return GLOBAL_END - 0.4 * 3600          # leave the cull re-sweep 25'
    return GLOBAL_END


def finished(script):
    """A session that emitted session_done is complete — skip on restart."""
    # results file convention: tpu_round3X_*.py → tpu_round3X_results.jsonl
    import re

    m = re.search(r"tpu_round3([a-z])", script)
    path = f"scripts/tpu_round3{m.group(1)}_results.jsonl" if m else None
    if not path or not os.path.exists(path):
        return False
    with open(path) as f:
        for line in f:
            if '"session_done"' not in line:
                continue
            try:
                d = json.loads(line)
            except Exception:
                continue
            if d.get("ok", True):
                return True
    return False


for script in ("scripts/tpu_round3a_bench.py",
               "scripts/tpu_round3b_allsteps.py",
               "scripts/tpu_round3c_monkey.py",
               "scripts/tpu_round3e_monkey2.py",
               "scripts/tpu_round3d_cullfix.py"):
    if finished(script):
        print(f"QUEUE: {script} already finished — skipping", flush=True)
        continue
    dl = deadline_for(script)
    if dl <= time.time():
        print(f"QUEUE: no time left for {script}", flush=True)
        continue
    os.environ["MOCCA_QUEUE_DEADLINE"] = str(dl)
    print(f"QUEUE: starting {script} at t={time.time()-t0:.0f}s "
          f"(deadline in {dl-time.time():.0f}s)", flush=True)
    try:
        runpy.run_path(script)
    except SystemExit:
        pass
    except Exception:
        traceback.print_exc()
        print(f"QUEUE: {script} FAILED", flush=True)
        sys.exit(1)
print(f"QUEUE DONE in {time.time()-t0:.0f}s", flush=True)
with open("scripts/QUEUE3_DONE", "w") as _f:
    _f.write(str(time.time()))
