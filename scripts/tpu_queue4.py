"""Round-3 second TPU queue: the sessions that depend on queue-3 outputs.

Runs after launch_queue3.sh finishes (QUEUE3_DONE or its global end):
  3f — split-impulse hardware decision (cost / drift / ckpt compat, ~50'),
  3g — pinned high-stage stepper fine-tune toward the end-stage bar (~80'),
then exits. Same one-process/one-claim + per-script deadline +
skip-if-session_done discipline as tpu_queue3.py.
"""

import json
import os
import re
import runpy
import sys
import time
import traceback

t0 = time.time()
GLOBAL_END = float(os.environ.get("MOCCA_QUEUE_END", t0 + 3.0 * 3600))

import jax

try:
    backend = jax.default_backend()
except Exception:
    traceback.print_exc()
    print("QUEUE4: backend unavailable — exiting for launcher retry", flush=True)
    sys.exit(1)
if backend != "tpu":
    print(f"QUEUE4: backend is {backend!r}, not tpu — exiting", flush=True)
    sys.exit(1)


def deadline_for(script):
    now = time.time()
    if script.endswith("3f_split.py"):
        return min(now + 55 * 60, GLOBAL_END - 3.5 * 3600)
    if script.endswith("3g_highstage.py"):
        return min(now + 85 * 60, GLOBAL_END - 2.6 * 3600)
    if script.endswith("3h_monkey3.py"):
        return min(now + 50 * 60, GLOBAL_END - 1.9 * 3600)
    if script.endswith("3j_decomp.py"):
        return min(now + 40 * 60, GLOBAL_END - 3.2 * 3600)
    if script.endswith("3k_highstage2.py"):
        return min(now + 70 * 60, GLOBAL_END - 1.3 * 3600)
    if script.endswith("3l_orient.py"):
        return min(now + 70 * 60, GLOBAL_END - 5 * 60)
    return GLOBAL_END


def finished(script):
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


for script in ("scripts/tpu_round3f_split.py",
               "scripts/tpu_round3g_highstage.py",
               "scripts/tpu_round3h_monkey3.py",
               "scripts/tpu_round3j_decomp.py",
               "scripts/tpu_round3k_highstage2.py",
               "scripts/tpu_round3l_orient.py",
               "scripts/tpu_round3i_seed2.py"):
    if finished(script):
        print(f"QUEUE4: {script} already finished — skipping", flush=True)
        continue
    dl = deadline_for(script)
    if dl <= time.time():
        print(f"QUEUE4: no time left for {script}", flush=True)
        continue
    os.environ["MOCCA_QUEUE_DEADLINE"] = str(dl)
    print(f"QUEUE4: starting {script} at t={time.time()-t0:.0f}s "
          f"(deadline in {dl-time.time():.0f}s)", flush=True)
    try:
        runpy.run_path(script)
    except SystemExit:
        pass
    except Exception:
        traceback.print_exc()
        print(f"QUEUE4: {script} FAILED — continuing to next", flush=True)
print(f"QUEUE4 DONE in {time.time()-t0:.0f}s", flush=True)
with open("scripts/QUEUE4_DONE", "w") as _f:
    _f.write(str(time.time()))
