"""Round-4i TPU session: monkey brachiation seed-2 (VERDICT r2 weak #8 —
the last single-seed headline row).

Round 3 solved brachiation at seed 1 (ep-end 14.65 of 15 bars at the
hardest spacing stage, p50 = full chain). This runs the identical
first-class pipeline (harness/brachiation.py) at seed 2 for the two-seed
table. JSONL → scripts/tpu_round4i_results.jsonl.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round4i_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 2.0 * 3600))


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    kw["seed"] = 2
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def beat():
    with open(HEARTBEAT, "a"):
        os.utime(HEARTBEAT)


def time_left():
    return DEADLINE - time.time()


import mocca_envs_tpu  # noqa: F401
from mocca_envs_tpu.harness.allsteps import RunHooks
from mocca_envs_tpu.harness.brachiation import (
    BrachiationConfig,
    run_brachiation,
)


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))
    # FULL schedule. The round-4 continuation ran this compressed
    # (1500+500) to fit a 30-min window and got a NEGATIVE: curriculum
    # never climbed, ep-end 2.99 bars adaptive / 1.96 @stage 9 (BENCH.md
    # "continuation session") — the spacing-curriculum climb happens in
    # the late updates this cut off. Round 5: run with >=1 h budget.
    cfg = BrachiationConfig(seed=2, ckpt_root="/root/repo/ckpt/r4i_brach")
    try:
        out = run_brachiation(
            cfg, RunHooks(emit=emit, beat=beat, time_left=time_left)
        )
        emit(phase="session_done",
             ok=bool(out.get("main_finished")), evals=out.get("evals"),
             wall_s=round(time.time() - T0, 1))
    except Exception:
        traceback.print_exc()
        emit(phase="session_done", ok=False,
             error=traceback.format_exc()[-300:],
             wall_s=round(time.time() - T0, 1))


main()
