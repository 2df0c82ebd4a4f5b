"""Round-5b TPU session: monkey brachiation seed-2 at the FULL schedule
(VERDICT r4 next-round #3 — the two-seed brachiation row).

Round 3 solved brachiation at seed 1 (ep-end 14.65 of 15 bars at the
hardest spacing stage, p50 = full chain) but that receipt was never
committed; the only replication attempt (4i) ran at 61% budget and was
negative — the spacing curriculum climbs late and nonlinearly, and the
compressed run cut that off. This runs the identical first-class
pipeline (harness/brachiation.py) at seed 2 with the FULL 2200+700
schedule and a FRESH checkpoint root (the stale compressed-run ckpt in
ckpt/r4i_brach/s2 carries a PHASE_DONE marker that would short-circuit
the main phase). JSONL -> scripts/tpu_round5b_results.jsonl, committed
with its BENCH.md row per the round-5 receipts discipline.

Ref: mocca_envs/robots.py::Monkey3D, SURVEY.md §2.2 B8 (reconstruction
cites — reference mount empty all rounds).
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round5b_results.jsonl"
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
    emit(phase="session_start", deadline_in_s=round(time_left()),
         schedule="full 2200+700")
    cfg = BrachiationConfig(seed=2, ckpt_root="/root/repo/ckpt/r5b_brach")
    try:
        out = run_brachiation(
            cfg, RunHooks(emit=emit, beat=beat, time_left=time_left)
        )
        ok = bool(out.get("main_finished")) and bool(out.get("ft_finished"))
        if ok and out.get("evals"):
            with open("scripts/R5B_DONE", "w") as f:
                f.write(json.dumps(out.get("evals")))
        emit(phase="session_done",
             ok=ok, evals=out.get("evals"),
             wall_s=round(time.time() - T0, 1))
    except Exception:
        traceback.print_exc()
        emit(phase="session_done", ok=False,
             error=traceback.format_exc()[-300:],
             wall_s=round(time.time() - T0, 1))


main()
