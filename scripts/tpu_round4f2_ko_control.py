"""Round-4f2 TPU probe: kernel-vs-oracle drift CONTROL rows.

4f measured the fused-kernel vs XLA-oracle single-control-step drift at
solver_iters=3 (median |Δq| 3.6e-3) but not the shipped iters=4 control,
so the number lacked a baseline. This 5-minute probe runs the identical
measurement at iters=4 (shipped) and re-runs iters=3, giving BENCH.md
the on-hardware drift of the SHIPPED config — a number the repo has not
recorded before (CPU equivalence tests run the kernel in interpret
mode, which shares arithmetic with the oracle; hardware Mosaic does
not). JSONL → scripts/tpu_round4f2_results.jsonl.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round4f2_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()

FAILED = []


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def beat():
    with open(HEARTBEAT, "a"):
        os.utime(HEARTBEAT)


import mocca_envs_tpu  # noqa: F401
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.tasks.walker_custom import make_walker3d_custom
from mocca_envs_tpu.utils.config import EngineConfig


def kernel_oracle(iters, B=1024, steps=20):
    envs = {
        path: make_walker3d_custom(
            config=EngineConfig(solver_iters=iters, use_pallas=use),
            name=f"KO2{iters}{path}",
        )
        for path, use in (("kernel", True), ("oracle", False))
    }
    keys = rng_mod.env_keys(rng_mod.root_key(3), B)
    states = {p: jax.jit(jax.vmap(e.init))(keys) for p, e in envs.items()}
    steppers = {p: jax.jit(jax.vmap(e.step)) for p, e in envs.items()}
    key = jax.random.key(5)
    meds, p99s = [], []
    for _ in range(steps):
        beat()
        key, ka = jax.random.split(key)
        a = jax.random.uniform(
            ka, (B, envs["kernel"].act_dim), minval=-1.0, maxval=1.0
        )
        for p in states:
            states[p] = steppers[p](states[p], a).state
        dq = np.abs(
            np.asarray(states["kernel"].q) - np.asarray(states["oracle"].q)
        ).max(axis=1)
        meds.append(float(np.median(dq)))
        p99s.append(float(np.percentile(dq, 99)))
        states["oracle"] = states["kernel"]  # one-step drift, not chaos
    emit(phase="kernel_oracle", iters=iters, batch=B, steps=steps,
         max_median_dq=max(meds), mean_median_dq=round(
             float(np.mean(meds)), 8),
         max_p99_dq=max(p99s))


def main():
    emit(phase="session_start")
    for iters in (4, 3):
        try:
            kernel_oracle(iters)
        except Exception:
            traceback.print_exc()
            FAILED.append(f"ko{iters}")
            emit(phase=f"ko{iters}", ok=False,
                 error=traceback.format_exc()[-300:])
    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
