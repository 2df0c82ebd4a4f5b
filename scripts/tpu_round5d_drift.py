"""Round-5d TPU probe: kernel-vs-oracle drift at HORIZON scale (VERDICT
r4 weak #5 / next-round #6).

4f2 established the per-control-step baseline (median |dq| 3.65e-3, p99
6.2e-2, Mosaic-vs-XLA arithmetic, resynced each step). This closes the
gap to the parity machinery: run the SHIPPED kernel config and the XLA
oracle side by side over a 600-step seeded rollout WITHOUT resync —
accumulated divergence — and score the per-step median-over-envs error
against harness/parity.ToleranceGate's growing envelope
(atol * growth^t), exactly what a future PyBullet recording will be
scored with. Per the verify-skill rule, the gated statistic is the
per-env MEDIAN (single contact-margin flips give cm-scale outliers in
the max).

Outputs per arm (random-action and zero-action walker):
  - first_crossing: first t where median |dq| exceeds the shipped
    envelope (None = stayed inside all 600 steps)
  - q_atol_needed: the smallest q_atol that would contain the median
    curve at growth=1.02 (the gate constant the BENCH.md paragraph
    records / tunes)
  - p99 variants of both.

JSONL -> scripts/tpu_round5d_results.jsonl.
Ref: BASELINE "contact-solver tolerance gates"; SURVEY §7.4.
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

OUT = "scripts/tpu_round5d_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 0.4 * 3600))

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


def time_left():
    return DEADLINE - time.time()


import mocca_envs_tpu  # noqa: F401
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.harness.parity import ToleranceGate
from mocca_envs_tpu.tasks.walker_custom import make_walker3d_custom
from mocca_envs_tpu.utils.config import EngineConfig

B = 1024          # minimum fused-kernel batch
STEPS = 600
GATE = ToleranceGate()   # shipped constants: q_atol=1e-3, growth=1.02


def drift_arm(tag, action_mode):
    envs = {
        path: make_walker3d_custom(
            config=EngineConfig(use_pallas=use),   # shipped solver_iters
            name=f"Drift5d{path}",
        )
        for path, use in (("kernel", True), ("oracle", False))
    }
    keys = rng_mod.env_keys(rng_mod.root_key(11), B)
    states = {p: jax.jit(jax.vmap(e.init))(keys) for p, e in envs.items()}
    # step_no_reset: drift accumulation must not be masked by auto-reset
    # re-synchronizing fallen envs onto identical fresh states
    steppers = {
        p: jax.jit(jax.vmap(e.step_no_reset)) for p, e in envs.items()
    }
    act_dim = envs["kernel"].act_dim
    key = jax.random.key(13)

    med = np.zeros(STEPS)
    p99 = np.zeros(STEPS)
    for t in range(STEPS):
        if t % 50 == 0:
            beat()
            if time_left() < 90:
                emit(phase="arm_truncated", arm=tag, at_step=t)
                med, p99 = med[:t], p99[:t]
                break
        key, ka = jax.random.split(key)
        if action_mode == "random":
            a = jax.random.uniform(
                ka, (B, act_dim), minval=-1.0, maxval=1.0
            )
        else:
            a = jnp.zeros((B, act_dim))
        for p in states:
            states[p] = steppers[p](states[p], a).state
        dq = np.abs(
            np.asarray(states["kernel"].q) - np.asarray(states["oracle"].q)
        ).max(axis=1)
        med[t] = float(np.median(dq))
        p99[t] = float(np.percentile(dq, 99))

    n = med.shape[0]
    ts = np.arange(n)
    env_med = GATE.q_atol * GATE.growth ** ts
    cross = np.nonzero(med > env_med)[0]
    first_crossing = int(cross[0]) if cross.size else None
    # smallest atol containing each curve at shipped growth
    atol_med = float(np.max(med / GATE.growth ** ts)) if n else None
    atol_p99 = float(np.max(p99 / GATE.growth ** ts)) if n else None
    emit(
        phase="drift_horizon", arm=tag, steps=n, batch=B,
        gate_q_atol=GATE.q_atol, gate_growth=GATE.growth,
        first_crossing_median=first_crossing,
        inside_frac_median=round(float((med <= env_med).mean()), 4),
        q_atol_needed_median=atol_med, q_atol_needed_p99=atol_p99,
        med_at_1=float(med[0]) if n else None,
        med_at_100=float(med[99]) if n > 99 else None,
        med_at_300=float(med[299]) if n > 299 else None,
        med_final=float(med[-1]) if n else None,
        p99_final=float(p99[-1]) if n else None,
    )
    # full curves for the BENCH.md plot/paragraph (decimated ×10)
    emit(phase="drift_curve", arm=tag,
         med=[round(float(v), 6) for v in med[::10]],
         p99=[round(float(v), 6) for v in p99[::10]])


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))
    for tag, mode in (("random", "random"), ("zero", "zero")):
        if time_left() < 180:
            emit(phase="arm_skipped", arm=tag, reason="deadline")
            continue
        try:
            drift_arm(tag, mode)
        except Exception:
            traceback.print_exc()
            FAILED.append(tag)
            emit(phase="arm_failed", arm=tag,
                 error=traceback.format_exc()[-300:])
    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
