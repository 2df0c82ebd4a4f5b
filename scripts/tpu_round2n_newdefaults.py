"""Round-2n TPU session: validate the round-2i default flip in a fresh process.

Round 2i measured the matfree+warm_start@4+reuse_factor combo with explicit
config overrides while the shipped defaults were still block@8; the defaults
were then flipped (utils/config.py) with the CPU gate suite green. This
session re-validates in a process that IMPORTS the new defaults from disk:

  A. Family benches at pure `mocca_envs_tpu.make(id)` defaults (what
     bench.py and any user gets), incl. the b8192/b16384 walker rows.
  B. Fused-kernel vs XLA-oracle agreement ON HARDWARE at the defaults
     (the CPU equivalence tests run the kernel in interpret mode only).
  C. Learning still works under the new solver physics: walker pretrain
     (validated recipe, capped), stepper transfer with the floor schedule,
     CassiePhase tracking — trend rows for BENCH.md.

Appends JSON lines to scripts/tpu_round2n_results.jsonl.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round2n_results.jsonl"
T0 = time.time()


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.utils.config import EngineConfig

# The point of this session: the plain constructor must carry the 2i winner.
_d = EngineConfig()
assert _d.matfree_pgs and _d.warm_start and _d.reuse_factor and _d.solver_iters == 4, _d
emit(phase="defaults_check", ok=True)


def bench_env(env, B=4096, T=50, rounds=3, tag=""):
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, ka = jax.random.split(key)
            a = jax.random.uniform(ka, (B, env.act_dim), minval=-1.0, maxval=1.0)
            tr = jax.vmap(env.step)(state, a)
            return (tr.state, key), ()

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=T)
        return state, key

    key = jax.random.key(1)
    tC = time.perf_counter()
    state, key = rollout(state, key)
    jax.block_until_ready(state.q)
    compile_s = time.perf_counter() - tC
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        state, key = rollout(state, key)
        jax.block_until_ready(state.q)
        best = min(best, time.perf_counter() - t0)
    finite = bool(jnp.all(jnp.isfinite(state.q)))
    emit(phase="bench", tag=tag, batch=B, env_steps_per_s=round(B * T / best),
         compile_s=round(compile_s, 1), finite=finite,
         z_mean=round(float(state.q[:, 2].mean()), 3))
    return B * T / best


# ---------------- A: shipped-default family benches
for env_id, B in [
    ("Walker3DCustomEnv-v0", 4096),
    ("Walker3DCustomEnv-v0", 8192),
    ("Walker3DCustomEnv-v0", 16384),
    ("Walker3DPDCustomEnv-v0", 4096),
    ("Walker3DStepperEnv-v0", 4096),
    ("Walker3DTerrainEnv-v0", 4096),
    ("CassieEnv-v0", 4096),
    ("Monkey3DStepperEnv-v0", 4096),
]:
    try:
        bench_env(mocca_envs_tpu.make(env_id), B=B,
                  tag=f"default_{env_id.removesuffix('-v0')}")
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=f"default_{env_id}", ok=False,
             error=traceback.format_exc()[-300:])

# ---------------- A2: kernel tile-size sweep (matfree freed ~14 MB VMEM;
# larger tiles may amortize launch/pipeline overhead — current_tile() is
# read at env-build time so one process can sweep)
import os

for tile in (512, 1024, 2048, 4096):
    try:
        os.environ["MOCCA_TILE"] = str(tile)
        bench_env(mocca_envs_tpu.make("Walker3DCustomEnv-v0"), B=8192,
                  tag=f"tile{tile}")
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=f"tile{tile}", ok=False,
             error=traceback.format_exc()[-300:])
os.environ["MOCCA_TILE"] = "1024"

# terrain patch-size sweep (extraction einsum is linear in P; P=12 spans
# 3.7 m root-centered — safe for a 1.2 m-reach walker)
for p in (12, 16, 24):
    try:
        os.environ["MOCCA_HF_PATCH"] = str(p)
        bench_env(mocca_envs_tpu.make("Walker3DTerrainEnv-v0"), B=4096,
                  tag=f"terrain_p{p}")
    except Exception:
        traceback.print_exc()
        emit(phase="bench", tag=f"terrain_p{p}", ok=False,
             error=traceback.format_exc()[-300:])
os.environ.pop("MOCCA_HF_PATCH", None)

# extraction micro-bench: the one-hot einsum measured 870 µs at B=4096 in
# 2i — ~150× off roofline. Compare a vmapped contiguous dynamic_slice
# (lowers to gather; TPU gathers are usually slow, but contiguous-row
# slices may not be) and a gather-of-rows formulation.
try:
    B, G, P = 4096, 65, 16
    hf = 0.25 * jax.random.normal(jax.random.key(0), (B, G, G))
    si = jax.random.randint(jax.random.key(1), (B,), 0, G - P)
    sj = jax.random.randint(jax.random.key(2), (B,), 0, G - P)

    def onehot(hf, si, sj):
        rows = (si[:, None, None] + jnp.arange(P)[None, :, None]
                == jnp.arange(G)[None, None, :]).astype(jnp.float32)
        cols = (sj[:, None, None] + jnp.arange(P)[None, :, None]
                == jnp.arange(G)[None, None, :]).astype(jnp.float32)
        return jnp.einsum("bph,bhw,bqw->bpq", rows, hf, cols)

    def dslice(hf, si, sj):
        return jax.vmap(
            lambda h, i, j: jax.lax.dynamic_slice(h, (i, j), (P, P))
        )(hf, si, sj)

    def rowgather(hf, si, sj):
        ri = si[:, None] + jnp.arange(P)[None, :]          # (B,P)
        rows = jnp.take_along_axis(hf, ri[:, :, None], axis=1)  # (B,P,G)
        ci = sj[:, None] + jnp.arange(P)[None, :]
        return jnp.take_along_axis(rows, ci[:, None, :], axis=2)

    ref = None
    for tag, fn in (("extract_onehot", onehot), ("extract_dslice", dslice),
                    ("extract_rowgather", rowgather)):
        f = jax.jit(fn)
        out = f(hf, si, sj); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(50):
            out = f(hf, si, sj)
        jax.block_until_ready(out)
        dt_us = (time.perf_counter() - t0) / 50 * 1e6
        if ref is None:
            ref = out
        err = float(jnp.max(jnp.abs(out - ref)))
        emit(phase="extract_bench", tag=tag, us_per_call=round(dt_us, 1),
             us_per_env=round(dt_us / B, 4), max_err=err)
except Exception:
    traceback.print_exc()
    emit(phase="extract_bench", ok=False, error=traceback.format_exc()[-300:])

# ---------------- B: kernel vs oracle on hardware at the defaults
try:
    B = 1024  # kernel tile multiple
    env_k = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    env_o = mocca_envs_tpu.make(
        "Walker3DCustomEnv-v0", config=EngineConfig(use_pallas=False))
    keys = rng_mod.env_keys(rng_mod.root_key(7), B)
    s_k = jax.jit(jax.vmap(env_k.init))(keys)
    s_o = jax.jit(jax.vmap(env_o.init))(keys)
    a = jax.random.uniform(jax.random.key(9), (B, env_k.act_dim),
                           minval=-1.0, maxval=1.0)
    tr_k = jax.jit(jax.vmap(env_k.step))(s_k, a)
    tr_o = jax.jit(jax.vmap(env_o.step))(s_o, a)
    # Per-env max error, then percentiles over envs: the max over 1024
    # contact-rich envs is dominated by single contact-margin flips (a 1e-7
    # fp difference toggles a row on/off → cm-scale q differences), so the
    # gate is the MEDIAN env (first run measured max 0.039 / median tiny).
    dq_env = jnp.max(jnp.abs(tr_k.state.q - tr_o.state.q), axis=1)
    dq1_med = float(jnp.median(dq_env))
    dq1_p99 = float(jnp.percentile(dq_env, 99))
    dq1 = float(dq_env.max())
    dr1 = float(jnp.max(jnp.abs(tr_k.reward - tr_o.reward)))
    # 20-step drift (chaotic contact dynamics diverge; report, don't gate)
    sk, so = tr_k.state, tr_o.state
    step_k = jax.jit(jax.vmap(env_k.step))
    step_o = jax.jit(jax.vmap(env_o.step))
    key = jax.random.key(11)
    for _ in range(20):
        key, ka = jax.random.split(key)
        a = jax.random.uniform(ka, (B, env_k.act_dim), minval=-1.0, maxval=1.0)
        sk = step_k(sk, a).state
        so = step_o(so, a).state
    dq20 = float(jnp.median(jnp.max(jnp.abs(sk.q - so.q), axis=1)))
    emit(phase="kernel_vs_oracle", max_dq_1step=dq1, med_dq_1step=dq1_med,
         p99_dq_1step=dq1_p99, max_dreward_1step=dr1,
         median_env_dq_20step=dq20, ok=bool(dq1_med < 1e-3))
    assert dq1_med < 1e-3, (dq1_med, dq1_p99, dq1)
except Exception:
    traceback.print_exc()
    emit(phase="kernel_vs_oracle", ok=False, error=traceback.format_exc()[-300:])

# ---------------- C: learning under the new defaults
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.harness.transfer import transfer_train_state
from mocca_envs_tpu.tasks import walker_stepper as ws
from mocca_envs_tpu.tasks.walker_stepper import StepperParams, make_walker3d_stepper

NUM_ENVS = 4096
CFG = PPOConfig(
    horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
    reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.0,
)

# C1: pretrain (validated recipe; done-rate gate relaxed to 1.5% — the 2m
# run plateaued at 1.24% and overshot into a 2.5 m/s sprinter)
pre_state = None
try:
    walker = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    learner = PPOLearner(walker, CFG, num_envs=NUM_ENVS)
    state = learner.init(seed=0)
    mgr = CheckpointManager("/root/repo/ckpt/pretrain_nd", max_to_keep=1)
    start_u = 0
    latest = mgr.latest_step()
    if latest is not None:
        state = mgr.restore(state, latest)
        start_u = latest
        emit(phase="pretrain_nd", resumed_from=latest)
    t0 = time.time()
    u = start_u
    for u in range(start_u, 1500):
        state, metrics = learner.train_step(state)
        if (u + 1) % 50 == 0 or u == start_u:
            jax.block_until_ready(state.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()
                 if not k.startswith("env/")}
            qd = state.env_state.qd
            m["speed"] = round(float(jnp.linalg.norm(qd[:, 0:2], axis=1).mean()), 3)
            m["env_steps_per_s"] = round(
                NUM_ENVS * CFG.horizon * (50 if u > start_u else 1)
                / max(time.time() - t0, 1e-9))
            t0 = time.time()
            emit(phase="pretrain_nd", update=u + 1, **m)
            if (u + 1) % 250 == 0:
                mgr.save(u + 1, state)
                mgr.wait()
            if m["speed"] > 1.2 and m["episode_done_rate"] < 0.015:
                emit(phase="pretrain_nd", update=u + 1, early_stop=True)
                break
    mgr.save(u + 1, state)
    mgr.wait()
    mgr.close()
    pre_state = state
except Exception:
    traceback.print_exc()
    emit(phase="pretrain_nd", ok=False, error=traceback.format_exc()[-300:])

# C2: stepper transfer — the VALIDATED v3 recipe (constant floor −1.0,
# default task params + adv_threshold 8). 2j's floor-scheduled run off the
# 2m sprinter pretrain died (zero stone discovery by u750 while entropy
# annealed away); this is the replacement, checkpointed for queue restarts.
sstate = None
try:
    assert pre_state is not None
    SCFG = dataclasses.replace(CFG, log_std_min=-1.0)
    SP = StepperParams.default().replace(
        adv_threshold=jnp.asarray(8.0, jnp.float32),
    )
    stepper = make_walker3d_stepper(params=SP)
    slearner = PPOLearner(stepper, SCFG, num_envs=NUM_ENVS)
    smgr = CheckpointManager("/root/repo/ckpt/stepper_nd", max_to_keep=2)
    start_u = 0
    latest = smgr.latest_step()
    sstate = slearner.init(seed=1)
    if latest is not None:
        sstate = smgr.restore(sstate, latest)
        start_u = latest
        emit(phase="stepper_nd", resumed_from=latest)
    else:
        sstate = transfer_train_state(pre_state, sstate, reset_log_std=-0.5)
        emit(phase="stepper_nd", transferred=True)
    t0 = time.time()
    u = start_u
    for u in range(start_u, 2500):
        sstate, metrics = slearner.train_step(sstate)
        if (u + 1) % 50 == 0 or u == start_u:
            jax.block_until_ready(sstate.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()
                 if not k.startswith("env/")}
            task = sstate.env_state.task
            m["mean_stage"] = round(float(task.stage.mean()), 3)
            m["max_stage"] = float(task.stage.max())
            m["env_steps_per_s"] = round(
                NUM_ENVS * SCFG.horizon * (50 if u > start_u else 1)
                / max(time.time() - t0, 1e-9))
            t0 = time.time()
            emit(phase="stepper_nd", update=u + 1, **m)
            if (u + 1) % 250 == 0:
                smgr.save(u + 1, sstate)
                smgr.wait()
    smgr.save(u + 1, sstate)
    smgr.wait()
    smgr.close()
except Exception:
    traceback.print_exc()
    emit(phase="stepper_nd", ok=False, error=traceback.format_exc()[-300:])

# C2b: fixed-stage episode-end evals (the honest ALLSTEPS skill statistic —
# the adaptive curriculum self-balances the adaptive-stage number)
try:
    assert sstate is not None
    EVAL_STEPPER = make_walker3d_stepper(
        params=SP.replace(adv_threshold=jnp.asarray(99.0, jnp.float32)))
    net = slearner.net
    for stage in (0, 2, 4):
        for det in (False, True):
            params, norm = sstate.params, sstate.obs_norm
            env_state = ws.set_stage(sstate.env_state, float(stage))
            rc0 = np.asarray(env_state.reset_count).copy()

            @jax.jit
            def step_fn(s, key):
                obs = jax.vmap(EVAL_STEPPER.obs_fn)(s)
                o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8),
                             -10.0, 10.0)
                mean, log_std, _v = net.apply(params, o)
                log_std = jnp.maximum(log_std, -2.0)
                noise = jax.random.normal(key, mean.shape)
                a = mean if det else mean + jnp.exp(log_std) * noise
                pre = s.task.next_step
                tr = jax.vmap(EVAL_STEPPER.step)(s, a)
                return tr.state, tr.done, pre, tr.state.reset_count

            key = jax.random.key(31 + stage)
            done_steps = []
            for _t in range(900):
                key, ka = jax.random.split(key)
                env_state, done, pre, rc = step_fn(env_state, ka)
                d = np.asarray(done) & (np.asarray(rc) > rc0 + 1)
                if d.any():
                    done_steps.append(np.asarray(pre)[d])
            ds = np.concatenate(done_steps) if done_steps else np.zeros(1)
            emit(phase="stepper_nd_eval", stage=stage, deterministic=det,
                 episodes=int(ds.size),
                 ep_end_steps_mean=round(float(ds.mean()), 2),
                 ep_end_steps_p90=float(np.percentile(ds, 90)),
                 frac_ge_4=round(float((ds >= 4).mean()), 3),
                 frac_ge_8=round(float((ds >= 8).mean()), 3))
except Exception:
    traceback.print_exc()
    emit(phase="stepper_nd_eval", ok=False, error=traceback.format_exc()[-300:])

# C3: CassiePhase tracking trend (new Cassie config = 2.78M control-steps/s)
try:
    CCFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                     reward_scale=0.1, log_std_min=-1.0)
    cenv = mocca_envs_tpu.make("CassiePhaseEnv-v0")
    clearner = PPOLearner(cenv, CCFG, num_envs=NUM_ENVS)
    cstate = clearner.init(seed=2)
    t0 = time.time()
    for u in range(150):
        cstate, metrics = clearner.train_step(cstate)
        if (u + 1) % 25 == 0 or u == 0:
            jax.block_until_ready(cstate.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()
                 if k in ("reward_per_step", "episode_done_rate", "entropy")
                 or "track" in k or "clock" in k or "fallen" in k}
            m["env_steps_per_s"] = round(
                NUM_ENVS * CCFG.horizon * (25 if u > 0 else 1)
                / max(time.time() - t0, 1e-9))
            t0 = time.time()
            emit(phase="cassie_nd", update=u + 1, **m)
except Exception:
    traceback.print_exc()
    emit(phase="cassie_nd", ok=False, error=traceback.format_exc()[-300:])

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
print(f"ROUND2N SESSION DONE in {time.time()-T0:.0f}s", flush=True)
