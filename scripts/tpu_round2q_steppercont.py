"""Round-2q TPU session: push stepper skill past the 2n plateau.

The 2n run (new solver defaults, validated v3 recipe) climbed the per-env
curriculum to mean stage 5.8 / max 8 by u2500 but fixed-stage skill was
stage-0 deterministic ep-end mean 4.62 (frac>=8 0.143) — far from the
roadmap target (stage-2 deterministic mean >= 8). Two known levers, both
validated in 2f/2b but never applied ON TOP of the 2n run:

  A. Continue ckpt/stepper_nd @2500 for 1500 updates with the
     STONE-DOMINATED reward (step_bonus 18, tall 1.0 — the 2f recipe that
     stops the tall-bonus stream from outcompeting risky stone hits) at
     floor −1.0 → ckpt/stepper_nd_cont.
  B. Fine-tune 500 updates at floor −2.0 (anneal exploration once the
     stone-seeking behavior is locked in; the 2c pipeline showed this
     lifts reward without the standing collapse WHEN the reward is
     stone-dominated) → ckpt/stepper_nd_ft.
  C. Fixed-stage evals (stage 0/2/4 × stoch/det) after A and after B —
     the honest ALLSTEPS statistic.

Resumable: A and B restore their own checkpoint dirs first, so a watchdog
restart skips finished work. Appends to scripts/tpu_round2q_results.jsonl.
"""

from __future__ import annotations

import json
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round2q_results.jsonl"
T0 = time.time()


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu  # noqa: F401  (registry side effects)
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.tasks import walker_stepper as ws
from mocca_envs_tpu.tasks.walker_stepper import StepperParams, make_walker3d_stepper

NUM_ENVS = 4096
SP = StepperParams.default().replace(adv_threshold=jnp.asarray(8.0, jnp.float32))
CONT_SP = SP.replace(
    step_bonus=jnp.asarray(18.0, jnp.float32),
    walker=SP.walker.replace(tall_bonus=jnp.asarray(1.0, jnp.float32)),
)
# matches 2n's SCFG (mirror_coef default, log_std_min −1.0) so the restored
# train state sees the same optimizer/net shapes
CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.0)
FT_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                   reward_scale=0.1, mirror_coef=4.0, log_std_min=-2.0)

CONT_LEARNER = PPOLearner(
    make_walker3d_stepper(params=CONT_SP), CFG, num_envs=NUM_ENVS
)
FT_LEARNER = PPOLearner(
    make_walker3d_stepper(params=CONT_SP), FT_CFG, num_envs=NUM_ENVS
)
EVAL_STEPPER = make_walker3d_stepper(
    params=SP.replace(adv_threshold=jnp.asarray(99.0, jnp.float32))
)


def eval_fixed_stage(state, stage, tag, deterministic=False, steps=900):
    """Pin every env to ``stage``; count only episodes begun after the pin."""
    params, norm = state.params, state.obs_norm
    net = CONT_LEARNER.net
    env_state = ws.set_stage(state.env_state, float(stage))
    rc0 = np.asarray(env_state.reset_count).copy()

    @jax.jit
    def step_fn(s, key):
        obs = jax.vmap(EVAL_STEPPER.obs_fn)(s)
        o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10.0, 10.0)
        mean, log_std, _v = net.apply(params, o)
        log_std = jnp.maximum(log_std, -2.0)
        noise = jax.random.normal(key, mean.shape)
        a = mean if deterministic else mean + jnp.exp(log_std) * noise
        pre = s.task.next_step
        tr = jax.vmap(EVAL_STEPPER.step)(s, a)
        return tr.state, tr.done, pre, tr.state.reset_count

    key = jax.random.key(97 + stage)
    done_steps = []
    for _t in range(steps):
        key, ka = jax.random.split(key)
        env_state, done, pre, rc = step_fn(env_state, ka)
        d = np.asarray(done) & (np.asarray(rc) > rc0 + 1)
        if d.any():
            done_steps.append(np.asarray(pre)[d])
    ds = np.concatenate(done_steps) if done_steps else np.zeros(1)
    emit(
        phase=tag, stage=stage, deterministic=deterministic,
        episodes=int(ds.size),
        ep_end_steps_mean=round(float(ds.mean()), 2),
        ep_end_steps_p50=float(np.percentile(ds, 50)),
        ep_end_steps_p90=float(np.percentile(ds, 90)),
        frac_ge_4=round(float((ds >= 4).mean()), 3),
        frac_ge_8=round(float((ds >= 8).mean()), 3),
    )


def train_phase(learner, src_mgr_dir, dst_mgr_dir, n_updates, tag):
    """Resume dst if it has progress, else seed from the latest of src."""
    dst = CheckpointManager(dst_mgr_dir, max_to_keep=2)
    state = learner.init(seed=1)
    start = dst.latest_step()
    if start is not None:
        state = dst.restore(state, start)
        emit(phase=tag, resumed_from=start)
    else:
        src = CheckpointManager(src_mgr_dir, max_to_keep=2)
        base = src.latest_step()
        assert base is not None, f"{src_mgr_dir} checkpoint missing"
        state = src.restore(state, base)
        start = 0
        emit(phase=tag, seeded_from=f"{src_mgr_dir}@{base}")
    t0 = time.time()
    u = start
    for u in range(start, n_updates):
        state, metrics = learner.train_step(state)
        if (u + 1) % 50 == 0 or u == start:
            jax.block_until_ready(state.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()
                 if not k.startswith("env/")}
            task = state.env_state.task
            m["mean_stage"] = round(float(task.stage.mean()), 3)
            m["max_stage"] = float(task.stage.max())
            m["env_steps_per_s"] = round(
                NUM_ENVS * CFG.horizon * (50 if u > start else 1)
                / max(time.time() - t0, 1e-9))
            t0 = time.time()
            emit(phase=tag, update=u + 1, **m)
        if (u + 1) % 250 == 0:
            dst.save(u + 1, state)
            dst.wait()
    dst.save(max(u + 1, start), state)
    dst.wait()
    dst.close()
    return state


# ---------------- A: stone-dominated continuation
cstate = None
try:
    cstate = train_phase(
        CONT_LEARNER, "/root/repo/ckpt/stepper_nd",
        "/root/repo/ckpt/stepper_nd_cont", 1500, "cont_q")
except Exception:
    traceback.print_exc()
    emit(phase="cont_q", ok=False, error=traceback.format_exc()[-300:])

if cstate is not None:
    for stg in (0, 2, 4):
        for det in (False, True):
            try:
                eval_fixed_stage(cstate, stg, "eval_q_cont", deterministic=det)
            except Exception:
                traceback.print_exc()
                emit(phase="eval_q_cont", stage=stg, ok=False)

# ---------------- B: floor −2.0 fine-tune
fstate = None
try:
    fstate = train_phase(
        FT_LEARNER, "/root/repo/ckpt/stepper_nd_cont",
        "/root/repo/ckpt/stepper_nd_ft", 500, "ft_q")
except Exception:
    traceback.print_exc()
    emit(phase="ft_q", ok=False, error=traceback.format_exc()[-300:])

if fstate is not None:
    for stg in (0, 2, 4):
        for det in (False, True):
            try:
                eval_fixed_stage(fstate, stg, "eval_q_ft", deterministic=det)
            except Exception:
                traceback.print_exc()
                emit(phase="eval_q_ft", stage=stg, ok=False)

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
