"""Round-2f TPU session: fixed-stage stepper evals + continuation-2 + config-5 row.

Motivation: under the per-env ADAPTIVE curriculum, episode-end stones hover
near the advance threshold BY CONSTRUCTION (envs that clear a stage advance
to a harder one, pulling their episode-end mean back down), so the training
logs understate skill. The honest metric is performance at a FIXED stage —
set all envs to stage k and measure stones reached per episode.

Phases:
  A. Fixed-stage evals (stage 0 / 2 / 4) of the best stepper checkpoint.
  B. Stepper continuation-2 (2500 updates, floor −1.5) → ckpt/stepper3_cont2.
  C. Re-eval fixed stages on the new checkpoint.
  D. Config-5 single-chip learning row: mixed Walker3D+Cassie+Monkey suite
     feeding ONE PPO learner, 200 updates.

Appends JSON lines to scripts/tpu_round2f_results.jsonl.
"""

from __future__ import annotations

import dataclasses
import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round2f_results.jsonl"
T0 = time.time()


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


import mocca_envs_tpu
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.tasks import walker_stepper as ws
from mocca_envs_tpu.tasks.walker_stepper import StepperParams

NUM_ENVS = 4096
CFG = PPOConfig(
    horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
    reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.5,
)
SP = StepperParams.default().replace(adv_threshold=jnp.asarray(8.0, jnp.float32))
STEPPER = mocca_envs_tpu.make("Walker3DStepperEnv-v0", params=SP)
LEARNER = PPOLearner(STEPPER, CFG, num_envs=NUM_ENVS)
# eval twin with per-env advancement DISABLED so a pinned stage stays pinned
# across the eval's auto-resets (otherwise successful envs advance mid-eval)
from mocca_envs_tpu.tasks.walker_stepper import make_walker3d_stepper

EVAL_STEPPER = make_walker3d_stepper(
    params=SP.replace(adv_threshold=jnp.asarray(99.0, jnp.float32))
)
# Continuation twin with a STONE-dominated reward: the 2d continuation run
# showed ep_end/steps_reached regressing (2.7 -> 1.5) as entropy annealed —
# the per-step tall bonus (2.0) made conservative survival outcompete risky
# stone hits (+6 once). Triple the hit bonus, halve the survival stream.
CONT_SP = SP.replace(
    step_bonus=jnp.asarray(18.0, jnp.float32),
    walker=SP.walker.replace(tall_bonus=jnp.asarray(1.0, jnp.float32)),
)
CONT_STEPPER = make_walker3d_stepper(params=CONT_SP)
CONT_LEARNER = PPOLearner(CONT_STEPPER, CFG, num_envs=NUM_ENVS)


def restore_latest(names, tag):
    like = LEARNER.init(seed=0)
    for ck in names:
        try:
            mgr = CheckpointManager(f"/root/repo/ckpt/{ck}")
            step_no = mgr.latest_step()
            if step_no is not None:
                state = mgr.restore(like, step_no)
                emit(phase=tag, restored=ck, at=step_no)
                return state
        except Exception:
            continue
    return None


def eval_fixed_stage(state, stage, tag, deterministic=False, steps=900):
    """Pin every env to ``stage``; skip episodes begun before the pin."""
    params, norm = state.params, state.obs_norm
    net = LEARNER.net
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

    key = jax.random.key(31 + stage)
    done_steps = []
    for t in range(steps):
        key, ka = jax.random.split(key)
        env_state, done, pre, rc = step_fn(env_state, ka)
        # only count episodes that BEGAN after the stage pin (reset_count
        # already advanced past its pre-pin value when this episode started)
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
        frac_complete=round(float((ds >= SP.stones.num_steps - 1).mean()), 3),
    )


# ---------------- A: fixed-stage evals of the current best checkpoint
# NOT stepper3_cont: the 2d continuation collapsed into stand-on-stone-0
# (entropy floor + tall-bonus-dominated reward; see BENCH.md) — ft is best
state = restore_latest(("stepper3_ft", "stepper3"), "evalA")
if state is not None:
    for stg in (0, 2, 4):
        for det in (False, True):
            try:
                eval_fixed_stage(state, stg, "evalA", deterministic=det)
            except Exception:
                traceback.print_exc()
                emit(phase="evalA", stage=stg, ok=False,
                     error=traceback.format_exc()[-300:])

# ---------------- B: continuation-2
try:
    state = restore_latest(("stepper3_ft", "stepper3"), "cont2")
    if state is not None:
        mgr = CheckpointManager("/root/repo/ckpt/stepper3_cont2", max_to_keep=2)
        if mgr.latest_step() is not None:
            state = mgr.restore(LEARNER.init(seed=0), mgr.latest_step())
            emit(phase="cont2", resumed_from=mgr.latest_step())
        t0 = time.time()
        for u in range(2500):
            state, metrics = CONT_LEARNER.train_step(state)
            if (u + 1) % 50 == 0 or u == 0:
                jax.block_until_ready(state.params)
                m = {k: round(float(v), 4) for k, v in metrics.items()
                     if not k.startswith("env/")}
                task = state.env_state.task
                m["mean_stage"] = round(float(task.stage.mean()), 3)
                m["max_stage"] = float(task.stage.max())
                m["env_steps_per_s"] = round(
                    NUM_ENVS * CFG.horizon * (50 if u else 1)
                    / max(time.time() - t0, 1e-9)
                )
                t0 = time.time()
                emit(phase="cont2", update=u + 1, **m)
            if (u + 1) % 500 == 0:
                mgr.save(u + 1, state)
                mgr.wait()
        mgr.save(2500, state)
        mgr.wait()
        mgr.close()
        # ---------------- C: re-eval
        for stg in (0, 2, 4):
            for det in (False, True):
                try:
                    eval_fixed_stage(state, stg, "evalC", deterministic=det)
                except Exception:
                    traceback.print_exc()
                    emit(phase="evalC", stage=stg, ok=False)
except Exception:
    traceback.print_exc()
    emit(phase="cont2", ok=False, error=traceback.format_exc()[-300:])

# ---------------- D: config-5 mixed-suite learning row (single chip)
try:
    from mocca_envs_tpu.harness.mixed import MixedSuite

    suite = MixedSuite(
        ("Walker3DCustomEnv-v0", "CassieEnv-v0", "Monkey3DStepperEnv-v0"),
        (1024, 1024, 1024),
    )
    cfg5 = PPOConfig(
        horizon=128, num_epochs=4, num_minibatches=24, lr=3e-4,
        reward_scale=0.1, log_std_min=-1.0,
    )
    learner5 = PPOLearner(suite, cfg5, num_envs=suite.num_envs)
    st5 = learner5.init(seed=0)
    t0 = time.time()
    for u in range(200):
        st5, metrics = learner5.train_step(st5)
        if (u + 1) % 25 == 0 or u == 0:
            jax.block_until_ready(st5.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            m["env_steps_per_s"] = round(
                suite.num_envs * cfg5.horizon * (25 if u else 1)
                / max(time.time() - t0, 1e-9)
            )
            t0 = time.time()
            emit(phase="mixed5", update=u + 1, **m)
except Exception:
    traceback.print_exc()
    emit(phase="mixed5", ok=False, error=traceback.format_exc()[-300:])

emit(phase="session_done", wall_s=round(time.time() - T0, 1))
print(f"ROUND2F SESSION DONE in {time.time()-T0:.0f}s", flush=True)
