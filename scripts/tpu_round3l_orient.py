"""Round-3l TPU session: the tilt-vision A/B (orient_obs on vs 3k blind).

3g's ladder shows a hard skill cliff between fixed stages 4 and 5 —
exactly where stone tilt exceeds ±14° — and the shipped stepper obs
carries no stone-orientation terms (SURVEY B4 [K-med]: "next-two step
targets + stone orientation terms"). The tilt terms append at the obs
TAIL, so the prefix-embed transfer (harness/transfer.embed_pytree) keeps
the trained policy intact while growing its first Dense kernel.

Design: restore the SAME 3g high-stage checkpoint 3k starts from,
transfer it into an orient_obs=True learner, and run the IDENTICAL
pinned-5..9 fine-tune (800 u, floor −1.5 → −2). The eval rows then
differ from 3k's in exactly one bit: whether the policy can see tilt.

JSONL → scripts/tpu_round3l_results.jsonl.
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

OUT = "scripts/tpu_round3l_results.jsonl"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 70 * 60))


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def time_left():
    return DEADLINE - time.time()


import mocca_envs_tpu  # noqa: F401
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.harness.transfer import transfer_train_state
from mocca_envs_tpu.tasks import walker_stepper as ws
from mocca_envs_tpu.tasks.walker_stepper import StepperParams, make_walker3d_stepper

NUM_ENVS = 4096
CKPT = "/root/repo/ckpt"

SP = StepperParams.default()
STONE_SP = SP.replace(
    step_bonus=jnp.asarray(18.0, jnp.float32),
    walker=SP.walker.replace(tall_bonus=jnp.asarray(1.0, jnp.float32)),
)
PIN_SP = STONE_SP.replace(adv_threshold=jnp.asarray(99.0, jnp.float32))

# identical to 3k's config — the env's mirror spec already covers the
# orient tail (tilt n_y components negate), so the A/B differs in exactly
# one bit: whether the policy can see tilt
FT_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                   reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.5,
                   log_std_min_final=-2.0, log_std_anneal_updates=500)

EVAL_ENV = make_walker3d_stepper(params=PIN_SP, orient_obs=True,
                                 name="EvalStepper3l")


def guarded(gtag, fn, *a, **kw):
    if time.time() > DEADLINE:
        emit(phase=gtag, skipped="deadline")
        return None
    try:
        return fn(*a, **kw)
    except Exception:
        traceback.print_exc()
        emit(phase=gtag, ok=False, error=traceback.format_exc()[-300:])
        return None


def eval_fixed_stage(net, state, stage, tag, deterministic=True, steps=700):
    params, norm = state.params, state.obs_norm
    env_state = ws.set_stage(state.env_state, float(stage))
    rc0 = np.asarray(env_state.reset_count).copy()

    @jax.jit
    def step_fn(s, key):
        obs = jax.vmap(EVAL_ENV.obs_fn)(s)
        o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10.0, 10.0)
        mean, log_std, _v = net.apply(params, o)
        log_std = jnp.maximum(log_std, -2.0)
        noise = jax.random.normal(key, mean.shape)
        a = mean if deterministic else mean + jnp.exp(log_std) * noise
        pre = s.task.next_step
        tr = jax.vmap(EVAL_ENV.step)(s, a)
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
    emit(phase=tag, stage=stage, deterministic=deterministic,
         episodes=int(ds.size),
         ep_end_steps_mean=round(float(ds.mean()), 2),
         ep_end_steps_p50=float(np.percentile(ds, 50)),
         ep_end_steps_p90=float(np.percentile(ds, 90)),
         frac_ge_4=round(float((ds >= 4).mean()), 3),
         frac_ge_8=round(float((ds >= 8).mean()), 3),
         frac_complete=round(float((ds >= 19).mean()), 3))


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))
    env = make_walker3d_stepper(params=PIN_SP, orient_obs=True,
                                name="StepperOrient")
    learner = PPOLearner(env, FT_CFG, num_envs=NUM_ENVS)

    out_dir = f"{CKPT}/r3_st_orient"
    mgr = CheckpointManager(out_dir, max_to_keep=2)
    start = mgr.latest_step()
    state = learner.init(seed=1)
    if start is not None:
        try:
            state = mgr.restore(state, start)
            emit(phase="orient", resumed_from=start)
        except Exception:
            import shutil
            mgr.close()
            shutil.rmtree(out_dir, ignore_errors=True)
            mgr = CheckpointManager(out_dir, max_to_keep=2)
            start = None
            emit(phase="orient", resume_failed="structure mismatch — wiped")
    if start is None:
        start = 0
        # restore the 3g blind checkpoint through a blind-learner template,
        # then prefix-embed into the orient learner (obs grew at the tail)
        blind_env = make_walker3d_stepper(params=PIN_SP, name="BlindTpl3l")
        blind = PPOLearner(blind_env, FT_CFG, num_envs=NUM_ENVS)
        smgr = CheckpointManager(f"{CKPT}/r3_st_hs", max_to_keep=2)
        s0 = smgr.latest_step()
        if s0 is None:
            emit(phase="orient", skipped="no 3g source checkpoint")
            return
        src = smgr.restore(blind.init(seed=1), s0)
        smgr.close()
        state = transfer_train_state(src, state)
        emit(phase="orient", seeded_from=f"r3_st_hs@{s0}", obs_dim=env.obs_dim)

    stages = 5.0 + (jnp.arange(NUM_ENVS) % 5).astype(jnp.float32)
    state = state.replace(env_state=ws.set_stage(state.env_state, stages))

    t0 = time.time()
    u = start
    for u in range(start, 800):
        state, metrics = learner.train_step(state)
        if (u + 1) % 50 == 0 or u == start:
            jax.block_until_ready(state.params)
            m = {k: round(float(v), 4) for k, v in metrics.items()
                 if not k.startswith("env/") and not k.startswith("ep_end/")}
            if "ep_end/steps_reached" in metrics and np.isfinite(
                    float(metrics["ep_end/steps_reached"])):
                m["ep_steps"] = round(float(metrics["ep_end/steps_reached"]), 3)
            m["env_steps_per_s"] = round(
                NUM_ENVS * 128 * (50 if u > start else 1)
                / max(time.time() - t0, 1e-9))
            emit(phase="orient", update=u + 1, **m)
            t0 = time.time()
        if (u + 1) % 150 == 0:
            mgr.save(u + 1, state)
            mgr.wait()
        if time_left() < 900 and (u + 1) % 50 == 0:
            emit(phase="orient", truncated_at=u + 1, reason="deadline")
            break
    if u + 1 > start and (u + 1) % 150 != 0:
        mgr.save(u + 1, state)
        mgr.wait()
    mgr.close()

    for stage in (4, 5, 6):
        guarded("eval_orient", eval_fixed_stage, learner.net, state, stage,
                "eval_orient")
    guarded("eval_orient", eval_fixed_stage, learner.net, state, 5,
            "eval_orient", deterministic=False)
    emit(phase="session_done", wall_s=round(time.time() - T0, 1))


main()
