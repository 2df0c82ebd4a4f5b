"""Round-3b TPU session: the full ALLSTEPS pipeline push (VERDICT r2 #1).

Round-2 state: per-env curriculum reached mean stage 3.0; fixed-stage
ep-end mean 2.74 stones. The stone-dominated continuation (2q) NEVER RAN
(queue cut off). This session runs the complete pipeline fresh on the
round-3 engine (culled stones, corner-sphere feet) with BOTH recipe
variants, evals at fixed stages, a second seed on the winner, and grounded
trained-policy bench rows (VERDICT r2 #3).

  P1  pretrain walker (validated 2m recipe: mirror 4.0, floor −1.0,
      reward_scale 0.1; early-stop at speed > 1.2 m/s) → ckpt/r3_pretrain
  P2  stepper v1 — validated levers: transfer(reset_log_std −0.5),
      STONE-DOMINATED reward (step_bonus 18, tall 1.0), per-env curriculum
      adv_threshold 8, floor −1.0, 3500 u → ckpt/r3_st_v1
  P3  v1 fine-tune: floor anneal −1 → −2 over 600 u (log-std schedule),
      800 u → ckpt/r3_st_v1_ft; fixed-stage evals
  P4  stepper v2 — NEW TOOLS on top of v1's reward: normalize_reward
      (drop reward_scale), LR anneal 3e-4 → 1e-4 — → ckpt/r3_st_v2 + ft
      → evals
  P5  grounded trained-policy bench rows: walker @ pretrain policy,
      stepper @ winner policy (b4096, T=600, z̄ recorded)
  P6  seed-2 rerun of the WINNER recipe (pretrain → stepper → ft → evals)

Every train phase restores its own ckpt dir first — watchdog restarts skip
finished work. JSONL → scripts/tpu_round3b_results.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round3b_results.jsonl"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 6.0 * 3600))


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def time_left():
    return DEADLINE - time.time()


import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.harness.transfer import transfer_train_state
from mocca_envs_tpu.tasks import walker_stepper as ws
from mocca_envs_tpu.tasks.walker_stepper import StepperParams, make_walker3d_stepper

NUM_ENVS = 4096
CKPT = "/root/repo/ckpt"

SP = StepperParams.default().replace(adv_threshold=jnp.asarray(8.0, jnp.float32))
# stone-dominated reward (2f-validated rebalance): the tall-bonus stream
# must not outcompete risky stone hits
STONE_SP = SP.replace(
    step_bonus=jnp.asarray(18.0, jnp.float32),
    walker=SP.walker.replace(tall_bonus=jnp.asarray(1.0, jnp.float32)),
)

PRE_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                    reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.0)
V1_CFG = PRE_CFG
FT_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                   reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.0,
                   log_std_min_final=-2.0, log_std_anneal_updates=500)
V2_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32,
                   lr=3e-4, lr_final=1e-4, lr_anneal_updates=3500,
                   normalize_reward=True, mirror_coef=4.0, log_std_min=-1.0)
V2FT_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=1e-4,
                     normalize_reward=True, mirror_coef=4.0, log_std_min=-1.0,
                     log_std_min_final=-2.0, log_std_anneal_updates=600)

WALKER = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
EVAL_STEPPER = make_walker3d_stepper(
    params=SP.replace(adv_threshold=jnp.asarray(99.0, jnp.float32)),
    name="EvalStepper",
)


# --------------------------------------------------------------- helpers
def log_metrics(tag, u, metrics, state, t0, every, extra=None):
    m = {k: round(float(v), 4) for k, v in metrics.items()
         if not k.startswith("env/") and not k.startswith("ep_end/")}
    for k in ("ep_end/steps_reached",):
        if k in metrics and np.isfinite(float(metrics[k])):
            m["ep_steps"] = round(float(metrics[k]), 3)
    task = getattr(state.env_state, "task", None)
    if task is not None and hasattr(task, "stage"):
        m["mean_stage"] = round(float(task.stage.mean()), 3)
        m["max_stage"] = float(task.stage.max())
    m["env_steps_per_s"] = round(
        NUM_ENVS * 128 * every / max(time.time() - t0, 1e-9))
    if extra:
        m.update(extra)
    emit(phase=tag, update=u, **m)


def train(learner, ckpt_dir, n_updates, tag, seed=1, seed_state=None,
          zero_update_count=False, every=50):
    """Resume ckpt_dir if present, else start from seed_state (or init)."""
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    state = learner.init(seed=seed)
    start = mgr.latest_step()
    if start is not None:
        try:
            state = mgr.restore(state, start)
            emit(phase=tag, resumed_from=start)
        except Exception:
            # pytree structure moved under the checkpoint (e.g. Scene grew
            # fields) — wipe and start fresh rather than dying
            import shutil
            mgr.close()
            shutil.rmtree(ckpt_dir, ignore_errors=True)
            mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
            state = learner.init(seed=seed)
            start = None
            emit(phase=tag, resume_failed="structure mismatch — wiped")
    if start is None:
        start = 0
        if seed_state is not None:
            state = seed_state
            if zero_update_count:
                state = state.replace(
                    update_count=jnp.zeros((), jnp.int32))
            emit(phase=tag, seeded=True)
    t0 = time.time()
    u = start
    for u in range(start, n_updates):
        state, metrics = learner.train_step(state)
        if (u + 1) % every == 0 or u == start:
            jax.block_until_ready(state.params)
            log_metrics(tag, u + 1, metrics, state, t0,
                        every if u > start else 1)
            t0 = time.time()
        if (u + 1) % 150 == 0:
            mgr.save(u + 1, state)
            mgr.wait()
        if time_left() < 600 and (u + 1) % 50 == 0:
            emit(phase=tag, truncated_at=u + 1, reason="deadline")
            break
    if u + 1 > start and (u + 1) % 150 != 0:
        mgr.save(u + 1, state)
        mgr.wait()
    mgr.close()
    return state


def restore_only(learner, ckpt_dir, seed=1):
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    step = mgr.latest_step()
    if step is None:
        return None
    state = mgr.restore(learner.init(seed=seed), step)
    mgr.close()
    return state


def eval_fixed_stage(net, state, stage, tag, deterministic=True, steps=700):
    """Pin every env to ``stage``; count episodes begun after the pin."""
    params, norm = state.params, state.obs_norm
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
    res = dict(
        phase=tag, stage=stage, deterministic=deterministic,
        episodes=int(ds.size),
        ep_end_steps_mean=round(float(ds.mean()), 2),
        ep_end_steps_p50=float(np.percentile(ds, 50)),
        ep_end_steps_p90=float(np.percentile(ds, 90)),
        frac_ge_4=round(float((ds >= 4).mean()), 3),
        frac_ge_8=round(float((ds >= 8).mean()), 3),
        frac_complete=round(float((ds >= 19).mean()), 3),
    )
    emit(**res)
    return res


def bench_policy(env, net, params, norm, tag, B=4096, T=600, rounds=3):
    """Grounded bench: deterministic trained policy instead of random
    torques (VERDICT r2 #3) — z̄ is the honesty column."""
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout(state):
        def body(s, _):
            obs = jax.vmap(env.obs_fn)(s)
            o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8),
                         -10.0, 10.0)
            mean, _ls, _v = net.apply(params, o)
            tr = jax.vmap(env.step)(s, mean)
            return tr.state, ()

        state, _ = jax.lax.scan(body, state, None, length=T)
        return state

    tC = time.perf_counter()
    state = rollout(state)
    jax.block_until_ready(state.q)
    compile_s = time.perf_counter() - tC
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        state = rollout(state)
        jax.block_until_ready(state.q)
        times.append(time.perf_counter() - t0)
    rate = B * T / min(times)
    emit(phase="bench_policy", tag=tag, batch=B, steps=T,
         env_steps_per_s=round(rate), compile_s=round(compile_s, 1),
         all_round_s=[round(x, 4) for x in times],
         finite=bool(jnp.all(jnp.isfinite(state.q))),
         z_mean=round(float(state.q[:, 2].mean()), 3),
         speed=round(float(jnp.linalg.norm(
             state.qd[:, 0:2], axis=1).mean()), 3))
    return rate


def guarded(tag, fn, *a, **kw):
    if time.time() > DEADLINE:
        emit(phase=tag, skipped="deadline")
        return None
    try:
        return fn(*a, **kw)
    except Exception:
        traceback.print_exc()
        emit(phase=tag, ok=False, error=traceback.format_exc()[-300:])
        return None


def pretrain(seed, ckpt_dir, tag):
    learner = PPOLearner(WALKER, PRE_CFG, num_envs=NUM_ENVS)
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    state = learner.init(seed=seed)
    start = mgr.latest_step() or 0
    if start:
        try:
            state = mgr.restore(state, start)
            emit(phase=tag, resumed_from=start)
        except Exception:
            import shutil
            mgr.close()
            shutil.rmtree(ckpt_dir, ignore_errors=True)
            mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
            state = learner.init(seed=seed)
            start = 0
            emit(phase=tag, resume_failed="structure mismatch — wiped")
    t0 = time.time()
    u = start
    for u in range(start, 3000):
        state, metrics = learner.train_step(state)
        if (u + 1) % 50 == 0 or u == start:
            jax.block_until_ready(state.params)
            speed = round(float(jnp.linalg.norm(
                state.env_state.qd[:, 0:2], axis=1).mean()), 3)
            log_metrics(tag, u + 1, metrics, state, t0,
                        50 if u > start else 1, extra={"speed": speed})
            t0 = time.time()
            if (u + 1) % 150 == 0:
                mgr.save(u + 1, state)
                mgr.wait()
            if (speed > 1.2
                    and float(metrics["episode_done_rate"]) < 0.01
                    and u + 1 >= 300):
                emit(phase=tag, update=u + 1, early_stop=True)
                break
    if u + 1 > start and (u + 1) % 150 != 0:
        mgr.save(u + 1, state)
        mgr.wait()
    mgr.close()
    return learner, state


def stepper_pipeline(seed, variant, pre_state, pre_learner, do_ft=True,
                     n_updates=2600, ft_updates=600):
    """Transfer → curriculum train → (optional floor-anneal ft) → evals.
    Returns the stage-2 det ep-end mean of the final policy. The pre-ft
    state gets its own stage-2 eval (seed-variance comparison at matched
    update count) BEFORE the ft phase donates its buffers."""
    cfg, ft_cfg = (V1_CFG, FT_CFG) if variant == "v1" else (V2_CFG, V2FT_CFG)
    name = f"r3_st_{variant}_s{seed}"
    env = make_walker3d_stepper(params=STONE_SP, name=f"Stepper_{variant}")
    learner = PPOLearner(env, cfg, num_envs=NUM_ENVS)

    dst = learner.init(seed=seed)
    seeded = transfer_train_state(pre_state, dst, reset_log_std=-0.5)
    state = guarded(name, train, learner, f"{CKPT}/{name}", n_updates, name,
                    seed=seed, seed_state=seeded)
    if state is None:
        return None
    guarded(f"eval_{name}_main", eval_fixed_stage, learner.net, state, 2,
            f"eval_{name}_main")
    ft_state = None
    if do_ft:
        ft_learner = PPOLearner(
            make_walker3d_stepper(params=STONE_SP, name=f"StepperF_{variant}"),
            ft_cfg, num_envs=NUM_ENVS)
        ft_state = guarded(
            f"{name}_ft", train, ft_learner, f"{CKPT}/{name}_ft", ft_updates,
            f"{name}_ft", seed=seed, seed_state=state, zero_update_count=True)
    score = None
    best = ft_state if ft_state is not None else state
    label = f"eval_{name}" + ("_ft" if ft_state is not None else "")
    for stage in (0, 2, 4, 6):
        r = guarded(label, eval_fixed_stage, learner.net, best, stage, label)
        if r and stage == 2:
            score = r["ep_end_steps_mean"]
    guarded(label, eval_fixed_stage, learner.net, best, 2, label,
            deterministic=False)
    return {"score": score, "ft_state": best,
            "learner": learner, "env": env}


# ================================================================= phases
emit(phase="session_start", deadline_in_s=round(time_left()))

# P1: pretrain seed 1
P1 = guarded("pretrain_s1", pretrain, 1, f"{CKPT}/r3_pretrain_s1",
             "pretrain_s1")

res_v1 = res_v2 = None
if P1 is not None:
    pre_learner, pre_state = P1
    # grounded trained-policy walker bench first (cheap, VERDICT r2 #3)
    guarded("bench_walker_policy", bench_policy, WALKER, pre_learner.net,
            pre_state.params, pre_state.obs_norm, "walker_policy_b4096")

    # P2+P3: validated recipe, seed 1
    res_v1 = stepper_pipeline(1, "v1", pre_state, pre_learner)
    if res_v1 and res_v1["ft_state"] is not None:
        st = res_v1["ft_state"]
        guarded("bench_stepper_policy", bench_policy, res_v1["env"],
                res_v1["learner"].net, st.params, st.obs_norm,
                "stepper_policy_b4096")

    # P6 (moved up): SECOND SEED of the headline recipe — the ≥2-seeds
    # requirement outranks the exploratory v2 variant. No ft (the deadline
    # is tight): its eval_*_main row compares against seed 1's at the same
    # update count and exploration floor.
    if time_left() > 1800:
        P1b = guarded("pretrain_s2", pretrain, 2, f"{CKPT}/r3_pretrain_s2",
                      "pretrain_s2")
        if P1b is not None:
            stepper_pipeline(2, "v1", P1b[1], P1b[0], do_ft=False)

    # P4: new-tools recipe with whatever time remains
    if time_left() > 3600:
        res_v2 = stepper_pipeline(1, "v2", pre_state, pre_learner)
    emit(phase="summary",
         v1_score=None if res_v1 is None else res_v1["score"],
         v2_score=None if res_v2 is None else res_v2["score"])

emit(phase="session_done", ok=bool(P1 is not None and res_v1 is not None),
     wall_s=round(time.time() - T0, 1))
