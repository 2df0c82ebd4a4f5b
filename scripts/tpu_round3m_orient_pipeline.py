"""Round-3m/4a TPU session: full ALLSTEPS pipeline WITH tilt vision.

The 3g/3k end-stage ladder localized the stage-4→5 cliff to stone TILT:
pinned high-stage dwell nearly doubled stage-4 skill (8.01 → 14.61
ep-end) but barely moved stage 5 (6.95) — and ±14°+ tilt is exactly what
the blind obs cannot see (SURVEY.md §2.2 B4 [K-med] "stone orientation
terms"). The planned 3l A/B (transfer the 3g checkpoint into an
orient_obs learner) is dead: the container recycled and /root/repo/ckpt
is gone. Silver lining — with no checkpoints to preserve, this is the
round boundary ROADMAP.md wanted for training with the tilt obs from
scratch.

Round 4 runs this same pipeline (it never completed in round 3 — the
container recycled mid-queue and its results were never committed), with
the round-3 advisor findings fixed:
  #1 session_done ok now reflects guarded() failures (FAILED list);
  #2 the P4/P5 fallback when P3 dies restores from checkpoint instead of
     reusing st_state whose buffers P3's donate_argnums deleted;
  #3 a no-episode eval emits episodes=0 with null stats, not a fabricated
     zero-score episode;
  #4 pretrain()/train() persist a PHASE_DONE marker and return restored
     state immediately on watchdog re-entry (no recompile-retrain churn);
  #5 the inner loops touch a heartbeat file every update so the launcher
     watchdog doesn't key on the sparse (every-50-update) results mtime.
Seed is MOCCA_SEED (default 1); ckpt dirs and the results file are
per-seed so a seed-2 session can run after seed-1 completes.

Pipeline (each phase checkpoint-resumable; watchdog restarts skip done
work):
  P1  pretrain walker, validated 3b recipe (mirror 4.0, floor −1.0,
      reward_scale 0.1; early-stop speed>1.2 & done<1%) → ckpt/r4a_pre
  P2  stepper transfer with orient_obs=True: stone-dominated reward
      (step_bonus 18, tall 1.0), per-env curriculum adv_threshold 8,
      floor −1.0; early-stop at mean stage ≥ 8.5 → ckpt/r4a_st
  P3  pinned high-stage fine-tune (the 3g dwell lever): every env pinned
      to a stage-4..9 mixture, floor anneal −1.0 → −2.0 over 600 u
      → ckpt/r4a_hs
  P4  fixed-stage deterministic evals (0/2/4/5/6 + stage-5 stochastic) —
      comparable row-for-row against the 3b/3g blind ladder in BENCH.md
  P5  grounded trained-policy bench row (z̄ honesty column)

VERDICT r2 #1 bar: ep-end mean ≥ 8 stones at fixed stage ≥ 5.
JSONL → scripts/tpu_round4a_s{seed}_results.jsonl.
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

SEED = int(os.environ.get("MOCCA_SEED", "1"))
OUT = f"scripts/tpu_round4a_s{SEED}_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 3.75 * 3600))

FAILED = []  # guarded() failure tags — session_done ok keys on this


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    kw["seed"] = SEED
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def beat():
    """Touch the watchdog heartbeat (advisor r3 #5: the results file only
    moves every 50 updates; a slow compile + 50 updates can exceed the
    stall window, so the inner loops prove liveness here instead)."""
    with open(HEARTBEAT, "a"):
        os.utime(HEARTBEAT)


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
STONE_SP = SP.replace(
    step_bonus=jnp.asarray(18.0, jnp.float32),
    walker=SP.walker.replace(tall_bonus=jnp.asarray(1.0, jnp.float32)),
)
PIN_SP = STONE_SP.replace(adv_threshold=jnp.asarray(99.0, jnp.float32))

PRE_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                    reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.0)
ST_CFG = PRE_CFG
HS_CFG = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                   reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.0,
                   log_std_min_final=-2.0, log_std_anneal_updates=600)

WALKER = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
EVAL_ENV = make_walker3d_stepper(params=PIN_SP, orient_obs=True,
                                 name="EvalStepper4a", reset_obs="zero")


def guarded(tag, fn, *a, **kw):
    if time.time() > DEADLINE:
        emit(phase=tag, skipped="deadline")
        return None
    try:
        return fn(*a, **kw)
    except Exception:
        traceback.print_exc()
        FAILED.append(tag)
        emit(phase=tag, ok=False, error=traceback.format_exc()[-300:])
        return None


def _done_marker(ckpt_dir):
    return os.path.join(ckpt_dir, "PHASE_DONE")


def _mark_done(ckpt_dir, **info):
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(_done_marker(ckpt_dir), "w") as f:
        f.write(json.dumps(info))


def restore_latest(learner, ckpt_dir, seed=1):
    """Restore the newest checkpoint in ckpt_dir into a fresh state, or
    None. Used by the P4/P5 fallback: after P3 has run even one update,
    the state P2 returned is dead (train_step donates its input and the
    seeded state shares buffers with it — advisor r3 #2)."""
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    step = mgr.latest_step()
    state = None
    if step is not None:
        try:
            state = mgr.restore(learner.init(seed=seed), step)
        except Exception:
            traceback.print_exc()
            state = None
    mgr.close()
    return state


def log_metrics(tag, u, metrics, state, t0, every, extra=None):
    m = {k: round(float(v), 4) for k, v in metrics.items()
         if not k.startswith("env/") and not k.startswith("ep_end/")}
    if "ep_end/steps_reached" in metrics and np.isfinite(
            float(metrics["ep_end/steps_reached"])):
        m["ep_steps"] = round(float(metrics["ep_end/steps_reached"]), 3)
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
          zero_update_count=False, stage_stop=None, pin_stages=None):
    """Resume ckpt_dir if present, else seed from seed_state (or init).

    stage_stop: early-stop when mean curriculum stage passes it.
    pin_stages: per-env stage array applied on FRESH seeding only (a
    restored checkpoint already carries them)."""
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    state = learner.init(seed=seed)
    start = mgr.latest_step()
    if start is not None:
        try:
            state = mgr.restore(state, start)
            emit(phase=tag, resumed_from=start)
        except Exception:
            import shutil
            mgr.close()
            shutil.rmtree(ckpt_dir, ignore_errors=True)
            mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
            state = learner.init(seed=seed)
            start = None
            emit(phase=tag, resume_failed="structure mismatch — wiped")
    # a finished or early-stopped phase re-entered by a watchdog restart:
    # return the restored state without paying a recompile-retrain cycle
    if start is not None and os.path.exists(_done_marker(ckpt_dir)):
        emit(phase=tag, already_done_at=start)
        mgr.close()
        return state
    if start is None:
        start = 0
        if seed_state is not None:
            state = seed_state
            if zero_update_count:
                state = state.replace(update_count=jnp.zeros((), jnp.int32))
            if pin_stages is not None:
                state = state.replace(
                    env_state=ws.set_stage(state.env_state, pin_stages))
            emit(phase=tag, seeded=True)
    if start >= n_updates:
        _mark_done(ckpt_dir, at=start)
        mgr.close()
        return state
    t0 = time.time()
    u = start
    finished = True
    for u in range(start, n_updates):
        beat()
        state, metrics = learner.train_step(state)
        if (u + 1) % 50 == 0 or u == start:
            jax.block_until_ready(state.params)
            log_metrics(tag, u + 1, metrics, state, t0,
                        50 if u > start else 1)
            t0 = time.time()
            if stage_stop is not None:
                ms = float(state.env_state.task.stage.mean())
                if ms >= stage_stop and u + 1 >= 400:
                    emit(phase=tag, update=u + 1, early_stop=True,
                         mean_stage=round(ms, 3))
                    break
        if (u + 1) % 150 == 0:
            mgr.save(u + 1, state)
            mgr.wait()
        if time_left() < 600 and (u + 1) % 50 == 0:
            emit(phase=tag, truncated_at=u + 1, reason="deadline")
            finished = False
            break
    if u + 1 > start and (u + 1) % 150 != 0:
        mgr.save(u + 1, state)
        mgr.wait()
    if finished:
        _mark_done(ckpt_dir, at=u + 1)
    mgr.close()
    return state


def pretrain(seed, ckpt_dir, tag, n_updates=1200):
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
    if start and (os.path.exists(_done_marker(ckpt_dir))
                  or start >= n_updates):
        emit(phase=tag, already_done_at=start)
        mgr.close()
        return learner, state
    t0 = time.time()
    u = start
    finished = True
    for u in range(start, n_updates):
        beat()
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
        if time_left() < 600 and (u + 1) % 50 == 0:
            emit(phase=tag, truncated_at=u + 1, reason="deadline")
            finished = False
            break
    if u + 1 > start and (u + 1) % 150 != 0:
        mgr.save(u + 1, state)
        mgr.wait()
    if finished:
        _mark_done(ckpt_dir, at=u + 1)
    mgr.close()
    return learner, state


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
        if _t % 50 == 0:
            beat()
        key, ka = jax.random.split(key)
        env_state, done, pre, rc = step_fn(env_state, ka)
        d = np.asarray(done) & (np.asarray(rc) > rc0 + 1)
        if d.any():
            done_steps.append(np.asarray(pre)[d])
    if not done_steps:
        # advisor r3 #3: a no-data eval must be distinguishable from a
        # policy that scores 0 — no fabricated zero episode
        emit(phase=tag, stage=stage, deterministic=deterministic,
             episodes=0, ep_end_steps_mean=None, ep_end_steps_p50=None,
             ep_end_steps_p90=None, frac_ge_4=None, frac_ge_8=None,
             frac_complete=None)
        return
    ds = np.concatenate(done_steps)
    emit(phase=tag, stage=stage, deterministic=deterministic,
         episodes=int(ds.size),
         ep_end_steps_mean=round(float(ds.mean()), 2),
         ep_end_steps_p50=float(np.percentile(ds, 50)),
         ep_end_steps_p90=float(np.percentile(ds, 90)),
         frac_ge_4=round(float((ds >= 4).mean()), 3),
         frac_ge_8=round(float((ds >= 8).mean()), 3),
         frac_complete=round(float((ds >= 19).mean()), 3))


def bench_policy(env, net, params, norm, tag, B=4096, T=600, rounds=3):
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)

    # obs carried (tr.obs), like the training rollout — per-step obs_fn
    # re-runs the XLA narrowphase (25x slower on stone scenes, 3j rows)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def rollout(state, obs):
        def body(carry, _):
            s, obs = carry
            o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8),
                         -10.0, 10.0)
            mean, _ls, _v = net.apply(params, o)
            tr = jax.vmap(env.step)(s, mean)
            return (tr.state, tr.obs), ()

        (state, obs), _ = jax.lax.scan(body, (state, obs), None, length=T)
        return state, obs

    obs = jax.jit(jax.vmap(env.obs_fn))(state)
    beat()
    tC = time.perf_counter()
    state, obs = rollout(state, obs)
    jax.block_until_ready(state.q)
    compile_s = time.perf_counter() - tC
    times = []
    for _ in range(rounds):
        beat()
        t0 = time.perf_counter()
        state, obs = rollout(state, obs)
        jax.block_until_ready(state.q)
        times.append(time.perf_counter() - t0)
    emit(phase="bench_policy", tag=tag, batch=B, steps=T,
         env_steps_per_s=round(B * T / min(times)),
         compile_s=round(compile_s, 1),
         finite=bool(jnp.all(jnp.isfinite(state.q))),
         z_mean=round(float(state.q[:, 2].mean()), 3),
         speed=round(float(jnp.linalg.norm(
             state.qd[:, 0:2], axis=1).mean()), 3))


# ================================================================= phases
def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))

    P1 = guarded("pretrain", pretrain, SEED, f"{CKPT}/r4a_s{SEED}_pre",
                 "pretrain")
    if P1 is None:
        emit(phase="session_done", ok=False, failed=FAILED,
             wall_s=round(time.time() - T0, 1))
        return
    pre_learner, pre_state = P1

    # P2: orient-obs stepper transfer. The tilt terms append at the obs
    # TAIL, so the prefix embed grows the first Dense kernel and keeps the
    # walker policy intact (CPU-validated path, commit d882a9a).
    # reset_obs="zero": frame-0 flags are zeros (bit-identical to the
    # exact predicate at spawn — tests/test_reset_obs.py gates rollout
    # equality), skipping the auto-reset narrowphase that made stepper
    # training 7.7x slower than the walker (3j decomposition)
    st_env = make_walker3d_stepper(params=STONE_SP, orient_obs=True,
                                   name="Stepper4a", reset_obs="zero")
    st_learner = PPOLearner(st_env, ST_CFG, num_envs=NUM_ENVS)
    seeded = transfer_train_state(
        pre_state, st_learner.init(seed=SEED), reset_log_std=-0.5)
    st_state = guarded("stepper", train, st_learner, f"{CKPT}/r4a_s{SEED}_st",
                       2200, "stepper", seed=SEED, seed_state=seeded,
                       stage_stop=8.5)
    if st_state is None:
        emit(phase="session_done", ok=False, failed=FAILED,
             wall_s=round(time.time() - T0, 1))
        return

    # P3: pinned high-stage dwell (3g lever) + floor anneal, from P2's end.
    hs_env = make_walker3d_stepper(params=PIN_SP, orient_obs=True,
                                   name="Stepper4aHS", reset_obs="zero")
    hs_learner = PPOLearner(hs_env, HS_CFG, num_envs=NUM_ENVS)
    pin = 4.0 + (jnp.arange(NUM_ENVS) % 6).astype(jnp.float32)  # 4..9
    hs_state = guarded("highstage", train, hs_learner,
                       f"{CKPT}/r4a_s{SEED}_hs", 900,
                       "highstage", seed=SEED, seed_state=st_state,
                       zero_update_count=True, pin_stages=pin)
    if hs_state is not None:
        best = hs_state
    else:
        # P3 crashed after donating the state it was seeded with; the
        # only live copies are on disk (advisor r3 #2)
        best = (restore_latest(hs_learner, f"{CKPT}/r4a_s{SEED}_hs", SEED)
                or restore_latest(st_learner, f"{CKPT}/r4a_s{SEED}_st", SEED))
        if best is None:
            emit(phase="session_done", ok=False, failed=FAILED,
                 reason="no usable checkpoint after highstage failure",
                 wall_s=round(time.time() - T0, 1))
            return
        emit(phase="highstage_fallback", restored=True)

    # P4: the ladder, row-comparable to 3b ft / 3g in BENCH.md.
    for stage in (0, 2, 4, 5, 6):
        guarded("eval", eval_fixed_stage, hs_learner.net, best, stage, "eval")
    guarded("eval", eval_fixed_stage, hs_learner.net, best, 5, "eval",
            deterministic=False)

    # P5: grounded trained-policy bench row.
    guarded("bench", bench_policy, EVAL_ENV, hs_learner.net, best.params,
            best.obs_norm, "stepper_orient_policy_b4096")

    # advisor r3 #1: ok only when every phase succeeded or was
    # deadline-skipped — a swallowed P3/P4/P5 failure must leave the
    # watchdog free to relaunch and resume from checkpoints
    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
