"""Round-5c TPU session: give Child3D a real learning result (VERDICT r4
weak #2 / next-round #5 — the one family without a positive outcome).

Diagnosis chain (BENCH.md rounds 2r/3): torque-actuated Child3D under
exploration noise sits in the energy-diffusion regime (zero joint
damping + s⁻² angular accelerations → z̄ ≈ 108 under random torques),
and the adult-tuned electricity weight swamps the progress term, so the
4k sweep only got −31.8 → −13.6. Two arms, both grounded by
construction, both with the child-scaled reward (families._child3d_params):

  A  Child3DPDCustomEnv — PD-servoed child (registered family; PD arms
     stay grounded, adult PD z̄ 0.87)
  B  damped-torque child — per-joint viscous damping 2.0·s³ = 0.25
     N·m·s (the adult damped knob scaled like power_coef, keeping the
     torque/damping ratio of the grounded WalkerDamped row)

Protocol = round-4k family sweep (b2048, mirror on, reward trend rows)
but 1200 updates, plus a final deterministic eval window reporting
speed, z̄, done-rate. Done bar: reward/step ends POSITIVE with grounded
z̄ (<1.0) and nonzero locomotion speed.

JSONL -> scripts/tpu_round5c_results.jsonl.
Ref: mocca_envs/robots.py::Child3D (SURVEY §2.1 C5 [K-low]; mount empty).
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round5c_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 0.65 * 3600))

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
from mocca_envs_tpu.envs.families import _make_child3d_custom
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.models import child3d

NUM_ENVS = 2048
UPDATES = 1200


def make_damped_child():
    m = child3d.make_model()
    damp = 2.0 * child3d.SCALE**3
    m = m.replace(damping=jnp.full((m.nj,), damp, jnp.float32))
    return _make_child3d_custom(model=m, name="Child3DDampedEnv")


def train_arm(tag, env):
    cfg = PPOConfig(
        horizon=128, num_epochs=4, num_minibatches=16, lr=3e-4,
        reward_scale=0.1, log_std_min=-1.0,
        mirror_coef=4.0 if getattr(env, "mirror", None) else 0.0,
    )
    learner = PPOLearner(env, cfg, num_envs=NUM_ENVS)
    state = learner.init(seed=0)
    t0 = time.time()
    first = None
    metrics = None
    for u in range(UPDATES):
        beat()
        state, metrics = learner.train_step(state)
        if (u + 1) % 100 == 0 or u == 0:
            jax.block_until_ready(state.params)
            row = {
                "reward_per_step": round(
                    float(metrics["reward_per_step"]), 4),
                "episode_done_rate": round(
                    float(metrics["episode_done_rate"]), 5),
                "speed": round(float(jnp.linalg.norm(
                    state.env_state.qd[:, 0:2], axis=1).mean()), 3),
                "z_mean": round(float(state.env_state.q[:, 2].mean()), 3),
                "env_steps_per_s": round(
                    NUM_ENVS * cfg.horizon * (100 if u else 1)
                    / max(time.time() - t0, 1e-9)),
            }
            t0 = time.time()
            if first is None:
                first = row
            emit(phase="train", arm=tag, update=u + 1, **row)
        if time_left() < 240:
            emit(phase="train", arm=tag, truncated_at=u + 1)
            break

    # deterministic eval window: 600 steps, mean-action policy
    params, norm = state.params, state.obs_norm
    env_state = state.env_state
    net = learner.net

    @jax.jit
    def step_det(s, obs):
        o = jnp.clip(
            (obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10.0, 10.0
        )
        mean, _ls, _v = net.apply(params, o)
        tr = jax.vmap(env.step)(s, mean)
        return (tr.state, tr.obs, tr.reward,
                tr.done, tr.state.q[:, 2],
                jnp.linalg.norm(tr.state.qd[:, 0:2], axis=1))

    obs = jax.jit(jax.vmap(env.obs_fn))(env_state)
    rew_sum = z_sum = sp_sum = done_sum = 0.0
    n = 0
    for t in range(600):
        if t % 100 == 0:
            beat()
            if time_left() < 60:
                emit(phase="eval_truncated", arm=tag, at_step=t)
                break
        env_state, obs, r, d, z, sp = step_det(env_state, obs)
        rew_sum += float(r.mean())
        z_sum += float(z.mean())
        sp_sum += float(sp.mean())
        done_sum += float(d.mean())
        n += 1
    emit(phase="eval_det", arm=tag, steps=n,
         reward_per_step=round(rew_sum / max(n, 1), 4),
         z_mean=round(z_sum / max(n, 1), 3),
         speed=round(sp_sum / max(n, 1), 3),
         done_rate=round(done_sum / max(n, 1), 5))
    emit(phase="arm_done", arm=tag,
         reward_first=first["reward_per_step"] if first else None,
         reward_last=round(float(metrics["reward_per_step"]), 4))


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))
    arms = [
        ("child3d_pd", lambda: mocca_envs_tpu.make("Child3DPDCustomEnv")),
        ("child3d_damped", make_damped_child),
    ]
    for tag, mk in arms:
        if time_left() < 500:
            emit(phase="arm_skipped", arm=tag, reason="deadline")
            continue
        try:
            train_arm(tag, mk())
        except Exception:
            traceback.print_exc()
            FAILED.append(tag)
            emit(phase="arm_failed", arm=tag,
                 error=traceback.format_exc()[-300:])
    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
