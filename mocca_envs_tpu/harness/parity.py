"""Parity harness: trajectory interchange format, recorder, replayer.

SURVEY.md §7.4: the north-star gate is seeded trajectory parity against the
reference's PyBullet rollouts (BASELINE.json config 1), but the reference
mount was empty at build time (SURVEY.md §0). This module therefore defines
the *trajectory interchange format* now, proves the machinery on internal
goldens, and ships a recorder CLI stub that will produce reference
recordings the moment a pybullet + mocca_envs install exists.

Format (npz):
    meta.json-in-npz:  env_id, seed, engine ("tpu"|"pybullet"), model_hash,
                       control_dt, notes
    per-step arrays:   q (T+1, nq), qd (T+1, nv), action (T, nu),
                       obs (T, obs_dim), reward (T,), done (T,)

Quaternion convention in FILES is pybullet's xyzw scalar-last
(core/quat.to_xyzw at the boundary) so reference recordings need no
conversion on their side.

Tolerance gates (BASELINE "contact-solver tolerance gates"): positions and
joint angles compared with a per-step growing envelope — contact solvers
diverge multiplicatively, so the gate is
``atol + rtol_growth^t * base`` rather than a flat epsilon.

Horizon-scale limits (measured on hardware, round-5d — BENCH.md "5d"):
accumulated cross-engine divergence is Lyapunov-dominated. Kernel vs
oracle from arithmetic-noise initial agreement (1.9e-5 per step,
zero-action walker) reaches O(1) joint-angle error by t~=100 — an
effective per-step growth of ~1.12, far above any sane envelope. So use
``replay_check``'s pointwise gates for (a) determinism/self-replay and
(b) SHORT windows (<~100 steps, or per-step with resync as in the 4f2
methodology); long-horizon parity against a different engine must be
STATISTICAL (return distributions, episode lengths, contact-impulse
histograms). A 600-step pointwise pass against PyBullet is physically
impossible and its failure would carry no information.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json

import numpy as np

import jax
import jax.numpy as jnp

from mocca_envs_tpu.core import quat as quat_ops
from mocca_envs_tpu.envs.env import FnEnv


def model_hash(model) -> str:
    """Stable content hash of a RobotModel's arrays + topology."""
    h = hashlib.sha256()
    h.update(repr((model.parent, model.jtype, model.floating)).encode())
    for leaf in jax.tree.leaves(model):
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()[:16]


@dataclasses.dataclass
class Recording:
    meta: dict
    q: np.ndarray
    qd: np.ndarray
    action: np.ndarray
    obs: np.ndarray
    reward: np.ndarray
    done: np.ndarray

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            meta=json.dumps(self.meta),
            q=self.q, qd=self.qd, action=self.action,
            obs=self.obs, reward=self.reward, done=self.done,
        )

    @classmethod
    def load(cls, path: str) -> "Recording":
        z = np.load(path, allow_pickle=False)
        return cls(
            meta=json.loads(str(z["meta"])),
            q=z["q"], qd=z["qd"], action=z["action"],
            obs=z["obs"], reward=z["reward"], done=z["done"],
        )


def _q_to_file_convention(model, q: np.ndarray) -> np.ndarray:
    """Internal wxyz → file xyzw for the base quaternion block."""
    if not model.floating:
        return q
    out = q.copy()
    out[..., 3:7] = np.asarray(quat_ops.to_xyzw(jnp.asarray(q[..., 3:7])))
    return out


def record(
    env: FnEnv,
    model,
    seed: int,
    horizon: int,
    policy=None,
    env_id: str = "",
) -> Recording:
    """Record a single seeded episode of OUR engine (no auto-reset).

    ``policy(obs, t) → action`` defaults to zeros. This produces internal
    goldens proving the format + replayer machinery (SURVEY.md §4.3) and is
    the half of the parity pair we can run today.
    """
    state = env.init(jax.random.key(seed))
    step = jax.jit(env.step_no_reset)
    qs, qds, acts, obss, rews, dones = [], [], [], [], [], []
    qs.append(np.asarray(state.q))
    qds.append(np.asarray(state.qd))
    for t in range(horizon):
        obs = env.obs_fn(state)
        a = (
            np.zeros(env.act_dim, dtype=np.float32)
            if policy is None
            else np.asarray(policy(np.asarray(obs), t), dtype=np.float32)
        )
        tr = step(state, jnp.asarray(a))
        state = tr.state
        acts.append(a)
        obss.append(np.asarray(tr.obs))
        rews.append(float(tr.reward))
        dones.append(bool(tr.done))
        qs.append(np.asarray(state.q))
        qds.append(np.asarray(state.qd))
        if dones[-1]:
            break
    meta = {
        "env_id": env_id or env.name,
        "seed": seed,
        "engine": "tpu",
        "model_hash": model_hash(model),
        "control_dt": env.control_dt,
        "format_version": 1,
    }
    return Recording(
        meta=meta,
        q=_q_to_file_convention(model, np.stack(qs)),
        qd=np.stack(qds),
        action=np.stack(acts),
        obs=np.stack(obss),
        reward=np.asarray(rews, dtype=np.float32),
        done=np.asarray(dones),
    )


@dataclasses.dataclass
class ToleranceGate:
    """Contact-solver tolerance gates (BASELINE.json config 1 wording)."""

    q_atol: float = 1e-3          # base tolerance on generalized positions
    growth: float = 1.02          # per-step multiplicative envelope
    reward_atol: float = 1e-2
    obs_atol: float = 5e-3

    def envelope(self, t: int, atol: float) -> float:
        return atol * (self.growth ** t)


def replay_check(
    env: FnEnv,
    model,
    rec: Recording,
    gate: ToleranceGate = ToleranceGate(),
) -> dict:
    """Re-run the recorded actions; return per-channel max errors + verdict.

    This is the gate that will compare against PYBULLET recordings when the
    reference appears; today it validates determinism against our own
    goldens (errors must be ~0) and exercises the full tolerance machinery.
    """
    state = env.init(jax.random.key(int(rec.meta["seed"])))
    step = jax.jit(env.step_no_reset)
    T = rec.action.shape[0]
    q_err = np.zeros(T)
    r_err = np.zeros(T)
    o_err = np.zeros(T)
    ok = True
    fail = ""
    for t in range(T):
        tr = step(state, jnp.asarray(rec.action[t]))
        state = tr.state
        q_now = _q_to_file_convention(model, np.asarray(state.q))
        q_err[t] = float(np.max(np.abs(q_now - rec.q[t + 1])))
        r_err[t] = abs(float(tr.reward) - float(rec.reward[t]))
        o_err[t] = float(np.max(np.abs(np.asarray(tr.obs) - rec.obs[t])))
        # EVERY channel gates: a parity run that matches positions but not
        # rewards/obs is not parity (BASELINE config 1 compares trajectory,
        # obs, reward AND return)
        if q_err[t] > gate.envelope(t, gate.q_atol):
            ok, fail = False, fail or f"q@{t}"
        if r_err[t] > gate.envelope(t, gate.reward_atol):
            ok, fail = False, fail or f"reward@{t}"
        if o_err[t] > gate.envelope(t, gate.obs_atol):
            ok, fail = False, fail or f"obs@{t}"
        if bool(tr.done) != bool(rec.done[t]):
            ok, fail = False, fail or f"done@{t}"
            break
    return {
        "ok": ok,
        "first_failure": fail,
        "steps": T,
        "max_q_err": float(q_err.max(initial=0.0)),
        "max_reward_err": float(r_err.max(initial=0.0)),
        "max_obs_err": float(o_err.max(initial=0.0)),
    }


# --------------------------------------------------------------- raw physics
# Engine-level parity, independent of the reference PACKAGE: our exported
# data/*.urdf assets (models/assets.py) describe identical robots in a
# format stock pybullet loads, so a cross-ENGINE comparison needs only
# `pip install pybullet` even while /root/reference stays empty. Ours-side
# recorder + replayer below; the pybullet mirror lives in
# parity_record_pybullet.py (--raw-urdf --match).


def record_raw(
    model,
    config,
    seed: int,
    horizon: int,
    q0: np.ndarray,
    qd0: np.ndarray | None = None,
    torque_scale: float = 0.3,
    friction: float = 0.8,
    name: str = "raw",
) -> Recording:
    """Record raw physics (no task): seeded torques through make_control_step.

    ``action[t]`` holds the actual joint torques so any engine can mirror
    the run verbatim. obs/reward/done carry zeros (no task semantics).
    """
    from mocca_envs_tpu.ops.step import make_control_step
    from mocca_envs_tpu.terrain import scene as scene_mod

    ctrl = jax.jit(
        lambda q, qd, tau: make_control_step(model, config)(
            q, qd, tau, scene_mod.flat(friction=friction)
        )
    )
    rng = np.random.default_rng(seed)
    taus = (
        torque_scale
        * np.asarray(model.power_coef)
        * rng.uniform(-1.0, 1.0, size=(horizon, model.nj))
    ).astype(np.float32)
    q = jnp.asarray(q0, dtype=jnp.float32)
    qd = jnp.asarray(
        qd0 if qd0 is not None else np.zeros(model.nv), dtype=jnp.float32
    )
    qs, qds = [np.asarray(q)], [np.asarray(qd)]
    for t in range(horizon):
        q, qd, _info = ctrl(q, qd, jnp.asarray(taus[t]))
        qs.append(np.asarray(q))
        qds.append(np.asarray(qd))
    T = horizon
    meta = {
        "env_id": name,
        "seed": seed,
        "engine": "tpu_raw",
        "model_hash": model_hash(model),
        "control_dt": float(config.control_dt),
        "dt": float(config.dt),
        "sim_substeps": int(config.sim_substeps),
        "llc_frames": int(config.llc_frames),
        "solver_iters": int(config.solver_iters),
        "friction": friction,
        "format_version": 1,
    }
    return Recording(
        meta=meta,
        q=_q_to_file_convention(model, np.stack(qs)),
        qd=np.stack(qds),
        action=taus,
        obs=np.zeros((T, 0), dtype=np.float32),
        reward=np.zeros((T,), dtype=np.float32),
        done=np.zeros((T,), dtype=bool),
    )


def replay_check_raw(
    model,
    config,
    rec: Recording,
    gate: ToleranceGate = ToleranceGate(),
) -> dict:
    """Replay a raw-physics recording through OUR engine and gate q/qd.

    Initial state comes from the recording itself (q[0]/qd[0], file xyzw
    convention), so a pybullet-produced recording of the same URDF with the
    same torques gates cross-engine trajectory parity directly.
    """
    from mocca_envs_tpu.ops.step import make_control_step
    from mocca_envs_tpu.terrain import scene as scene_mod

    q0 = np.array(rec.q[0])
    if model.floating:
        q0[3:7] = np.asarray(quat_ops.from_xyzw(jnp.asarray(q0[3:7])))
    ctrl = jax.jit(
        lambda q, qd, tau: make_control_step(model, config)(
            q, qd, tau, scene_mod.flat(friction=float(rec.meta["friction"]))
        )
    )
    q = jnp.asarray(q0, dtype=jnp.float32)
    qd = jnp.asarray(rec.qd[0], dtype=jnp.float32)
    T = rec.action.shape[0]
    q_err = np.zeros(T)
    ok = True
    fail = ""
    for t in range(T):
        q, qd, _info = ctrl(q, qd, jnp.asarray(rec.action[t]))
        q_now = _q_to_file_convention(model, np.asarray(q))
        q_err[t] = float(np.max(np.abs(q_now - rec.q[t + 1])))
        if q_err[t] > gate.envelope(t, gate.q_atol):
            ok, fail = False, fail or f"q@{t}"
    return {
        "ok": ok,
        "first_failure": fail,
        "steps": T,
        "max_q_err": float(q_err.max(initial=0.0)),
    }


def reference_recorder_stub() -> str:
    """CLI recipe for producing the pybullet half of the parity pair.

    Runnable the moment ``/root/reference`` is populated and pybullet is
    installed (SURVEY.md §0 verification protocol). Kept as an executable
    docstring so the interchange contract lives next to the replayer.
    """
    return (
        "python -m mocca_envs_tpu.harness.parity_record_pybullet "
        "--env Walker3DCustomEnv-v0 --seed 0 --horizon 1000 "
        "--out recordings/walker3d_seed0.npz\n"
        "# writes the same npz schema with meta.engine='pybullet'; quats "
        "already xyzw; actions replayed from a saved action file or a "
        "seeded policy"
    )
