"""Shared task machinery: observation pieces and reward terms.

Reconstructs the common structure of the reference task envs
(``mocca_envs/env_locomotion.py`` + ``robots.py::WalkerBase.calc_state`` —
SURVEY.md §2.2 behaviors B4/B5). The pybullet-lineage constants are
parametrized in each family's ``Params`` pytree so they can be fit during
parity testing (SURVEY.md §0: exact constants are [K-med] until the
reference appears).
"""

from __future__ import annotations

import jax.numpy as jnp

from mocca_envs_tpu.core import quat as quat_ops
from mocca_envs_tpu.models.schema import RobotModel
from mocca_envs_tpu.ops.kinematics import joint_q, joint_qd


def heading_yaw(q: jnp.ndarray) -> jnp.ndarray:
    """Base yaw angle — the heading frame used throughout calc_state (B4)."""
    return quat_ops.to_rpy(q[3:7])[2]


def to_heading_frame(yaw: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate a world vector into the yaw-aligned (heading) frame."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack(
        [c * v[0] + s * v[1], -s * v[0] + c * v[1], v[2]]
    )


def joint_obs(model: RobotModel, q: jnp.ndarray, qd: jnp.ndarray):
    """(q_scaled, 0.1·q̇) — reference joint obs normalization (B4 [K-med]).

    Angles scaled relative to limits: ``2 (q − mid) / range`` ∈ [−1, 1];
    velocities scaled by 0.1, both per ``WalkerBase.calc_state``.
    """
    qj = joint_q(model, q)
    qdj = joint_qd(model, qd)
    mid = 0.5 * (model.limit_lo + model.limit_hi)
    rng = jnp.maximum(model.limit_hi - model.limit_lo, 1e-6)
    q_scaled = 2.0 * (qj - mid) / rng
    return q_scaled, 0.1 * qdj


def body_obs(
    model: RobotModel,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    initial_z: float,
    angle_to_target: jnp.ndarray,
) -> jnp.ndarray:
    """The 8-dim "more" block of calc_state (B4):
    [Δz, sin(α), cos(α), 0.3·v_heading(3), roll, pitch]."""
    yaw = heading_yaw(q)
    rpy = quat_ops.to_rpy(q[3:7])
    v_head = to_heading_frame(yaw, qd[0:3])
    return jnp.concatenate(
        [
            jnp.stack([q[2] - initial_z, jnp.sin(angle_to_target), jnp.cos(angle_to_target)]),
            0.3 * v_head,
            rpy[0:2],
        ]
    )


def torque_actuation(model: RobotModel, power: float):
    """Walker torque map (behavior B2): τ = power · power_coef · clip(a)."""

    def actuation(q, qd, action):
        a = jnp.clip(action, -1.0, 1.0)
        return power * model.power_coef * model.actuated * a

    return actuation


def pd_actuation(model: RobotModel):
    """Cassie-style joint-position servo (behavior B3), recomputed per llc
    frame by ops/step.make_control_step: τ = kp (q* − q) − kd q̇ on motors."""

    def actuation(q, qd, action):
        qj = joint_q(model, q)
        qdj = joint_qd(model, qd)
        return model.actuated * (model.kp * (action - qj) - model.kd * qdj)

    return actuation


def energy_costs(
    model: RobotModel,
    action: jnp.ndarray,
    qd: jnp.ndarray,
    w_electricity: jnp.ndarray,
    w_stall: jnp.ndarray,
):
    """Electricity + stall-torque costs (B5, pybullet-lineage [K-med]):
    ``w_e · mean|a · q̇_scaled| + w_s · mean(a²)`` (returned positive)."""
    a = jnp.clip(action, -1.0, 1.0)
    qdj = joint_qd(model, qd)
    elec = w_electricity * jnp.mean(jnp.abs(a * 0.1 * qdj))
    stall = w_stall * jnp.mean(jnp.square(a))
    return elec + stall


def joints_at_limit_cost(model: RobotModel, q: jnp.ndarray, w: jnp.ndarray):
    """Count of joints within 1% of their limits, weighted (B5)."""
    q_scaled, _ = joint_obs(model, q, jnp.zeros_like(q))
    return w * jnp.sum((jnp.abs(q_scaled) > 0.99).astype(q.dtype))


def reset_foot_flags(model: RobotModel, contact_margin: float, state) -> jnp.ndarray:
    """Foot-contact flags at reset time, from the SAME narrowphase predicate
    the in-step solver flags use (depth > 0 vs the actual scene), so
    obs[t=0] and obs[t>0] share one contact semantics — a seeded parity diff
    must not trip on frame 0 (VERDICT r1 weak #2)."""
    from mocca_envs_tpu.ops.collide import collide, foot_contact_flags
    from mocca_envs_tpu.ops.kinematics import forward_kinematics

    fd = forward_kinematics(model, state.q, state.qd)
    contacts = collide(model, fd, state.scene, contact_margin)
    return foot_contact_flags(model, contacts)


def mirror_spec(model: RobotModel, extra_obs_perm=None, extra_obs_sign=None):
    """Left/right mirror maps for symmetry-aware RL.

    Reconstructs the reference's mirror-index accessors
    (``robots.py`` mirror arrays consumed by symmetry-augmented training —
    SURVEY.md §2.1 C5 [K-med]) for the standard obs layout
    ``[body(8), q_scaled(nj), 0.1·q̇(nj), feet(nfeet), extra…]``:

    - body block: sin(α), v_y, roll negate under y-reflection;
    - joint blocks: permute via the model's left/right joint map with signs
      (x/z hinges negate);
    - feet flags: swap left/right;
    - ``extra_obs_perm``/``sign`` append task-specific tail maps.

    Returns dict with ``obs_perm``, ``obs_sign``, ``act_perm``, ``act_sign``
    — apply as ``obs_m = obs[obs_perm] * obs_sign``.
    """
    import numpy as np

    nj = model.nj
    nfeet = len(model.foot_links)
    jp = np.asarray(model.mirror_act_perm)
    js = np.asarray(model.mirror_act_sign)

    perm = list(range(8))
    sign = [1.0, -1.0, 1.0, 1.0, -1.0, 1.0, -1.0, 1.0]  # sinα, vy, roll flip
    base = 8
    perm += list(base + jp)
    sign += list(js)
    base += nj
    perm += list(base + jp)
    sign += list(js)
    base += nj
    # feet flags: swap right/left pairs (foot order is right, left per side)
    foot_perm = list(range(nfeet))
    for i, name in enumerate(model.foot_links):
        if name.startswith("right_"):
            other = name.replace("right_", "left_")
        elif name.startswith("left_"):
            other = name.replace("left_", "right_")
        else:
            other = name
        if other in model.foot_links:
            foot_perm[i] = model.foot_links.index(other)
    perm += [base + p for p in foot_perm]
    sign += [1.0] * nfeet
    base += nfeet
    if extra_obs_perm is not None:
        perm += [base + p for p in extra_obs_perm]
        sign += list(extra_obs_sign)
    return {
        "obs_perm": jnp.asarray(np.array(perm, dtype=np.int32)),
        "obs_sign": jnp.asarray(np.array(sign, dtype=np.float32)),
        "act_perm": model.mirror_act_perm,
        "act_sign": model.mirror_act_sign,
    }


def mirror_obs(spec: dict, obs: jnp.ndarray) -> jnp.ndarray:
    return obs[..., spec["obs_perm"]] * spec["obs_sign"]


def mirror_action(spec: dict, action: jnp.ndarray) -> jnp.ndarray:
    return action[..., spec["act_perm"]] * spec["act_sign"]
