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
