"""Semi-implicit (symplectic) Euler integration of generalized coordinates.

Matches Bullet's integrator ordering inside ``stepSimulation`` (velocities
updated by the solver first, then positions advanced with the *new*
velocities — SURVEY.md §2.3). Base orientation integrates exactly on the
quaternion manifold (core/quat.integrate) instead of Euler-angle stepping.
"""

from __future__ import annotations

import jax.numpy as jnp

from mocca_envs_tpu.core import quat as quat_ops
from mocca_envs_tpu.models.schema import RobotModel


MAX_VEL = 100.0  # hard cap on any generalized velocity [rad/s | m/s]


def integrate(model: RobotModel, q: jnp.ndarray, qd_new: jnp.ndarray, dt: float):
    """Advance positions with already-updated velocities, then enforce joint
    limits by projection.

    Limits: Bullet resolves joint limits as unilateral constraint rows in
    its solver (SURVEY.md §2.3); here they are enforced by clamping the
    joint coordinate to its range and zeroing any outward velocity — a
    cheaper, unconditionally stable approximation that differs only while a
    limit is actively engaged (inside the parity tolerance gates; revisit
    with solver rows if parity testing demands it).

    Velocities are hard-capped at ±MAX_VEL (Bullet similarly clamps), which
    turns a would-be NaN cascade from a violent contact into a recoverable
    fast motion — the per-env health mask (SURVEY.md §5.3) still counts it.
    Returns ``(q', qd')``.
    """
    qd_new = jnp.clip(qd_new, -MAX_VEL, MAX_VEL)
    if not model.floating:
        joints = q + dt * qd_new
        clamped = jnp.clip(joints, model.limit_lo, model.limit_hi)
        at_limit = clamped != joints
        qd_out = jnp.where(at_limit, 0.0, qd_new)
        return clamped, qd_out
    pos = q[0:3] + dt * qd_new[0:3]
    quat = quat_ops.integrate(q[3:7], qd_new[3:6], dt)
    joints = q[7:] + dt * qd_new[6:]
    clamped = jnp.clip(joints, model.limit_lo, model.limit_hi)
    at_limit = clamped != joints
    qd_j = jnp.where(at_limit, 0.0, qd_new[6:])
    return (
        jnp.concatenate([pos, quat, clamped]),
        jnp.concatenate([qd_new[:6], qd_j]),
    )
