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


LIMIT_SLOP = 5e-3  # joint-limit violation tolerated before the backstop [rad|m]


def _limit_backstop(model: RobotModel, joints, qd_j):
    """Backstop projection BEYOND the solver's limit rows.

    Joint limits are primarily unilateral constraint rows in the impulse
    solver (ops/solver.pgs_solve — momentum-consistent, like Bullet). This
    projection only catches fly-through past ``LIMIT_SLOP`` (a joint can
    cross margin + slop within one substep at high speed) and then zeroes
    ONLY the outward velocity component, so an inward-recovering joint keeps
    its momentum. A plain clamp-and-zero here is an energy pump: zeroing a
    fast limb's velocity without an impulse on the rest of the tree breaks
    momentum conservation every substep it fires (scripts/diag_flight.py).
    """
    lo = model.limit_lo - LIMIT_SLOP
    hi = model.limit_hi + LIMIT_SLOP
    clamped = jnp.clip(joints, lo, hi)
    qd_out = jnp.where((joints > hi) & (qd_j > 0.0), 0.0, qd_j)
    qd_out = jnp.where((joints < lo) & (qd_out < 0.0), 0.0, qd_out)
    return clamped, qd_out


def integrate(model: RobotModel, q: jnp.ndarray, qd_new: jnp.ndarray, dt: float,
              qd_pos: jnp.ndarray | None = None):
    """Advance positions with already-updated velocities, then apply the
    joint-limit backstop (see ``_limit_backstop`` — the real limit handling
    is constraint rows in the solver).

    ``qd_pos`` (nv,) is the split-impulse pseudo-velocity
    (EngineConfig.split_impulse): it is ADDED for the position advance only
    and never appears in the returned velocity — Bullet's
    m_pushVelocity/m_turnVelocity channel. The limit backstop still clamps
    the (pseudo-advanced) position and zeroes only the REAL outward velocity.

    Velocities are hard-capped at ±MAX_VEL (Bullet similarly clamps), which
    turns a would-be NaN cascade from a violent contact into a recoverable
    fast motion — the per-env health mask (SURVEY.md §5.3) still counts it.
    Returns ``(q', qd')``.
    """
    qd_new = jnp.clip(qd_new, -MAX_VEL, MAX_VEL)
    qd_int = qd_new if qd_pos is None else qd_new + qd_pos
    if not model.floating:
        joints = q + dt * qd_int
        clamped, qd_out = _limit_backstop(model, joints, qd_new)
        return clamped, qd_out
    pos = q[0:3] + dt * qd_int[0:3]
    quat = quat_ops.integrate(q[3:7], qd_int[3:6], dt)
    joints = q[7:] + dt * qd_int[6:]
    clamped, qd_j = _limit_backstop(model, joints, qd_new[6:])
    return (
        jnp.concatenate([pos, quat, clamped]),
        jnp.concatenate([qd_new[:6], qd_j]),
    )
