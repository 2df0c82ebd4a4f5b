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


def integrate(model: RobotModel, q: jnp.ndarray, qd_new: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Advance positions with already-updated velocities."""
    if not model.floating:
        return q + dt * qd_new
    pos = q[0:3] + dt * qd_new[0:3]
    quat = quat_ops.integrate(q[3:7], qd_new[3:6], dt)
    joints = q[7:] + dt * qd_new[6:]
    return jnp.concatenate([pos, quat, joints])
