"""Child3D: scaled-down Walker3D.

Reconstructs the reference's child-sized humanoid variant
(``mocca_envs/robots.py::Child3D`` — SURVEY.md §2.1 C5 [K-low]): the same
tree as Walker3D with geometric scale s on lengths, s³ on masses, s⁵ on
inertias, and s³ on joint power (muscle cross-section × moment arm).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from mocca_envs_tpu.models import walker3d
from mocca_envs_tpu.models.schema import RobotModel

SCALE = 0.5
INITIAL_Z = walker3d.INITIAL_Z * SCALE


@functools.lru_cache(maxsize=2)
def make_model(scale: float = SCALE) -> RobotModel:
    m = walker3d.make_model()
    s = jnp.asarray(scale, dtype=jnp.float32)
    return m.replace(
        joint_pos=m.joint_pos * s,
        mass=m.mass * s**3,
        com=m.com * s,
        inertia=m.inertia * s**5,
        power_coef=m.power_coef * s**3,
        armature=m.armature * s**5,
        sph_pos=m.sph_pos * s,
        sph_radius=m.sph_radius * s,
    )
