"""Small rigid-body math helpers shared across the engine.

World-frame Newton–Euler formulation: link kinematics/dynamics are carried as
plain 3-vectors (ω, v, α, a) in world coordinates rather than Featherstone
6-vectors — on TPU the fused elementwise chains this produces vectorize
cleanly over the env batch (VPU lanes), and the mass matrix is assembled from
per-link Jacobians as batched matmuls (MXU) instead of spatial-inertia
recursions. See ops/dynamics.py.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["skew", "cross", "transform_point", "inertia_world", "rotate_inertia"]


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector → skew-symmetric matrix with ``skew(v) @ u == v × u``."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def transform_point(rot: jnp.ndarray, pos: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply rigid transform (rot 3×3, pos 3) to local point ``p``."""
    return pos + jnp.einsum("...ij,...j->...i", rot, p)


def rotate_inertia(rot: jnp.ndarray, inertia: jnp.ndarray) -> jnp.ndarray:
    """Rotate a body-frame inertia tensor into the world frame: R I Rᵀ."""
    return jnp.einsum("...ij,...jk,...lk->...il", rot, inertia, rot)


def inertia_world(rot: jnp.ndarray, inertia_diag: jnp.ndarray) -> jnp.ndarray:
    """World-frame inertia from a principal-axis (diagonal) body inertia."""
    return jnp.einsum(
        "...ij,...j,...kj->...ik", rot, inertia_diag, rot
    )
