"""Quaternion algebra for the TPU locomotion engine.

Scalar-first convention: ``q = (w, x, y, z)``. All functions are pure,
shape-polymorphic over leading batch dimensions, and safe under ``jit`` /
``vmap`` / ``grad``.

Reference parity note: the reference engine (UBCMOCCA/mocca_envs, via
pybullet) uses scalar-last ``(x, y, z, w)`` quaternions; conversion happens
only at the parity-harness boundary (``harness/parity.py``). Internally we use
scalar-first, matching the JAX ecosystem convention.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "identity",
    "normalize",
    "mul",
    "conj",
    "rotate",
    "inv_rotate",
    "to_matrix",
    "from_matrix",
    "from_axis_angle",
    "from_rpy",
    "to_rpy",
    "integrate",
    "from_angular_velocity",
    "to_xyzw",
    "from_xyzw",
]

_EPS = 1e-12


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Return the unit quaternion along ``q`` (safe at ‖q‖ → 0)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``a ⊗ b`` (applies ``b``'s rotation first)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector ``v`` by unit quaternion ``q`` (body → world).

    Uses the 15-mul Rodrigues form: ``v + 2 q_v × (q_v × v + q_w v)``.
    """
    qv = q[..., 1:]
    qw = q[..., :1]
    t = jnp.cross(qv, jnp.cross(qv, v) + qw * v)
    return v + 2.0 * t


def inv_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``v`` by ``q⁻¹`` (world → body)."""
    return rotate(conj(q), v)


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion → 3×3 rotation matrix (row-major, acts on columns)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """3×3 rotation matrix → unit quaternion (branchless Shepperd variant).

    Numerically stable for all rotations; used only in offline model
    compilation and tests, so clarity beats speed here.
    """
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    # Four candidate constructions, each stable in a different region.
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + tr)) / 2.0
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2])) / 2.0
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2])) / 2.0
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2])) / 2.0
    qx = jnp.copysign(qx, m[..., 2, 1] - m[..., 1, 2])
    qy = jnp.copysign(qy, m[..., 0, 2] - m[..., 2, 0])
    qz = jnp.copysign(qz, m[..., 1, 0] - m[..., 0, 1])
    return normalize(jnp.stack([qw, qx, qy, qz], axis=-1))


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit ``axis`` + ``angle`` [rad] → quaternion. Broadcasts over batch."""
    angle = jnp.asarray(angle)[..., None]
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half), axis * jnp.sin(half)], axis=-1
    )


def from_rpy(rpy: jnp.ndarray) -> jnp.ndarray:
    """URDF-convention fixed-axis roll/pitch/yaw → quaternion.

    ``R = Rz(yaw) · Ry(pitch) · Rx(roll)`` — matches how the reference's
    URDF/MJCF loader (pybullet ``getQuaternionFromEuler``) interprets
    ``rpy`` attributes (cited: mocca_envs data assets, SURVEY.md §2 C6).
    """
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        axis=-1,
    )


def to_rpy(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion → (roll, pitch, yaw), inverse of :func:`from_rpy`.

    Used by observation construction (reference behavior B4,
    ``robots.py::WalkerBase.calc_state`` exposes roll/pitch and uses yaw as
    the heading frame). Gimbal-safe via clipped asin.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def from_angular_velocity(omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Exact exponential map: world-frame ``ω`` over ``dt`` → delta quaternion.

    Taylor-safe near ‖ω‖ → 0 (sinc form), so it is differentiable at rest.
    """
    half_theta_vec = 0.5 * dt * omega
    half_theta = jnp.linalg.norm(half_theta_vec, axis=-1, keepdims=True)
    # sinc(x) = sin(x)/x, stable at 0 via jnp.sinc(x/pi)
    s = jnp.sinc(half_theta / jnp.pi)
    return jnp.concatenate([jnp.cos(half_theta), half_theta_vec * s], axis=-1)


def integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation under world-frame angular velocity.

    ``q(t+dt) = exp(dt/2 · [0, ω_world]) ⊗ q(t)`` — the TPU-native
    replacement for Bullet's base-orientation update inside
    ``stepSimulation`` (SURVEY.md §2.3). Renormalizes to fight f32 drift.
    """
    dq = from_angular_velocity(omega_world, dt)
    return normalize(mul(dq, q))


def to_xyzw(q: jnp.ndarray) -> jnp.ndarray:
    """Scalar-first → pybullet scalar-last, for the parity harness."""
    return jnp.concatenate([q[..., 1:], q[..., :1]], axis=-1)


def from_xyzw(q: jnp.ndarray) -> jnp.ndarray:
    """pybullet scalar-last → scalar-first."""
    return jnp.concatenate([q[..., 3:], q[..., :3]], axis=-1)
