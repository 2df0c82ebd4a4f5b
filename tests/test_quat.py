"""Quaternion / spatial algebra identities (SURVEY.md §4.1 unit gates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocca_envs_tpu.core import quat


def rand_quat(key):
    q = jax.random.normal(key, (4,))
    return quat.normalize(q)


@pytest.fixture
def keys():
    return jax.random.split(jax.random.key(0), 8)


def test_mul_identity(keys):
    q = rand_quat(keys[0])
    np.testing.assert_allclose(quat.mul(quat.identity(), q), q, atol=1e-6)
    np.testing.assert_allclose(quat.mul(q, quat.identity()), q, atol=1e-6)


def test_rotate_matches_matrix(keys):
    q = rand_quat(keys[0])
    v = jax.random.normal(keys[1], (3,))
    np.testing.assert_allclose(
        quat.rotate(q, v), quat.to_matrix(q) @ v, atol=1e-5
    )


def test_mul_composes_rotation(keys):
    a, b = rand_quat(keys[0]), rand_quat(keys[1])
    v = jax.random.normal(keys[2], (3,))
    np.testing.assert_allclose(
        quat.rotate(quat.mul(a, b), v), quat.rotate(a, quat.rotate(b, v)), atol=1e-5
    )


def test_inv_rotate_roundtrip(keys):
    q = rand_quat(keys[0])
    v = jax.random.normal(keys[1], (3,))
    np.testing.assert_allclose(quat.inv_rotate(q, quat.rotate(q, v)), v, atol=1e-5)


def test_from_matrix_roundtrip(keys):
    for k in keys:
        q = rand_quat(k)
        q2 = quat.from_matrix(quat.to_matrix(q))
        # q and −q are the same rotation
        sign = jnp.sign(jnp.sum(q * q2))
        np.testing.assert_allclose(sign * q2, q, atol=1e-5)


def test_rpy_roundtrip():
    rpy = jnp.array([0.3, -0.4, 1.2])
    np.testing.assert_allclose(quat.to_rpy(quat.from_rpy(rpy)), rpy, atol=1e-5)


def test_rpy_matches_matrix_convention():
    # URDF fixed-axis: R = Rz(y) Ry(p) Rx(r)
    r, p, y = 0.2, -0.5, 0.9
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    expected = Rz @ Ry @ Rx
    got = quat.to_matrix(quat.from_rpy(jnp.array([r, p, y])))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_integrate_constant_omega():
    # Integrating ω = 2π ẑ for 1 s in small steps returns to start.
    q = quat.identity()
    omega = jnp.array([0.0, 0.0, 2 * np.pi])
    n = 1000
    for _ in range(4):
        pass  # keep loop below jitted
    def body(i, q):
        return quat.integrate(q, omega, 1.0 / n)
    qf = jax.lax.fori_loop(0, n, body, q)
    np.testing.assert_allclose(jnp.abs(jnp.sum(qf * q)), 1.0, atol=1e-4)


def test_integrate_matches_axis_angle():
    omega = jnp.array([0.3, -0.2, 0.7])
    dt = 0.01
    q = quat.integrate(quat.identity(), omega, dt)
    angle = float(jnp.linalg.norm(omega) * dt)
    axis = omega / jnp.linalg.norm(omega)
    q_ref = quat.from_axis_angle(axis, angle)
    np.testing.assert_allclose(q, q_ref, atol=1e-6)


def test_xyzw_roundtrip(keys):
    q = rand_quat(keys[0])
    np.testing.assert_allclose(quat.from_xyzw(quat.to_xyzw(q)), q, atol=1e-7)
