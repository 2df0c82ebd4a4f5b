"""Analytic dynamics gates (SURVEY.md §4.1): the engine vs closed forms and
vs an independent Lagrangian-autodiff oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocca_envs_tpu.ops.dynamics import bias_forces, forward_dynamics, mass_matrix
from mocca_envs_tpu.ops.kinematics import forward_kinematics, point_jacobian

from tests.models_util import (
    double_pendulum,
    floating_chain,
    free_body,
    free_q,
    free_qd,
    pendulum,
)

G = 9.8


# --------------------------------------------------------------- pendulum
def test_pendulum_mass_matrix():
    m, l = 1.3, 0.8
    model = pendulum(m, l)
    q = jnp.array([0.7])
    qd = jnp.array([0.0])
    fd = forward_kinematics(model, q, qd)
    M = mass_matrix(model, fd)
    np.testing.assert_allclose(M, [[m * l * l]], rtol=1e-5)


def test_pendulum_gravity_torque():
    m, l = 1.3, 0.8
    model = pendulum(m, l)
    for angle in [0.0, 0.4, -1.1, 2.5]:
        q = jnp.array([angle])
        qd = jnp.array([0.0])
        fd = forward_kinematics(model, q, qd)
        b = bias_forces(model, fd, qd)
        np.testing.assert_allclose(b, [m * G * l * np.sin(angle)], rtol=1e-4, atol=1e-5)


def test_pendulum_no_coriolis():
    model = pendulum()
    q = jnp.array([0.3])
    fd0 = forward_kinematics(model, q, jnp.array([0.0]))
    fd1 = forward_kinematics(model, q, jnp.array([3.0]))
    b0 = bias_forces(model, fd0, jnp.array([0.0]))
    b1 = bias_forces(model, fd1, jnp.array([3.0]))
    np.testing.assert_allclose(b0, b1, atol=1e-4)


# -------------------------------------------- double pendulum vs Lagrangian
M1, M2 = 1.1, 0.7
L1, LC1, LC2 = 0.9, 0.5, 0.35
I1, I2 = 0.02, 0.01


def _coms(q):
    q1, q2 = q[0], q[1]
    c1 = LC1 * jnp.array([-jnp.sin(q1), 0.0, -jnp.cos(q1)])
    j2 = L1 * jnp.array([-jnp.sin(q1), 0.0, -jnp.cos(q1)])
    c2 = j2 + LC2 * jnp.array([-jnp.sin(q1 + q2), 0.0, -jnp.cos(q1 + q2)])
    return c1, c2


def _kinetic(q, qd):
    J1 = jax.jacfwd(lambda q: _coms(q)[0])(q)
    J2 = jax.jacfwd(lambda q: _coms(q)[1])(q)
    v1, v2 = J1 @ qd, J2 @ qd
    w1, w2 = qd[0], qd[0] + qd[1]
    return 0.5 * (M1 * v1 @ v1 + M2 * v2 @ v2 + I1 * w1**2 + I2 * w2**2)


def _potential(q):
    c1, c2 = _coms(q)
    return G * (M1 * c1[2] + M2 * c2[2])


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_double_pendulum_vs_lagrangian(seed):
    model = double_pendulum(M1, M2, L1, LC1, LC2, I1, I2)
    key = jax.random.key(seed)
    q = jax.random.uniform(key, (2,), minval=-2.0, maxval=2.0)
    qd = jax.random.uniform(jax.random.fold_in(key, 1), (2,), minval=-3.0, maxval=3.0)

    fd = forward_kinematics(model, q, qd)
    M_engine = mass_matrix(model, fd)
    b_engine = bias_forces(model, fd, qd)

    M_ref = jax.hessian(_kinetic, argnums=1)(q, qd)
    # Euler–Lagrange: bias = (∂(M q̇)/∂q) q̇ − ∂T/∂q + ∂U/∂q
    mom = lambda q: jax.grad(_kinetic, argnums=1)(q, qd)
    gamma = jax.jacfwd(mom)(q) @ qd
    b_ref = gamma - jax.grad(_kinetic, argnums=0)(q, qd) + jax.grad(_potential)(q)

    np.testing.assert_allclose(M_engine, M_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(b_engine, b_ref, rtol=1e-3, atol=1e-4)


# ------------------------------------------------------------- free body
def test_free_body_falls_at_g():
    model = free_body()
    q = free_q(pos=(0.3, -0.2, 2.0), quat=(0.9238795, 0.0, 0.3826834, 0.0))
    qd = free_qd(lin=(1.0, 0.5, 0.2), ang=(2.0, -1.0, 0.5))
    q, qd = jnp.asarray(q), jnp.asarray(qd)
    fd = forward_kinematics(model, q, qd)
    tau = jnp.zeros(6)
    qdd, _ = forward_dynamics(model, fd, qd, tau)

    alpha, a_o = qdd[3:6], qdd[0:3]
    rc = fd.com_w[0] - fd.pos[0]
    omega = qd[3:6]
    a_com = a_o + jnp.cross(alpha, rc) + jnp.cross(omega, jnp.cross(omega, rc))
    np.testing.assert_allclose(a_com, [0.0, 0.0, -G], rtol=1e-4, atol=1e-4)

    # torque-free Euler equation about COM: I α + ω × I ω = 0
    Iw = fd.inertia_w[0]
    resid = Iw @ alpha + jnp.cross(omega, Iw @ omega)
    np.testing.assert_allclose(resid, np.zeros(3), atol=1e-4)


# ---------------------------------------------------------- point jacobian
@pytest.mark.parametrize("seed", [0, 3])
def test_point_jacobian_matches_velocity(seed):
    model = floating_chain()
    key = jax.random.key(seed)
    ks = jax.random.split(key, 4)
    q = jnp.concatenate(
        [
            jax.random.normal(ks[0], (3,)),
            _rand_quat(ks[1]),
            jax.random.uniform(ks[2], (model.nj,), minval=-1.0, maxval=1.0),
        ]
    )
    qd = jax.random.normal(ks[3], (model.nv,))
    fd = forward_kinematics(model, q, qd)
    for link in range(model.nl):
        x = fd.pos[link] + fd.rot[link] @ jnp.array([0.03, -0.07, 0.11])
        J = point_jacobian(model, fd, link, x)
        v_jac = J @ qd
        v_fk = fd.vel[link] + jnp.cross(fd.omega[link], x - fd.pos[link])
        np.testing.assert_allclose(v_jac, v_fk, rtol=1e-4, atol=1e-5)


def _rand_quat(key):
    q = jax.random.normal(key, (4,))
    return q / jnp.linalg.norm(q)


# ----------------------------------------------------- jit/vmap properties
def test_vmap_equals_stacked():
    model = floating_chain()
    key = jax.random.key(7)
    B = 5
    qs = jnp.stack(
        [
            jnp.concatenate(
                [
                    jnp.array([0.0, 0.0, 1.0 + 0.1 * i]),
                    _rand_quat(jax.random.fold_in(key, i)),
                    jnp.full((model.nj,), 0.1 * i),
                ]
            )
            for i in range(B)
        ]
    )
    qds = jax.random.normal(jax.random.fold_in(key, 99), (B, model.nv))

    f = lambda q, qd: mass_matrix(model, forward_kinematics(model, q, qd))
    batched = jax.vmap(f)(qs, qds)
    stacked = jnp.stack([f(qs[i], qds[i]) for i in range(B)])
    np.testing.assert_allclose(batched, stacked, rtol=1e-5, atol=1e-6)


def test_jit_equals_eager():
    model = floating_chain()
    q = jnp.asarray(free_q(joints=(0.2, -0.3)))
    qd = jnp.asarray(free_qd(lin=(0.5, 0, 0), ang=(0, 1, 0), joints=(1.0, -0.5)))
    f = lambda q, qd: bias_forces(model, forward_kinematics(model, q, qd), qd)
    np.testing.assert_allclose(jax.jit(f)(q, qd), f(q, qd), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_airborne_com_free_falls_under_internal_torques():
    """Momentum-conservation regression (the "flying walker" bug).

    Internal joint torques can exert NO net force on the COM: an airborne
    robot must free-fall whatever the policy does. The old joint-limit
    projection clamp (zero qd at the bound, outside the solver) violated
    this — random full-power torques pumped the walker to z ≈ 50 m and
    +80 m/s within one second (scripts/diag_flight.py), making every
    locomotion task unlearnable. Limits are now unilateral solver rows.
    """
    from mocca_envs_tpu.models import walker3d
    from mocca_envs_tpu.ops.step import make_control_step
    from mocca_envs_tpu.terrain import scene as scene_mod
    from mocca_envs_tpu.utils.config import EngineConfig

    model = walker3d.make_model()
    config = EngineConfig(use_pallas=False)
    control = make_control_step(
        model,
        config,
        actuation=lambda q, qd, a: model.power_coef * model.actuated * jnp.clip(a, -1, 1),
    )
    scene = scene_mod.flat(ground_z=-1000.0)  # never touches down

    def com_z(q, qd):
        fd = forward_kinematics(model, q, qd)
        return jnp.sum(fd.com_w[:, 2] * model.mass) / jnp.sum(model.mass)

    def roll(steps):
        q = jnp.concatenate(
            [jnp.array([0.0, 0.0, 50.0]), jnp.array([1.0, 0, 0, 0]), jnp.zeros(model.nj)]
        )
        qd = jnp.zeros(model.nv)
        z0 = com_z(q, qd)

        def body(carry, k):
            q, qd = carry
            a = jax.random.uniform(k, (model.nj,), minval=-1.0, maxval=1.0)
            q2, qd2, _ = control(q, qd, a, scene)
            return (q2, qd2), None

        (q, qd), _ = jax.lax.scan(body, (q, qd), jax.random.split(jax.random.key(3), steps))
        return z0, com_z(q, qd)

    steps = 30
    z0, z1 = jax.jit(lambda: roll(steps))()
    T = steps * EngineConfig().control_dt
    expected_drop = 0.5 * 9.8 * T * T
    np.testing.assert_allclose(float(z0 - z1), expected_drop, atol=0.12)
