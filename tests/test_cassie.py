"""Cassie gates: closed-chain constraint holds, springs act, PD servo
stabilizes the stand, planar variant stays in-plane (SURVEY.md B3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mocca_envs_tpu
from mocca_envs_tpu.models import cassie
from mocca_envs_tpu.ops.kinematics import forward_kinematics


@pytest.fixture(scope="module")
def env():
    return mocca_envs_tpu.make("CassieEnv")


def rod_gap(model, spec, q, qd):
    """Max |anchor_a − anchor_b| over the closed-chain rods."""
    fd = forward_kinematics(model, q, qd)
    gaps = []
    for k in range(spec.num_p2p):
        la, lb = spec.p2p_link_a[k], spec.p2p_link_b[k]
        aa = jnp.asarray(spec.p2p_anchor_a[k])
        ab = jnp.asarray(spec.p2p_anchor_b[k])
        xa = fd.pos[la] + fd.rot[la] @ aa
        xb = fd.pos[lb] + fd.rot[lb] @ ab
        gaps.append(jnp.linalg.norm(xa - xb))
    return float(jnp.max(jnp.stack(gaps)))


def test_model_structure():
    model = cassie.make_model()
    assert model.nj == 16  # 5 motors + 3 passive per leg
    assert int(jnp.sum(model.actuated)) == 10
    assert float(jnp.max(model.stiffness)) >= 1000.0  # leaf springs present


@pytest.mark.slow
def test_stand_pd_keeps_robot_up(env):
    """Zero action = hold stand pose; PD + springs + rods must stabilize for
    at least a second of sim time."""
    state = env.init(jax.random.key(0))
    step = jax.jit(env.step_no_reset)
    for i in range(30):  # 30 control steps at 30 Hz = 1 s
        tr = step(state, jnp.zeros(env.act_dim))
        state = tr.state
        assert bool(jnp.all(jnp.isfinite(state.q))), f"NaN at {i}"
    assert float(state.q[2]) > 0.65, float(state.q[2])


@pytest.mark.slow
def test_rod_constraint_stays_closed(env):
    model = cassie.make_model()
    spec = cassie.constraints()
    state = env.init(jax.random.key(1))
    g0 = rod_gap(model, spec, state.q, state.qd)
    step = jax.jit(env.step_no_reset)
    for _ in range(20):
        tr = step(state, 0.1 * jnp.sin(jnp.arange(env.act_dim) * 1.0))
        state = tr.state
    g1 = rod_gap(model, spec, state.q, state.qd)
    # Baumgarte holds the rod gap near its (small) initial closure error
    assert g1 < max(2.5 * g0, 0.05), (g0, g1)


def test_springs_resist_deflection():
    """Deflecting a spring joint must produce restoring torque (B3)."""
    model = cassie.make_model()
    from mocca_envs_tpu.ops.kinematics import joint_q

    qj = jnp.asarray(cassie.stand_q(model))
    shin_idx = model.joint_names.index("right_shin")
    # passive torque τ = −k (q − q_ref): deflect by +0.1 rad → τ ≈ −150
    tau = -model.stiffness[shin_idx] * (qj[shin_idx] + 0.1 - model.spring_ref[shin_idx])
    assert float(tau) < -100.0


@pytest.mark.slow
def test_cassie2d_stays_planar():
    env2d = mocca_envs_tpu.make("Cassie2DEnv")
    state = env2d.init(jax.random.key(2))
    step = jax.jit(env2d.step_no_reset)
    for _ in range(25):
        tr = step(state, 0.2 * jnp.ones(env2d.act_dim))
        state = tr.state
    assert abs(float(state.q[1])) < 0.02   # y stays locked
    from mocca_envs_tpu.core import quat

    rpy = quat.to_rpy(state.q[3:7])
    assert abs(float(rpy[0])) < 0.05       # roll locked
    assert abs(float(rpy[2])) < 0.05       # yaw locked


def test_phase_env_obs_has_clock():
    envp = mocca_envs_tpu.make("CassiePhaseEnv")
    env_plain = mocca_envs_tpu.make("CassieEnv")
    assert envp.obs_dim == env_plain.obs_dim + 2
    state = envp.init(jax.random.key(3))
    tr = jax.jit(envp.step)(state, jnp.zeros(envp.act_dim))
    sin_cos = tr.obs[-2:]
    assert abs(float(jnp.linalg.norm(sin_cos)) - 1.0) < 1e-5


def test_gait_table_interpolation_and_stance():
    """GaitTable.at_phase: row interpolation is exact at row phases, stance
    alternates legs half a cycle apart (reference-motion machinery for the
    CassiePhase* mocap behavior)."""
    from mocca_envs_tpu.models.cassie_gait import synthesized_walk

    g = synthesized_walk(period_steps=40.0, rows=64)
    # at phase of an exact row: interpolation returns that row
    row = 16
    phase = jnp.asarray(40.0 * row / 64)
    q_ref, st = g.at_phase(phase)
    np.testing.assert_allclose(
        np.asarray(q_ref), np.asarray(g.q_motors[row]), atol=1e-5
    )
    # alternating stance: legs out of phase by half a cycle
    q0, st0 = g.at_phase(jnp.asarray(0.0))
    q2, st2 = g.at_phase(jnp.asarray(20.0))
    np.testing.assert_allclose(np.asarray(st0), np.asarray(st2)[::-1], atol=1e-5)
    # midpoint interpolates between rows
    qm, _ = g.at_phase(jnp.asarray(40.0 * (row + 0.5) / 64))
    np.testing.assert_allclose(
        np.asarray(qm),
        0.5 * np.asarray(g.q_motors[row] + g.q_motors[row + 1]),
        atol=1e-5,
    )


def test_phase_env_tracks_reference_motion():
    """CassiePhaseEnv's imitation channel discriminates poses matching the
    gait table from poses off it.

    Gate on the tracking channel (``track_err`` → ``w_imitation·exp(-8e)``),
    NOT total reward: a +0.6 rad crouch legitimately launches the pelvis
    forward, and at converged contact accuracy (cold row-PGS @128 sweeps)
    the speed term outscores the imitation delta — the old total-reward
    assertion passed only under the under-converged round-2e solver
    defaults (measured in round 2i when warm_start became the default)."""
    from mocca_envs_tpu.models import cassie
    from mocca_envs_tpu.models.cassie_gait import synthesized_walk

    envp = mocca_envs_tpu.make("CassiePhaseEnv")
    model = cassie.make_model()
    g = synthesized_walk()
    stand = jnp.asarray(cassie.stand_q(model))
    motor_idx = np.nonzero(np.asarray(model.actuated) > 0.5)[0]

    state = envp.init(jax.random.key(5))
    phase = state.task.phase  # the step reward indexes the PRE-step phase
    q_ref_dev, _ = g.at_phase(phase)

    def posed(dev):
        qj = stand.at[jnp.asarray(motor_idx)].add(dev)
        q = state.q.at[7:].set(qj)
        return state.replace(q=q)

    act = jnp.zeros(envp.act_dim)
    step = jax.jit(envp.step_no_reset)
    tr_on = step(posed(q_ref_dev), act)
    tr_off = step(posed(q_ref_dev + 0.6), act)
    e_on = float(tr_on.metrics["track_err"])
    e_off = float(tr_off.metrics["track_err"])
    assert e_on < 0.05, e_on
    assert e_off > 10.0 * max(e_on, 1e-4), (e_on, e_off)
    # and the imitation reward channel follows: exp(-8e) on-pose ≈ 1
    assert np.exp(-8.0 * e_on) > 2.0 * np.exp(-8.0 * e_off)
