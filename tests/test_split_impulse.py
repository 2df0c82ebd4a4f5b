"""Split-impulse position correction gates (EngineConfig.split_impulse).

Reference behavior: Bullet's btContactSolverInfo.m_splitImpulse — pybullet
``setPhysicsEngineParameter(useSplitImpulse=1)`` (SURVEY.md §2.3
setPhysicsEngineParameter row). The physical claim under test: penetration
recovery must not inject kinetic energy. With plain Baumgarte the push-out
bias is a REAL velocity target (the measured z-drift pump of long
random-torque rollouts — BENCH.md round-2 "known wart"); with split impulse
the same ERP-rate depenetration happens through pseudo-velocities that
advance positions only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocca_envs_tpu.ops.step import make_substep
from mocca_envs_tpu.terrain import scene as scene_mod
from mocca_envs_tpu.utils.config import EngineConfig

from tests.models_util import ball, free_q, free_qd, hopper


def _rollout_vz(cfg, n_sub=40, z0=0.07):
    """Ball (r=0.1) spawned penetrating 3 cm, at rest. Returns the peak
    base vz over the rollout and the final (z, vz, depth)."""
    model = ball()
    sub = make_substep(model, cfg)
    scene = scene_mod.flat()
    q = jnp.asarray(free_q(pos=(0.0, 0.0, z0)))
    qd = jnp.asarray(free_qd())
    tau = jnp.zeros((model.nj,))
    step = jax.jit(lambda q, qd: sub(q, qd, tau, scene))
    peak_vz = 0.0
    depth = None
    for _ in range(n_sub):
        q, qd, info, _lam = step(q, qd)
        peak_vz = max(peak_vz, float(qd[2]))
        depth = float(info.contacts.depth[0])
    return peak_vz, float(q[2]), float(qd[2]), depth


def test_split_impulse_no_energy_injection():
    """Depenetration must not launch the body: with Baumgarte the 3 cm
    penetration becomes a ~max_push_vel real upward velocity; with split
    impulse the body rises at the same ERP rate but its REAL velocity stays
    at rest scale. Both must actually resolve the penetration."""
    cfg_b = EngineConfig(split_impulse=False, warm_start=False)
    cfg_s = EngineConfig(split_impulse=True, warm_start=False)
    peak_b, _, _, depth_b = _rollout_vz(cfg_b)
    peak_s, _, vz_s, depth_s = _rollout_vz(cfg_s)
    # Baumgarte pops: peak vz on the order of max_push_vel
    assert peak_b > 0.3, f"expected a Baumgarte pop, got peak vz {peak_b}"
    # split impulse: no real kick (≥20× smaller), penetration still resolved
    assert peak_s < 0.05 * peak_b, (peak_s, peak_b)
    assert depth_s < cfg_s.slop + 2e-3, depth_s
    assert abs(vz_s) < 0.05, vz_s


def test_split_impulse_resting_contact():
    """A dropped ball settles at depth ≈ slop and STAYS — no hover, no
    micro-bounce from the position pass feeding back into velocities."""
    cfg = EngineConfig(split_impulse=True)
    model = ball()
    sub = make_substep(model, cfg)
    scene = scene_mod.flat()
    q = jnp.asarray(free_q(pos=(0.0, 0.0, 0.12)))
    qd = jnp.asarray(free_qd())
    tau = jnp.zeros((model.nj,))
    lam = jnp.zeros((3 * model.ns,))
    step = jax.jit(lambda q, qd, lam: sub(q, qd, tau, scene, lam_in=lam))
    for _ in range(240):
        q, qd, info, lam = step(q, qd, lam)
    z = float(q[2])
    assert 0.1 - cfg.slop - 2e-3 < z < 0.1 + 1e-3, z
    assert abs(float(qd[2])) < 0.05, float(qd[2])


def test_split_impulse_limit_rows():
    """Joint-limit recovery through the position pass: a joint parked past
    its bound returns to the limit band without a velocity spike."""
    model = hopper()   # leg joint limit ±1.5
    cfg = EngineConfig(split_impulse=True, warm_start=False)
    sub = make_substep(model, cfg)
    scene = scene_mod.flat()
    # high above ground: no contacts, only the limit row acts on the joint
    q = jnp.asarray(free_q(pos=(0.0, 0.0, 5.0), joints=(1.56,)))
    qd = jnp.asarray(free_qd(joints=(0.0,)))
    tau = jnp.zeros((model.nj,))
    step = jax.jit(lambda q, qd: sub(q, qd, tau, scene))
    peak = 0.0
    for _ in range(30):
        q, qd, info, _lam = step(q, qd)
        peak = max(peak, abs(float(qd[6])))
    assert float(q[7]) < 1.5 + 0.01, float(q[7])
    # Baumgarte at this violation would target min(48·0.055, 1.0) ≈ 1.0 rad/s
    assert peak < 0.12, peak


@pytest.mark.slow
@pytest.mark.parametrize("matfree", [False, True])
def test_pallas_split_matches_oracle(matfree):
    """Fused kernel ≡ JAX oracle with split_impulse on (both PGS forms).

    States are spawned LOW (z≈0.5) so several spheres penetrate and the
    position pass carries real bias on contact AND limit rows."""
    from mocca_envs_tpu.ops.pallas.engine import TILE, make_pallas_substep

    model = hopper()
    cfg = EngineConfig(
        sim_substeps=2, solver_iters=8, split_impulse=True,
        warm_start=False, reuse_factor=False, matfree_pgs=matfree,
    )
    B = TILE
    kq, kd = jax.random.split(jax.random.key(3))
    base = jnp.concatenate(
        [jnp.array([0.0, 0.0, 0.5]), jnp.array([1.0, 0.0, 0.0, 0.0]),
         jnp.zeros(model.nj)]
    )
    q = jnp.tile(base, (B, 1)) + 0.03 * jax.random.normal(kq, (B, model.nq))
    q = q.at[:, 3:7].set(
        q[:, 3:7] / jnp.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    )
    qd = 0.3 * jax.random.normal(kd, (B, model.nv))
    tau = 0.5 * jax.random.normal(jax.random.key(4), (B, model.nj))
    gz = jnp.zeros(B)
    fric = jnp.full((B,), 0.8)

    pal = make_pallas_substep(model, cfg, interpret=True)
    q_p, qd_p, depth_p, nimp_p = pal(q, qd, tau, gz, fric)

    sub = make_substep(model, cfg)
    scene = scene_mod.flat()

    def jax_path(q1, qd1, t1):
        qq, dd = q1, qd1
        for _ in range(cfg.sim_substeps):
            qq, dd, info, _ = sub(qq, dd, t1, scene)
        return qq, dd, info.contacts.depth, info.normal_impulse

    q_j, qd_j, depth_j, nimp_j = jax.vmap(jax_path)(q, qd, tau)

    np.testing.assert_allclose(np.asarray(q_p), np.asarray(q_j), atol=2e-4)
    np.testing.assert_allclose(np.asarray(qd_p), np.asarray(qd_j), atol=5e-3)
    np.testing.assert_allclose(np.asarray(depth_p), np.asarray(depth_j), atol=2e-4)
    np.testing.assert_allclose(np.asarray(nimp_p), np.asarray(nimp_j), atol=5e-3)


@pytest.mark.slow
def test_pallas_split_shipped_defaults():
    """Kernel ≡ oracle with split_impulse on TOP of the shipped defaults
    (matfree + warm_start@4 + reuse_factor + block) — the candidate
    round-4 default configuration, carry threading and all."""
    from mocca_envs_tpu.ops.pallas.engine import TILE, make_pallas_substep
    from mocca_envs_tpu.ops.step import make_control_step

    model = hopper()
    cfg = EngineConfig(split_impulse=True, use_pallas=False)
    B = TILE
    kq, kd = jax.random.split(jax.random.key(5))
    base = jnp.concatenate(
        [jnp.array([0.0, 0.0, 0.5]), jnp.array([1.0, 0.0, 0.0, 0.0]),
         jnp.zeros(model.nj)]
    )
    q = jnp.tile(base, (B, 1)) + 0.03 * jax.random.normal(kq, (B, model.nq))
    q = q.at[:, 3:7].set(
        q[:, 3:7] / jnp.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    )
    qd = 0.3 * jax.random.normal(kd, (B, model.nv))
    tau = 0.5 * jax.random.normal(jax.random.key(6), (B, model.nj))
    gz = jnp.zeros(B)
    fric = jnp.full((B,), 0.8)

    pal = make_pallas_substep(model, cfg, interpret=True)
    q_p, qd_p, _, _ = pal(q, qd, tau, gz, fric)

    ctrl = make_control_step(model, cfg)
    scene = scene_mod.flat()
    q_j, qd_j, _ = jax.vmap(lambda a, b, c: ctrl(a, b, c, scene))(q, qd, tau)

    np.testing.assert_allclose(np.asarray(q_p), np.asarray(q_j), atol=2e-4)
    np.testing.assert_allclose(np.asarray(qd_p), np.asarray(qd_j), atol=5e-3)
