"""Fused Pallas substep vs the JAX oracle (interpret mode, CPU).

Gates the whole-engine kernel (ops/pallas/engine.py) against ops/step.py on
identical inputs: same model, same EngineConfig, random states near contact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocca_envs_tpu.ops.pallas.engine import TILE, make_pallas_substep, supports
from mocca_envs_tpu.ops.step import make_substep
from mocca_envs_tpu.terrain import scene as scene_mod
from mocca_envs_tpu.utils.config import EngineConfig

from tests.models_util import hopper


CFG = EngineConfig(sim_substeps=2, solver_iters=8)


def _random_states(model, B, key):
    kq, kd = jax.random.split(key)
    base = jnp.concatenate(
        [
            jnp.array([0.0, 0.0, 0.58]),
            jnp.array([1.0, 0.0, 0.0, 0.0]),
            jnp.zeros(model.nj),
        ]
    )
    q = jnp.tile(base, (B, 1)) + 0.03 * jax.random.normal(kq, (B, model.nq))
    qn = q[:, 3:7] / jnp.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    q = q.at[:, 3:7].set(qn)
    qd = 0.3 * jax.random.normal(kd, (B, model.nv))
    return q, qd


def test_supports_detection():
    model = hopper()
    assert supports(model)


@pytest.mark.slow
def test_pallas_matches_jax_substep():
    model = hopper()
    B = TILE
    q, qd = _random_states(model, B, jax.random.key(0))
    tau = 0.5 * jax.random.normal(jax.random.key(1), (B, model.nj))
    gz = jnp.zeros(B)
    fric = jnp.full((B,), 0.8)

    pal = make_pallas_substep(model, CFG, interpret=True)
    q_p, qd_p, depth_p, nimp_p = pal(q, qd, tau, gz, fric)

    sub = make_substep(model, CFG)
    scene = scene_mod.flat()

    def jax_path(q1, qd1, t1):
        qq, dd = q1, qd1
        for _ in range(CFG.sim_substeps):
            qq, dd, info = sub(qq, dd, t1, scene)
        return qq, dd, info.contacts.depth, info.normal_impulse

    q_j, qd_j, depth_j, nimp_j = jax.vmap(jax_path)(q, qd, tau)

    np.testing.assert_allclose(np.asarray(q_p), np.asarray(q_j), atol=2e-4)
    np.testing.assert_allclose(np.asarray(qd_p), np.asarray(qd_j), atol=5e-3)
    np.testing.assert_allclose(np.asarray(depth_p), np.asarray(depth_j), atol=2e-4)
    np.testing.assert_allclose(np.asarray(nimp_p), np.asarray(nimp_j), atol=5e-3)


@pytest.mark.slow
def test_pallas_constraints_match_jax_substep():
    """Equality rows (p2p rod, planar lock, grab) vs the JAX oracle."""
    from mocca_envs_tpu.ops.step import ConstraintSpec

    model = hopper()
    B = TILE
    q, qd = _random_states(model, B, jax.random.key(9))
    tau = 0.2 * jax.random.normal(jax.random.key(10), (B, model.nj))
    gz = jnp.zeros(B)
    fric = jnp.full((B,), 0.8)

    leg = model.link_names.index("leg")
    spec = ConstraintSpec(
        p2p_link_a=(0,), p2p_link_b=(leg,),
        p2p_anchor_a=((0.2, 0.0, -0.3),), p2p_anchor_b=((0.15, 0.0, -0.1),),
        planar=True,
        num_grabs=1, grab_links=(leg,), grab_anchors=((0.0, 0.0, -0.5),),
    )
    ga = (jnp.arange(B) % 2).astype(jnp.float32)[:, None]       # half attached
    gt = jnp.tile(jnp.array([[0.1, 0.0, 0.2]]), (B, 1))[:, None, :]

    pal = make_pallas_substep(model, CFG, interpret=True, constraints=spec)
    q_p, qd_p, depth_p, nimp_p = pal(q, qd, tau, gz, fric, ga, gt)

    sub = make_substep(model, CFG, constraints=spec)
    scene = scene_mod.flat()

    def jax_path(q1, qd1, t1, ga1, gt1):
        qq, dd = q1, qd1
        for _ in range(CFG.sim_substeps):
            qq, dd, info = sub(qq, dd, t1, scene, ga1, gt1)
        return qq, dd, info.contacts.depth, info.normal_impulse

    q_j, qd_j, depth_j, nimp_j = jax.vmap(jax_path)(q, qd, tau, ga, gt)
    np.testing.assert_allclose(np.asarray(q_p), np.asarray(q_j), atol=5e-4)
    np.testing.assert_allclose(np.asarray(qd_p), np.asarray(qd_j), atol=2e-2)
    np.testing.assert_allclose(np.asarray(depth_p), np.asarray(depth_j), atol=5e-4)


@pytest.mark.slow
def test_pallas_stones_matches_jax_substep():
    """Stone-box narrowphase + generic friction frames vs the JAX oracle."""
    model = hopper()
    B = TILE
    K = 4
    key = jax.random.key(3)
    q, qd = _random_states(model, B, key)
    tau = 0.3 * jax.random.normal(jax.random.key(4), (B, model.nj))
    gz = jnp.full((B,), -5.0)
    fric = jnp.full((B,), 0.8)
    # per-env stones: one directly under each hopper, plus decoys
    kp = jax.random.split(key, 4)
    sp = jnp.stack(
        [
            jnp.tile(jnp.array([0.0, 0.0, -0.2]), (B, 1)),
            jnp.tile(jnp.array([0.9, 0.0, -0.1]), (B, 1)),
            jnp.tile(jnp.array([-0.9, 0.4, -0.3]), (B, 1)),
            jnp.tile(jnp.array([0.0, 1.2, -0.2]), (B, 1)),
        ],
        axis=1,
    ) + 0.05 * jax.random.normal(kp[0], (B, K, 3))
    ang = 0.2 * jax.random.normal(kp[1], (B, K))
    sq = jnp.stack(
        [jnp.cos(ang / 2), jnp.sin(ang / 2), jnp.zeros_like(ang), jnp.zeros_like(ang)],
        axis=2,
    )
    sh = jnp.tile(jnp.array([0.4, 0.4, 0.2]), (B, K, 1))
    sa = jnp.ones((B, K))

    pal = make_pallas_substep(model, CFG, interpret=True, num_stones=K)
    q_p, qd_p, depth_p, nimp_p = pal(q, qd, tau, gz, fric, sp, sq, sh, sa)

    sub = make_substep(model, CFG)

    def jax_path(q1, qd1, t1, sp1, sq1, sh1, sa1):
        sc = scene_mod.with_stones(sp1, sq1, sh1, sa1, ground_z=-5.0)
        qq, dd = q1, qd1
        for _ in range(CFG.sim_substeps):
            qq, dd, info = sub(qq, dd, t1, sc)
        return qq, dd, info.contacts.depth, info.normal_impulse

    q_j, qd_j, depth_j, nimp_j = jax.vmap(jax_path)(q, qd, tau, sp, sq, sh, sa)

    # looser gates: box narrowphase has inside/edge-case branches where the
    # two implementations may pick different (equally valid) face normals
    q_err = np.abs(np.asarray(q_p) - np.asarray(q_j))
    frac_ok = float(np.mean(q_err < 1e-3))
    assert frac_ok > 0.97, f"only {frac_ok:.3f} of q entries agree"
    np.testing.assert_allclose(
        np.sort(np.asarray(depth_p), axis=0),
        np.sort(np.asarray(depth_j), axis=0),
        atol=5e-3,
    )
