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
