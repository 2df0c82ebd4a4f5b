"""Terrain raycast gates: oracle correctness + Pallas kernel equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocca_envs_tpu.ops.pallas.raycast import (
    TILE,
    make_raycaster,
    raycast_reference,
)
from mocca_envs_tpu.terrain.heightfield import fractal_heightfield


def _flat_hf(n=65, h=0.0):
    return jnp.full((n, n), h, dtype=jnp.float32)


def test_reference_hits_flat_ground():
    hf = _flat_hf(h=0.0)
    xy0 = jnp.array([-10.0, -10.0])
    cell = jnp.asarray(20.0 / 64)
    B = 8
    origins = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (B, 1))
    down45 = jnp.tile(
        jnp.array([np.sqrt(0.5), 0.0, -np.sqrt(0.5)]), (B, 1)
    )
    t, h = raycast_reference(origins, down45, hf, xy0, cell, max_t=5.0, num_steps=200)
    # hit at t = 1/sin(45°) = √2 from height 1
    np.testing.assert_allclose(np.asarray(t), np.sqrt(2.0), atol=0.05)
    np.testing.assert_allclose(np.asarray(h), 0.0, atol=1e-5)


def test_reference_miss_returns_max_t():
    hf = _flat_hf(h=0.0)
    xy0 = jnp.array([-10.0, -10.0])
    cell = jnp.asarray(20.0 / 64)
    origins = jnp.array([[0.0, 0.0, 1.0]])
    up = jnp.array([[0.0, 0.0, 1.0]])
    t, _ = raycast_reference(origins, up, hf, xy0, cell, max_t=3.0)
    assert float(t[0]) == 3.0


def test_pallas_kernel_matches_reference_interpret():
    # small grid: the kernel's gather-free one-hot fetch is O(H·W) per march
    # step, which the Pallas INTERPRETER executes op-by-op — a 17² grid keeps
    # the gate fast while exercising every code path (on hardware the ops are
    # vector-unit cheap; the on-TPU probe in scripts/ covers the 65² case)
    n = 17
    hf = jnp.asarray(fractal_heightfield(n, amplitude=0.4, seed=2, use_native=False))
    xy0 = jnp.array([-2.5, -2.5])
    cell = jnp.asarray(5.0 / (n - 1))
    B = TILE
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    origins = jnp.stack(
        [
            jax.random.uniform(k1, (B,), minval=-2, maxval=2),
            jax.random.uniform(k2, (B,), minval=-2, maxval=2),
            jnp.full((B,), 2.0),
        ],
        axis=1,
    )
    d = jnp.tile(jnp.array([0.3, 0.1, -0.95]), (B, 1))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    rc = make_raycaster((n, n), max_t=4.0, num_steps=16, interpret=True)
    t_k, h_k = rc(origins, d, hf, xy0, cell)
    t_r, h_r = raycast_reference(origins, d, hf, xy0, cell, max_t=4.0, num_steps=16)
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_r), atol=1e-5)


def test_lidar_env_obliquerays_consume_raycast():
    """Walker3DTerrainLidarEnv: the oblique-ray consumer (SURVEY §2.3
    rayTest row). On flat terrain all 8 fan rays hit at the analytic
    t = (z0 + 0.3)/sin(45°), quantized up to the march step."""
    import mocca_envs_tpu
    from mocca_envs_tpu.tasks.walker_terrain import (
        LIDAR_MAX_T,
        LIDAR_STEPS,
        make_walker3d_terrain,
    )

    env = make_walker3d_terrain(
        name="LidarFlat", amplitude=0.0, lidar=True
    )
    base_env = mocca_envs_tpu.make("Walker3DTerrainEnv")
    assert env.obs_dim == base_env.obs_dim + 8
    assert env.mirror["obs_perm"].shape == (env.obs_dim,)

    s = env.init(jax.random.key(0))
    obs = env.obs_fn(s)
    rays = np.asarray(obs[-8:]) * LIDAR_MAX_T
    z0 = float(s.q[2]) + 0.3
    t_true = z0 / np.sin(np.pi / 4)
    dt = LIDAR_MAX_T / LIDAR_STEPS
    # all rays identical on flat ground, hit within one march step above
    # the analytic parameter
    np.testing.assert_allclose(rays, rays[0], atol=1e-6)
    assert t_true <= rays[0] <= t_true + dt + 1e-6, (rays[0], t_true)

    # registered extension steps finitely and keeps the ray block in [0, 1]
    lenv = mocca_envs_tpu.make("Walker3DTerrainLidarEnv")
    st = lenv.init(jax.random.key(1))
    tr = jax.jit(lenv.step)(st, jnp.zeros(lenv.act_dim))
    assert bool(jnp.all(jnp.isfinite(tr.obs)))
    assert float(tr.obs[-8:].min()) >= 0.0 and float(tr.obs[-8:].max()) <= 1.0
