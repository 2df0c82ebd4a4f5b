"""Native + fallback terrain generation gates, and heightfield physics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocca_envs_tpu.terrain.heightfield import (
    _native_lib,
    fractal_heightfield,
    with_heightfield,
)
from mocca_envs_tpu.terrain.scene import hf_normal, hf_sample


def test_fallback_terrain_shape_and_determinism():
    h1 = fractal_heightfield(65, seed=3, use_native=False)
    h2 = fractal_heightfield(65, seed=3, use_native=False)
    np.testing.assert_array_equal(h1, h2)
    assert h1.shape == (65, 65)
    assert abs(float(h1.mean())) < 1e-5
    assert float(h1.std()) > 0.01  # actually has relief


def test_native_terrain_builds_and_is_deterministic():
    if _native_lib() is None:
        pytest.skip("native toolchain unavailable")
    h1 = fractal_heightfield(129, seed=7)
    h2 = fractal_heightfield(129, seed=7)
    h3 = fractal_heightfield(129, seed=8)
    np.testing.assert_array_equal(h1, h2)
    assert not np.allclose(h1, h3)
    assert abs(float(h1.mean())) < 1e-4
    assert float(h1.std()) > 0.01


def test_heightfield_sampling_and_normals():
    h = fractal_heightfield(65, seed=1, use_native=False)
    scene = with_heightfield(h, extent=10.0)
    # sample at grid points reproduces grid values
    xy = jnp.array([-5.0, -5.0])  # grid [0,0]
    np.testing.assert_allclose(float(hf_sample(scene, xy)), h[0, 0], atol=1e-5)
    n = hf_normal(scene, jnp.zeros(2))
    assert abs(float(jnp.linalg.norm(n)) - 1.0) < 1e-5
    assert float(n[2]) > 0.2  # mostly-up normal for walkable terrain


def test_ball_rolls_on_heightfield():
    from mocca_envs_tpu.ops.step import make_substep
    from mocca_envs_tpu.utils.config import EngineConfig
    from tests.models_util import ball, free_q, free_qd

    model = ball(radius=0.1)
    h = fractal_heightfield(65, amplitude=0.3, seed=5, use_native=False)
    scene = with_heightfield(h, extent=20.0)
    sub = jax.jit(make_substep(model, EngineConfig(use_pallas=False)))
    q = jnp.asarray(free_q(pos=(0.0, 0.0, 1.5)))
    qd = jnp.asarray(free_qd())
    for _ in range(500):
        q, qd, info, _ = sub(q, qd, jnp.zeros(model.nj), scene)
    assert bool(jnp.all(jnp.isfinite(q)))
    # settled on the surface: center ≈ surface + radius (tolerant: slopes)
    surf = float(hf_sample(scene, q[0:2]))
    assert abs(float(q[2]) - surf - 0.1) < 0.08


def test_walker_terrain_env_runs_and_keeps_terrain_across_resets():
    """Extension family over HeightField scenes: per-slot terrain persists
    across auto-resets (reset prev-state contract), spawn sits on surface."""
    import mocca_envs_tpu

    env = mocca_envs_tpu.make("Walker3DTerrainEnv")
    state = env.init(jax.random.key(3))
    surf0 = float(hf_sample(state.scene, state.q[0:2]))
    # spawned roughly standing height above the LOCAL surface
    assert abs(float(state.q[2]) - surf0 - 0.96) < 0.1
    hf_before = np.asarray(state.scene.hf_height)
    step = jax.jit(env.step)
    done_seen = False
    for _ in range(250):
        tr = step(state, jnp.ones(env.act_dim))
        state = tr.state
        if bool(tr.done):
            done_seen = True
            break
    assert done_seen
    assert bool(jnp.all(jnp.isfinite(state.q)))
    np.testing.assert_array_equal(np.asarray(state.scene.hf_height), hf_before)


def test_extract_patch_matches_full_grid():
    """The shared hot-path window (terrain/scene.extract_patch): bilinear
    samples of the P×P patch equal samples of the full grid for any query
    within the patch margin, including when the window clamps at the grid
    border (the margin shrinks one-sidedly there exactly as grid clamping
    does)."""
    from mocca_envs_tpu.terrain.scene import extract_patch

    h = fractal_heightfield(65, seed=11, use_native=False)
    scene = with_heightfield(h, extent=20.0)
    P = 16
    cell = float(scene.hf_cell)
    margin = (P / 2 - 2) * cell
    rng = np.random.default_rng(0)
    # centers spanning interior AND borders (clamped windows)
    centers = rng.uniform(-10.0, 10.0, size=(32, 2)).astype(np.float32)
    for c in centers:
        patch = extract_patch(scene, jnp.asarray(c), P)
        assert patch.hf_height.shape == (P, P)
        offs = rng.uniform(-margin, margin, size=(16, 2)).astype(np.float32)
        pts = jnp.asarray(np.clip(c + offs, -10.0, 10.0))
        np.testing.assert_allclose(
            np.asarray(hf_sample(patch, pts)),
            np.asarray(hf_sample(scene, pts)),
            atol=1e-6,
        )
    # grid no larger than a patch passes through unchanged
    small = with_heightfield(h[:12, :12], extent=4.0)
    same = extract_patch(small, jnp.zeros(2), P)
    assert same.hf_height.shape == (12, 12)


def test_terrain_step_probes_and_target_use_full_grid():
    """walker_terrain.raw_step runs physics+probes off a pre-extracted patch
    but must report probes identical to full-grid sampling and keep the
    (possibly resampled) target's z pinned to the FULL grid, not the patch."""
    import mocca_envs_tpu
    from mocca_envs_tpu.tasks.walker_terrain import PROBE_OFFSETS

    env = mocca_envs_tpu.make("Walker3DTerrainEnv")
    K = PROBE_OFFSETS.shape[0]
    state = env.init(jax.random.key(9))
    step = jax.jit(env.step)
    for _ in range(5):
        tr = step(state, jnp.zeros(env.act_dim))
        # probes in the step's obs == obs_fn on the post-step state, which
        # samples the FULL grid (obs_fn has no patch argument)
        np.testing.assert_allclose(
            np.asarray(tr.obs[-K:]),
            np.asarray(env.obs_fn(tr.state)[-K:]),
            atol=2e-5,
        )
        # target z always equals the full-grid surface height at target xy
        tgt = tr.state.task.target
        np.testing.assert_allclose(
            float(tgt[2]),
            float(hf_sample(tr.state.scene, tgt[0:2])),
            atol=2e-5,
        )
        state = tr.state


def test_terrain_probes_in_obs():
    """Obs tail = K heading-frame terrain probes relative to the root's
    surface height (VERDICT r1 #6: terrain env must PERCEIVE terrain)."""
    import mocca_envs_tpu
    from mocca_envs_tpu.tasks.walker_terrain import PROBE_OFFSETS

    env = mocca_envs_tpu.make("Walker3DTerrainEnv")
    K = PROBE_OFFSETS.shape[0]
    state = env.init(jax.random.key(4))
    obs = env.obs_fn(state)
    assert obs.shape == (env.obs_dim,)
    # at spawn yaw≈0: probes equal direct hf samples at root + offsets
    root = np.asarray(state.q[0:2])
    h_root = float(hf_sample(state.scene, state.q[0:2]))
    for i in range(K):
        pt = jnp.asarray(root + PROBE_OFFSETS[i])
        expect = float(hf_sample(state.scene, pt)) - h_root
        assert abs(float(obs[-K + i]) - expect) < 1e-5
    # probes survive a step and stay finite
    tr = jax.jit(env.step)(state, jnp.zeros(env.act_dim))
    assert tr.obs.shape == (env.obs_dim,)
    assert bool(jnp.all(jnp.isfinite(tr.obs)))
    # mirror maps cover the extended obs and remain involutive
    perm = np.asarray(env.mirror["obs_perm"])
    sign = np.asarray(env.mirror["obs_sign"])
    assert perm.shape[0] == env.obs_dim == sign.shape[0]
    np.testing.assert_array_equal(perm[perm], np.arange(env.obs_dim))
