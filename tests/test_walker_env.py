"""End-to-end Walker3DCustomEnv gates: API conformance, determinism,
auto-reset, batching (SURVEY.md §4.2 property tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mocca_envs_tpu
from mocca_envs_tpu.envs.env import BatchedEnv
from mocca_envs_tpu.envs.gym_wrapper import GymEnv


@pytest.fixture(scope="module")
def env():
    return mocca_envs_tpu.make("Walker3DCustomEnv-v0")


def test_registry_lists_walker():
    assert "Walker3DCustomEnv" in mocca_envs_tpu.registered_envs()


def test_obs_dims(env):
    assert env.act_dim == 21  # Walker3D: 21 actuated DoF (SURVEY.md C5)
    assert env.obs_dim == 8 + 21 + 21 + 2  # body + q + q̇ + feet = 52


def test_reset_and_step_shapes(env):
    state = env.init(jax.random.key(0))
    obs = env.obs_fn(state)
    assert obs.shape == (env.obs_dim,)
    a = jnp.zeros(env.act_dim)
    tr = jax.jit(env.step)(state, a)
    assert tr.obs.shape == (env.obs_dim,)
    assert tr.reward.shape == ()
    assert bool(jnp.isfinite(tr.reward))


def test_seed_determinism(env):
    """Behavior B9: same seed ⇒ identical trajectory."""
    step = jax.jit(env.step)

    def rollout(seed):
        state = env.init(jax.random.key(seed))
        obs_list = []
        for i in range(5):
            a = 0.3 * jnp.sin(jnp.arange(env.act_dim) + i)
            tr = step(state, a)
            state = tr.state
            obs_list.append(tr.obs)
        return jnp.stack(obs_list)

    np.testing.assert_array_equal(rollout(7), rollout(7))
    assert not np.allclose(rollout(7), rollout(8))


def test_walker_stays_up_briefly_and_falls_eventually(env):
    state = env.init(jax.random.key(1))
    step = jax.jit(env.step_no_reset)
    fell = False
    for i in range(120):
        tr = step(state, jnp.zeros(env.act_dim))
        state = tr.state
        assert bool(jnp.all(jnp.isfinite(state.q))), f"NaN at step {i}"
        if bool(tr.done):
            fell = True
            assert i > 3, "fell immediately — initial pose broken"
            break
    assert fell, "zero-torque walker should eventually fall"


def test_auto_reset_restarts_episode(env):
    state = env.init(jax.random.key(2))
    step = jax.jit(env.step)
    for _ in range(300):
        tr = step(state, jnp.full((env.act_dim,), 1.0))
        state = tr.state
        if bool(tr.done):
            break
    assert bool(tr.done), "expected an episode end within 300 steps"
    # post-reset state is a fresh episode: steps reset, upright
    assert int(state.steps) == 0
    assert float(state.q[2]) > 0.8


@pytest.mark.slow
def test_batched_env_steps(env):
    batch = BatchedEnv(env, num_envs=8, seed=0)
    state = batch.init()
    a = jnp.zeros((8, env.act_dim))
    tr = batch.step(state, a)
    assert tr.obs.shape == (8, env.obs_dim)
    assert tr.reward.shape == (8,)
    # envs are independently seeded: distinct targets
    assert not np.allclose(tr.state.task.target[0], tr.state.task.target[1])


@pytest.mark.slow
def test_vmap_matches_single(env):
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(0), i))(
        jnp.arange(3)
    )
    bstate = jax.vmap(env.init)(keys)
    a = jnp.tile(jnp.linspace(-0.5, 0.5, env.act_dim)[None], (3, 1))
    btr = jax.vmap(env.step_no_reset)(bstate, a)
    single = jax.jit(env.step_no_reset)
    for i in range(3):
        s = jax.tree.map(lambda x: x[i], bstate)
        tr = single(s, a[i])
        np.testing.assert_allclose(btr.obs[i], tr.obs, rtol=2e-4, atol=2e-5)


def test_gym_wrapper_api(env):
    g = GymEnv(env, seed=3)
    obs = g.reset()
    assert obs.shape == (env.obs_dim,)
    obs, r, done, info = g.step(np.zeros(env.act_dim))
    assert isinstance(r, float) and isinstance(done, bool)
    assert "progress" in info
    state_view = g.render()
    assert state_view["q"].shape == (7 + 21,)


def test_gym_wrapper_mirror_indices_equal_perm_sign(env):
    """get_mirror_indices (reference mirror-index accessor, SURVEY C5):
    the swap+negate lists must reproduce obs[perm]*sign exactly."""
    g = GymEnv(env, seed=0)
    no, ro, lo, na, ra, la = g.get_mirror_indices()
    m = env.mirror
    rng = np.random.default_rng(5)
    for perm, sign, neg, right, left in (
        (m["obs_perm"], m["obs_sign"], no, ro, lo),
        (m["act_perm"], m["act_sign"], na, ra, la),
    ):
        x = rng.normal(size=len(np.asarray(perm)))
        via_perm = x[np.asarray(perm)] * np.asarray(sign)
        y = x.copy()
        y[right], y[left] = x[left], x[right]
        y[neg] *= -1.0
        np.testing.assert_allclose(y, via_perm, rtol=0, atol=0)


def test_gym_wrapper_set_curriculum_resamples_terrain():
    """set_curriculum(k) (reference trainer API, SURVEY §3.5): next reset
    samples stage-k terrain — stage 9 stones tilt, stage 0 stones don't —
    and the walker env without a curriculum rejects the call."""
    import mocca_envs_tpu
    from mocca_envs_tpu.envs.gym_wrapper import GymEnv as GE

    g = GE(mocca_envs_tpu.make("Walker3DStepperEnv"), seed=11)
    g.reset()
    flat_quat = np.asarray(g.state.task.stone_quat)
    assert float(g.state.task.stage.max()) == 0.0
    tilt0 = np.abs(flat_quat[2:, 1:3]).max()  # stage 0: no x/y tilt

    g.set_curriculum(9.0)
    g.reset()
    assert float(g.state.task.stage.min()) == 9.0
    hard_quat = np.asarray(g.state.task.stone_quat)
    tilt9 = np.abs(hard_quat[2:, 1:3]).max()
    assert tilt0 < 1e-5 and tilt9 > 0.02, (tilt0, tilt9)

    w = GE(mocca_envs_tpu.make("Walker3DCustomEnv"), seed=0)
    w.set_curriculum(3.0)
    with pytest.raises(ValueError):
        w.reset()


@pytest.mark.slow
def test_pd_walker_variant_steps_and_holds():
    """Walker3DPDCustomEnv (BASELINE config 2 'PD control' bench variant):
    actions are joint targets; a zero action (mid-range targets) keeps the
    robot upright and finite for a second of sim time."""
    import mocca_envs_tpu

    env = mocca_envs_tpu.make("Walker3DPDCustomEnv")
    state = env.init(jax.random.key(3))
    step = jax.jit(env.step)
    for _ in range(60):
        tr = step(state, jnp.zeros(env.act_dim))
        state = tr.state
    assert bool(jnp.all(jnp.isfinite(state.q)))
    assert float(state.q[2]) > 0.6
