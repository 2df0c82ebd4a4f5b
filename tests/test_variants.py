"""2D / child model-variant gates (SURVEY.md §2.1 C5 [K-low] families)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mocca_envs_tpu


ALL_IDS = [
    "Walker3DCustomEnv",
    "Walker3DStepperEnv",
    "CassieEnv",
    "Cassie2DEnv",
    "CassiePhaseEnv",
    "CassiePhase2DEnv",
    "Monkey3DStepperEnv",
    "Walker2DCustomEnv",
    "Crab2DCustomEnv",
    "Child3DCustomEnv",
]


def test_registry_covers_reference_table():
    regd = mocca_envs_tpu.registered_envs()
    for env_id in ALL_IDS:
        assert env_id in regd, f"{env_id} missing from registry"


@pytest.mark.parametrize("env_id", ["Walker2DCustomEnv", "Crab2DCustomEnv"])
def test_planar_env_steps_and_stays_in_plane(env_id):
    env = mocca_envs_tpu.make(env_id)
    state = env.init(jax.random.key(0))
    step = jax.jit(env.step_no_reset)
    for _ in range(20):
        tr = step(state, 0.3 * jnp.ones(env.act_dim))
        state = tr.state
    assert bool(jnp.all(jnp.isfinite(state.q)))
    assert abs(float(state.q[1])) < 0.05  # y locked by planar rows


def test_child3d_is_smaller_and_lighter():
    from mocca_envs_tpu.models import child3d, walker3d

    child = child3d.make_model()
    adult = walker3d.make_model()
    assert float(child.mass.sum()) < 0.2 * float(adult.mass.sum())
    env = mocca_envs_tpu.make("Child3DCustomEnv")
    state = env.init(jax.random.key(1))
    assert float(state.q[2]) < 0.55
    tr = jax.jit(env.step)(state, jnp.zeros(env.act_dim))
    assert bool(jnp.all(jnp.isfinite(tr.obs)))


def test_mirror_involution():
    """Mirror maps are involutions: mirror(mirror(x)) == x (C5 symmetry)."""
    from mocca_envs_tpu.tasks import base as T

    for env_id in ("Walker3DCustomEnv", "Walker3DStepperEnv"):
        env = mocca_envs_tpu.make(env_id)
        spec = env.mirror
        obs = jnp.arange(env.obs_dim, dtype=jnp.float32) / env.obs_dim
        act = jnp.arange(env.act_dim, dtype=jnp.float32) / env.act_dim
        np.testing.assert_allclose(
            T.mirror_obs(spec, T.mirror_obs(spec, obs)), obs, atol=1e-6
        )
        np.testing.assert_allclose(
            T.mirror_action(spec, T.mirror_action(spec, act)), act, atol=1e-6
        )
        # mirroring is not the identity (it actually swaps limbs)
        assert not np.allclose(T.mirror_obs(spec, obs), obs)


def test_round4_registry_defaults():
    """Round-4 default flips, pinned so a refactor can't silently revert
    them: the registry stepper ships WITH tilt vision (orient_obs — two
    seeds climbed to mean stage 8.5/8.4 vs 5.8 blind, BENCH.md round 4)
    and every walker-family env ships with the cheap auto-reset obs
    (reset_obs="zero" — bit-identical rollouts, 10.4x training speedup)."""
    st = mocca_envs_tpu.make("Walker3DStepperEnv")
    # 8 body + 2*21 joints + 2 feet + 6 targets + 4 stone-normal dims
    assert st.obs_dim == 62, st.obs_dim
    for env_id in ("Walker3DCustomEnv", "Walker3DStepperEnv",
                   "Walker3DTerrainEnv", "CassieEnv"):
        env = mocca_envs_tpu.make(env_id)
        assert env.reset_obs_fn is not None, env_id


def test_no_family_spawns_terminal():
    """Every registered family must survive its first two zero-action
    control steps without `done`. Guards the class of bug the round-4k
    training sweep exposed: Crab2DCustomEnv spawned BELOW the default
    walker terminal_height (base z 0.45 < 0.7), so the fall predicate
    held at the reset pose and every episode was terminal at every step
    — invisible to throughput benches (random-torque rows never read
    `done`), fatal to training."""
    import jax
    import jax.numpy as jnp

    import mocca_envs_tpu
    from mocca_envs_tpu.envs.registry import registered_envs

    for env_id in registered_envs():
        env = mocca_envs_tpu.make(env_id)
        s = env.init(jax.random.key(1))
        step = jax.jit(env.step_no_reset)
        for k in range(2):
            tr = step(s, jnp.zeros(env.act_dim))
            assert not bool(tr.done), f"{env_id} terminal at step {k}"
            s = tr.state
