"""Gates for the cheap auto-reset obs path (FnEnv.reset_obs_fn).

The spawn pose is airborne by construction (z = initial_z + 0.02), so
the exact frame-0 contact predicate evaluates to zero flags — which is
also the reference behavior (pybullet reports no contact points before
the first stepSimulation). ``reset_obs="zero"`` skips the FK+narrowphase
subgraph that, traced into the auto-reset branch of every scan step,
dominated stepper training 13× (round-4 3j decomposition)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.tasks import base as T
from mocca_envs_tpu.tasks.walker_stepper import (
    StepperParams,
    make_walker3d_stepper,
)


def _fresh_batch(env, n, seed=0):
    keys = rng_mod.env_keys(rng_mod.root_key(seed), n)
    return jax.jit(jax.vmap(env.init))(keys)


@pytest.mark.parametrize("stage", [0.0, 9.0])
def test_spawn_contact_flags_are_zero(stage):
    """The exact predicate at seeded spawn poses = zeros — the empirical
    fact that makes the zero mode an equality, not an approximation."""
    env = make_walker3d_stepper(
        params=StepperParams.default().set_curriculum(stage),
        name=f"ResetObsStage{int(stage)}",
    )
    states = _fresh_batch(env, 64, seed=int(stage))
    from mocca_envs_tpu.utils.config import EngineConfig

    margin = EngineConfig().contact_margin
    flags = jax.vmap(
        lambda s: T.reset_foot_flags(env.model, margin, s)
    )(states)
    assert float(jnp.abs(flags).max()) == 0.0


def test_zero_mode_obs_equals_exact_on_fresh_states():
    exact = make_walker3d_stepper(name="ResetObsExact", reset_obs="exact")
    zero = make_walker3d_stepper(name="ResetObsZero")  # zero is the default
    assert exact.reset_obs_fn is None and zero.reset_obs_fn is not None
    states = _fresh_batch(exact, 32, seed=3)
    o_exact = jax.vmap(exact.obs_fn)(states)
    o_zero = jax.vmap(zero.reset_obs_fn)(states)
    np.testing.assert_allclose(
        np.asarray(o_exact), np.asarray(o_zero), rtol=0, atol=0
    )


def test_zero_mode_rollout_bit_identical():
    """Full auto-reset rollouts agree bit-for-bit between modes: the only
    difference is the frame-0 flag source, and those values coincide."""
    exact = make_walker3d_stepper(name="ResetObsRollE", reset_obs="exact")
    zero = make_walker3d_stepper(name="ResetObsRollZ")
    n = 8
    s_e = _fresh_batch(exact, n, seed=5)
    s_z = _fresh_batch(zero, n, seed=5)
    step_e = jax.jit(jax.vmap(exact.step))
    step_z = jax.jit(jax.vmap(zero.step))
    key = jax.random.key(0)
    resets = 0
    for t in range(50):
        key, ka = jax.random.split(key)
        # strong random torques so episodes end and auto-resets happen
        a = jax.random.uniform(ka, (n, exact.act_dim), minval=-1, maxval=1)
        tr_e = step_e(s_e, a)
        tr_z = step_z(s_z, a)
        np.testing.assert_array_equal(
            np.asarray(tr_e.obs), np.asarray(tr_z.obs), err_msg=f"t={t}"
        )
        resets += int(tr_e.done.sum())
        s_e, s_z = tr_e.state, tr_z.state
    assert resets > 0, "rollout never auto-reset; gate is vacuous"


def test_unknown_mode_rejected():
    with pytest.raises(ValueError):
        make_walker3d_stepper(name="ResetObsBad", reset_obs="nope")
