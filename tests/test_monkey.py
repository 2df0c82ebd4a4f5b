"""Monkey3DStepperEnv gates: grab constraints hold the body, release works,
bar-advance machine scores new grabs (SURVEY.md behavior B8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mocca_envs_tpu
from mocca_envs_tpu.models import monkey


@pytest.fixture(scope="module")
def env():
    return mocca_envs_tpu.make("Monkey3DStepperEnv")


def test_reset_hangs_by_right_hand(env):
    state = env.init(jax.random.key(0))
    assert float(state.task.attached[0]) == 1.0
    assert float(state.task.attached[1]) == 0.0
    assert int(state.task.next_bar) == 1


def test_grab_holds_against_gravity(env):
    """Holding with the right hand (grab signal +1) must keep the monkey
    from free-falling; releasing both hands must drop it."""
    state = env.init(jax.random.key(1))
    step = jax.jit(env.step_no_reset)
    hold = jnp.concatenate([jnp.zeros(env.act_dim - 2), jnp.array([1.0, -1.0])])
    for _ in range(30):  # 0.5 s
        tr = step(state, hold)
        state = tr.state
    z_holding = float(state.q[2])
    assert z_holding > -1.5, z_holding  # did not fall; hangs near the bar

    release = jnp.concatenate(
        [jnp.zeros(env.act_dim - 2), jnp.array([-1.0, -1.0])]
    )
    for _ in range(40):
        tr = step(state, release)
        state = tr.state
        if bool(tr.done):
            break
    assert float(state.q[2]) < -1.5 or bool(tr.done)


def test_anchor_stays_near_palm(env):
    """While attached, the palm must stay near its grab anchor (the p2p
    constraint is actually enforced by the solver)."""
    from mocca_envs_tpu.ops.kinematics import forward_kinematics

    model = monkey.make_model()
    spec = monkey.constraints()
    state = env.init(jax.random.key(2))
    step = jax.jit(env.step_no_reset)
    hold = jnp.concatenate([jnp.zeros(env.act_dim - 2), jnp.array([1.0, -1.0])])
    for _ in range(25):
        tr = step(state, hold)
        state = tr.state
    fd = forward_kinematics(model, state.q, state.qd)
    l = spec.grab_links[0]
    palm = fd.pos[l] + fd.rot[l] @ jnp.asarray(monkey.PALM_OFFSET)
    gap = float(jnp.linalg.norm(palm - state.task.anchor[0]))
    assert gap < 0.08, gap


def test_obs_dim_and_finite(env):
    state = env.init(jax.random.key(3))
    obs = env.obs_fn(state)
    assert obs.shape == (env.obs_dim,)
    tr = jax.jit(env.step)(state, jnp.zeros(env.act_dim))
    assert bool(jnp.all(jnp.isfinite(tr.obs)))
