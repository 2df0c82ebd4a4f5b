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


def test_bars_are_solid_but_palms_pass(env):
    """Bars carry real capsule collision (VERDICT r1 #6): a torso overlapping
    a bar yields a positive contact depth, while the grabbing palm spheres
    are statically excluded (``sph_no_bar`` — a wrapped hand must not be
    pushed out of the bar it holds)."""
    from mocca_envs_tpu.ops.collide import collide
    from mocca_envs_tpu.ops.kinematics import forward_kinematics
    from mocca_envs_tpu.terrain.scene import Scene

    model = monkey.make_model()
    state = env.init(jax.random.key(4))
    fd = forward_kinematics(model, state.q, state.qd)

    # one bar threaded horizontally straight through the torso center
    base = state.q[0:3]
    sc = Scene(
        has_ground=True, has_bars=True, ground_z=jnp.asarray(-8.0),
        bar_a=(base + jnp.array([0.0, -0.4, 0.0]))[None],
        bar_b=(base + jnp.array([0.0, 0.4, 0.0]))[None],
        bar_r=jnp.array([monkey.BAR_RADIUS]),
        bar_active=jnp.ones(1),
    )
    contacts = collide(model, fd, sc, margin=0.01)
    depth = np.asarray(contacts.depth)
    sph_link = np.asarray(model.sph_link)
    no_bar = np.asarray(model.sph_no_bar)
    torso = [i for i in range(len(depth)) if sph_link[i] == 0]
    assert any(depth[i] > 0.05 for i in torso), depth[torso]

    # palms: move the bar onto the right palm — depth must NOT register
    spec = monkey.constraints()
    l = spec.grab_links[0]
    palm = fd.pos[l] + fd.rot[l] @ jnp.asarray(monkey.PALM_OFFSET)
    sc2 = sc.replace(
        bar_a=(palm + jnp.array([0.0, -0.4, 0.0]))[None],
        bar_b=(palm + jnp.array([0.0, 0.4, 0.0]))[None],
    )
    c2 = collide(model, forward_kinematics(model, state.q, state.qd), sc2, margin=0.01)
    d2 = np.asarray(c2.depth)
    palm_spheres = [i for i in range(len(d2)) if no_bar[i] > 0.5]
    assert palm_spheres, "palm spheres must be flagged no_bar"
    for i in palm_spheres:
        assert d2[i] < 0.0, (i, d2[i])


def test_grab_gate_deterministic(env):
    """Deterministic B8 gate (the stepper-B7 analog): free palm placed on the
    target bar + grab signal ⇒ attach fires, ``next_bar`` advances, and the
    bar bonus lands in the reward."""
    from mocca_envs_tpu.ops.kinematics import forward_kinematics

    model = monkey.make_model()
    spec = monkey.constraints()
    state = env.init(jax.random.key(5))
    # teleport the TARGET bar onto the free (left) palm
    fd = forward_kinematics(model, state.q, state.qd)
    l = spec.grab_links[1]
    palm = fd.pos[l] + fd.rot[l] @ jnp.asarray(monkey.PALM_OFFSET)
    tgt = int(state.task.next_bar)
    bar_pos = state.task.bar_pos.at[tgt].set(palm)
    task = state.task.replace(bar_pos=bar_pos)
    sc = state.scene.replace(
        bar_a=bar_pos - monkey.BAR_HALF_LEN * state.task.bar_dir,
        bar_b=bar_pos + monkey.BAR_HALF_LEN * state.task.bar_dir,
    )
    state = state.replace(task=task, scene=sc)

    grab_left = jnp.concatenate(
        [jnp.zeros(env.act_dim - 2), jnp.array([0.0, 1.0])]
    )
    tr = jax.jit(env.step_no_reset)(state, grab_left)
    assert float(tr.state.task.attached[1]) == 1.0
    assert int(tr.state.task.next_bar) == tgt + 1
    assert float(tr.metrics["bar_hit"]) == 1.0
    assert float(tr.reward) > 3.0  # bar_bonus=6 dominates the step reward


def test_obs_dim_and_finite(env):
    state = env.init(jax.random.key(3))
    obs = env.obs_fn(state)
    assert obs.shape == (env.obs_dim,)
    tr = jax.jit(env.step)(state, jnp.zeros(env.act_dim))
    assert bool(jnp.all(jnp.isfinite(tr.obs)))


def test_release_timing_shaping_gates_alive_bonus():
    """hold_grace: the alive bonus stops paying after grace steps without a
    bar hit; w_swing pays toward-target CoM speed while holding (round-3
    release-timing shaping — default-off knobs)."""
    from mocca_envs_tpu.tasks.monkey_stepper import MonkeyParams, make_monkey3d_stepper

    shaped = make_monkey3d_stepper(
        params=MonkeyParams().replace(
            hold_grace=jnp.asarray(3, jnp.int32),
            w_swing=jnp.asarray(0.0),
        ),
        name="MonkeyGrace",
    )
    s = env_s = shaped.init(jax.random.key(0))
    step = jax.jit(shaped.step_no_reset)
    a = jnp.zeros(shaped.act_dim).at[-2].set(1.0)  # keep holding, no torque
    rewards = []
    for t in range(6):
        tr = step(env_s, a)
        env_s = tr.state
        rewards.append(float(tr.reward))
        assert int(env_s.task.since_hit) == t + 1
    # within grace (steps 1..3): alive bonus paid; after: gated off — the
    # reward must DROP by exactly the alive bonus once grace expires
    # (costs ~0 at zero torque, passive swing keeps progress tiny)
    early = np.mean(rewards[:2])
    late = np.mean(rewards[4:])
    assert early - late > 0.5, (early, late)  # default alive_bonus = 1.0

    # w_swing: identical state, nonzero swing weight, moving toward target
    swung = make_monkey3d_stepper(
        params=MonkeyParams().replace(w_swing=jnp.asarray(2.0)),
        name="MonkeySwing",
    )
    s0 = swung.init(jax.random.key(0))
    to_tgt = s0.task.bar_pos[1][0:2] - s0.q[0:2]
    dirn = to_tgt / jnp.linalg.norm(to_tgt)
    qd_fwd = s0.qd.at[0:2].set(1.5 * dirn)
    s_fwd = s0.replace(qd=qd_fwd)
    s_bwd = s0.replace(qd=s0.qd.at[0:2].set(-1.5 * dirn))
    r_fwd = float(jax.jit(swung.step_no_reset)(s_fwd, a).reward)
    r_bwd = float(jax.jit(swung.step_no_reset)(s_bwd, a).reward)
    # forward swing pays the shaping term; backward gets none of it.
    # (progress differs too — both push the same direction, so the gap is
    # strictly positive and large)
    assert r_fwd - r_bwd > 1.0, (r_fwd, r_bwd)


def test_progress_timeout_terminates_hanging():
    """progress_timeout: an episode with no new bar hit for N control steps
    ENDS (round-3 no-progress termination — default-off). Hanging then
    cannot be funded by bootstrapped value either, unlike hold_grace which
    only gates the alive bonus."""
    from mocca_envs_tpu.tasks.monkey_stepper import MonkeyParams, make_monkey3d_stepper

    env2 = make_monkey3d_stepper(
        params=MonkeyParams().replace(
            progress_timeout=jnp.asarray(4, jnp.int32),
        ),
        name="MonkeyTimeout",
    )
    s = env2.init(jax.random.key(0))
    step = jax.jit(env2.step_no_reset)
    a = jnp.zeros(env2.act_dim).at[-2].set(1.0)  # hold, no torque
    dones = []
    for _ in range(6):
        tr = step(s, a)
        s = tr.state
        dones.append(bool(tr.done))
    # no hit happens while passively hanging → done fires at since_hit == 4
    assert dones[:3] == [False, False, False], dones
    assert dones[3], dones
