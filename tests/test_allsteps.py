"""ALLSTEPS pipeline gates (VERDICT r1 #4 / SURVEY.md §3.5).

Pretrain→transfer embedding, per-env adaptive curriculum advance, and the
mirror-symmetry PPO loss — the three pieces that turn the stepper from
"survives" into "learns stones like the reference".
"""

import jax
import jax.numpy as jnp
import numpy as np
import dataclasses
import pytest

import mocca_envs_tpu
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.harness.transfer import embed_pytree, transfer_train_state


CFG = PPOConfig(horizon=4, num_epochs=1, num_minibatches=1, hidden=(32, 32))


@pytest.mark.slow
def test_transfer_embeds_walker_into_stepper():
    walker = mocca_envs_tpu.make("Walker3DCustomEnv")
    stepper = mocca_envs_tpu.make("Walker3DStepperEnv")
    src = PPOLearner(walker, CFG, num_envs=4).init(seed=0)
    dl = PPOLearner(stepper, CFG, num_envs=4)
    dst0 = dl.init(seed=1)
    dst = transfer_train_state(src, dst0)

    sk = src.params["params"]["Dense_0"]["kernel"]
    dk = dst.params["params"]["Dense_0"]["kernel"]
    assert dk.shape[0] == stepper.obs_dim > walker.obs_dim == sk.shape[0]
    # prefix rows = pretrained weights; new target rows keep fresh init
    np.testing.assert_array_equal(np.asarray(dk[: sk.shape[0]]), np.asarray(sk))
    np.testing.assert_array_equal(
        np.asarray(dk[sk.shape[0]:]),
        np.asarray(dst0.params["params"]["Dense_0"]["kernel"][sk.shape[0]:]),
    )
    # deeper layers copy verbatim
    np.testing.assert_array_equal(
        np.asarray(dst.params["params"]["Dense_1"]["kernel"]),
        np.asarray(src.params["params"]["Dense_1"]["kernel"]),
    )
    # obs-normalizer stats embed the same way
    np.testing.assert_array_equal(
        np.asarray(dst.obs_norm.mean[: walker.obs_dim]),
        np.asarray(src.obs_norm.mean),
    )
    # same-shape leaves must be COPIES, not views: train_step donates the
    # transferred state, and an aliased src would hit deleted buffers when
    # one pretrain seeds two curriculum variants
    assert dst.params["params"]["Dense_1"]["kernel"] is not \
        src.params["params"]["Dense_1"]["kernel"]
    # transferred state trains
    state, metrics = dl.train_step(dst)
    jax.block_until_ready(state.params)
    assert np.isfinite(float(metrics["pg_loss"]))
    # and src remains usable after the donation
    assert bool(jnp.all(jnp.isfinite(src.params["params"]["Dense_1"]["kernel"])))


def test_embed_rejects_shrinking():
    with pytest.raises(ValueError):
        embed_pytree(jnp.zeros((4, 3)), jnp.zeros((2, 3)))


@pytest.mark.slow
def test_per_env_curriculum_advances_on_chain_completion():
    """An env whose episode reached ≥ adv_threshold stones advances ITS OWN
    stage at auto-reset; others keep theirs (per-env, in-graph — no trainer
    round-trip)."""
    env = mocca_envs_tpu.make("Walker3DStepperEnv")
    from mocca_envs_tpu.core import rng as rng_mod

    B = 4
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)
    K = state.task.stone_top.shape[1]
    # fabricate terminal progress: slots 0, 2 completed the chain
    reached = jnp.array([K - 1, 1, K - 1, 2], jnp.int32)
    state = state.replace(
        task=state.task.replace(next_step=reached),
        q=state.q.at[:, 2].set(-50.0),  # force a fall → done for all slots
    )
    tr = jax.jit(jax.vmap(env.step))(state, jnp.zeros((B, env.act_dim)))
    assert bool(jnp.all(tr.done))
    stages = np.asarray(tr.state.task.stage)
    np.testing.assert_array_equal(stages, [1.0, 0.0, 1.0, 0.0])
    # stage persists across the NEXT ordinary reset too
    tr2 = jax.jit(jax.vmap(env.step))(
        tr.state.replace(q=tr.state.q.at[:, 2].set(-50.0)),
        jnp.zeros((B, env.act_dim)),
    )
    assert np.asarray(tr2.state.task.stage)[0] == 1.0


@pytest.mark.slow
def test_mirror_loss_trains_and_symmetrizes():
    """mirror_coef > 0 must build, run, and actually pull the policy toward
    left/right symmetry (loss measurably below the coef=0 baseline after a
    few updates on the same seed)."""
    env = mocca_envs_tpu.make("Walker3DStepperEnv")
    m = env.mirror
    assert m is not None

    def sym_gap(learner, state, key):
        obs = jax.random.normal(key, (64, env.obs_dim))
        mean, _, _ = learner.net.apply(state.params, obs)
        m_obs = obs[:, m["obs_perm"]] * m["obs_sign"]
        m_mean, _, _ = learner.net.apply(state.params, m_obs)
        tgt = mean[:, m["act_perm"]] * m["act_sign"]
        return float(jnp.mean(jnp.square(m_mean - tgt)))

    import dataclasses

    gaps = {}
    for coef in (0.0, 4.0):
        cfg = dataclasses.replace(CFG, mirror_coef=coef)
        learner = PPOLearner(env, cfg, num_envs=4)
        state = learner.init(seed=0)
        for _ in range(3):
            state, metrics = learner.train_step(state)
        jax.block_until_ready(state.params)
        gaps[coef] = sym_gap(learner, state, jax.random.key(42))
    assert np.isfinite(gaps[4.0])
    assert gaps[4.0] < gaps[0.0], gaps


def test_transfer_reset_log_std():
    """reset_log_std re-opens exploration: the log_std leaf takes the given
    value while every other leaf still embeds from the source."""
    walker = mocca_envs_tpu.make("Walker3DCustomEnv")
    stepper = mocca_envs_tpu.make("Walker3DStepperEnv")
    src = PPOLearner(walker, CFG, num_envs=4).init(seed=0)
    # simulate an annealed pretrain policy
    collapsed = jax.tree_util.tree_map_with_path(
        lambda path, leaf: jnp.full_like(leaf, -3.0)
        if any(getattr(p, "key", None) == "log_std" for p in path)
        else leaf,
        src.params,
    )
    src = src.replace(params=collapsed)
    dst0 = PPOLearner(stepper, CFG, num_envs=4).init(seed=1)

    kept = transfer_train_state(src, dst0)
    np.testing.assert_allclose(np.asarray(kept.params["params"]["log_std"]), -3.0)

    dst = transfer_train_state(src, dst0, reset_log_std=-0.5)
    np.testing.assert_allclose(np.asarray(dst.params["params"]["log_std"]), -0.5)
    np.testing.assert_array_equal(
        np.asarray(dst.params["params"]["Dense_1"]["kernel"]),
        np.asarray(src.params["params"]["Dense_1"]["kernel"]),
    )


def test_log_std_floor_bounds_entropy():
    """PPOConfig.log_std_min floors the sampling distribution: even with a
    log_std param far below the floor, rollout actions keep at least the
    floor's spread."""
    walker = mocca_envs_tpu.make("Walker3DCustomEnv")
    cfg = dataclasses.replace(CFG, log_std_min=-1.0)
    learner = PPOLearner(walker, cfg, num_envs=4)
    state = learner.init(seed=0)
    collapsed = jax.tree_util.tree_map_with_path(
        lambda path, leaf: jnp.full_like(leaf, -20.0)
        if any(getattr(p, "key", None) == "log_std" for p in path)
        else leaf,
        state.params,
    )
    state = state.replace(params=collapsed)
    state, metrics = learner.train_step(state)
    # entropy reported from the clamped log_std: act_dim * (floor + const)
    act_dim = walker.act_dim
    expected = act_dim * (-1.0 + 0.5 * np.log(2 * np.pi * np.e))
    np.testing.assert_allclose(float(metrics["entropy"]), expected, atol=1e-3)


def test_env_metrics_surface_in_train_metrics():
    """Env metric channels ride the rollout into learner metrics: batch
    means (env/) and done-masked episode-end means (ep_end/)."""
    stepper = mocca_envs_tpu.make("Walker3DStepperEnv")
    learner = PPOLearner(stepper, CFG, num_envs=4)
    state = learner.init(seed=0)
    state, m = learner.train_step(state)
    assert "env/steps_reached" in m and "ep_end/steps_reached" in m
    assert np.isfinite(float(m["env/steps_reached"]))
    assert float(m["env/steps_reached"]) >= 1.0  # next_step starts at 1
