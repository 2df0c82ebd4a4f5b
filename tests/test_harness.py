"""Harness gates: parity record/replay, PPO update, sharded training,
checkpoint/resume, metrics, debug utilities (SURVEY.md §4.4/§5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mocca_envs_tpu
from mocca_envs_tpu.harness import parity
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.metrics import aggregate, merge_means
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.parallel.mesh import env_mesh
from mocca_envs_tpu.parallel.sharded import sharded_env, sharded_init
from mocca_envs_tpu.utils.debug import finite_fraction


@pytest.fixture(scope="module")
def env():
    return mocca_envs_tpu.make("Walker3DCustomEnv")


@pytest.fixture(scope="module")
def model():
    from mocca_envs_tpu.models import walker3d

    return walker3d.make_model()


# ------------------------------------------------------------------ parity
def test_parity_record_replay_roundtrip(env, model, tmp_path):
    """The interchange machinery must prove determinism on our own goldens
    (SURVEY.md §7.4): record → save → load → replay → zero error."""
    rec = parity.record(env, model, seed=5, horizon=12)
    path = str(tmp_path / "golden.npz")
    rec.save(path)
    rec2 = parity.Recording.load(path)
    assert rec2.meta["seed"] == 5
    assert rec2.meta["model_hash"] == parity.model_hash(model)
    result = parity.replay_check(env, model, rec2)
    assert result["ok"], result
    assert result["max_q_err"] < 1e-6, result
    assert result["max_reward_err"] < 1e-6, result


def test_parity_raw_roundtrip_and_gate(model, tmp_path):
    """Raw-physics parity seam (engine vs engine, no task): record_raw on
    the ASSET-LOADED walker (the same data/walker3d.urdf a pybullet mirror
    would load) → save/load → replay_check_raw zero-error; corrupting the
    trajectory trips the gate."""
    import numpy as np

    from mocca_envs_tpu.models import assets
    from mocca_envs_tpu.utils.config import EngineConfig

    amodel = assets.load("walker3d")
    cfg = EngineConfig(use_pallas=False)
    q0 = np.concatenate([[0, 0, 1.32], [1, 0, 0, 0], np.zeros(amodel.nj)])
    rec = parity.record_raw(amodel, cfg, seed=3, horizon=10, q0=q0)
    path = str(tmp_path / "raw.npz")
    rec.save(path)
    rec2 = parity.Recording.load(path)
    assert rec2.meta["engine"] == "tpu_raw"
    result = parity.replay_check_raw(amodel, cfg, rec2)
    assert result["ok"], result
    assert result["max_q_err"] < 1e-6, result
    rec2.q[5:] += 0.02
    bad = parity.replay_check_raw(amodel, cfg, rec2)
    assert not bad["ok"] and bad["first_failure"].startswith("q@")


def test_parity_detects_mismatch(env, model, tmp_path):
    rec = parity.record(env, model, seed=6, horizon=8)
    rec.q[3:] += 0.5  # corrupt the golden
    result = parity.replay_check(env, model, rec)
    assert not result["ok"]
    assert result["first_failure"].startswith("q@")


def test_parity_gates_on_reward_and_obs(env, model):
    """replay_check must gate EVERY channel (VERDICT r1 weak #1): a golden
    with corrupted rewards/obs but intact positions fails the gate."""
    rec = parity.record(env, model, seed=7, horizon=8)
    bad_r = parity.Recording(
        meta=rec.meta, q=rec.q, qd=rec.qd, action=rec.action,
        obs=rec.obs, reward=rec.reward + 1.0, done=rec.done,
    )
    result = parity.replay_check(env, model, bad_r)
    assert not result["ok"] and result["first_failure"].startswith("reward@")
    bad_o = parity.Recording(
        meta=rec.meta, q=rec.q, qd=rec.qd, action=rec.action,
        obs=rec.obs + 0.3, reward=rec.reward, done=rec.done,
    )
    result = parity.replay_check(env, model, bad_o)
    assert not result["ok"] and result["first_failure"].startswith("obs@")


def test_pybullet_recorder_module_imports_clean():
    """The reference-side recorder must import with no pybullet/gym/reference
    installed (import-guarded — SURVEY.md §7.4: parity is ONE command the
    moment the mount populates)."""
    import importlib

    mod = importlib.import_module(
        "mocca_envs_tpu.harness.parity_record_pybullet"
    )
    assert callable(mod.record_pybullet) and callable(mod.main)


# ------------------------------------------------------------------ PPO
@pytest.mark.slow
def test_ppo_log_std_floor_schedule(env):
    """log_std_min_final/log_std_anneal_updates: the effective floor anneals
    linearly with update_count and holds at the final value."""
    cfg = PPOConfig(
        horizon=4, num_epochs=1, num_minibatches=2, hidden=(16, 16),
        log_std_min=-1.0, log_std_min_final=-2.0, log_std_anneal_updates=2,
    )
    learner = PPOLearner(env, cfg, mesh=None, num_envs=16)
    state = learner.init(seed=0)
    floors = []
    for _ in range(4):
        state, metrics = learner.train_step(state)
        floors.append(float(metrics["log_std_floor"]))
    # floor at update_count = 0, 1, 2, 3 → -1.0, -1.5, -2.0, -2.0 (held)
    np.testing.assert_allclose(floors, [-1.0, -1.5, -2.0, -2.0], atol=1e-6)


def test_discounted_return_scan_matches_hand_rollout():
    """R_t = γR+r with post-done reset, carried across rollout boundaries."""
    from mocca_envs_tpu.harness.ppo import discounted_return_scan

    gamma = 0.5
    reward = jnp.array([[1.0], [1.0], [2.0], [4.0]])
    done = jnp.array([[0.0], [1.0], [0.0], [0.0]])
    rets, accum = discounted_return_scan(
        reward, done, jnp.zeros((1,)), gamma
    )
    # t0: 1; t1: 0.5+1=1.5 (episode ends AFTER this step); t2: 2; t3: 1+4=5
    np.testing.assert_allclose(
        np.asarray(rets)[:, 0], [1.0, 1.5, 2.0, 5.0], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(accum), [5.0], atol=1e-6)


@pytest.mark.slow
def test_ppo_lr_schedule_and_reward_norm(env):
    """lr_final/lr_anneal_updates anneal the optimizer LR with the opt-state
    step count; normalize_reward carries per-env return accumulators and a
    running return std, while reward_per_step still reports RAW reward."""
    cfg = PPOConfig(
        horizon=4, num_epochs=1, num_minibatches=2, hidden=(16, 16),
        lr=1e-3, lr_final=0.0, lr_anneal_updates=2, normalize_reward=True,
    )
    learner = PPOLearner(env, cfg, mesh=None, num_envs=16)
    state = learner.init(seed=0)
    assert state.ret_accum.shape == (16,)
    r_raw = []
    for _ in range(3):
        state, metrics = learner.train_step(state)
        r_raw.append(float(metrics["reward_per_step"]))
        assert np.isfinite(float(metrics["reward_norm_std"]))
    # the running return std moved off its 1.0 init and stayed positive
    assert float(state.ret_norm.var[0]) != 1.0
    assert float(state.ret_norm.var[0]) > 0.0
    assert all(np.isfinite(r_raw))
    # after 2 anneal updates (= 4 optimizer steps) LR is 0 → params frozen
    p_before = jax.tree.leaves(state.params)[0].copy()
    state, _ = learner.train_step(state)
    np.testing.assert_allclose(
        jax.tree.leaves(state.params)[0], p_before, atol=0.0
    )


@pytest.mark.slow
def test_ppo_reward_norm_sharded_matches_replicas(env):
    """normalize_reward under the mesh path: return stats are psum-merged so
    ret_norm stays replicated and the update runs to finite params."""
    mesh = env_mesh()
    cfg = PPOConfig(
        horizon=4, num_epochs=1, num_minibatches=1, hidden=(16, 16),
        normalize_reward=True,
    )
    learner = PPOLearner(env, cfg, mesh=mesh, num_envs=32)
    state = learner.init(seed=1)
    state, metrics = learner.train_step(state)
    assert np.isfinite(float(metrics["reward_norm_std"]))
    assert state.ret_accum.shape == (32,)
    assert bool(jnp.all(jnp.isfinite(jax.tree.leaves(state.params)[0])))
    # the psum merge must leave ret_norm REPLICATED: every device holds the
    # same (count, mean, var) — a broken merge diverges per-shard stats
    for leaf in (state.ret_norm.count, state.ret_norm.mean, state.ret_norm.var):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        assert len(shards) == mesh.size
        for s in shards[1:]:
            np.testing.assert_array_equal(s, shards[0])
    # (a cross-run comparison vs mesh=None is NOT valid here: the sharded
    # rollout folds shard ids into its key stream, so trajectories differ —
    # replication of the merged stats is the property the psum buys)


@pytest.mark.slow
def test_ppo_single_device_update(env):
    cfg = PPOConfig(horizon=8, num_epochs=1, num_minibatches=2, hidden=(32, 32))
    learner = PPOLearner(env, cfg, mesh=None, num_envs=16)
    state = learner.init(seed=0)
    p0 = jax.tree.leaves(state.params)[0].copy()
    state, metrics = learner.train_step(state)
    assert float(finite_fraction(state.params)) == 1.0
    assert "pg_loss" in metrics and np.isfinite(float(metrics["pg_loss"]))
    p1 = jax.tree.leaves(state.params)[0]
    assert not np.allclose(p0, p1)  # the update actually moved params


def test_mirror_matrix_equals_gather(env):
    """The signed one-hot mirror MATRICES (MXU form) must reproduce the
    index-gather semantics ``x[:, perm] * sign`` EXACTLY — selection by
    ±1 one-hot rows is lossless at HIGHEST precision."""
    cfg = PPOConfig(horizon=4, num_epochs=1, num_minibatches=1,
                    hidden=(16, 16), mirror_coef=1.0)
    learner = PPOLearner(env, cfg, mesh=None, num_envs=8)
    m = learner.mirror
    x = jax.random.normal(jax.random.key(3), (32, len(m["obs_perm"])))
    a = jax.random.normal(jax.random.key(4), (32, len(m["act_perm"])))
    ref_o = np.asarray(x)[:, np.asarray(m["obs_perm"])] * np.asarray(m["obs_sign"])
    ref_a = np.asarray(a)[:, np.asarray(m["act_perm"])] * np.asarray(m["act_sign"])
    got_o = jnp.matmul(x, learner._mir_mats["obs"],
                       precision=jax.lax.Precision.HIGHEST)
    got_a = jnp.matmul(a, learner._mir_mats["act"],
                       precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_array_equal(np.asarray(got_o), ref_o)
    np.testing.assert_array_equal(np.asarray(got_a), ref_a)


def test_ppo_time_shuffle_mode(env):
    """shuffle_mode='time' (contiguous-row horizon shuffle — the TPU
    gather-free minibatcher) must train: finite metrics, params move.
    Mis-paired horizon/minibatches must be rejected up front."""
    cfg = PPOConfig(horizon=8, num_epochs=2, num_minibatches=2,
                    hidden=(32, 32), shuffle_mode="time")
    learner = PPOLearner(env, cfg, mesh=None, num_envs=16)
    state = learner.init(seed=0)
    p0 = jax.tree.leaves(state.params)[0].copy()
    state, metrics = learner.train_step(state)
    assert float(finite_fraction(state.params)) == 1.0
    assert np.isfinite(float(metrics["pg_loss"]))
    assert not np.allclose(p0, jax.tree.leaves(state.params)[0])

    with pytest.raises(ValueError, match="horizon"):
        PPOLearner(
            env,
            PPOConfig(horizon=6, num_minibatches=4, shuffle_mode="time"),
            mesh=None, num_envs=16,
        )
    with pytest.raises(ValueError, match="shuffle_mode"):
        PPOLearner(
            env, PPOConfig(shuffle_mode="bogus"), mesh=None, num_envs=16
        )


@pytest.mark.slow
def test_ppo_sharded_update_matches_devices(env):
    mesh = env_mesh()
    assert mesh.size == 8  # conftest forces 8 virtual cpu devices
    cfg = PPOConfig(horizon=4, num_epochs=1, num_minibatches=1, hidden=(16, 16))
    learner = PPOLearner(env, cfg, mesh=mesh, num_envs=32)
    state = learner.init(seed=1)
    state, metrics = learner.train_step(state)
    assert np.isfinite(float(metrics["reward_per_step"]))
    # params remain replicated (psum'd grads): fetch is consistent
    leaf = jax.tree.leaves(state.params)[0]
    assert bool(jnp.all(jnp.isfinite(leaf)))


# ------------------------------------------------------------------ sharding
@pytest.mark.slow
def test_sharded_env_step_matches_unsharded(env):
    mesh = env_mesh()
    B = 16
    state = sharded_init(env, mesh, B, seed=0)
    step = sharded_env(env, mesh)
    actions = jnp.zeros((B, env.act_dim))
    tr = step(state, actions)

    from mocca_envs_tpu.core import rng as rng_mod

    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state2 = jax.jit(jax.vmap(env.init))(keys)
    tr2 = jax.jit(jax.vmap(env.step))(state2, actions)
    np.testing.assert_allclose(
        np.asarray(tr.obs), np.asarray(tr2.obs), rtol=2e-4, atol=1e-5
    )


def test_shard_mapped_env_runs(env):
    from mocca_envs_tpu.parallel.sharded import shard_mapped_env

    mesh = env_mesh()
    B = 16
    state = sharded_init(env, mesh, B, seed=3)
    step = shard_mapped_env(env, mesh)
    tr = step(state, jnp.zeros((B, env.act_dim)))
    assert tr.obs.shape == (B, env.obs_dim)


# ------------------------------------------------------------------ ckpt
@pytest.mark.slow
def test_checkpoint_roundtrip(env, tmp_path):
    cfg = PPOConfig(horizon=4, num_epochs=1, num_minibatches=1, hidden=(16, 16))
    learner = PPOLearner(env, cfg, mesh=None, num_envs=8)
    state = learner.init(seed=2)
    state, _ = learner.train_step(state)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state)
    mgr.wait()
    assert mgr.latest_step() == 1
    restored = mgr.restore(state)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(state.env_state.q), np.asarray(restored.env_state.q)
    )
    mgr.close()


@pytest.mark.slow
def test_restore_compat_across_normalize_reward_flip(env, tmp_path):
    """A checkpoint saved WITHOUT --normalize-reward must restore into a
    flag-ON learner (the ALLSTEPS --init-from transfer recipe) and vice
    versa — ADVICE r2: ret_accum/ret_norm presence is pytree STRUCTURE, so
    a naive StandardRestore fails on the flip."""
    from mocca_envs_tpu.harness.train import restore_compat

    base = dict(horizon=4, num_epochs=1, num_minibatches=1, hidden=(16, 16))
    off = PPOLearner(env, PPOConfig(**base), mesh=None, num_envs=8)
    st_off = off.init(seed=2)
    st_off, _ = off.train_step(st_off)
    mgr = CheckpointManager(str(tmp_path / "off"))
    mgr.save(1, st_off)
    mgr.wait()

    # flag-off checkpoint → flag-on run: params restore, fresh norm attaches
    on = PPOLearner(
        env, PPOConfig(normalize_reward=True, **base), mesh=None, num_envs=8
    )
    # (train the flag-on learner FIRST: restore_compat's output aliases its
    # template's ret_accum, and train_step donates its input)
    st_on2, _ = on.train_step(on.init(seed=7))
    got = restore_compat(mgr, on.init(seed=7), num_envs=8)
    for a, b in zip(jax.tree.leaves(st_off.params), jax.tree.leaves(got.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert got.ret_accum is not None and got.ret_norm is not None
    # and the restored state must run
    got, _ = on.train_step(got)
    mgr.close()

    # flag-on checkpoint → flag-off run: stats drop, params restore
    mgr2 = CheckpointManager(str(tmp_path / "on"))
    mgr2.save(1, st_on2)
    mgr2.wait()
    got2 = restore_compat(mgr2, off.init(seed=9), num_envs=8)
    for a, b in zip(jax.tree.leaves(st_on2.params), jax.tree.leaves(got2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert got2.ret_accum is None and got2.ret_norm is None
    mgr2.close()


def test_lr_schedule_flags_must_pair(env):
    """ADVICE r2: passing only one of lr_final / lr_anneal_updates is a
    silent constant-LR footgun — must raise."""
    base = dict(horizon=4, num_epochs=1, num_minibatches=1, hidden=(16, 16))
    with pytest.raises(ValueError, match="lr_final"):
        PPOLearner(env, PPOConfig(lr_final=0.0, **base), mesh=None, num_envs=8)
    with pytest.raises(ValueError, match="lr_final"):
        PPOLearner(
            env, PPOConfig(lr_anneal_updates=10, **base), mesh=None, num_envs=8
        )


@pytest.mark.slow
def test_mixed_suite_per_family_metrics_and_mirror():
    """Config-5 CPU slice (VERDICT r2 #7): the mixed suite must surface
    NAMESPACED per-family metric channels (NaN-masked union) and an ACTIVE
    family-selected mirror loss."""
    from mocca_envs_tpu.harness.mixed import MixedSuite

    suite = MixedSuite(("Walker3DCustomEnv", "Monkey3DStepperEnv"), (8, 8))
    # family-stacked mirror spec: walker has a spec, monkey gets identity
    assert suite.mirror is not None and suite.mirror["family"]
    assert suite.mirror["obs_perms"].shape == (2, suite.obs_dim)

    cfg = PPOConfig(horizon=4, num_epochs=1, num_minibatches=1,
                    hidden=(16, 16), mirror_coef=0.1)
    learner = PPOLearner(suite, cfg, mesh=None, num_envs=16)
    state = learner.init(seed=0)
    state, metrics = learner.train_step(state)
    # per-family channels present with finite batch means
    for ch in ("env/Walker3DCustomEnv/progress",
               "env/Walker3DCustomEnv/episode_steps",
               "env/Monkey3DStepperEnv/bars_reached"):
        assert ch in metrics, sorted(metrics)
        assert np.isfinite(float(metrics[ch])), ch
    assert float(metrics["env/Walker3DCustomEnv/episode_steps"]) > 0.0
    # the update ran to finite params with the mirror loss on
    assert bool(jnp.all(jnp.isfinite(jax.tree.leaves(state.params)[0])))


# ------------------------------------------------------------------ metrics
def test_metrics_aggregation():
    m = {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((2, 3))}
    agg = aggregate(m)
    assert float(agg["a"]) == 2.5 and float(agg["b"]) == 1.0
    merged = merge_means([{"x": 1.0}, {"x": 3.0}])
    assert merged["x"] == 2.0
