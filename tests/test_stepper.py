"""Walker3DStepperEnv gates: stone generation, curriculum scaling, the
step-advance machine, and batched per-env curricula (SURVEY.md B6/B7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mocca_envs_tpu
from mocca_envs_tpu.tasks.walker_stepper import StepperParams, make_walker3d_stepper
from mocca_envs_tpu.terrain.stones import StoneParams, sample_stones


def test_stone_chain_shape_and_determinism():
    p = StoneParams()
    key = jax.random.key(3)
    pos1, quat1 = sample_stones(p, key, jnp.zeros(3))
    pos2, quat2 = sample_stones(p, key, jnp.zeros(3))
    assert pos1.shape == (p.num_steps, 3)
    np.testing.assert_array_equal(pos1, pos2)
    # consecutive stone spacing within configured ranges: stage 0 stones
    # overlap (continuous walkway); stage 9 reaches ALLSTEPS stride ranges
    d = jnp.linalg.norm(jnp.diff(pos1, axis=0), axis=1)
    assert float(jnp.min(d)) >= 0.35 - 1e-6 and float(jnp.max(d)) <= 0.45 + 1e-6
    d9 = jnp.linalg.norm(
        jnp.diff(sample_stones(p.set_stage(9), key, jnp.zeros(3))[0], axis=0),
        axis=1,
    )
    assert float(jnp.max(d9)) > 0.8 and float(jnp.max(d9)) < 1.6


def test_curriculum_stage_widens_ranges():
    key = jax.random.key(0)
    easy_p = StoneParams().set_stage(0)
    hard_p = StoneParams().set_stage(9)

    def spread(p):
        pos, _ = sample_stones(p, key, jnp.zeros(3))
        return float(jnp.std(pos[:, 2]))  # height variation

    # stage 0 has zero pitch ⇒ flat chain; stage 9 pitches up to ±50°
    assert spread(easy_p) < 1e-5
    assert spread(hard_p) > 0.1


def test_curriculum_is_dynamic_data_no_recompile():
    """SURVEY.md §7.3 hard part #4: stage updates must not change shapes."""
    p = StoneParams()
    f = jax.jit(lambda p, key: sample_stones(p, key, jnp.zeros(3)))
    key = jax.random.key(1)
    f(p.set_stage(0), key)
    before = f._cache_size()
    f(p.set_stage(5), key)
    f(p.set_stage(9), key)
    assert f._cache_size() == before


@pytest.fixture(scope="module")
def env():
    return mocca_envs_tpu.make("Walker3DStepperEnv")


@pytest.mark.slow
def test_stone_culling_exact():
    """EngineConfig.stone_window (the stepper fast path) must be EXACT: the
    culled narrowphase produces bit-identical trajectories to the full
    20-stone set, including through falls between stones."""
    from mocca_envs_tpu.utils.config import EngineConfig

    full = make_walker3d_stepper(config=EngineConfig(stone_window=0),
                                 name="StepperFull")
    culled = make_walker3d_stepper(config=EngineConfig(stone_window=8),
                                   name="StepperCulled")
    key = jax.random.key(11)
    s_f = full.init(key)
    s_c = culled.init(key)
    np.testing.assert_array_equal(np.asarray(s_f.q), np.asarray(s_c.q))
    step_f = jax.jit(full.step)
    step_c = jax.jit(culled.step)
    akey = jax.random.key(5)
    for t in range(40):
        akey, k = jax.random.split(akey)
        a = 0.4 * jax.random.normal(k, (full.act_dim,))
        tr_f = step_f(s_f, a)
        tr_c = step_c(s_c, a)
        s_f, s_c = tr_f.state, tr_c.state
        np.testing.assert_array_equal(
            np.asarray(s_f.q), np.asarray(s_c.q), err_msg=f"step {t}"
        )
        np.testing.assert_array_equal(
            np.asarray(tr_f.reward), np.asarray(tr_c.reward), err_msg=f"step {t}"
        )


def test_cull_stones_selection():
    """cull_stones keeps the nearest-by-(center − bound) active stones and
    no-ops when the window covers the set."""
    from mocca_envs_tpu.terrain.scene import cull_stones, with_stones

    K = 10
    pos = jnp.stack(
        [jnp.arange(K, dtype=jnp.float32), jnp.zeros(K), jnp.zeros(K)], axis=1
    )
    quat = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (K, 1))
    half = jnp.full((K, 3), 0.25)
    sc = with_stones(pos, quat, half)
    out = cull_stones(sc, jnp.array([4.2, 0.0]), 3)
    assert out.stone_pos.shape == (3, 3)
    kept = sorted(float(x) for x in out.stone_pos[:, 0])
    assert kept == [3.0, 4.0, 5.0]
    # inactive stones rank last even when nearest
    sc2 = sc.replace(stone_active=sc.stone_active.at[4].set(0.0))
    out2 = cull_stones(sc2, jnp.array([4.2, 0.0]), 3)
    assert 4.0 not in {float(x) for x in out2.stone_pos[:, 0]}
    # window >= K → untouched
    assert cull_stones(sc, jnp.array([0.0, 0.0]), K).stone_pos.shape == (K, 3)


def test_stepper_reset_on_first_stone(env):
    state = env.init(jax.random.key(0))
    # robot starts above stone 0's top (top z = 0)
    assert 0.7 < float(state.q[2]) < 1.2
    assert int(state.task.next_step) == 1
    obs = env.obs_fn(state)
    assert obs.shape == (env.obs_dim,)
    # targets in obs are ahead of the robot in heading frame (+x-ish);
    # the 6 target dims sit before the 4-dim orientation tail (default ON)
    assert float(obs[-10]) > 0.0


@pytest.mark.slow
def test_stepper_steps_and_stays_finite(env):
    state = env.init(jax.random.key(2))
    step = jax.jit(env.step)
    for _ in range(30):
        tr = step(state, jnp.zeros(env.act_dim))
        state = tr.state
    assert bool(jnp.all(jnp.isfinite(state.q)))


def test_stepper_falls_between_stones(env):
    """Zero-torque walker must eventually fall off / collapse and reset."""
    state = env.init(jax.random.key(4))
    step = jax.jit(env.step_no_reset)
    done = False
    for _ in range(200):
        tr = step(state, jnp.zeros(env.act_dim))
        state = tr.state
        if bool(tr.done):
            done = True
            break
    assert done


def test_per_env_curriculum_in_one_batch():
    """Different curriculum stages coexist in one vmapped batch."""
    import mocca_envs_tpu.tasks.walker_stepper as ws

    def make_state(stage, seed):
        env = make_walker3d_stepper(
            params=StepperParams.default().set_curriculum(stage)
        )
        return env.init(jax.random.key(seed))

    s_easy = make_state(0, 0)
    s_hard = make_state(9, 0)
    flat_z = float(jnp.std(s_easy.task.stone_top[:, 2]))
    hard_z = float(jnp.std(s_hard.task.stone_top[:, 2]))
    assert flat_z < 1e-5 and hard_z > 0.05


def test_env_level_curriculum_no_recompile_and_survives_reset():
    """Stage lives in env state: set_stage is pure data, survives auto-reset,
    and widens terrain on the next episode (SURVEY.md §3.5, §7.3 #4)."""
    from mocca_envs_tpu.tasks.walker_stepper import set_stage

    env = mocca_envs_tpu.make("Walker3DStepperEnv")
    step = jax.jit(env.step)
    state = env.init(jax.random.key(11))
    assert float(state.task.stage) == 0.0
    # warm the compile at stage 0 FIRST so the cache gate below measures
    # only what the stage change adds (the registry shares env objects, so
    # without this the snapshot depends on which tests ran earlier)
    state = step(state, jnp.zeros(env.act_dim)).state
    before = step._cache_size()
    state = set_stage(state, 9)
    # force episode end via many steps with violent actions
    flat0 = float(jnp.std(state.task.stone_top[:, 2]))
    done_seen = False
    for _ in range(250):
        tr = step(state, jnp.ones(env.act_dim))
        state = tr.state
        if bool(tr.done):
            done_seen = True
            break
    assert done_seen
    assert step._cache_size() == before  # stage change compiled nothing new
    assert float(state.task.stage) == 9.0  # survived the auto-reset
    # the regenerated chain is stage-9 terrain (pitch variation present)
    assert float(jnp.std(state.task.stone_top[:, 2])) > max(flat0, 0.05)


def test_step_advance_machine_fires_on_stone_contact():
    """B7 deterministically: drop the walker onto its target stone → hit,
    bonus, and window advance."""
    env = mocca_envs_tpu.make("Walker3DStepperEnv")
    state = env.init(jax.random.key(0))
    tgt = state.task.stone_top[1]
    q = state.q.at[0:2].set(tgt[0:2]).at[2].set(tgt[2] + 0.95)
    state = state.replace(q=q, qd=jnp.zeros_like(state.qd))
    step = jax.jit(env.step_no_reset)
    hit_step = None
    for i in range(30):
        tr = step(state, jnp.zeros(env.act_dim))
        state = tr.state
        if float(tr.metrics["stone_hit"]) > 0:
            hit_step = i
            break
    assert hit_step is not None, "stone never registered as hit"
    assert int(state.task.next_step) == 2
    assert float(tr.reward) > 5.0  # step bonus dominates that step


def test_orient_obs_appends_stone_normals():
    """orient_obs (default ON since round 4; SURVEY B4's stone orientation
    terms): 4 tail dims = next-two stone top normals' heading-frame xy —
    ~zero at stage 0 (flat stones), nonzero at stage 9 (tilt ±25°)."""
    base = make_walker3d_stepper(name="StepperNoOrient", orient_obs=False)
    env = make_walker3d_stepper(name="StepperOrient")
    assert env.obs_dim == base.obs_dim + 4
    assert env.mirror["obs_perm"].shape == (env.obs_dim,)
    # mirror signs on the orientation tail: n_y negates
    np.testing.assert_array_equal(
        np.asarray(env.mirror["obs_sign"][-4:]), [1.0, -1.0, 1.0, -1.0]
    )
    s = env.init(jax.random.key(0))
    tail = np.asarray(env.obs_fn(s)[-4:])
    assert np.abs(tail).max() < 1e-5, tail  # stage 0: flat stones

    hard = make_walker3d_stepper(
        name="StepperOrientHard", orient_obs=True,
        params=StepperParams.default().set_curriculum(9.0),
    )
    sh = hard.init(jax.random.key(3))
    tailh = np.asarray(hard.obs_fn(sh)[-4:])
    assert np.abs(tailh).max() > 0.05, tailh  # tilted stones visible


def test_nearmiss_shaping_is_optional_and_consistent():
    """Round-5 end-stage lever: w_nearmiss adds a potential-based term on
    the swing foot's 3-D distance to the target. Gates: (a) w=0 (the
    shipped default) and w>0 produce IDENTICAL dynamics (reward never
    feeds back into physics), (b) the reward difference equals the
    emitted `nearmiss` metric exactly, (c) the term is zero on the gated
    first step after reset."""
    p0 = StepperParams.default()
    pw = StepperParams.default().replace(
        w_nearmiss=jnp.asarray(0.5, jnp.float32)
    )
    e0 = make_walker3d_stepper(name="StepperNM0", params=p0)
    ew = make_walker3d_stepper(name="StepperNMw", params=pw)
    s0 = e0.init(jax.random.key(7))
    sw = ew.init(jax.random.key(7))
    step0 = jax.jit(e0.step_no_reset)
    stepw = jax.jit(ew.step_no_reset)
    key = jax.random.key(11)
    saw_nonzero = False
    for i in range(12):
        key, ka = jax.random.split(key)
        a = 0.3 * jax.random.normal(ka, (e0.act_dim,))
        t0 = step0(s0, a)
        tw = stepw(sw, a)
        np.testing.assert_array_equal(np.asarray(t0.state.q),
                                      np.asarray(tw.state.q))
        nm = float(tw.metrics["nearmiss"])
        if i == 0:
            assert nm == 0.0  # first-step gate (reset basis placeholder)
        assert float(t0.metrics["nearmiss"]) == 0.0  # w=0: term off
        np.testing.assert_allclose(
            float(tw.reward) - float(t0.reward), nm, rtol=0, atol=1e-4
        )
        saw_nonzero = saw_nonzero or abs(nm) > 1e-6
        s0, sw = t0.state, tw.state
    assert saw_nonzero, "shaping term never fired in 12 random steps"
