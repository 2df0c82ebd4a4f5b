"""Elastic-recovery fault injection (SURVEY.md §5.3(c), VERDICT r1 #7).

The blowup mask is load-bearing for the 4096-env story: a physics blow-up in
one slot must (a) force-reset that slot in-graph, (b) increment its
``blowup_count``, and (c) leave every other slot's trajectory BIT-identical
to an uninjected run — the batched-engine form of the reference ecosystem's
worker-restart elasticity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod


BAD = (1, 5)  # slots to corrupt
B = 8


@pytest.fixture(scope="module")
def setup():
    env = mocca_envs_tpu.make("Walker3DCustomEnv")
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)
    step = jax.jit(jax.vmap(env.step))
    acts = jnp.zeros((B, env.act_dim))
    return env, state, step, acts


def _run(step, state, acts, n):
    frames = []
    for _ in range(n):
        tr = step(state, acts)
        state = tr.state
        frames.append(np.asarray(tr.state.q))
    return state, frames


@pytest.mark.slow
def test_nan_injection_recovers_and_isolates(setup):
    env, state0, step, acts = setup

    # clean branch: 3 + 5 steps
    mid_clean, _ = _run(step, state0, acts, 3)
    _, clean_frames = _run(step, mid_clean, acts, 5)

    # corrupted branch: same 3 steps, then NaN the chosen slots' q
    mid, _ = _run(step, state0, acts, 3)
    q_bad = mid.q.at[jnp.asarray(BAD), :].set(jnp.nan)
    mid = mid.replace(q=q_bad)

    tr = step(mid, acts)
    # (a) corrupted slots flagged + force-reset to finite state
    for b in BAD:
        assert bool(tr.done[b]), "blown slot must report done"
        assert float(tr.metrics["blowup"][b]) == 1.0
        assert float(tr.reward[b]) == -1.0
        assert bool(jnp.all(jnp.isfinite(tr.state.q[b])))
        assert bool(jnp.all(jnp.isfinite(tr.obs[b])))
        # (b) counter incremented, carried into the fresh episode
        assert int(tr.state.blowup_count[b]) == 1
        assert int(tr.state.reset_count[b]) == int(mid.reset_count[b]) + 1
    # healthy slots: no flags
    for b in range(B):
        if b in BAD:
            continue
        assert float(tr.metrics["blowup"][b]) == 0.0
        assert int(tr.state.blowup_count[b]) == 0

    # (c) healthy slots' trajectories BIT-identical to the clean branch
    state = tr.state
    _, frames = _run(step, state, acts, 4)
    good = [b for b in range(B) if b not in BAD]
    for t, (fc, fi) in enumerate(zip(clean_frames[1:], frames)):
        np.testing.assert_array_equal(
            fc[good], fi[good],
            err_msg=f"healthy slots diverged at step {t}",
        )


def test_blowup_count_accumulates(setup):
    """Repeated faults on one slot keep counting (monotone health metric)."""
    env, state0, step, acts = setup
    state = state0
    for k in range(3):
        state = state.replace(q=state.q.at[2, :].set(jnp.nan))
        tr = step(state, acts)
        state = tr.state
        assert int(state.blowup_count[2]) == k + 1
    assert int(state.blowup_count[0]) == 0
