"""Horizon-scale drift gates (VERDICT r4 weak #5 / next-round #6).

The parity machinery (harness/parity.py) scores a replay against a
per-step GROWING envelope ``atol * growth^t`` — contact solvers diverge
multiplicatively, so a flat epsilon either trips on benign arithmetic
noise early or waves through real divergence late. These tests pin that
machinery at the horizon the hardware probe (scripts/tpu_round5d_drift.py)
uses:

- fast: the envelope algebra itself — a 4f2-scale per-step error
  (3.65e-3) crosses the shipped 1e-3 envelope before t=65 and is inside
  after; an accumulating error stays inside once growth outpaces it.
- slow: a 600-step zero-action walker recording replayed through
  ``replay_check`` is deterministic (errors ~0, ok=True) — the exact
  record→replay path a PyBullet recording will take; and a perturbed
  replay (1e-4 joint-angle kick at t=0) FAILS the gate with a
  first_failure in the early steps, proving the envelope rejects real
  state divergence rather than vacuously passing.

Ref: BASELINE "contact-solver tolerance gates"; SURVEY.md §7.4
(mocca_envs reconstruction cites — reference mount empty all rounds).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mocca_envs_tpu.harness.parity import (
    Recording,
    ToleranceGate,
    record,
    replay_check,
)
from mocca_envs_tpu.models import walker3d
from mocca_envs_tpu.tasks.walker_custom import make_walker3d_custom

HORIZON = 600


def test_envelope_crossing_algebra():
    gate = ToleranceGate()
    # shipped constants
    assert gate.q_atol == 1e-3 and gate.growth == 1.02
    # the measured per-step Mosaic-vs-XLA baseline (BENCH.md 4f2) sits
    # ABOVE the envelope at t=0 and inside it once growth catches up:
    # 1e-3 * 1.02^t >= 3.65e-3  <=>  t >= ln(3.65)/ln(1.02) ~= 65.4
    base = 3.65e-3
    crossings = [t for t in range(HORIZON)
                 if base > gate.envelope(t, gate.q_atol)]
    assert crossings and crossings[0] == 0
    assert max(crossings) == 65
    assert base <= gate.envelope(66, gate.q_atol)
    # an error growing slower than the envelope stays inside forever
    # after its own crossing point
    err = base * 1.01 ** np.arange(HORIZON)
    env = gate.q_atol * gate.growth ** np.arange(HORIZON)
    inside = err <= env
    assert inside[HORIZON - 1]
    first_inside = int(np.argmax(inside))
    assert inside[first_inside:].all()


@pytest.mark.slow
def test_replay_deterministic_at_horizon():
    env = make_walker3d_custom(name="DriftGoldenWalker")
    model = walker3d.make_model()
    rec = record(env, model, seed=3, horizon=HORIZON)
    out = replay_check(env, model, rec)
    assert out["ok"], out
    assert out["max_q_err"] < 1e-5, out
    assert out["max_reward_err"] < 1e-5, out


@pytest.mark.slow
def test_replay_gate_rejects_state_divergence():
    env = make_walker3d_custom(name="DriftGoldenWalker")
    model = walker3d.make_model()
    rec = record(env, model, seed=3, horizon=200)
    # perturb the recording's post-step trajectory: a 1e-2 kick on a
    # knee angle from t=1 on models an engine whose solver genuinely
    # disagrees — far outside envelope(t) for small t
    q = rec.q.copy()
    q[1:, 10] += 1e-2
    bad = Recording(meta=rec.meta, q=q, qd=rec.qd, action=rec.action,
                    obs=rec.obs, reward=rec.reward, done=rec.done)
    out = replay_check(env, model, bad)
    assert not out["ok"]
    assert out["first_failure"].startswith("q@")
    t_fail = int(out["first_failure"][2:])
    assert t_fail < 120   # rejected well before growth swallows 1e-2
