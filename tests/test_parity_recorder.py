"""Execute the pybullet recorder CLI against a fake pybullet (VERDICT r2 #2).

The real reference stack (gym + pybullet + mocca_envs) is absent, so
``harness/parity_record_pybullet.py``'s driving logic would otherwise bitrot
unexecuted. These gates run BOTH recorder modes end-to-end against
tests/fake_pybullet.py (trivial dynamics, real shipped-URDF joint
structure), then round-trip the outputs through parity.Recording and the
replay_check machinery — so the day the mount populates, parity is one
command with already-exercised code."""

import json
import sys

import numpy as np
import pytest

from mocca_envs_tpu.harness.parity import (
    Recording,
    record_raw,
    replay_check,
    replay_check_raw,
)
from mocca_envs_tpu.models import assets, walker3d
from mocca_envs_tpu.utils.config import EngineConfig

from tests import fake_pybullet


@pytest.fixture()
def fake_stack(monkeypatch):
    fake_pybullet.reset_fake()
    urdf = assets.asset_path("walker3d")
    gym_mod, pb_mod, mocca_mod = fake_pybullet.make_fake_modules(urdf)
    monkeypatch.setitem(sys.modules, "gym", gym_mod)
    monkeypatch.setitem(sys.modules, "pybullet", pb_mod)
    monkeypatch.setitem(sys.modules, "mocca_envs", mocca_mod)
    return urdf


def _called(name):
    return any(c[0] == name for c in fake_pybullet.CALLS)


def test_record_pybullet_cli_end_to_end(fake_stack, tmp_path):
    """--env mode: joint discovery, seeding, the step loop, extraction, and
    the npz round-trip into replay_check all execute."""
    from mocca_envs_tpu.harness import parity_record_pybullet as rec_mod

    out = str(tmp_path / "ref.npz")
    rec_mod.main(["--env", "Walker3DCustomEnv-v0", "--seed", "3",
                  "--horizon", "4", "--out", out])

    rec = Recording.load(out)
    nj = walker3d.make_model().nj
    assert rec.meta["engine"] == "pybullet"
    assert rec.meta["seed"] == 3
    assert rec.q.shape[1] == 7 + nj
    assert rec.qd.shape[1] == 6 + nj
    assert rec.action.shape == (4, nj)
    assert rec.obs.shape[0] == 4 and rec.reward.shape == (4,)
    assert np.all(np.isfinite(rec.q)), "state extraction produced NaNs"
    # the recorder exercised the real control flow, not a stub:
    for call in ("env.seed", "env.reset", "env.step",
                 "getBasePositionAndOrientation", "getBaseVelocity",
                 "getJointStates", "env.close"):
        assert _called(call), call

    # the recording FEEDS the gate machinery (obs dim matches our walker
    # family is not required — replay_check gates channels independently
    # and reports errors; a fake-dynamics recording must FAIL, not crash)
    import mocca_envs_tpu

    env = mocca_envs_tpu.make("Walker3DCustomEnv")
    report = replay_check(env, walker3d.make_model(), rec)
    assert "ok" in report and report["ok"] in (True, False)
    assert not report["ok"]  # fake dynamics ≠ our engine — gate catches it


def test_record_raw_pybullet_cli_end_to_end(fake_stack, tmp_path):
    """--raw-urdf mode: mirror one of OUR record_raw recordings in (fake)
    pybullet — motor disable, state seeding, torque replay, extraction —
    then gate the result with replay_check_raw."""
    from mocca_envs_tpu.harness import parity_record_pybullet as rec_mod

    model = walker3d.make_model()
    config = EngineConfig()
    q0 = np.zeros(model.nq, dtype=np.float32)
    q0[2] = 1.0
    q0[3] = 1.0  # wxyz identity
    ours = record_raw(model, config, seed=5, horizon=3, q0=q0)
    match = str(tmp_path / "ours.npz")
    ours.save(match)

    out = str(tmp_path / "pb_raw.npz")
    rec_mod.main(["--raw-urdf", fake_stack, "--match", match, "--out", out])

    rec = Recording.load(out)
    assert rec.meta["engine"] == "pybullet_raw"
    assert rec.q.shape == (4, 7 + model.nj)
    assert rec.qd.shape == (4, 6 + model.nj)
    np.testing.assert_allclose(rec.action, ours.action, atol=0)
    assert np.all(np.isfinite(rec.q))
    # the recorder's pybullet-prep logic all ran:
    for call in ("connect", "setGravity", "setTimeStep",
                 "setPhysicsEngineParameter", "createCollisionShape",
                 "createMultiBody", "loadURDF", "getNumJoints",
                 "getJointInfo", "setJointMotorControl2", "resetJointState",
                 "changeDynamics", "resetBaseVelocity",
                 "setJointMotorControlArray", "stepSimulation",
                 "disconnect"):
        assert _called(call), call
    # initial state was seeded from the match recording (xyzw file quat)
    np.testing.assert_allclose(rec.q[0], ours.q[0], atol=1e-6)
    # default velocity motors were disabled on every movable joint
    disables = [c for c in fake_pybullet.CALLS
                if c[0] == "setJointMotorControl2"
                and c[2] == fake_pybullet.VELOCITY_CONTROL and c[3] == 0.0]
    assert len(disables) == model.nj
    # substep count honored: T control steps × substeps × llc sim calls
    nsim = sum(1 for c in fake_pybullet.CALLS if c[0] == "stepSimulation")
    assert nsim == 3 * config.sim_substeps * config.llc_frames

    # round-trip into the cross-engine gate: runs, reports, and (because the
    # fake's dynamics are NOT physics) correctly fails
    report = replay_check_raw(model, config, rec)
    assert "ok" in report and not report["ok"]
    assert np.isfinite(report["q_err"]) if "q_err" in report else True


def test_recorder_import_guard_message():
    """Without the fake stack the CLI must exit with the actionable message
    (not an ImportError traceback)."""
    from mocca_envs_tpu.harness import parity_record_pybullet as rec_mod

    for name in ("gym", "pybullet", "mocca_envs"):
        assert name not in sys.modules or hasattr(sys.modules[name], "make")
    with pytest.raises(SystemExit, match="reference stack"):
        rec_mod.record_pybullet("X-v0", 0, 1)
