"""Gates for harness/allsteps — the ALLSTEPS pipeline as a product
surface (the reference's raison d'être; the pipeline itself lived in the
reference ecosystem's sibling training repo, SURVEY.md §1)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocca_envs_tpu.harness.allsteps import (
    AllstepsConfig,
    RunHooks,
    eval_fixed_stage,
    run_allsteps,
    train_phase,
)
from mocca_envs_tpu.harness.ppo import PPOLearner


TINY = AllstepsConfig(
    num_envs=8,
    seed=3,
    horizon=4,
    num_epochs=1,
    num_minibatches=2,
    hidden=(16, 16),
    mirror_coef=1.0,
    pretrain_updates=2,
    pretrain_min_updates=99,     # gates unreachable at tiny scale
    stepper_updates=2,
    stepper_min_updates=99,
    highstage_updates=2,
    floor_anneal_updates=2,
    eval_stages=(0.0,),
    eval_steps=12,
    checkpoint_every=2,
    log_every=1,
)


def test_config_plumbing():
    cfg = TINY
    ppo = cfg.ppo()
    assert ppo.horizon == 4 and ppo.hidden == (16, 16)
    assert ppo.log_std_min == cfg.floor_explore
    sp = cfg.stepper_params()
    assert float(sp.adv_threshold) == cfg.adv_threshold
    assert float(sp.step_bonus) == cfg.step_bonus
    assert float(sp.walker.tall_bonus) == cfg.tall_bonus
    pinned = cfg.stepper_params(pinned=True)
    assert float(pinned.adv_threshold) == 99.0


def test_eval_fixed_stage_counts_only_pinned_episodes():
    from mocca_envs_tpu.tasks.walker_stepper import make_walker3d_stepper

    cfg = TINY
    env = make_walker3d_stepper(
        params=cfg.stepper_params(pinned=True), name="EvalGateStepper"
    )
    learner = PPOLearner(env, cfg.ppo(mirror_coef=0.0), num_envs=cfg.num_envs)
    state = learner.init(seed=0)
    row = eval_fixed_stage(env, learner.net, state, 0.0, cfg)
    assert row["stage"] == 0.0
    # a random policy at 12 eval steps may or may not complete episodes —
    # both shapes must be well-formed (advisor r3 #3: no fabricated rows)
    if row["episodes"] == 0:
        assert row["ep_end_steps_mean"] is None
    else:
        assert row["ep_end_steps_mean"] >= 0.0
        assert 0.0 <= row["frac_complete"] <= 1.0


@pytest.mark.slow
def test_pipeline_end_to_end_and_resume(tmp_path):
    emits = []
    hooks = RunHooks(emit=lambda **kw: emits.append(kw))
    cfg = dataclasses.replace(TINY, ckpt_root=str(tmp_path))

    out = run_allsteps(cfg, hooks)
    assert out["pretrain_finished"] and out["stepper_finished"]
    assert out["highstage_finished"]
    assert len(out["ladder"]) == 1
    root = tmp_path / "s3"
    for phase in ("pre", "st", "hs"):
        assert (root / phase / "PHASE_DONE").exists(), phase
    phases = [e.get("phase") for e in emits]
    assert "pretrain" in phases and "ladder" in phases
    # transfer seeding happened exactly once per downstream phase
    assert sum(1 for e in emits if e.get("seeded")) == 2

    # watchdog re-entry: every phase short-circuits on its done marker
    emits2 = []
    out2 = run_allsteps(
        cfg, RunHooks(emit=lambda **kw: emits2.append(kw))
    )
    assert out2["highstage_finished"]
    assert sum(1 for e in emits2 if "already_done_at" in e) == 3
    assert not any("update" in e for e in emits2), "retrained a done phase"


@pytest.mark.slow
def test_train_phase_deadline_truncates_without_done_marker(tmp_path):
    import mocca_envs_tpu

    cfg = dataclasses.replace(TINY, ckpt_root=str(tmp_path))
    env = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    learner = PPOLearner(env, cfg.ppo(mirror_coef=0.0), num_envs=cfg.num_envs)
    hooks = RunHooks(time_left=lambda: 0.0)  # immediate deadline
    state, finished = train_phase(
        learner, str(tmp_path / "pre"), 4, "pretrain", cfg, hooks
    )
    assert not finished
    assert not (tmp_path / "pre" / "PHASE_DONE").exists()
    # a relaunch resumes from the truncation checkpoint
    state2, finished2 = train_phase(
        learner, str(tmp_path / "pre"), 4, "pretrain", cfg, RunHooks(
            emit=lambda **kw: None
        )
    )
    assert finished2
    assert (tmp_path / "pre" / "PHASE_DONE").exists()
