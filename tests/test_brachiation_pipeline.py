"""Gates for harness/brachiation — monkey pipeline as a product surface
(SURVEY.md §2.2 B8; recipe constants from the round-3 solve)."""

import dataclasses

import pytest

from mocca_envs_tpu.harness.allsteps import RunHooks
from mocca_envs_tpu.harness.brachiation import (
    BrachiationConfig,
    eval_bars,
    run_brachiation,
)
from mocca_envs_tpu.harness.ppo import PPOLearner


TINY = BrachiationConfig(
    num_envs=8,
    seed=5,
    horizon=4,
    num_epochs=1,
    num_minibatches=2,
    hidden=(16, 16),
    main_updates=2,
    ft_updates=2,
    floor_anneal_updates=2,
    eval_steps=10,
    eval_stages=(0.0,),
    checkpoint_every=2,
    log_every=1,
)


def test_config_carries_round3_shaping():
    mp = TINY.monkey_params()
    assert float(mp.adv_threshold) == 4.0
    assert float(mp.alive_bonus) == pytest.approx(0.3)
    assert int(mp.hold_grace) == 60
    assert float(mp.w_swing) == 0.5
    assert int(mp.progress_timeout) == 120
    assert float(TINY.monkey_params(pinned=True).adv_threshold) == 99.0


@pytest.mark.slow
def test_brachiation_end_to_end_and_resume(tmp_path):
    emits = []
    cfg = dataclasses.replace(TINY, ckpt_root=str(tmp_path))
    out = run_brachiation(cfg, RunHooks(emit=lambda **kw: emits.append(kw)))
    assert out["main_finished"] and out["ft_finished"]
    # pinned stage-0 row + the adaptive (stage=None) row
    assert len(out["evals"]) == 2
    for row in out["evals"]:
        if row["episodes"] == 0:
            assert row["ep_end_bars_mean"] is None
        else:
            assert row["ep_end_bars_mean"] >= 0.0
    assert (tmp_path / "s5" / "main" / "PHASE_DONE").exists()
    assert (tmp_path / "s5" / "ft" / "PHASE_DONE").exists()

    out2 = run_brachiation(cfg, RunHooks(emit=lambda **kw: None))
    assert out2["ft_finished"]
