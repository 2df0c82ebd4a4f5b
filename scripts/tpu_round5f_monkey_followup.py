"""Round-5f TPU session: brachiation seed follow-up after the 5b
full-schedule seed-2 negative.

5b ran seed 2 at 2200+700 (mislabeled "full" — the round-3e SOLVED
schedule was 2500+800, BENCH.md "Monkey brachiation — solved") and the
spacing curriculum never left stage ~0.29: the monkey learned the
hold-and-survive plateau (reward/step ~0.88) but not the 4-bar episodes
that advance the curriculum. Two arms separate budget from seed:

  A  seed-2 EXTENSION: delete the main phase's PHASE_DONE marker and
     continue the same checkpointed run to 4500 updates (double the 5b
     budget), then a fresh 800-u annealed fine-tune + evals. If the
     climb is late-and-nonlinear (the 4i hypothesis), doubling the dwell
     finds it; if stage stays ~0.3, seed 2 is a genuine recipe-
     sensitivity negative at ANY plausible budget.
  B  seed-3 FRESH at the exact 3e schedule (2500+800, now the harness
     default). The two-seed claim the round-4 verdict asks for needs A
     REPLICATION, not specifically seed 2.

JSONL -> scripts/tpu_round5f_results.jsonl.
Ref: robots.py::Monkey3D, SURVEY §2.2 B8 (reconstruction cites).
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

OUT = "scripts/tpu_round5f_results.jsonl"
HEARTBEAT = "scripts/tpu_queue_heartbeat"
T0 = time.time()
DEADLINE = float(os.environ.get("MOCCA_QUEUE_DEADLINE", T0 + 1.5 * 3600))

FAILED = []


def emit(**kw):
    kw["t"] = round(time.time() - T0, 1)
    line = json.dumps(kw)
    print("RESULT", line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def beat():
    with open(HEARTBEAT, "a"):
        os.utime(HEARTBEAT)


def time_left():
    return DEADLINE - time.time()


import mocca_envs_tpu  # noqa: F401
from mocca_envs_tpu.harness.allsteps import RunHooks, train_phase
from mocca_envs_tpu.harness.brachiation import (
    BrachiationConfig,
    eval_bars,
    run_brachiation,
)
from mocca_envs_tpu.harness.ppo import PPOLearner
from mocca_envs_tpu.tasks.monkey_stepper import make_monkey3d_stepper

HOOKS = RunHooks(emit=emit, beat=beat, time_left=time_left)
CKPT = "/root/repo/ckpt"


def arm_a_seed2_extension():
    cfg = BrachiationConfig(seed=2, ckpt_root=f"{CKPT}/r5b_brach",
                            main_updates=4500)
    root = os.path.abspath(f"{CKPT}/r5b_brach/s2")
    marker = os.path.join(root, "main", "PHASE_DONE")
    if os.path.exists(marker):
        os.remove(marker)   # 5b marked done at 2200; we continue to 4500
        emit(phase="arm_a", note="removed main PHASE_DONE to extend")

    env = make_monkey3d_stepper(params=cfg.monkey_params(),
                                name="BrachiationMonkey")
    learner = PPOLearner(env, cfg.ppo(), num_envs=cfg.num_envs)
    state, ok = train_phase(learner, f"{root}/main", cfg.main_updates,
                            "monkey_main_ext", cfg, HOOKS)
    emit(phase="arm_a", main_ext_finished=bool(ok))
    if not ok:
        return

    ft_learner = PPOLearner(
        env,
        cfg.ppo(log_std_min=cfg.floor_explore,
                log_std_min_final=cfg.floor_final,
                log_std_anneal_updates=cfg.floor_anneal_updates),
        num_envs=cfg.num_envs,
    )
    ft_state, ok = train_phase(
        ft_learner, f"{CKPT}/r5f_s2_ft", cfg.ft_updates, "monkey_ft_ext",
        cfg, HOOKS, seed_state=state, zero_update_count=True,
    )
    emit(phase="arm_a", ft_ext_finished=bool(ok))
    for stage in (9.0, None):
        if time_left() < 120:
            emit(phase="bar_eval", arm="a_s2ext", skipped="deadline")
            continue
        row = eval_bars(env, ft_learner.net, ft_state, cfg, stage, HOOKS)
        emit(phase="bar_eval", arm="a_s2ext", **row)


def arm_b_seed3():
    cfg = BrachiationConfig(seed=3, ckpt_root=f"{CKPT}/r5f_brach")
    out = run_brachiation(cfg, HOOKS)
    emit(phase="arm_b", main_finished=bool(out.get("main_finished")),
         ft_finished=bool(out.get("ft_finished")))


def main():
    emit(phase="session_start", deadline_in_s=round(time_left()))
    for tag, fn in (("arm_a_s2ext", arm_a_seed2_extension),
                    ("arm_b_s3", arm_b_seed3)):
        if time_left() < 600:
            emit(phase="arm_skipped", arm=tag, reason="deadline")
            continue
        try:
            fn()
        except Exception:
            traceback.print_exc()
            FAILED.append(tag)
            emit(phase="arm_failed", arm=tag,
                 error=traceback.format_exc()[-300:])
    emit(phase="session_done", ok=not FAILED, failed=FAILED,
         wall_s=round(time.time() - T0, 1))


main()
