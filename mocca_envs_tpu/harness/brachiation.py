"""Monkey brachiation pipeline as a first-class harness.

The second headline skill of the reference suite
(``mocca_envs/env_locomotion.py::Monkey3DStepperEnv`` +
``robots.py::Monkey3D`` — SURVEY.md §2.2 B8): swing hand-over-hand along
a generated chain of bars with grab/release dynamics. The recipe here is
the one that solved it on hardware in round 3 (BENCH.md "Monkey
brachiation — solved": ep-end 14.59–14.65 bars of 15, p50 = full chain,
at the hardest spacing stage):

- bar-dominated reward with ``hold_grace`` (the alive bonus stops paying
  1 s after the last bar hit) and ``w_swing`` (toward-target CoM speed
  pays while holding) — the shaping gradient out of the hang-forever
  attractor;
- ``progress_timeout`` — an episode with no new bar for 2 s ENDS, so a
  safe hang is terminal for the value function too, not just unpaid;
- per-env spacing curriculum at ``adv_threshold`` 4 (in-graph advance);
- main phase at exploration floor −1.0, then a fine-tune with the floor
  annealed −1.0 → −2.0.

CLI::

    python -m mocca_envs_tpu.harness.brachiation --num-envs 4096 --seed 1
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mocca_envs_tpu.harness.allsteps import (
    RunHooks,
    restore_latest,
    train_phase,
)
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.tasks.monkey_stepper import (
    MonkeyParams,
    make_monkey3d_stepper,
    set_stage,
)


@dataclasses.dataclass(frozen=True)
class BrachiationConfig:
    num_envs: int = 4096
    seed: int = 1
    ckpt_root: str = "ckpt/brachiation"
    horizon: int = 128
    num_epochs: int = 4
    num_minibatches: int = 32
    hidden: tuple = (256, 256)
    lr: float = 3e-4
    reward_scale: float = 0.1
    # round-3e/3h shaping (values validated on hardware)
    adv_threshold: float = 4.0
    alive_bonus: float = 0.3
    hold_grace: int = 60
    w_swing: float = 0.5
    progress_timeout: int = 120
    # phases — the round-3e SOLVED schedule was 2500+800 (BENCH.md
    # "Monkey brachiation — solved"); earlier round-4/5 reruns used
    # 2200+700 mislabeled as "full", so their negatives ran at 88% of
    # the solved budget. Defaults now match 3e.
    main_updates: int = 2500
    ft_updates: int = 800
    floor_explore: float = -1.0
    floor_final: float = -2.0
    floor_anneal_updates: int = 600
    # eval
    eval_steps: int = 700
    eval_stages: tuple = (9.0,)   # pinned hardest spacing by default
    checkpoint_every: int = 150
    log_every: int = 50
    deadline_margin_s: float = 600.0

    def ppo(self, **over) -> PPOConfig:
        base = dict(
            horizon=self.horizon,
            num_epochs=self.num_epochs,
            num_minibatches=self.num_minibatches,
            hidden=self.hidden,
            lr=self.lr,
            reward_scale=self.reward_scale,
            log_std_min=self.floor_explore,
        )
        base.update(over)
        return PPOConfig(**base)

    def monkey_params(self, pinned: bool = False) -> MonkeyParams:
        f = lambda v: jnp.asarray(v, jnp.float32)
        i = lambda v: jnp.asarray(v, jnp.int32)
        mp = MonkeyParams()
        return mp.replace(
            adv_threshold=f(99.0 if pinned else self.adv_threshold),
            alive_bonus=f(self.alive_bonus),
            hold_grace=i(self.hold_grace),
            w_swing=f(self.w_swing),
            progress_timeout=i(self.progress_timeout),
        )


def eval_bars(
    env,
    net,
    state,
    cfg: BrachiationConfig,
    stage: float | None = None,
    hooks: RunHooks = RunHooks(),
    deterministic: bool = True,
) -> dict:
    """Episode-end bars-reached (the B8 skill statistic). ``stage`` pins
    every env's spacing stage; None evaluates at the carried per-env
    stages. Only episodes BEGUN under the pinned stage count."""
    params, norm = state.params, state.obs_norm
    env_state = state.env_state
    if stage is not None:
        env_state = set_stage(env_state, float(stage))
    rc0 = np.asarray(env_state.reset_count).copy()

    # obs carried (tr.obs) — see allsteps.eval_fixed_stage: per-step
    # obs_fn re-runs the XLA narrowphase, 25× slower than the kernel path
    @jax.jit
    def step_fn(s, obs, key):
        o = jnp.clip(
            (obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10.0, 10.0
        )
        mean, log_std, _v = net.apply(params, o)
        noise = jax.random.normal(key, mean.shape)
        a = mean if deterministic else mean + jnp.exp(
            jnp.maximum(log_std, cfg.floor_final)
        ) * noise
        pre = s.task.next_bar
        sg = s.task.stage
        tr = jax.vmap(env.step)(s, a)
        return tr.state, tr.obs, tr.done, pre, sg, tr.state.reset_count

    key = jax.random.key(41 + int(stage or 0))
    obs = jax.jit(jax.vmap(env.obs_fn))(env_state)
    done_bars, done_stage = [], []
    truncated = False
    for t in range(cfg.eval_steps):
        if t % 50 == 0:
            hooks.beat()
            # truncate before a queue hard-timeout can drop the whole row
            # (same ADVICE-r4 fix as allsteps.eval_fixed_stage)
            if hooks.time_left() < 60.0:
                truncated = True
                hooks.emit(phase="eval_truncated", stage=stage, at_step=t)
                break
        key, ka = jax.random.split(key)
        env_state, obs, done, pre, sg, rc = step_fn(env_state, obs, ka)
        d = np.asarray(done)
        if stage is not None:
            d = d & (np.asarray(rc) > rc0 + 1)
        if d.any():
            done_bars.append(np.asarray(pre)[d])
            done_stage.append(np.asarray(sg)[d])
    if not done_bars:
        return dict(
            stage=stage, deterministic=deterministic, truncated=truncated,
            episodes=0,
            ep_end_bars_mean=None, ep_end_bars_p50=None,
            ep_end_bars_p90=None, frac_ge_4=None, stage_mean=None,
        )
    db = np.concatenate(done_bars)
    dg = np.concatenate(done_stage)
    return dict(
        stage=stage,
        deterministic=deterministic,
        truncated=truncated,
        episodes=int(db.size),
        ep_end_bars_mean=round(float(db.mean()), 2),
        ep_end_bars_p50=float(np.percentile(db, 50)),
        ep_end_bars_p90=float(np.percentile(db, 90)),
        frac_ge_4=round(float((db >= 4).mean()), 3),
        stage_mean=round(float(dg.mean()), 3),
    )


def run_brachiation(
    cfg: BrachiationConfig, hooks: RunHooks = RunHooks()
) -> dict:
    """Main (spacing curriculum) → floor-anneal fine-tune → bar evals."""
    root = os.path.abspath(os.path.join(cfg.ckpt_root, f"s{cfg.seed}"))
    results: dict[str, Any] = {"config": dataclasses.asdict(cfg)}

    env = make_monkey3d_stepper(
        params=cfg.monkey_params(), name="BrachiationMonkey"
    )
    learner = PPOLearner(env, cfg.ppo(), num_envs=cfg.num_envs)
    state, ok = train_phase(
        learner, f"{root}/main", cfg.main_updates, "monkey_main",
        cfg, hooks,
    )
    results["main_finished"] = ok
    if not ok:
        return results

    ft_learner = PPOLearner(
        env,
        cfg.ppo(
            log_std_min=cfg.floor_explore,
            log_std_min_final=cfg.floor_final,
            log_std_anneal_updates=cfg.floor_anneal_updates,
        ),
        num_envs=cfg.num_envs,
    )
    ft_state, ok = train_phase(
        ft_learner, f"{root}/ft", cfg.ft_updates, "monkey_ft",
        cfg, hooks, seed_state=state, zero_update_count=True,
    )
    results["ft_finished"] = ok

    evals = []
    for stage in cfg.eval_stages:
        row = eval_bars(env, ft_learner.net, ft_state, cfg, stage, hooks)
        hooks.emit(phase="bar_eval", **row)
        evals.append(row)
    # the adaptive-stage row (what the curriculum parked each env at)
    row = eval_bars(env, ft_learner.net, ft_state, cfg, None, hooks)
    hooks.emit(phase="bar_eval", **row)
    evals.append(row)
    results["evals"] = evals
    return results


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--ckpt-root", default="ckpt/brachiation")
    p.add_argument("--main-updates", type=int, default=2500)
    p.add_argument("--ft-updates", type=int, default=800)
    p.add_argument("--horizon", type=int, default=128)
    p.add_argument("--num-epochs", type=int, default=4)
    p.add_argument("--num-minibatches", type=int, default=32)
    p.add_argument("--hidden", type=int, nargs="*", default=[256, 256])
    p.add_argument("--eval-steps", type=int, default=700)
    p.add_argument("--eval-stages", type=float, nargs="*", default=[9.0])
    args = p.parse_args(argv)
    cfg = BrachiationConfig(
        num_envs=args.num_envs,
        seed=args.seed,
        ckpt_root=args.ckpt_root,
        main_updates=args.main_updates,
        ft_updates=args.ft_updates,
        horizon=args.horizon,
        num_epochs=args.num_epochs,
        num_minibatches=args.num_minibatches,
        hidden=tuple(args.hidden),
        eval_steps=args.eval_steps,
        eval_stages=tuple(args.eval_stages),
    )
    out = run_brachiation(cfg)
    print(json.dumps({"evals": out.get("evals")}, indent=2))


if __name__ == "__main__":
    main()
