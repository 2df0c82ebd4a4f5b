"""ALLSTEPS curriculum pipeline as a first-class harness.

The reference package exists to serve the ALLSTEPS experiment
("Curriculum-driven Learning of Stepping Stone Skills", Xie et al., SCA
2020): pretrain a walker, transfer it to ``Walker3DStepperEnv``
(SURVEY.md §2.1 C3, behaviors B6/B7), and climb the stone curriculum.
The reference ships only the envs — the pipeline lived in the sibling
training repo. This module is that pipeline, TPU-native: every phase is
PPO over the batched fused engine, checkpoint-resumable, and the recipe
constants are the ones validated on hardware across rounds 2–4 (see
BENCH.md "ALLSTEPS end-stage skill"):

  P1  pretrain  — walk-to-target until a speed gate (exploration floor
      −1.0 forces a dynamically-stable gait; standing still is unstable
      at σ ≥ 0.37, which is what rescued round 2's stand-forever optimum)
  P2  transfer  — stepper with stone-dominated reward (step_bonus 18,
      tall 1.0) and the per-env in-graph curriculum (adv_threshold 8);
      obs prefix stays walker-compatible so the policy transfers by
      param surgery (harness/transfer.py)
  P3  high-stage dwell — every env pinned to a hard-stage mixture with
      the log-std floor annealed −1.0 → −2.0 (round-3g: dwell nearly
      doubled stage-4 skill over where the adaptive curriculum parks)
  P4  fixed-stage ladder — deterministic episode-end stones-reached
      at pinned stages: THE honest skill statistic (the adaptive
      curriculum self-balances its own episode-end numbers toward the
      advance threshold, so mid-training snapshots understate skill)

Usage (CLI)::

    python -m mocca_envs_tpu.harness.allsteps --num-envs 4096 --seed 1 \
        --ckpt-root ckpt/allsteps

or programmatic: ``run_allsteps(AllstepsConfig(...), RunHooks(...))`` —
session scripts pass emit/heartbeat/deadline hooks; defaults print JSON
lines and never stop early.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
from mocca_envs_tpu.harness.transfer import transfer_train_state
from mocca_envs_tpu.tasks import walker_stepper as ws
from mocca_envs_tpu.tasks.walker_stepper import (
    StepperParams,
    make_walker3d_stepper,
)


@dataclasses.dataclass(frozen=True)
class RunHooks:
    """Side-channel callbacks a session driver owns; defaults are inert."""

    emit: Callable[..., None] = lambda **kw: print(json.dumps(kw), flush=True)
    beat: Callable[[], None] = lambda: None          # liveness heartbeat
    time_left: Callable[[], float] = lambda: float("inf")


@dataclasses.dataclass(frozen=True)
class AllstepsConfig:
    num_envs: int = 4096
    seed: int = 1
    ckpt_root: str = "ckpt/allsteps"
    # PPO shape (identical across phases so checkpoints/transfer line up)
    horizon: int = 128
    num_epochs: int = 4
    num_minibatches: int = 32
    hidden: tuple = (256, 256)
    lr: float = 3e-4
    reward_scale: float = 0.1
    mirror_coef: float = 4.0
    # P1 pretrain
    pretrain_updates: int = 1200
    pretrain_min_updates: int = 300
    speed_gate: float = 1.2          # m/s batch-mean; early-stop with...
    done_gate: float = 0.01          # ...episode_done_rate below this
    # P2 stepper transfer
    stepper_updates: int = 2200
    stepper_min_updates: int = 400
    stage_stop: float = 8.5          # early-stop at mean curriculum stage
    adv_threshold: float = 8.0
    step_bonus: float = 18.0
    tall_bonus: float = 1.0
    transfer_log_std: float = -0.5
    orient_obs: bool = True
    # near-miss shaping weight (walker_stepper.StepperParams.w_nearmiss);
    # 0.0 = the round-4 reward exactly. Round-5+ end-stage lever.
    w_nearmiss: float = 0.0
    # P3 pinned high-stage dwell
    highstage_updates: int = 900
    pin_lo: int = 4                  # env i pinned to lo + i % (hi-lo+1)
    pin_hi: int = 9
    floor_explore: float = -1.0
    floor_final: float = -2.0
    floor_anneal_updates: int = 600
    # P4 ladder
    eval_stages: tuple = (0, 2, 4, 5, 6)
    eval_steps: int = 700
    # bookkeeping
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
            mirror_coef=self.mirror_coef,
            log_std_min=self.floor_explore,
        )
        base.update(over)
        return PPOConfig(**base)

    def stepper_params(self, pinned: bool = False) -> StepperParams:
        f = lambda v: jnp.asarray(v, jnp.float32)
        sp = StepperParams.default().replace(
            adv_threshold=f(99.0 if pinned else self.adv_threshold),
            step_bonus=f(self.step_bonus),
            w_nearmiss=f(self.w_nearmiss),
        )
        return sp.replace(
            walker=sp.walker.replace(tall_bonus=f(self.tall_bonus))
        )


# --------------------------------------------------------------- phases
def _done_marker(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "PHASE_DONE")


def _mark_done(ckpt_dir: str, **info) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(_done_marker(ckpt_dir), "w") as f:
        f.write(json.dumps(info))


def restore_latest(learner: PPOLearner, ckpt_dir: str, seed: int):
    """Newest checkpoint in ``ckpt_dir`` restored into a fresh state, or
    None. The post-crash fallback: ``train_step`` donates its input, so a
    state already fed to a later phase is dead on device — disk holds the
    only live copy."""
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    try:
        step = mgr.latest_step()
        if step is None:
            return None
        return mgr.restore(learner.init(seed=seed), step)
    except Exception:
        return None
    finally:
        mgr.close()


def train_phase(
    learner: PPOLearner,
    ckpt_dir: str,
    n_updates: int,
    tag: str,
    cfg: AllstepsConfig,
    hooks: RunHooks,
    seed_state=None,
    zero_update_count: bool = False,
    pin_stages=None,
    stop_fn: Callable[[int, dict, Any], bool] | None = None,
):
    """One checkpoint-resumable PPO phase.

    Resume from ``ckpt_dir`` when checkpoints exist (a PHASE_DONE marker
    short-circuits retraining on watchdog re-entry); otherwise seed from
    ``seed_state`` (or fresh init). ``stop_fn(update, metrics, state)``
    early-stops; a deadline (hooks.time_left) truncates WITHOUT marking
    done so a relaunch continues. Returns (state, finished)."""
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    state = learner.init(seed=cfg.seed)
    start = mgr.latest_step()
    if start is not None:
        try:
            state = mgr.restore(state, start)
            hooks.emit(phase=tag, resumed_from=start)
        except Exception:
            import shutil

            mgr.close()
            shutil.rmtree(ckpt_dir, ignore_errors=True)
            mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
            state = learner.init(seed=cfg.seed)
            start = None
            hooks.emit(phase=tag, resume_failed="structure mismatch — wiped")
    if start is not None and os.path.exists(_done_marker(ckpt_dir)):
        hooks.emit(phase=tag, already_done_at=start)
        mgr.close()
        return state, True
    if start is None:
        start = 0
        if seed_state is not None:
            state = seed_state
            if zero_update_count:
                state = state.replace(update_count=jnp.zeros((), jnp.int32))
            if pin_stages is not None:
                state = state.replace(
                    env_state=ws.set_stage(state.env_state, pin_stages)
                )
            hooks.emit(phase=tag, seeded=True)
    if start >= n_updates:
        _mark_done(ckpt_dir, at=start)
        mgr.close()
        return state, True

    t0 = time.time()
    u = start
    finished = True
    for u in range(start, n_updates):
        hooks.beat()
        state, metrics = learner.train_step(state)
        if (u + 1) % cfg.log_every == 0 or u == start:
            jax.block_until_ready(state.params)
            row = {
                k: round(float(v), 4)
                for k, v in metrics.items()
                if not k.startswith(("env/", "ep_end/"))
            }
            if "ep_end/steps_reached" in metrics and np.isfinite(
                float(metrics["ep_end/steps_reached"])
            ):
                row["ep_steps"] = round(
                    float(metrics["ep_end/steps_reached"]), 3
                )
            task = getattr(state.env_state, "task", None)
            if task is not None and hasattr(task, "stage"):
                row["mean_stage"] = round(float(task.stage.mean()), 3)
                row["max_stage"] = float(task.stage.max())
            row["speed"] = round(
                float(
                    jnp.linalg.norm(
                        state.env_state.qd[:, 0:2], axis=1
                    ).mean()
                ),
                3,
            )
            dt = max(time.time() - t0, 1e-9)
            n = cfg.log_every if u > start else 1
            row["env_steps_per_s"] = round(
                cfg.num_envs * cfg.horizon * n / dt
            )
            hooks.emit(phase=tag, update=u + 1, **row)
            t0 = time.time()
            if stop_fn is not None and stop_fn(u + 1, row, state):
                hooks.emit(phase=tag, update=u + 1, early_stop=True)
                break
        if (u + 1) % cfg.checkpoint_every == 0:
            mgr.save(u + 1, state)
            mgr.wait()
        if (
            hooks.time_left() < cfg.deadline_margin_s
            and (u + 1) % cfg.log_every == 0
        ):
            hooks.emit(phase=tag, truncated_at=u + 1, reason="deadline")
            finished = False
            break
    if u + 1 > start and (u + 1) % cfg.checkpoint_every != 0:
        mgr.save(u + 1, state)
        mgr.wait()
    if finished:
        _mark_done(ckpt_dir, at=u + 1)
    mgr.close()
    return state, finished


def eval_fixed_stage(
    env,
    net,
    state,
    stage: float,
    cfg: AllstepsConfig,
    hooks: RunHooks = RunHooks(),
    deterministic: bool = True,
) -> dict:
    """Episode-end stones-reached at a pinned stage (the ALLSTEPS skill
    statistic — ONLY completed episodes count, and only episodes begun
    under the pinned stage: the first auto-reset after set_stage replays
    the carried layout, so episodes from reset_count ≤ start+1 are
    discarded)."""
    params, norm = state.params, state.obs_norm
    env_state = ws.set_stage(state.env_state, float(stage))
    rc0 = np.asarray(env_state.reset_count).copy()
    # full chain = last stone index (stone_top is (B, K, 3))
    last_stone = env_state.task.stone_top.shape[-2] - 1

    # obs is CARRIED (tr.obs), exactly like the training rollout —
    # recomputing obs_fn per step re-runs the XLA-path narrowphase the
    # fused kernel exists to avoid (measured 25× slower on the stepper:
    # 200k vs 5M env-steps/s, round-4 3j decomposition)
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
        pre = s.task.next_step
        tr = jax.vmap(env.step)(s, a)
        return tr.state, tr.obs, tr.done, pre, tr.state.reset_count

    key = jax.random.key(97 + int(stage))
    obs = jax.jit(jax.vmap(env.obs_fn))(env_state)
    done_steps = []
    truncated = False
    for t in range(cfg.eval_steps):
        if t % 50 == 0:
            hooks.beat()
            # a queue's hard timeout must not land mid-eval and drop the
            # row — truncate and report what we have (ADVICE r4)
            if hooks.time_left() < 60.0:
                truncated = True
                hooks.emit(phase="eval_truncated", stage=stage, at_step=t)
                break
        key, ka = jax.random.split(key)
        env_state, obs, done, pre, rc = step_fn(env_state, obs, ka)
        d = np.asarray(done) & (np.asarray(rc) > rc0 + 1)
        if d.any():
            done_steps.append(np.asarray(pre)[d])
    if not done_steps:
        # no fabricated zero-score episode: a no-data eval must be
        # distinguishable from a policy that scores 0
        return dict(
            stage=stage, deterministic=deterministic, truncated=truncated,
            episodes=0,
            ep_end_steps_mean=None, ep_end_steps_p50=None,
            ep_end_steps_p90=None, frac_ge_4=None, frac_ge_8=None,
            frac_complete=None,
        )
    ds = np.concatenate(done_steps)
    return dict(
        stage=stage,
        deterministic=deterministic,
        truncated=truncated,
        episodes=int(ds.size),
        ep_end_steps_mean=round(float(ds.mean()), 2),
        ep_end_steps_p50=float(np.percentile(ds, 50)),
        ep_end_steps_p90=float(np.percentile(ds, 90)),
        frac_ge_4=round(float((ds >= 4).mean()), 3),
        frac_ge_8=round(float((ds >= 8).mean()), 3),
        frac_complete=round(float((ds >= last_stone).mean()), 3),
    )


# ------------------------------------------------------------------ run
def run_allsteps(cfg: AllstepsConfig, hooks: RunHooks = RunHooks()) -> dict:
    """Full pipeline; returns {phase: outcome} including the P4 ladder."""
    import mocca_envs_tpu

    root = os.path.join(cfg.ckpt_root, f"s{cfg.seed}")
    root = os.path.abspath(root)
    results: dict[str, Any] = {"config": dataclasses.asdict(cfg)}

    # P1 — pretrain the walker
    walker = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
    pre_learner = PPOLearner(walker, cfg.ppo(), num_envs=cfg.num_envs)

    def pre_stop(u, row, state):
        return (
            u >= cfg.pretrain_min_updates
            and row.get("speed", 0.0) > cfg.speed_gate
            and row.get("episode_done_rate", 1.0) < cfg.done_gate
        )

    pre_state, ok = train_phase(
        pre_learner, f"{root}/pre", cfg.pretrain_updates, "pretrain",
        cfg, hooks, stop_fn=pre_stop,
    )
    results["pretrain_finished"] = ok
    if not ok:
        return results

    # P2 — stepper transfer (obs tail grows; prefix param surgery)
    st_env = make_walker3d_stepper(
        params=cfg.stepper_params(), orient_obs=cfg.orient_obs,
        name="AllstepsStepper",
    )
    st_learner = PPOLearner(st_env, cfg.ppo(), num_envs=cfg.num_envs)
    seeded = transfer_train_state(
        pre_state,
        st_learner.init(seed=cfg.seed),
        reset_log_std=cfg.transfer_log_std,
    )

    def st_stop(u, row, state):
        return (
            u >= cfg.stepper_min_updates
            and float(state.env_state.task.stage.mean()) >= cfg.stage_stop
        )

    st_state, ok = train_phase(
        st_learner, f"{root}/st", cfg.stepper_updates, "stepper",
        cfg, hooks, seed_state=seeded, stop_fn=st_stop,
    )
    results["stepper_finished"] = ok
    if not ok:
        return results

    # P3 — pinned high-stage dwell with floor anneal
    hs_env = make_walker3d_stepper(
        params=cfg.stepper_params(pinned=True), orient_obs=cfg.orient_obs,
        name="AllstepsStepperHS",
    )
    hs_learner = PPOLearner(
        hs_env,
        cfg.ppo(
            log_std_min=cfg.floor_explore,
            log_std_min_final=cfg.floor_final,
            log_std_anneal_updates=cfg.floor_anneal_updates,
        ),
        num_envs=cfg.num_envs,
    )
    span = cfg.pin_hi - cfg.pin_lo + 1
    pin = cfg.pin_lo + (jnp.arange(cfg.num_envs) % span).astype(jnp.float32)
    hs_state, ok = train_phase(
        hs_learner, f"{root}/hs", cfg.highstage_updates, "highstage",
        cfg, hooks, seed_state=st_state, zero_update_count=True,
        pin_stages=pin,
    )
    results["highstage_finished"] = ok
    best = hs_state
    # (if train_phase raised instead of returning, the session driver's
    # fallback is restore_latest() on the hs/st checkpoint dirs — the
    # in-memory states upstream are donation-dead by then)

    # P4 — the fixed-stage ladder
    ladder = []
    for stage in cfg.eval_stages:
        row = eval_fixed_stage(hs_env, hs_learner.net, best, stage, cfg, hooks)
        hooks.emit(phase="ladder", **row)
        ladder.append(row)
    results["ladder"] = ladder
    return results


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--ckpt-root", default="ckpt/allsteps")
    p.add_argument("--pretrain-updates", type=int, default=1200)
    p.add_argument("--stepper-updates", type=int, default=2200)
    p.add_argument("--highstage-updates", type=int, default=900)
    p.add_argument("--no-orient-obs", action="store_true")
    p.add_argument("--eval-stages", type=int, nargs="*", default=[0, 2, 4, 5, 6])
    p.add_argument("--horizon", type=int, default=128)
    p.add_argument("--num-epochs", type=int, default=4)
    p.add_argument("--num-minibatches", type=int, default=32)
    p.add_argument("--hidden", type=int, nargs="*", default=[256, 256])
    p.add_argument("--eval-steps", type=int, default=700)
    p.add_argument("--w-nearmiss", type=float, default=0.0,
                   help="swing-foot near-miss shaping weight (0 = off)")
    args = p.parse_args(argv)
    cfg = AllstepsConfig(
        num_envs=args.num_envs,
        seed=args.seed,
        ckpt_root=args.ckpt_root,
        pretrain_updates=args.pretrain_updates,
        stepper_updates=args.stepper_updates,
        highstage_updates=args.highstage_updates,
        orient_obs=not args.no_orient_obs,
        eval_stages=tuple(args.eval_stages),
        horizon=args.horizon,
        num_epochs=args.num_epochs,
        num_minibatches=args.num_minibatches,
        hidden=tuple(args.hidden),
        eval_steps=args.eval_steps,
        w_nearmiss=args.w_nearmiss,
    )
    out = run_allsteps(cfg)
    print(json.dumps({"ladder": out.get("ladder")}, indent=2))


if __name__ == "__main__":
    main()
