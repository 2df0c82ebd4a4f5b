"""Training CLI: PPO over batched/sharded envs.

The reference ships no trainer (SURVEY.md §1); this is the BASELINE config-5
harness surfaced as a command line:

    python -m mocca_envs_tpu.harness.train \
        --env Walker3DStepperEnv --num-envs 4096 --updates 1000 \
        --ckpt-dir /tmp/ckpt --metrics out/metrics.jsonl

Features: mesh sharding when >1 device is visible, orbax checkpointing with
resume, curriculum advancement on the stepper families (reference §3.5
trainer call), metrics logging, optional profiler traces.
"""

from __future__ import annotations

import argparse
import logging
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--env", default="Walker3DCustomEnv",
        help="env ID, or comma-separated IDs for the mixed multi-family "
        "suite (BASELINE config 5), e.g. "
        "'Walker3DCustomEnv,CassieEnv,Monkey3DStepperEnv'",
    )
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--updates", type=int, default=100)
    p.add_argument("--horizon", type=int, default=128)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--minibatches", type=int, default=4)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--ckpt-every", type=int, default=50)
    p.add_argument("--metrics", default=None, help="JSONL metrics path")
    p.add_argument("--log-every", type=int, default=5)
    p.add_argument("--profile-dir", default=None)
    p.add_argument(
        "--curriculum-threshold", type=float, default=None,
        help="HOST-side batch-mean curriculum advance (legacy). Stepper "
        "families advance per-env IN-GRAPH by default (ALLSTEPS adaptive "
        "curriculum — StepperParams.adv_threshold); leave unset for that.",
    )
    p.add_argument("--no-mesh", action="store_true")
    # ALLSTEPS transfer: warm-start from a checkpoint trained on another
    # family (e.g. pretrain Walker3DCustomEnv → stepper curriculum)
    p.add_argument("--init-from", default=None,
                   help="checkpoint dir of a pretrained run to embed")
    p.add_argument("--init-env", default=None,
                   help="env ID the --init-from checkpoint was trained on")
    p.add_argument("--mirror-coef", type=float, default=0.0,
                   help="ALLSTEPS mirror-symmetry loss weight (0 = off)")
    p.add_argument("--log-std-min", type=float, default=-2.0,
                   help="exploration floor on the policy log-std "
                   "(-1.0 during pretrain keeps the standing local optimum "
                   "unstable — see BENCH.md ALLSTEPS notes)")
    p.add_argument("--reward-scale", type=float, default=1.0,
                   help="learner-side reward scaling (0.1 for walker families)")
    p.add_argument("--log-std-min-final", type=float, default=None,
                   help="anneal the exploration floor to this value over "
                   "--log-std-anneal updates (linear in update_count), then "
                   "hold — subsumes the two-phase pretrain/fine-tune recipe")
    p.add_argument("--log-std-anneal", type=int, default=0,
                   help="updates over which the floor anneals (0 = constant)")
    p.add_argument("--reset-log-std", type=float, default=None,
                   help="re-open exploration at --init-from transfer by "
                   "resetting the policy log-std to this value")
    p.add_argument("--lr-final", type=float, default=None,
                   help="anneal the learning rate linearly to this value "
                   "over --lr-anneal updates, then hold")
    p.add_argument("--lr-anneal", type=int, default=0,
                   help="updates over which the LR anneals (0 = constant)")
    p.add_argument("--normalize-reward", action="store_true",
                   help="scale rewards by the running std of the discounted "
                   "return before GAE (subsumes hand-tuned --reward-scale)")
    # multi-host (BASELINE config 5: N≥2 hosts feed one PPO learner).
    # With no flags and a TPU-pod environment, jax.distributed autodetects.
    p.add_argument("--shuffle-mode", default="full", choices=("full", "time"),
                   help="PPO minibatch shuffle: 'full' exact per-sample "
                        "permutation, 'time' horizon-axis only (gather-free "
                        "on TPU; see PPOConfig.shuffle_mode)")
    p.add_argument("--split-impulse", action="store_true",
                   help="split-impulse position correction in the engine "
                        "(Bullet m_splitImpulse; EngineConfig.split_impulse)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed before building the mesh")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (omit on TPU pods)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args(argv)


def restore_compat(ckpt, state, num_envs: int):
    """Restore ``state`` tolerating a --normalize-reward flag mismatch.

    ``TrainState.ret_accum``/``ret_norm`` are pytree leaves only when the run
    that SAVED the checkpoint had normalize_reward on (they default to None,
    which orbax treats as structure).  A checkpoint saved on one side of the
    flag therefore fails orbax StandardRestore into a template built on the
    other side.  Both the ``--ckpt-dir`` resume and the ``--init-from``
    transfer path (the ALLSTEPS pretrain recipe) must survive the flip, so:
    try the template as-is, then retry with the alternate shape and
    attach/drop the reward-norm stats accordingly.
    """
    try:
        return ckpt.restore(state)
    except Exception:
        pass
    if state.ret_accum is not None:
        # checkpoint predates --normalize-reward: restore the flag-off
        # structure, keep this run's fresh accumulator/normalizer
        bare = state.replace(ret_accum=None, ret_norm=None)
        restored = ckpt.restore(bare)
        return restored.replace(
            ret_accum=state.ret_accum, ret_norm=state.ret_norm
        )
    # checkpoint was saved WITH --normalize-reward but this run is flag-off:
    # restore with placeholder stats of the canonical shapes, then drop them
    import jax.numpy as jnp

    from mocca_envs_tpu.harness.ppo import RunningNorm

    full = state.replace(
        ret_accum=jnp.zeros((num_envs,)), ret_norm=RunningNorm.init(1)
    )
    restored = ckpt.restore(full)
    return restored.replace(ret_accum=None, ret_norm=None)


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    if args.multihost:
        # must run before any other jax API touches the backend
        from mocca_envs_tpu.parallel import multihost

        multihost.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax

    import mocca_envs_tpu
    from mocca_envs_tpu.harness.checkpoint import CheckpointManager
    from mocca_envs_tpu.harness.metrics import MetricsLogger
    from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
    from mocca_envs_tpu.parallel.mesh import env_mesh

    def _split_cfg(env_id):
        # each family keeps its OWN timing defaults; only the flag flips
        import dataclasses as _dc0

        from mocca_envs_tpu.utils.config import EngineConfig

        if env_id.startswith("Cassie"):
            from mocca_envs_tpu.tasks.cassie_task import CASSIE_CONFIG

            return _dc0.replace(CASSIE_CONFIG, split_impulse=True)
        return _dc0.replace(EngineConfig(), split_impulse=True)

    if "," in args.env:
        if args.split_impulse:
            raise SystemExit(
                "--split-impulse is not wired for mixed suites yet; "
                "run the families separately"
            )
        from mocca_envs_tpu.harness.mixed import MixedSuite

        ids = tuple(s.strip() for s in args.env.split(","))
        per = args.num_envs // len(ids)
        env = MixedSuite(ids, (per,) * len(ids))
        args.num_envs = env.num_envs
    else:
        env = (mocca_envs_tpu.make(args.env, config=_split_cfg(args.env))
               if args.split_impulse else mocca_envs_tpu.make(args.env))
    mesh = None
    if not args.no_mesh and len(jax.devices()) > 1:
        mesh = env_mesh()
        logging.info("mesh over %d devices (%d processes)",
                     mesh.size, jax.process_count())

    cfg = PPOConfig(
        horizon=args.horizon,
        num_epochs=args.epochs,
        num_minibatches=args.minibatches,
        lr=args.lr,
        mirror_coef=args.mirror_coef,
        log_std_min=args.log_std_min,
        log_std_min_final=args.log_std_min_final,
        log_std_anneal_updates=args.log_std_anneal,
        reward_scale=args.reward_scale,
        lr_final=args.lr_final,
        lr_anneal_updates=args.lr_anneal,
        normalize_reward=args.normalize_reward,
        shuffle_mode=args.shuffle_mode,
    )
    learner = PPOLearner(env, cfg, mesh=mesh, num_envs=args.num_envs)
    state = learner.init(seed=args.seed)

    if args.init_from:
        # ALLSTEPS pretrain→transfer: restore the source family's state and
        # prefix-embed its policy + obs stats into this learner's
        from mocca_envs_tpu.harness.transfer import transfer_train_state

        import dataclasses as _dc

        src_env = mocca_envs_tpu.make(args.init_env or args.env)
        src_learner = PPOLearner(
            src_env, _dc.replace(cfg, mirror_coef=0.0),
            mesh=mesh, num_envs=args.num_envs,
        )
        src_state = restore_compat(
            CheckpointManager(args.init_from),
            src_learner.init(seed=args.seed),
            args.num_envs,
        )
        state = transfer_train_state(
            src_state, state, reset_log_std=args.reset_log_std
        )
        logging.info(
            "transferred pretrained policy from %s (%s)",
            args.init_from, src_env.name,
        )

    ckpt = CheckpointManager(args.ckpt_dir) if args.ckpt_dir else None
    start_update = 0
    if ckpt is not None and ckpt.latest_step() is not None:
        state = restore_compat(ckpt, state, args.num_envs)
        start_update = int(state.update_count)
        logging.info("resumed from update %d", start_update)

    mlog = MetricsLogger(jsonl_path=args.metrics)
    steps_per_update = args.num_envs * args.horizon

    prof_ctx = None
    if args.profile_dir:
        from mocca_envs_tpu.harness.profile import trace

        prof_ctx = trace(args.profile_dir)
        prof_ctx.__enter__()

    # curriculum advancement (reference trainer call, SURVEY.md §3.5):
    # stepper-family states expose a per-env dynamic stage; advance it when
    # the batch clears the threshold. Pure data update — no recompilation.
    def maybe_advance_curriculum(state, metrics):
        task = getattr(state.env_state, "task", None)
        if task is None or not hasattr(task, "stage"):
            return state, None
        if args.curriculum_threshold is None:
            # per-env in-graph advance (StepperParams.adv_threshold) is the
            # default; just report the current mean stage
            return state, float(task.stage.mean())
        reached = metrics.get("env/steps_reached", metrics.get("steps_reached"))
        if reached is None or float(reached) < args.curriculum_threshold:
            return state, float(task.stage.mean())
        import jax.numpy as jnp

        new_stage = jnp.minimum(task.stage + 1.0, 9.0)
        state = state.replace(
            env_state=state.env_state.replace(
                task=task.replace(stage=new_stage)
            )
        )
        return state, float(new_stage.mean())

    t0 = time.time()
    for u in range(start_update, args.updates):
        state, metrics = learner.train_step(state)
        if (u + 1) % args.log_every == 0:
            jax.block_until_ready(state.params)
            m = {k: float(v) for k, v in metrics.items()}
            m["env_steps_per_s"] = steps_per_update * args.log_every / max(
                time.time() - t0, 1e-9
            )
            state, stage = maybe_advance_curriculum(state, m)
            if stage is not None:
                m["curriculum_stage"] = stage
            t0 = time.time()
            mlog.log(u + 1, m)
        if ckpt is not None and (u + 1) % args.ckpt_every == 0:
            ckpt.save(u + 1, state)

    if prof_ctx is not None:
        prof_ctx.__exit__(None, None, None)
    if ckpt is not None:
        ckpt.save(args.updates, state)
        ckpt.wait()
        ckpt.close()
    mlog.close()
    return state


if __name__ == "__main__":
    main()
