"""Post-training monkey artifacts: brachiation replay from the 3e ckpt.

  python scripts/round3_monkey_artifacts.py [--ckpt ckpt/r3_monkey2_ft] \
      [--steps 600] [--stage 9]

Writes docs/monkey3_view.html (interactive replay: bars + grab anchors)
and docs/monkey3_rollout.png (frame strip), prints bars reached. CPU.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpt/r3_monkey2_ft")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--stage", type=float, default=9.0)
    ap.add_argument("--out-prefix", default="docs/monkey3")
    ap.add_argument("--frames", type=int, default=6)
    args = ap.parse_args(argv)

    import mocca_envs_tpu  # noqa: F401
    from mocca_envs_tpu.harness.checkpoint import CheckpointManager
    from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
    from mocca_envs_tpu.harness.viewer import export_html
    from mocca_envs_tpu.harness.viz import dump_trajectory, scene_to_desc
    from mocca_envs_tpu.tasks import monkey_stepper as ms
    from mocca_envs_tpu.tasks.monkey_stepper import (
        MonkeyParams,
        make_monkey3d_stepper,
    )

    # the 3e training configuration (shapes must match the checkpoint)
    MP = MonkeyParams().replace(
        adv_threshold=jnp.asarray(4.0, jnp.float32),
        alive_bonus=jnp.asarray(0.3, jnp.float32),
        hold_grace=jnp.asarray(60, jnp.int32),
        w_swing=jnp.asarray(0.5, jnp.float32),
    )
    env = make_monkey3d_stepper(params=MP, name="ArtifactMonkey")
    cfg = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                    reward_scale=0.1, log_std_min=-1.0,
                    log_std_min_final=-2.0, log_std_anneal_updates=600)
    learner = PPOLearner(env, cfg, num_envs=4096)
    mgr = CheckpointManager(args.ckpt)
    state = mgr.restore(learner.init(seed=1), mgr.latest_step())
    params, norm = state.params, state.obs_norm
    net = learner.net
    print(f"restored {args.ckpt}@{mgr.latest_step()}")

    # single-env deterministic rollout at the pinned spacing stage: stage
    # is per-env data applied at the NEXT reset, so set it and reset once
    s = env.init(jax.random.key(7))
    s = s.replace(task=s.task.replace(stage=jnp.asarray(args.stage)))
    s = env.reset(s.key, s.reset_count + 1, s)

    @jax.jit
    def policy_step(s):
        obs = env.obs_fn(s)
        o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10, 10)
        mean, _ls, _v = net.apply(params, o[None])
        return env.step_no_reset(s, mean[0])

    qs = [np.asarray(s.q)]
    anchors = [np.asarray(s.task.anchor)]
    reached = 0
    for t in range(args.steps):
        tr = policy_step(s)
        s = tr.state
        qs.append(np.asarray(s.q))
        anchors.append(np.asarray(s.task.anchor))
        reached = int(s.task.next_bar)
        if bool(tr.done):
            print(f"episode ended at t={t}, bars reached={reached}")
            break
    print(f"bars reached: {reached}, frames: {len(qs)}")

    os.makedirs("docs", exist_ok=True)
    dump = args.out_prefix + "_traj.json"
    dump_trajectory(
        env.model, np.stack(qs), dump,
        scene_desc=scene_to_desc(s.scene),
    )
    export_html(dump, args.out_prefix + "_view.html")
    os.remove(dump)
    print("wrote", args.out_prefix + "_view.html")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from mocca_envs_tpu.envs.gym_wrapper import GymEnv

    g = GymEnv(env)
    g._state = s
    sel = np.linspace(0, len(qs) - 1, args.frames).astype(int)
    fig, axes = plt.subplots(1, len(sel), figsize=(4 * len(sel), 4), dpi=140)
    for ax_, t in zip(axes, sel):
        g._state = g._state.replace(q=jnp.asarray(qs[t]))
        frame = g.render("rgb_array", model=env.model)
        ax_.imshow(frame)
        ax_.set_axis_off()
        ax_.set_title(f"t={t}")
    fig.tight_layout()
    fig.savefig(args.out_prefix + "_rollout.png")
    print("wrote", args.out_prefix + "_rollout.png")


if __name__ == "__main__":
    main()
