"""Post-training artifacts: trained-policy rollout strips + interactive
viewers from the round-3 checkpoints (CPU; run after the TPU queue).

  python scripts/round3_artifacts.py [--ckpt ckpt/r3_st_v1_s1_ft] \
      [--steps 240] [--stage 2]

Writes docs/stepper3_rollout.png (frame strip), docs/stepper3_view.html
(interactive replay), and prints the episode's stones reached.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpt/r3_st_v1_s1_ft")
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--stage", type=float, default=2.0)
    ap.add_argument("--out-prefix", default="docs/stepper3")
    ap.add_argument("--frames", type=int, default=6)
    args = ap.parse_args(argv)

    import mocca_envs_tpu
    from mocca_envs_tpu.harness.checkpoint import CheckpointManager
    from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner
    from mocca_envs_tpu.harness.viewer import export_html
    from mocca_envs_tpu.harness.viz import dump_trajectory, scene_to_desc
    from mocca_envs_tpu.tasks import walker_stepper as ws
    from mocca_envs_tpu.tasks.walker_stepper import (
        StepperParams,
        make_walker3d_stepper,
    )

    SP = StepperParams.default().replace(
        adv_threshold=jnp.asarray(99.0, jnp.float32)
    )
    # round-3 checkpoints were trained BLIND (pre tilt-vision); the round-4
    # defaults flip means orient_obs must be disabled explicitly to restore
    env = make_walker3d_stepper(params=SP, name="ArtifactStepper",
                                orient_obs=False)
    # learner shapes must match the training run (3b recipe)
    cfg = PPOConfig(horizon=128, num_epochs=4, num_minibatches=32, lr=3e-4,
                    reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.0,
                    log_std_min_final=-2.0, log_std_anneal_updates=600)
    learner = PPOLearner(env, cfg, num_envs=4096)
    mgr = CheckpointManager(args.ckpt)
    state = mgr.restore(learner.init(seed=1), mgr.latest_step())
    params, norm = state.params, state.obs_norm
    net = learner.net
    print(f"restored {args.ckpt}@{mgr.latest_step()}")

    # single-env deterministic rollout at the pinned stage
    s = env.init(jax.random.key(123))
    s = ws.set_stage(
        jax.tree.map(lambda x: x[None] if hasattr(x, "ndim") else x, s),
        args.stage,
    )
    s = jax.tree.map(lambda x: x[0] if hasattr(x, "ndim") and x.ndim else x, s)

    @jax.jit
    def policy_step(s):
        obs = env.obs_fn(s)
        o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10, 10)
        mean, _ls, _v = net.apply(params, o[None])
        return env.step_no_reset(s, mean[0])

    qs = [np.asarray(s.q)]
    reached = 0
    for t in range(args.steps):
        tr = policy_step(s)
        s = tr.state
        qs.append(np.asarray(s.q))
        reached = int(s.task.next_step)
        if bool(tr.done):
            print(f"episode ended at t={t}, stones reached={reached}")
            break
    print(f"stones reached: {reached}, frames: {len(qs)}")

    os.makedirs("docs", exist_ok=True)
    dump = args.out_prefix + "_traj.json"
    dump_trajectory(
        env.model, np.stack(qs), dump,
        scene_desc=scene_to_desc(s.scene),
    )
    export_html(dump, args.out_prefix + "_view.html")
    os.remove(dump)
    print("wrote", args.out_prefix + "_view.html")

    # frame strip via the gym wrapper's rasterizer
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from mocca_envs_tpu.envs.gym_wrapper import GymEnv

    g = GymEnv(env)
    g._state = s  # only for scene access; frames re-render stored qs
    sel = np.linspace(0, len(qs) - 1, args.frames).astype(int)
    fig, axes = plt.subplots(1, len(sel), figsize=(3 * len(sel), 3), dpi=80)
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
