"""Round-4 artifacts: end-stage stepper rollout (interactive viewer +
frame strip) from the progressive-frontier checkpoints (CPU; run after
the TPU chain).

  python scripts/round4_artifacts.py [--ckpt ckpt/r4d_f8] \
      [--steps 700] [--stage 8] [--tries 8]

Unlike round 3's script this restores an orient_obs (default-ON) learner
with the AllstepsConfig shapes, and retries seeds to find an episode that
clears many stones at the pinned stage (end stages are stochastic even
deterministically: stone layouts vary per reset key).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpt/r4d_f8")
    ap.add_argument("--steps", type=int, default=700)
    ap.add_argument("--stage", type=float, default=8.0)
    ap.add_argument("--tries", type=int, default=8)
    ap.add_argument("--out-prefix", default="docs/stepper4_end")
    ap.add_argument("--frames", type=int, default=6)
    args = ap.parse_args(argv)

    import mocca_envs_tpu  # noqa: F401
    from mocca_envs_tpu.harness.allsteps import AllstepsConfig
    from mocca_envs_tpu.harness.checkpoint import CheckpointManager
    from mocca_envs_tpu.harness.ppo import PPOLearner
    from mocca_envs_tpu.harness.viewer import export_html
    from mocca_envs_tpu.harness.viz import dump_trajectory, scene_to_desc
    from mocca_envs_tpu.tasks import walker_stepper as ws
    from mocca_envs_tpu.tasks.walker_stepper import make_walker3d_stepper

    cfg = AllstepsConfig()
    env = make_walker3d_stepper(
        params=cfg.stepper_params(pinned=True), name="Artifact4Stepper"
    )
    learner = PPOLearner(env, cfg.ppo(), num_envs=cfg.num_envs)
    mgr = CheckpointManager(args.ckpt)
    state = mgr.restore(learner.init(seed=1), mgr.latest_step())
    params, norm = state.params, state.obs_norm
    net = learner.net
    print(f"restored {args.ckpt}@{mgr.latest_step()}")

    @jax.jit
    def policy_step(s, obs):
        o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10, 10)
        mean, _ls, _v = net.apply(params, o[None])
        tr = env.step_no_reset(s, mean[0])
        return tr, env.obs_fn(tr.state)

    def rollout(seed):
        s = env.init(jax.random.key(seed))
        s1 = jax.tree.map(lambda x: x[None] if hasattr(x, "ndim") else x, s)
        s1 = ws.set_stage(s1, args.stage)
        s = jax.tree.map(
            lambda x: x[0] if hasattr(x, "ndim") and x.ndim else x, s1
        )
        # re-sample the stone chain AT the pinned stage (init used stage 0;
        # reset carries the stage forward via prev_state)
        s = env.reset(
            jax.random.key(seed + 7919), jnp.ones((), jnp.int32), s
        )
        obs = env.obs_fn(s)
        qs = [np.asarray(s.q)]
        reached = 0
        for t in range(args.steps):
            tr, obs = policy_step(s, obs)
            s = tr.state
            qs.append(np.asarray(s.q))
            reached = int(s.task.next_step) - 1  # stone 0 is the spawn
            if bool(tr.done):
                break
        return reached, qs, s

    best = None
    for k in range(args.tries):
        reached, qs, s_end = rollout(123 + 71 * k)
        print(f"try {k}: stones reached={reached} frames={len(qs)}")
        if best is None or reached > best[0]:
            best = (reached, qs, s_end)
    reached, qs, s = best
    print(f"best rollout: {reached} stones, {len(qs)} frames")

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
