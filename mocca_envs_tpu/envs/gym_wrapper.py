"""Gym-style host wrapper for single-env debugging.

Mirrors the reference's user-facing API (SURVEY.md §2.1 C1/C2:
``env = gym.make("Walker3DCustomEnv-v0"); obs = env.reset();
obs, r, done, info = env.step(a)``) on top of the functional core. This is a
debugging/parity convenience — production stepping is the batched/sharded
path (envs/env.BatchedEnv, parallel/sharded.py).

Rendering: the reference's GUI path (pybullet GUI + keyboard camera —
SURVEY.md §2.1 C2, out of parity scope per §2.3) maps to
``render(mode="state")`` returning a dict of link poses for external
visualizers, and harness/viz.py's trajectory dump.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.envs.env import FnEnv


class GymEnv:
    """Single-env, host-facing, stateful wrapper (old-gym 4-tuple API)."""

    def __init__(self, env: FnEnv, seed: int = 0, auto_reset: bool = False):
        self._env = env
        self._seed = seed
        self._auto = auto_reset
        self._step = jax.jit(env.step if auto_reset else env.step_no_reset)
        self._reset = jax.jit(env.reset)
        self._state = None
        self._reset_count = 0
        self.observation_space_shape = (env.obs_dim,)
        self.action_space_shape = (env.act_dim,)
        # render("human") accumulator → interactive HTML on close()
        self._human_qs = None
        self._human_path = f"{env.name.lower()}_view.html"
        self._curriculum = None
        self._reset_prev = jax.jit(env.reset)

    # -- reference API surface -------------------------------------------
    def seed(self, seed: int):
        """Reseed the env stream (reference ``EnvBase.seed``, behavior B9)."""
        self._seed = seed
        self._reset_count = 0
        return [seed]

    def set_curriculum(self, stage: float):
        """Reference trainer API (SURVEY.md §3.5 ``env.set_curriculum(k)``):
        takes effect at the next ``reset()`` — terrain is resampled with the
        stage-k ranges; physics is unchanged."""
        self._curriculum = float(stage)

    def get_mirror_indices(self):
        """Reference-style mirror index lists (the mocca extras consumed by
        symmetry-augmented trainers — SURVEY.md §2.1 C5 [K-med] mirror-index
        accessors). Returns ``(neg_obs, right_obs, left_obs, neg_act,
        right_act, left_act)``; mirroring applies as::

            m = obs.copy()
            m[right], m[left] = obs[left], obs[right]
            m[neg] *= -1

        Exactly equivalent to the engine's perm+sign maps
        (``obs[perm] * sign``): negation lists are ``sign < 0`` at the
        destination index, swap lists are the permutation's 2-cycles."""
        m = self._env.mirror
        if m is None:
            raise ValueError(f"{self._env.name} has no mirror spec")

        def split(perm, sign):
            perm = np.asarray(perm)
            sign = np.asarray(sign)
            neg = np.nonzero(sign < 0)[0]
            right = np.asarray(
                [i for i in range(len(perm)) if perm[i] > i], dtype=np.int64
            )
            left = perm[right] if right.size else right
            return neg, right, left

        no, ro, lo = split(m["obs_perm"], m["obs_sign"])
        na, ra, la = split(m["act_perm"], m["act_sign"])
        return no, ro, lo, na, ra, la

    def reset(self) -> np.ndarray:
        key = rng_mod.root_key(self._seed)
        n = jnp.asarray(self._reset_count, jnp.int32)
        self._state = self._reset(key, n)
        if self._curriculum is not None:
            task = getattr(self._state, "task", None)
            if task is None or not hasattr(task, "stage"):
                raise ValueError(
                    f"{self._env.name} has no curriculum stage to set"
                )
            # stamp the stage, then re-reset with prev= so the terrain is
            # resampled under the stage-k ranges (same episode key — only
            # the stage differs; the fresh task can't trip the advance
            # predicate, so the stamped stage carries through verbatim)
            staged = self._state.replace(
                task=task.replace(
                    stage=jnp.full_like(task.stage, self._curriculum)
                )
            )
            self._state = self._reset_prev(key, n, staged)
        self._reset_count += 1
        return np.asarray(self._env.obs_fn(self._state))

    def step(self, action):
        tr = self._step(self._state, jnp.asarray(action, dtype=jnp.float32))
        self._state = tr.state
        info = {k: float(v) for k, v in tr.metrics.items()}
        return (
            np.asarray(tr.obs),
            float(tr.reward),
            bool(tr.done),
            info,
        )

    def render(self, mode: str = "state", model=None):
        """Render the current state.

        - ``state`` → dict of q/qd (external-viewer feed; the default);
        - ``rgb_array`` → (H, W, 3) uint8 frame (matplotlib orthographic
          collision-sphere view — the reference's live GUI camera
          (``env_base.py`` camera follow, SURVEY.md §2.1 C2) is replaced by
          this offline rasterization; no interactive window exists on a TPU
          host). Pass ``model`` (RobotModel) for sphere placement; without it
          only the base trace renders.
        """
        s = self._state
        if mode == "state":
            return {"q": np.asarray(s.q), "qd": np.asarray(s.qd)}
        if mode == "human":
            # the reference pops a pybullet GUI window here; the TPU-native
            # shape is record→interactive replay: each call appends the
            # current frame, close() writes a standalone HTML viewer
            # (harness/viewer.py — orbit/zoom/camera-follow/pause/scrub)
            # whose path this returns.
            if self._human_qs is None:
                self._human_qs = []
            self._human_qs.append(np.asarray(s.q))
            return self._human_path
        if mode != "rgb_array":
            raise ValueError(f"unknown render mode {mode!r}")
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(4, 3), dpi=96)
        base = np.asarray(s.q[0:3])
        if model is not None:
            from mocca_envs_tpu.ops.collide import sphere_centers
            from mocca_envs_tpu.ops.kinematics import forward_kinematics

            fd = forward_kinematics(model, s.q, s.qd)
            # kinematic skeleton: parent→child link segments (through the
            # joint origins) make small-sphere models (monkey) legible
            pos = np.asarray(fd.pos)
            for l in range(1, model.nl):
                p = int(model.parent[l])
                if p >= 0:
                    ax.plot([pos[p, 0], pos[l, 0]], [pos[p, 2], pos[l, 2]],
                            color="tab:blue", lw=2.0, alpha=0.8,
                            solid_capstyle="round")
            centers = np.asarray(sphere_centers(model, fd))
            radii = np.asarray(model.sph_radius)
            for c, r in zip(centers, radii):
                ax.add_patch(plt.Circle((c[0], c[2]), max(r, 0.01), alpha=0.7))
        ax.plot([base[0]], [base[2]], "r+")
        sc = s.scene
        if getattr(sc, "has_ground", False):
            gz = float(sc.ground_z)
            ax.axhline(gz, color="k", lw=1)
        if getattr(sc, "has_stones", False):
            # x–z side view: stones as (axis-aligned) rectangles at their
            # centers — orientation is dropped, enough to see the chain
            pos = np.asarray(sc.stone_pos)
            half = np.asarray(sc.stone_half)
            for p, h in zip(pos, half):
                ax.add_patch(
                    plt.Rectangle(
                        (p[0] - h[0], p[2] - h[2]), 2 * h[0], 2 * h[2],
                        color="tab:gray", alpha=0.8,
                    )
                )
        if getattr(sc, "has_tris", False):
            # mesh faces as x–z segments (enough to see stairs/ramps)
            a = np.asarray(sc.tri_a)
            b = np.asarray(sc.tri_b)
            c = np.asarray(sc.tri_c)
            for k in range(a.shape[0]):
                for p0, p1 in ((a[k], b[k]), (b[k], c[k]), (c[k], a[k])):
                    ax.plot([p0[0], p1[0]], [p0[2], p1[2]],
                            color="tab:purple", lw=0.8, alpha=0.6)
        if getattr(sc, "has_bars", False):
            a = np.asarray(sc.bar_a)
            b = np.asarray(sc.bar_b)
            mid = 0.5 * (a + b)
            for m, r in zip(mid, np.asarray(sc.bar_r)):
                ax.add_patch(plt.Circle((m[0], m[2]), max(float(r), 0.02),
                                        color="tab:brown"))
        ax.set_xlim(base[0] - 1.5, base[0] + 1.5)
        ax.set_ylim(base[2] - 1.5, base[2] + 1.5)
        ax.set_aspect("equal")
        ax.set_axis_off()
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        return buf

    def close(self):
        if self._human_qs:
            self._flush_human_render()
        self._state = None

    def _flush_human_render(self) -> str:
        """Write the accumulated render("human") frames as an interactive
        HTML viewer; returns the path. Needs the env's RobotModel."""
        model = self._env.model
        if model is None:
            raise ValueError(
                f"{self._env.name} carries no RobotModel — human render "
                "needs FK replay"
            )
        import tempfile

        from mocca_envs_tpu.harness.viewer import export_html
        from mocca_envs_tpu.harness.viz import dump_trajectory, scene_to_desc

        import json as _json
        import os as _os

        with tempfile.TemporaryDirectory() as td:
            tmp = _os.path.join(td, "traj.json")
            dump_trajectory(
                model, np.stack(self._human_qs), tmp,
                scene_desc=scene_to_desc(self._state.scene),
            )
            with open(tmp) as f:
                doc = _json.load(f)
        out = export_html(doc, self._human_path)
        self._human_qs = None
        return out

    @property
    def state(self):
        return self._state
