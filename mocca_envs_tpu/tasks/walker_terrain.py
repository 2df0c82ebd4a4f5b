"""Walker3DTerrainEnv — walk-to-target over uneven fractal terrain.

Extension family exercising the reference's HeightField scene object end to
end (``bullet_objects.py::HeightField`` — SURVEY.md §2.1 C7 [K-med]; the
reference uses heightfield terrain for uneven-ground experiments). Not part
of the reference's confirmed gym ID table — registered as an extension with
the same API shape.

Design: each env slot gets its own fractal heightfield, generated host-side
at init (native C++ diamond-square, terrain/heightfield.py) and CARRIED
ACROSS AUTO-RESETS via the reset(prev_state) contract — terrain is per-slot
persistent, spawn pose re-randomizes per episode. On TPU, physics runs in
the fused Pallas kernel: ops/step.py extracts a 16×16 local patch around the
root each control step and the kernel bilinearly samples it (one-hot
contraction — ops/pallas/engine.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mocca_envs_tpu.envs.env import EnvState
from mocca_envs_tpu.models import walker3d
from mocca_envs_tpu.tasks import base as T
from mocca_envs_tpu.tasks.walker_custom import WalkerParams, make_walker3d_custom
from mocca_envs_tpu.terrain.heightfield import fractal_heightfield
from mocca_envs_tpu.terrain.scene import (
    Scene,
    extract_patch,
    hf_sample,
    hf_sample_onehot,
)
from mocca_envs_tpu.utils.config import EngineConfig

def _patch_side() -> int:
    """The fused kernel's build-time patch side — the env pre-extracts at
    the SAME size so ops/step's ``_hf_patch_args`` passes the window through
    untouched (one extraction per control step, shared by narrowphase and
    obs probes). Falls back to the default when pallas is unavailable."""
    try:
        from mocca_envs_tpu.ops.pallas import engine as pallas_engine

        return pallas_engine.current_hf_patch()
    except Exception:  # pragma: no cover - pallas unavailable
        return 16

# Terrain height probes appended to the obs (SURVEY.md §2.3 rayTest: the
# reference ecosystem used ray probes for terrain perception; here vertical
# probes = heightfield samples — the general oblique-ray API is
# ops/pallas/raycast). Offsets are (forward, left) in the HEADING frame,
# meters; mirror pairs under y-reflection: 3↔4, 5↔6 (rest self-mirror).
PROBE_OFFSETS = np.array(
    [
        (0.35, 0.0), (0.70, 0.0), (1.05, 0.0),
        (0.35, 0.35), (0.35, -0.35),
        (0.70, 0.70), (0.70, -0.70),
        (-0.35, 0.0),
    ],
    dtype=np.float32,
)
_PROBE_MIRROR = (0, 1, 2, 4, 3, 6, 5, 7)


# LIDAR mode (Walker3DTerrainLidarEnv): 8 oblique rays fanned ±75° in the
# heading frame, pitched 45° down, marched against the SAME per-control-step
# patch the narrowphase uses — the oblique-ray consumer of the raycast
# design (SURVEY.md §2.3 rayTest row; ops/pallas/raycast.py holds the
# shared-grid Mosaic kernel + oracle, gate: tests/test_raycast.py). Marching
# samples via hf_sample_onehot (one MXU contraction per step — a vmapped
# gather would scalarize, see cull_stones).
LIDAR_YAWS = np.linspace(-1.309, 1.309, 8).astype(np.float32)   # ±75°
LIDAR_PITCH = np.float32(np.pi / 4)
LIDAR_MAX_T = 2.2
LIDAR_STEPS = 16
_LIDAR_MIRROR = tuple(range(7, -1, -1))   # symmetric fan reverses


def make_walker3d_terrain(
    config: EngineConfig | None = None,
    params: WalkerParams | None = None,
    name: str = "Walker3DTerrainEnv",
    grid: int = 65,
    extent: float = 20.0,
    amplitude: float = 0.25,
    terrain_seed: int = 0,
    lidar: bool = False,
    reset_obs: str = "zero",
):
    """Walker walk-to-target on a heightfield.

    The returned family's ``init``/``reset`` build a per-slot heightfield by
    hashing the env stream key — deterministic under the B9 seed contract —
    chosen from a bank of ``n_bank`` pre-generated host-side terrains.
    """
    base = make_walker3d_custom(
        config=config, params=params, name=name,
        initial_z=walker3d.INITIAL_Z, reset_obs=reset_obs,
    )
    cell = extent / (grid - 1)
    n_bank = 16
    bank = np.stack(
        [
            fractal_heightfield(grid, amplitude=amplitude, seed=terrain_seed * 1000 + i)
            for i in range(n_bank)
        ]
    )
    bank_j = jnp.asarray(bank)
    xy0 = jnp.asarray([-extent / 2.0, -extent / 2.0], dtype=jnp.float32)

    def _terrain_scene(key) -> Scene:
        # deterministic per-slot terrain pick from the stream key (B9)
        idx = jax.random.randint(jax.random.fold_in(key, 7919), (), 0, n_bank)
        return Scene(
            has_ground=False,
            has_hf=True,
            hf_height=bank_j[idx],
            hf_xy0=xy0,
            hf_cell=jnp.asarray(cell, dtype=jnp.float32),
            friction=jnp.asarray(0.8, dtype=jnp.float32),
        )

    def reset(key, reset_count, prev: EnvState | None = None) -> EnvState:
        state = base.reset(key, reset_count, prev)
        scene = prev.scene if prev is not None else _terrain_scene(key)
        # spawn standing on the local surface; target on the surface too.
        # (auto-reset traces this into EVERY step — gather-free sampling
        # matters here as much as in raw_step)
        pts = jnp.stack([state.q[0:2], state.task.target[0:2]])
        hs = hf_sample_onehot(scene, pts)
        q = state.q.at[2].add(hs[0])
        tgt = state.task.target.at[2].set(hs[1])
        return state.replace(q=q, scene=scene, task=state.task.replace(target=tgt))

    offsets = jnp.asarray(PROBE_OFFSETS)
    K = offsets.shape[0]

    P_SIDE = _patch_side()

    def _probes(state: EnvState, sample_scene: Scene | None = None) -> jnp.ndarray:
        """K terrain heights around the robot, heading-frame ring, relative
        to the surface under the root — the env's terrain perception.

        One batched gather-free sample (K probes + root in a single one-hot
        matmul — hf_sample under vmap would lower to TPU scalar loops).
        ``sample_scene`` lets the hot path contract against the control
        step's pre-extracted P×P patch instead of the full grid (probes
        reach ≤1.24 m from the root vs the (P/2−2)·cell ≈ 1.9 m patch
        margin at P=16, and patch-border clamping coincides with
        grid-border clamping — see terrain/scene.extract_patch)."""
        scn = state.scene if sample_scene is None else sample_scene
        yaw = T.heading_yaw(state.q)
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        world = state.q[0:2] + jnp.stack(
            [
                c * offsets[:, 0] - s * offsets[:, 1],
                s * offsets[:, 0] + c * offsets[:, 1],
            ],
            axis=1,
        )                                                    # (K, 2)
        pts = jnp.concatenate([world, state.q[None, 0:2]], axis=0)
        h = hf_sample_onehot(scn, pts)
        return h[:K] - h[K]

    cp, sp = float(np.cos(LIDAR_PITCH)), float(np.sin(LIDAR_PITCH))
    lidar_local = jnp.stack(
        [
            cp * jnp.cos(jnp.asarray(LIDAR_YAWS)),
            cp * jnp.sin(jnp.asarray(LIDAR_YAWS)),
            -sp * jnp.ones(len(LIDAR_YAWS)),
        ],
        axis=1,
    )                                                     # (R, 3)
    R = lidar_local.shape[0]

    def _lidar(state: EnvState, sample_scene: Scene | None = None) -> jnp.ndarray:
        """Normalized hit parameters of the oblique ray fan, marched by
        fixed-step sampling against the (patch) heightfield."""
        scn = state.scene if sample_scene is None else sample_scene
        yaw = T.heading_yaw(state.q)
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        dw = jnp.stack(
            [
                c * lidar_local[:, 0] - s * lidar_local[:, 1],
                s * lidar_local[:, 0] + c * lidar_local[:, 1],
                lidar_local[:, 2],
            ],
            axis=1,
        )                                                 # (R, 3)
        origin = state.q[0:3] + jnp.array([0.0, 0.0, 0.3])
        dt = LIDAR_MAX_T / LIDAR_STEPS

        def body(i, t_hit):
            t = (i + 1).astype(jnp.float32) * dt
            p = origin[None, :] + t * dw                  # (R, 3)
            h = hf_sample_onehot(scn, p[:, :2])
            first = (p[:, 2] <= h) & (t_hit >= LIDAR_MAX_T)
            return jnp.where(first, t, t_hit)

        t_hit = jax.lax.fori_loop(
            0, LIDAR_STEPS, body, jnp.full((R,), LIDAR_MAX_T)
        )
        return t_hit / LIDAR_MAX_T

    def obs_fn(state: EnvState) -> jnp.ndarray:
        parts = [base.obs_fn(state), _probes(state)]
        if lidar:
            parts.append(_lidar(state))
        return jnp.concatenate(parts)

    # auto-reset obs passthrough (see FnEnv.reset_obs_fn): when the base
    # walker family carries a cheap reset-obs variant, compose it with the
    # probe/lidar tails the same way obs_fn composes the exact one
    if base.reset_obs_fn is not None:

        def reset_obs_fn(state: EnvState) -> jnp.ndarray:
            parts = [base.reset_obs_fn(state), _probes(state)]
            if lidar:
                parts.append(_lidar(state))
            return jnp.concatenate(parts)

    else:
        reset_obs_fn = None

    def raw_step(state: EnvState, action):
        # ONE P×P patch extraction per control step, shared by the fused
        # kernel's hf narrowphase (ops/step._hf_patch_args passes a
        # pre-extracted window through untouched), the terrain-aware fall
        # test, and the obs probes — previously each contracted against the
        # full 65² grid independently (round-2i decomposition: extraction
        # and probes were each ≈ the whole terrain-vs-flat throughput gap).
        patch = extract_patch(state.scene, state.q[0:2], P_SIDE)
        tr = base.step_no_reset(state.replace(scene=patch), action)
        st = tr.state.replace(scene=state.scene)   # carry the FULL grid
        # base's reached-target z resample saw only the patch — targets land
        # 3–7 m away, outside it — so re-pin z from the full grid (one
        # sample, branchless; resampling an unchanged target is a no-op).
        tgt = st.task.target
        tz = hf_sample_onehot(state.scene, tgt[None, :2])[0]
        st = st.replace(task=st.task.replace(target=tgt.at[2].set(tz)))
        parts = [tr.obs, _probes(st, sample_scene=patch)]
        if lidar:
            # same shared patch: the fan's horizontal reach (2.2·cos45° ≈
            # 1.56 m) stays inside the ±1.9 m patch margin
            parts.append(_lidar(st, sample_scene=patch))
        obs = jnp.concatenate(parts)
        return tr.replace(state=st, obs=obs)

    # extend the mirror maps: probe block permutes left/right, signs +1;
    # the lidar fan reverses (yaw-symmetric rays)
    mirror = dict(base.mirror)
    nb = base.obs_dim
    extra_perm = [nb + jnp.asarray(_PROBE_MIRROR, dtype=jnp.int32)]
    extra_dim = K
    if lidar:
        extra_perm.append(
            nb + K + jnp.asarray(_LIDAR_MIRROR, dtype=jnp.int32)
        )
        extra_dim += len(_LIDAR_MIRROR)
    mirror["obs_perm"] = jnp.concatenate([mirror["obs_perm"]] + extra_perm)
    mirror["obs_sign"] = jnp.concatenate(
        [mirror["obs_sign"], jnp.ones(extra_dim, dtype=jnp.float32)]
    )

    from mocca_envs_tpu.envs.env import make_fn_env

    return make_fn_env(
        name=name,
        obs_dim=base.obs_dim + extra_dim,
        act_dim=base.act_dim,
        reset=reset,
        raw_step=raw_step,
        obs_fn=obs_fn,
        control_dt=base.control_dt,
        mirror=mirror,
        model=base.model,
        reset_obs_fn=reset_obs_fn,
    )
