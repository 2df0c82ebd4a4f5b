"""On-device stepping-stone placement + curriculum (behavior B6).

Reconstructs ``env_locomotion.py::Walker3DStepperEnv.generate_step_placements``
(SURVEY.md §2.2 B6 [K-high mechanism]): a chain of N stones sampled in
spherical increments — per step a distance r, heading yaw φ, pitch θ (height
change) and stone tilt, each uniform in ranges that scale with an integer
curriculum stage. ALLSTEPS end-stage ranges: pitch ±50°, yaw ±20°, tilt ±25°,
r up to ≈0.8–1.5 m [K-med] (Xie et al., SCA 2020, §4).

The TPU-native difference (SURVEY.md §3.5): the curriculum stage is a FIELD
of the dynamic params pytree, not Python state — stages can differ per env
slot in one vmapped batch and advance with zero recompiles. Stones become
oriented boxes in the env's Scene (terrain/scene.py), not separate bodies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mocca_envs_tpu.core import quat as quat_ops
from mocca_envs_tpu.core import rng as rng_mod

DEG = jnp.pi / 180.0


class StoneParams(struct.PyTreeNode):
    """Dynamic sampling ranges; ``stage / max_stage`` interpolates lo→hi."""

    num_steps: int = struct.field(pytree_node=False, default=20)
    stage: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.float32))
    max_stage: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(9.0))
    # per-step increment ranges at stage 0 → max stage (ALLSTEPS-style).
    # Spacing ALSO ramps: stage 0's r ≈ 0.35–0.45 m keeps consecutive
    # 0.5 m stones overlapping (a continuous walkway — stepping almost in
    # place advances the chain), so a from-scratch policy meets a dense
    # step-bonus gradient; end stages reach the paper's 0.65–1.35 m strides.
    r_lo_start: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.35))
    r_lo_end: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.65))
    r_hi_start: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.45))
    r_hi_end: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.35))
    yaw_max_end: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(20.0 * DEG))
    pitch_max_end: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(50.0 * DEG))
    tilt_max_end: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(25.0 * DEG))
    # stone geometry (Plank/Pillar half-extents — SURVEY.md C7 [K-med])
    half_x: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.25))
    half_y: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.25))
    half_z: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.5))

    def set_stage(self, stage) -> "StoneParams":
        """Trainer-facing curriculum setter (reference §3.5 call stack)."""
        return self.replace(stage=jnp.asarray(stage, jnp.float32))


def sample_stones(params: StoneParams, key: jax.Array, start: jnp.ndarray):
    """Sample the stone chain. Returns (pos (K,3) top centers, quat (K,4)).

    ``start`` is the world position of stone 0's top center (under the
    robot's initial pose; the first two stones are flat and level so the
    reset pose is always feasible — mirrors the reference's fixed first
    steps [K-med]).
    """
    K = params.num_steps
    frac = jnp.clip(params.stage / jnp.maximum(params.max_stage, 1.0), 0.0, 1.0)
    r_lo = params.r_lo_start + frac * (params.r_lo_end - params.r_lo_start)
    r_hi = params.r_hi_start + frac * (params.r_hi_end - params.r_hi_start)
    yaw_max = frac * params.yaw_max_end
    pitch_max = frac * params.pitch_max_end
    tilt_max = frac * params.tilt_max_end

    ks = jax.random.split(key, 5)
    r = rng_mod.uniform(ks[0], (K,), r_lo, r_hi)
    dyaw = rng_mod.uniform(ks[1], (K,), -yaw_max, yaw_max)
    pitch = rng_mod.uniform(ks[2], (K,), -pitch_max, pitch_max)
    tilt_x = rng_mod.uniform(ks[3], (K,), -tilt_max, tilt_max)
    tilt_y = rng_mod.uniform(ks[4], (K,), -tilt_max, tilt_max)

    # first two increments flat & straight ahead (stable start)
    easy = jnp.arange(K) < 2
    dyaw = jnp.where(easy, 0.0, dyaw)
    pitch = jnp.where(easy, 0.0, pitch)
    tilt_x = jnp.where(easy, 0.0, tilt_x)
    tilt_y = jnp.where(easy, 0.0, tilt_y)
    r = jnp.where(easy, 0.5 * (r_lo + r_hi), r)

    heading = jnp.cumsum(dyaw)
    delta = r[:, None] * jnp.stack(
        [
            jnp.cos(heading) * jnp.cos(pitch),
            jnp.sin(heading) * jnp.cos(pitch),
            jnp.sin(pitch),
        ],
        axis=1,
    )
    # stone 0 sits under the start; subsequent stones accumulate increments
    pos = start[None, :] + jnp.concatenate(
        [jnp.zeros((1, 3)), jnp.cumsum(delta[1:], axis=0)], axis=0
    )
    quat = quat_ops.from_rpy(
        jnp.stack([tilt_x, tilt_y, heading], axis=1)
    )
    return pos, quat


def stones_to_scene_boxes(params: StoneParams, top_pos, quat):
    """Top-center poses → box centers/halves for terrain/scene.with_stones."""
    half = jnp.stack(
        [
            jnp.broadcast_to(params.half_x, top_pos[:, 0].shape),
            jnp.broadcast_to(params.half_y, top_pos[:, 0].shape),
            jnp.broadcast_to(params.half_z, top_pos[:, 0].shape),
        ],
        axis=1,
    )
    # box center sits half_z below the top face along the stone's local z
    center = top_pos - quat_ops.rotate(quat, jnp.stack(
        [jnp.zeros_like(half[:, 2]), jnp.zeros_like(half[:, 2]), half[:, 2]], axis=1
    ))
    return center, half
