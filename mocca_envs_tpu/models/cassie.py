"""Cassie: closed-chain biped with spring joints.

Reconstructs the reference's Cassie robot (``mocca_envs/robots.py::Cassie`` +
``mocca_envs/data/cassie/*.urdf`` — SURVEY.md §2.1 C5/C6, behavior B3
[K-high]): 10 motors (hip roll/yaw/pitch, knee, toe × 2 legs), 3 passive
joints per leg (shin spring, tarsus, heel spring), and per-leg closed-loop
linkages — the achilles rod tying the tarsus/heel-spring back to the hip
pitch output — realized as point-to-point constraint rows in the solver
(ops/step.ConstraintSpec ↔ reference ``createConstraint(JOINT_POINT2POINT)``).

PROVENANCE (SURVEY.md §0): reference asset files unavailable; the kinematic
layout below is a simplified reconstruction (segments extend down the local
−z axis; the real Cassie uses x-aligned segment frames with large offset
angles) [K-med]. PD gains and spring stiffnesses follow the widely-used
cassie-mujoco-sim values (P = [100, 100, 88, 96, 50], D = [10, 10, 8, 9.6,
5] per leg; shin spring k ≈ 1500, heel spring k ≈ 1250 N·m/rad) [K-med].
Structure (motor set, spring joints, closed chains) is [K-high] via
BASELINE.json.

SELF-CONSISTENT CLOSURE: the achilles-rod anchor on the heel-spring link and
the standing pelvis height are computed from forward kinematics of the
canonical stand pose at build time, so the closed chain starts exactly
closed and the feet exactly touch the ground regardless of the approximate
segment dimensions — keeping the [K-med] geometry honest about what matters
(constraint consistency), while the parity harness will re-fit dimensions if
the reference appears.
"""

from __future__ import annotations

import functools

import numpy as np

from mocca_envs_tpu.models.schema import ModelBuilder, RobotModel
from mocca_envs_tpu.ops.step import ConstraintSpec

FOOT_HALF_LEN = 0.09
FOOT_RADIUS = 0.025

# per-leg motor PD gains (hip_roll, hip_yaw, hip_pitch, knee, toe)
_KP = (100.0, 100.0, 88.0, 96.0, 50.0)
_KD = (10.0, 10.0, 8.0, 9.6, 5.0)
_SHIN_K = 1500.0
_HEEL_K = 1250.0
# reflected rotor inertia (gearbox): cassie-mujoco-sim armature values [K-med]
_ARM = (0.038, 0.038, 0.09, 0.09, 0.036)

# canonical stand pose: slight crouch, shin spring and heel spring relaxed
STAND_POSE = {
    "hip_roll": 0.0,
    "hip_yaw": 0.0,
    "hip_pitch": 0.2,    # thigh pitched slightly forward
    "knee": -0.4,        # knee slightly flexed
    "shin": 0.0,         # spring at rest
    "tarsus": 0.2,       # compensates knee so the foot lands under the hip
    "heel_spring": 0.0,  # spring at rest
    "toe": 0.0,          # foot plate level
}

# rod anchor on the hip-pitch (thigh) link, behind the leg plane
_ACHILLES_THIGH_ANCHOR = (-0.05, 0.0, -0.06)
# anchor point on the heel-spring link in ITS frame is solved at build time
_HEEL_TIP = (0.0, 0.0, -0.08)  # heel-spring tip (rod attachment region)


def _leg(b: ModelBuilder, side: str, sign: float) -> None:
    s = side
    b.add_link(
        f"{s}_hip_roll", "base",
        joint_pos=(0.021, sign * 0.135, 0.0), joint_axis=(1, 0, 0),
        limit=(-0.26, 0.39) if s == "right" else (-0.39, 0.26),
        mass=1.82, com=(-0.01, sign * 0.03, 0.0),
        inertia_diag=(0.004, 0.004, 0.004), actuated=True,
        kp=_KP[0], kd=_KD[0], damping=1.0, armature=_ARM[0],
    )
    b.add_link(
        f"{s}_hip_yaw", f"{s}_hip_roll",
        joint_pos=(0.0, sign * 0.09, -0.05), joint_axis=(0, 0, 1),
        limit=(-0.39, 0.39),
        mass=1.17, com=(0.0, 0.0, -0.04),
        inertia_diag=(0.002, 0.002, 0.002), actuated=True,
        kp=_KP[1], kd=_KD[1], damping=1.0, armature=_ARM[1],
    )
    # thigh: hip pitch motor; segment extends down −z
    b.add_link(
        f"{s}_hip_pitch", f"{s}_hip_yaw",
        joint_pos=(0.0, 0.0, -0.07), joint_axis=(0, 1, 0),
        limit=(-0.87, 1.40),
        mass=5.52, com=(0.0, 0.0, -0.15),
        inertia_diag=(0.06, 0.06, 0.01), actuated=True,
        kp=_KP[2], kd=_KD[2], damping=1.0, armature=_ARM[2],
    )
    b.add_link(
        f"{s}_knee", f"{s}_hip_pitch",
        joint_pos=(0.0, 0.0, -0.30), joint_axis=(0, 1, 0),
        limit=(-2.0, 0.4),
        mass=0.76, com=(0.0, 0.0, -0.03),
        inertia_diag=(0.003, 0.003, 0.001), actuated=True,
        kp=_KP[3], kd=_KD[3], damping=1.0, armature=_ARM[3],
    )
    # passive leaf-spring joint between knee output and shin tube (B3)
    b.add_link(
        f"{s}_shin", f"{s}_knee",
        joint_pos=(0.0, 0.0, -0.06), joint_axis=(0, 1, 0),
        limit=(-0.35, 0.35),
        mass=0.58, com=(0.0, 0.0, -0.21),
        inertia_diag=(0.01, 0.01, 0.002), actuated=False,
        stiffness=_SHIN_K, damping=0.3,
    )
    b.add_link(
        f"{s}_tarsus", f"{s}_shin",
        joint_pos=(0.0, 0.0, -0.43), joint_axis=(0, 1, 0),
        limit=(-0.8, 1.8),
        mass=0.78, com=(0.0, 0.0, -0.2),
        inertia_diag=(0.02, 0.02, 0.002), actuated=False, damping=0.3,
    )
    # heel leaf spring at the top of the tarsus; the achilles rod ties its
    # tip back to the thigh, closing the four-bar (B3 [K-high])
    b.add_link(
        f"{s}_heel_spring", f"{s}_tarsus",
        joint_pos=(-0.02, 0.0, -0.02), joint_axis=(0, 1, 0),
        limit=(-0.3, 0.3),
        mass=0.12, com=(0.0, 0.0, -0.04),
        inertia_diag=(4e-4, 4e-4, 1e-4), actuated=False,
        stiffness=_HEEL_K, damping=0.1,
    )
    b.add_link(
        f"{s}_toe", f"{s}_tarsus",
        joint_pos=(0.0, 0.0, -0.41), joint_axis=(0, 1, 0),
        limit=(-1.2, 1.2),
        mass=0.15, com=(0.02, 0.0, -0.01),
        inertia_diag=(2e-4, 4e-4, 4e-4), actuated=True,
        kp=_KP[4], kd=_KD[4], damping=0.5, armature=_ARM[4],
    )
    # foot collision: heel + toe spheres on the foot plate
    b.add_sphere(f"{s}_toe", (-FOOT_HALF_LEN, 0.0, -0.02), FOOT_RADIUS, foot=f"{s}_foot")
    b.add_sphere(f"{s}_toe", (FOOT_HALF_LEN, 0.0, -0.02), FOOT_RADIUS, foot=f"{s}_foot")


@functools.lru_cache(maxsize=2)
def make_model() -> RobotModel:
    b = ModelBuilder("cassie", floating=True)
    b.base_inertial(10.33, (0.05, 0.0, 0.04), inertia_diag=(0.09, 0.11, 0.12))
    _leg(b, "right", -1.0)
    _leg(b, "left", 1.0)
    b.add_sphere("base", (0.0, 0.0, 0.0), 0.13)
    return b.build()


def stand_q(model: RobotModel) -> np.ndarray:
    """Neutral standing joint vector (nj,) from STAND_POSE."""
    qj = np.zeros(model.nj)
    for j, name in enumerate(model.joint_names):
        suffix = name.split("_", 1)[1]  # strip side prefix
        if suffix in STAND_POSE:
            qj[j] = STAND_POSE[suffix]
    return qj


@functools.lru_cache(maxsize=2)
def _stand_fk():
    """FK of the canonical stand pose with base at origin (host-side)."""
    import jax.numpy as jnp

    from mocca_envs_tpu.ops.collide import sphere_centers
    from mocca_envs_tpu.ops.kinematics import forward_kinematics

    model = make_model()
    q = jnp.concatenate(
        [
            jnp.zeros(3),
            jnp.array([1.0, 0.0, 0.0, 0.0]),
            jnp.asarray(stand_q(model), dtype=jnp.float32),
        ]
    )
    fd = forward_kinematics(model, q, jnp.zeros(model.nv))
    centers = sphere_centers(model, fd)
    lowest = float(jnp.min(centers[:, 2] - model.sph_radius))
    return model, fd, lowest


def initial_z() -> float:
    """Standing pelvis height: feet exactly on the ground at the stand pose."""
    _, _, lowest = _stand_fk()
    return -lowest


INITIAL_Z = None  # resolved lazily; import-time FK would drag in jax early


@functools.lru_cache(maxsize=2)
def constraints() -> ConstraintSpec:
    """Closed-chain achilles rods, one per leg (behavior B3).

    Rod end A is a fixed anchor on the thigh; rod end B's local coordinates
    on the heel-spring link are SOLVED from stand-pose FK so the chain
    starts exactly closed (zero-length rod approximation of the reference's
    point-to-point rod constraints [K-high mechanism]).
    """
    import jax.numpy as jnp

    model, fd, _ = _stand_fk()
    idx = {n: i for i, n in enumerate(model.link_names)}
    link_a, link_b, anch_a, anch_b = [], [], [], []
    for s in ("right", "left"):
        la = idx[f"{s}_hip_pitch"]
        lb = idx[f"{s}_heel_spring"]
        aa = np.asarray(_ACHILLES_THIGH_ANCHOR)
        xa = np.asarray(fd.pos[la]) + np.asarray(fd.rot[la]) @ aa
        # solve local anchor on heel_spring so xb == xa at the stand pose
        ab = np.asarray(fd.rot[lb]).T @ (xa - np.asarray(fd.pos[lb]))
        link_a.append(la)
        link_b.append(lb)
        anch_a.append(tuple(aa))
        anch_b.append(tuple(float(v) for v in ab))
    return ConstraintSpec(
        p2p_link_a=tuple(link_a),
        p2p_link_b=tuple(link_b),
        p2p_anchor_a=tuple(anch_a),
        p2p_anchor_b=tuple(anch_b),
    )


def motor_mask(model: RobotModel) -> np.ndarray:
    return np.asarray(model.actuated)


ACTION_DIM = 10  # position targets for the 10 motors
