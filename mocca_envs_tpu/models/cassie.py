"""Cassie: closed-chain biped with spring joints.

Reconstructs the reference's Cassie robot (``mocca_envs/robots.py::Cassie`` +
``mocca_envs/data/cassie/*.urdf`` — SURVEY.md §2.1 C5/C6, behavior B3
[K-high]): 10 motors (hip roll/yaw/pitch, knee, toe × 2 legs), 3 passive
joints per leg (shin spring, tarsus, heel spring), and per-leg closed-loop
linkages — the achilles rod tying the tarsus back to the hip pitch output —
realized as point-to-point constraint rows in the solver
(ops/step.ConstraintSpec ↔ reference ``createConstraint(JOINT_POINT2POINT)``).

PROVENANCE (SURVEY.md §0): reference asset files unavailable; kinematic
offsets, inertias and rod anchors below are plausible reconstructions from
the public Agility Robotics Cassie model family [K-med]. PD gains and spring
stiffnesses follow the widely-used cassie-mujoco-sim values (P = [100, 100,
88, 96, 50], D = [10, 10, 8, 9.6, 5] per leg; shin spring k ≈ 1500,
heel spring k ≈ 1250 N·m/rad) [K-med]. Structure (joint count, motor set,
spring joints, closed chains) is [K-high] via BASELINE.json.
"""

from __future__ import annotations

import functools

import numpy as np

from mocca_envs_tpu.models.schema import ModelBuilder, RobotModel
from mocca_envs_tpu.ops.step import ConstraintSpec

INITIAL_Z = 1.0   # standing pelvis height [K-med]
FOOT_HALF_LEN = 0.09

# per-leg motor PD gains (hip_roll, hip_yaw, hip_pitch, knee, toe)
_KP = (100.0, 100.0, 88.0, 96.0, 50.0)
_KD = (10.0, 10.0, 8.0, 9.6, 5.0)
_SHIN_K = 1500.0
_HEEL_K = 1250.0

# neutral standing pose for the leg chain [K-med]
STAND_POSE = {
    "hip_roll": 0.0,
    "hip_yaw": 0.0,
    "hip_pitch": 0.5,
    "knee": -1.2,
    "shin": 0.0,
    "tarsus": 1.45,
    "heel_spring": 0.0,
    "toe": -1.6,
}


def _leg(b: ModelBuilder, side: str, sign: float) -> None:
    s = side
    b.add_link(
        f"{s}_hip_roll", "base",
        joint_pos=(0.021, sign * 0.135, 0.0), joint_axis=(1, 0, 0),
        limit=(-0.26, 0.39) if s == "right" else (-0.39, 0.26),
        mass=1.82, com=(-0.01, sign * 0.03, 0.0),
        inertia_diag=(0.004, 0.004, 0.004), actuated=True,
        kp=_KP[0], kd=_KD[0], damping=1.0,
    )
    b.add_link(
        f"{s}_hip_yaw", f"{s}_hip_roll",
        joint_pos=(0.0, sign * 0.09, 0.0), joint_axis=(0, 0, 1),
        limit=(-0.39, 0.39),
        mass=1.17, com=(0.0, 0.0, -0.04),
        inertia_diag=(0.002, 0.002, 0.002), actuated=True,
        kp=_KP[1], kd=_KD[1], damping=1.0,
    )
    b.add_link(
        f"{s}_hip_pitch", f"{s}_hip_yaw",
        joint_pos=(0.0, 0.0, -0.09), joint_axis=(0, 1, 0),
        limit=(-0.87, 1.40),
        mass=5.52, com=(0.12, sign * 0.0, -0.01),
        inertia_diag=(0.01, 0.06, 0.06), actuated=True,
        kp=_KP[2], kd=_KD[2], damping=1.0,
    )
    b.add_link(
        f"{s}_knee", f"{s}_hip_pitch",
        joint_pos=(0.12, sign * 0.0, -0.04), joint_axis=(0, 1, 0),
        limit=(-2.86, -0.64),
        mass=0.76, com=(0.05, 0.0, -0.02),
        inertia_diag=(0.003, 0.003, 0.001), actuated=True,
        kp=_KP[3], kd=_KD[3], damping=1.0,
    )
    # passive leaf-spring joint between knee output and shin tube (B3)
    b.add_link(
        f"{s}_shin", f"{s}_knee",
        joint_pos=(0.06, 0.0, -0.05), joint_axis=(0, 1, 0),
        limit=(-0.35, 0.35),
        mass=0.58, com=(0.18, 0.0, -0.19),
        inertia_diag=(0.01, 0.01, 0.002), actuated=False,
        stiffness=_SHIN_K, damping=0.3,
    )
    b.add_link(
        f"{s}_tarsus", f"{s}_shin",
        joint_pos=(0.435, 0.0, -0.01), joint_axis=(0, 1, 0),
        limit=(0.87, 2.96),
        mass=0.78, com=(0.11, 0.0, -0.25),
        inertia_diag=(0.02, 0.02, 0.002), actuated=False, damping=0.3,
    )
    # heel leaf spring hanging off the tarsus; the achilles rod ties its tip
    # back to the hip pitch link, closing the four-bar (B3 [K-high])
    b.add_link(
        f"{s}_heel_spring", f"{s}_tarsus",
        joint_pos=(-0.01, 0.0, 0.0), joint_axis=(0, 1, 0),
        limit=(-0.3, 0.3),
        mass=0.12, com=(0.08, 0.0, 0.0),
        inertia_diag=(4e-4, 4e-4, 1e-4), actuated=False,
        stiffness=_HEEL_K, damping=0.1,
    )
    b.add_link(
        f"{s}_toe", f"{s}_tarsus",
        joint_pos=(0.41, 0.0, -0.05), joint_axis=(0, 1, 0),
        limit=(-2.44, -0.52),
        mass=0.15, com=(0.03, 0.0, -0.01),
        inertia_diag=(2e-4, 4e-4, 4e-4), actuated=True,
        kp=_KP[4], kd=_KD[4], damping=0.5,
    )
    # foot collision: heel + toe spheres on the toe (foot plate) link
    b.add_sphere(f"{s}_toe", (-FOOT_HALF_LEN, 0.0, -0.02), 0.02, foot=f"{s}_foot")
    b.add_sphere(f"{s}_toe", (FOOT_HALF_LEN, 0.0, -0.02), 0.02, foot=f"{s}_foot")


@functools.lru_cache(maxsize=2)
def make_model() -> RobotModel:
    b = ModelBuilder("cassie", floating=True)
    b.base_inertial(10.33, (0.05, 0.0, 0.04), inertia_diag=(0.09, 0.11, 0.12))
    _leg(b, "right", -1.0)
    _leg(b, "left", 1.0)
    b.add_sphere("base", (0.0, 0.0, 0.0), 0.13)
    model = b.build()
    return model


def constraints() -> ConstraintSpec:
    """Closed-chain achilles rods, one per leg (behavior B3).

    Anchors: rod end on the hip-pitch link (behind the knee axis) to the
    heel-spring tip — point-to-point, matching the reference's
    ``createConstraint(JOINT_POINT2POINT)`` rows [K-high mechanism, K-med
    anchor coordinates].
    """
    m = make_model()
    idx = {n: i for i, n in enumerate(m.link_names)}
    return ConstraintSpec(
        p2p_link_a=(idx["right_hip_pitch"], idx["left_hip_pitch"]),
        p2p_link_b=(idx["right_heel_spring"], idx["left_heel_spring"]),
        p2p_anchor_a=((0.0, 0.0, 0.045), (0.0, 0.0, 0.045)),
        p2p_anchor_b=((0.11, 0.0, 0.01), (0.11, 0.0, 0.01)),
    )


def stand_q(model: RobotModel) -> np.ndarray:
    """Neutral standing joint vector (nj,) from STAND_POSE."""
    qj = np.zeros(model.nj)
    for j, name in enumerate(model.joint_names):
        for key, val in STAND_POSE.items():
            if name.endswith(key):
                qj[j] = val
    return qj


def motor_mask(model: RobotModel) -> np.ndarray:
    return np.asarray(model.actuated)


ACTION_DIM = 10  # position targets for the 10 motors
