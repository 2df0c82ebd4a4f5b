"""Monkey3D: brachiating gibbon-like model.

Reconstructs ``mocca_envs/robots.py::Monkey3D`` (SURVEY.md §2.1 C5, behavior
B8 [K-high mechanism]): a light-bodied brachiator whose hands attach to
overhead bars by point constraints created on grab and destroyed on release.
Grabs are realized here as the maskable world-anchor constraint rows of
ops/step.ConstraintSpec (constraint *activation is data, not structure* —
SURVEY.md §7.3 hard part #5).

PROVENANCE: asset unavailable (SURVEY.md §0); segment sizes/masses are
plausible gibbon-scale reconstructions [K-med]; structure (torso + two
3-DoF arms with grabbing hands + short legs) is [K-med].
"""

from __future__ import annotations

import functools

from mocca_envs_tpu.models.schema import ModelBuilder, RobotModel
from mocca_envs_tpu.ops.step import ConstraintSpec

# palm offset at the end of the forearm — the grab anchor (B8)
PALM_OFFSET = (0.0, 0.0, -0.24)
GRAB_RADIUS = 0.16   # palm-to-bar engage distance [K-med]
INITIAL_Z = 0.0      # hands start at bar height; body hangs below
BAR_RADIUS = 0.03    # handhold capsule radius [K-med: reference MonkeyBar]
BAR_HALF_LEN = 0.4   # handhold half length [K-med]


def _arm(b: ModelBuilder, side: str, sign: float) -> None:
    s = side
    b.add_link(
        f"{s}_shoulder_x", "base",
        joint_pos=(0.0, sign * 0.12, 0.2), joint_axis=(1, 0, 0),
        limit=(-2.6, 2.6), mass=0.3, com=(0, 0, 0),
        inertia_diag=(5e-4, 5e-4, 5e-4), power_coef=30.0, armature=0.008,
    )
    b.add_link(
        f"{s}_shoulder_y", f"{s}_shoulder_x",
        joint_pos=(0.0, 0.0, 0.0), joint_axis=(0, 1, 0),
        # brachiator shoulders circumduct fully; a tight limit here fights
        # the grab constraint via the limit projection (velocity zeroing)
        limit=(-6.3, 6.3), mass=0.9, com=(0, 0, -0.13),
        inertia_diag=(0.006, 0.006, 0.001), power_coef=30.0, armature=0.008,
    )
    b.add_link(
        f"{s}_elbow", f"{s}_shoulder_y",
        joint_pos=(0.0, 0.0, -0.26), joint_axis=(0, 1, 0),
        limit=(-2.9, 0.3), mass=0.7, com=(0, 0, -0.13),
        inertia_diag=(0.005, 0.005, 8e-4), power_coef=25.0, armature=0.006,
    )
    # palm: grabbing hands WRAP the bar — excluded from bar push-out (B8)
    b.add_sphere(f"{s}_elbow", PALM_OFFSET, 0.035, foot=f"{s}_hand", no_bar=True)


def _leg(b: ModelBuilder, side: str, sign: float) -> None:
    s = side
    b.add_link(
        f"{s}_hip", "base",
        joint_pos=(0.0, sign * 0.08, -0.25), joint_axis=(0, 1, 0),
        limit=(-2.0, 1.2), mass=0.8, com=(0, 0, -0.12),
        inertia_diag=(0.005, 0.005, 0.001), power_coef=30.0, armature=0.008,
    )
    b.add_link(
        f"{s}_knee", f"{s}_hip",
        joint_pos=(0.0, 0.0, -0.24), joint_axis=(0, 1, 0),
        limit=(-0.1, 2.3), mass=0.5, com=(0, 0, -0.1),
        inertia_diag=(0.003, 0.003, 5e-4), power_coef=20.0, armature=0.005,
    )
    b.add_sphere(f"{s}_knee", (0.0, 0.0, -0.2), 0.04, foot=f"{s}_foot")


@functools.lru_cache(maxsize=2)
def make_model() -> RobotModel:
    b = ModelBuilder("monkey3d", floating=True)
    b.base_inertial(4.5, (0.0, 0.0, -0.02), inertia_diag=(0.05, 0.04, 0.03))
    _arm(b, "right", -1.0)
    _arm(b, "left", 1.0)
    _leg(b, "right", -1.0)
    _leg(b, "left", 1.0)
    b.add_sphere("base", (0.0, 0.0, 0.0), 0.1)
    return b.build()


def constraints() -> ConstraintSpec:
    """Two maskable grab constraints, one per hand (behavior B8)."""
    m = make_model()
    idx = {n: i for i, n in enumerate(m.link_names)}
    return ConstraintSpec(
        num_grabs=2,
        grab_links=(idx["right_elbow"], idx["left_elbow"]),
        grab_anchors=(PALM_OFFSET, PALM_OFFSET),
    )


ACTION_DIM = None  # nj joint torques + 2 grab signals (set by task)
