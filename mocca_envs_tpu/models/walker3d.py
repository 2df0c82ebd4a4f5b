"""Walker3D: the flagship biped of the suite.

Reconstructs the reference's ``mocca_envs/robots.py::Walker3D`` (SURVEY.md
§2.1 C5 [K-high]): a 3D humanoid-like walker with 21 actuated hinge DoF —
3-DoF ball-style hips realized as three stacked hinges (x/y/z), 1-DoF knees,
2-DoF ankles, 2-DoF shoulders realized as hinge pairs, 1-DoF elbows, and a
3-hinge abdomen — derived from the pybullet_envs/Roboschool humanoid lineage
the reference models descend from.

PROVENANCE (SURVEY.md §0): the reference asset files were unavailable at
build time (empty mount), so segment dimensions, masses and per-joint
``power_coef`` gains below are plausible reconstructions tagged [K-med];
joint COUNT and tree STRUCTURE are [K-high] via BASELINE.json + the ALLSTEPS
paper. All constants are centralized here so a diff against the real
``walker3d`` asset is a single-file fix; the parity harness (harness/parity)
gates on trajectories once the reference appears.

Mirror arrays (left/right symmetry for symmetry-aware RL — SURVEY.md C5
[K-med]) are populated so ``get_mirror_indices``-style training works.
"""

from __future__ import annotations

import functools

import numpy as np

from mocca_envs_tpu.models.schema import ModelBuilder, RobotModel

# Total mass ≈ 45 kg child-sized humanoid [K-med]; power scale follows the
# reference's τ = power · power_coef · clip(a) actuation (behavior B2).
POWER = 1.0

# (name, parent, joint_pos, axis, limit_lo, limit_hi, power_coef)
# Hips/abdomen stacked-hinge clusters share an anchor point.
_JOINTS = [
    # abdomen (3 hinges): pelvis → torso
    ("abdomen_z", "pelvis", (0.0, 0.0, 0.10), (0, 0, 1), -0.79, 0.79, 60.0),
    ("abdomen_y", "abdomen_z", (0.0, 0.0, 0.0), (0, 1, 0), -1.31, 0.52, 80.0),
    ("abdomen_x", "abdomen_y", (0.0, 0.0, 0.0), (1, 0, 0), -0.61, 0.61, 60.0),
    # right leg
    ("right_hip_x", "pelvis", (0.0, -0.08, -0.04), (1, 0, 0), -0.44, 0.61, 80.0),
    ("right_hip_z", "right_hip_x", (0.0, 0.0, 0.0), (0, 0, 1), -1.05, 0.61, 60.0),
    ("right_hip_y", "right_hip_z", (0.0, 0.0, 0.0), (0, 1, 0), -1.92, 0.77, 100.0),
    ("right_knee", "right_hip_y", (0.0, 0.0, -0.40), (0, 1, 0), -2.79, -0.03, 90.0),
    ("right_ankle_y", "right_knee", (0.0, 0.0, -0.39), (0, 1, 0), -0.87, 0.87, 60.0),
    ("right_ankle_x", "right_ankle_y", (0.0, 0.0, 0.0), (1, 0, 0), -0.44, 0.44, 40.0),
    # left leg
    ("left_hip_x", "pelvis", (0.0, 0.08, -0.04), (1, 0, 0), -0.61, 0.44, 80.0),
    ("left_hip_z", "left_hip_x", (0.0, 0.0, 0.0), (0, 0, 1), -0.61, 1.05, 60.0),
    ("left_hip_y", "left_hip_z", (0.0, 0.0, 0.0), (0, 1, 0), -1.92, 0.77, 100.0),
    ("left_knee", "left_hip_y", (0.0, 0.0, -0.40), (0, 1, 0), -2.79, -0.03, 90.0),
    ("left_ankle_y", "left_knee", (0.0, 0.0, -0.39), (0, 1, 0), -0.87, 0.87, 60.0),
    ("left_ankle_x", "left_ankle_y", (0.0, 0.0, 0.0), (1, 0, 0), -0.44, 0.44, 40.0),
    # right arm
    ("right_shoulder_x", "torso_ref", (0.0, -0.17, 0.22), (1, 0, 0), -1.48, 1.05, 30.0),
    ("right_shoulder_y", "right_shoulder_x", (0.0, 0.0, 0.0), (0, 1, 0), -1.57, 1.22, 30.0),
    ("right_elbow", "right_shoulder_y", (0.0, 0.0, -0.27), (0, 1, 0), -1.57, 0.0, 25.0),
    # left arm
    ("left_shoulder_x", "torso_ref", (0.0, 0.17, 0.22), (1, 0, 0), -1.05, 1.48, 30.0),
    ("left_shoulder_y", "left_shoulder_x", (0.0, 0.0, 0.0), (0, 1, 0), -1.57, 1.22, 30.0),
    ("left_elbow", "left_shoulder_y", (0.0, 0.0, -0.27), (0, 1, 0), -1.57, 0.0, 25.0),
]

# inertial properties per moving segment [K-med]: (mass, com, inertia_diag)
_SEGMENTS = {
    "abdomen_z": (0.5, (0, 0, 0), (1e-3, 1e-3, 1e-3)),
    "abdomen_y": (0.5, (0, 0, 0), (1e-3, 1e-3, 1e-3)),
    "abdomen_x": (14.0, (0.0, 0.0, 0.17), (0.18, 0.16, 0.08)),  # torso proper
    "right_hip_x": (0.5, (0, 0, 0), (1e-3, 1e-3, 1e-3)),
    "right_hip_z": (0.5, (0, 0, 0), (1e-3, 1e-3, 1e-3)),
    "right_hip_y": (4.5, (0.0, 0.0, -0.20), (0.06, 0.06, 0.012)),  # thigh
    "right_knee": (2.8, (0.0, 0.0, -0.19), (0.035, 0.035, 0.006)),  # shin
    "right_ankle_y": (0.2, (0, 0, 0), (5e-4, 5e-4, 5e-4)),
    "right_ankle_x": (1.0, (0.05, 0.0, -0.04), (0.002, 0.004, 0.004)),  # foot
    "left_hip_x": (0.5, (0, 0, 0), (1e-3, 1e-3, 1e-3)),
    "left_hip_z": (0.5, (0, 0, 0), (1e-3, 1e-3, 1e-3)),
    "left_hip_y": (4.5, (0.0, 0.0, -0.20), (0.06, 0.06, 0.012)),
    "left_knee": (2.8, (0.0, 0.0, -0.19), (0.035, 0.035, 0.006)),
    "left_ankle_y": (0.2, (0, 0, 0), (5e-4, 5e-4, 5e-4)),
    "left_ankle_x": (1.0, (0.05, 0.0, -0.04), (0.002, 0.004, 0.004)),
    "right_shoulder_x": (0.3, (0, 0, 0), (5e-4, 5e-4, 5e-4)),
    "right_shoulder_y": (1.6, (0.0, 0.0, -0.14), (0.01, 0.01, 0.002)),  # upper arm
    "right_elbow": (1.0, (0.0, 0.0, -0.15), (0.008, 0.008, 0.0015)),  # forearm+hand
    "left_shoulder_x": (0.3, (0, 0, 0), (5e-4, 5e-4, 5e-4)),
    "left_shoulder_y": (1.6, (0.0, 0.0, -0.14), (0.01, 0.01, 0.002)),
    "left_elbow": (1.0, (0.0, 0.0, -0.15), (0.008, 0.008, 0.0015)),
}

# Standing pelvis height above the support surface [K-med] — the reference's
# initial_z used for the obs height term (behavior B4) and reset placement.
INITIAL_Z = 0.94
FOOT_RADIUS = 0.042
FOOT_HALF_W = 0.025   # lateral half-spread of the foot corner spheres [K-med]

ACTION_DIM = 21


@functools.lru_cache(maxsize=4)
def make_model() -> RobotModel:
    b = ModelBuilder("walker3d", floating=True)
    # pelvis is the floating base link
    b.base_inertial(8.0, (0.0, 0.0, 0.0), inertia_diag=(0.05, 0.04, 0.05))

    names = {"pelvis": "base"}
    # "torso_ref" is an alias resolved to the abdomen_x segment (torso mass).
    for (name, parent, jpos, axis, lo, hi, pc) in _JOINTS:
        parent_resolved = names.get(parent, parent)
        if parent == "torso_ref":
            parent_resolved = "abdomen_x"
        mass, com, inertia = _SEGMENTS[name]
        b.add_link(
            name,
            parent_resolved,
            joint_pos=jpos,
            joint_axis=axis,
            limit=(lo, hi),
            mass=mass,
            com=com,
            inertia_diag=inertia,
            power_coef=pc,
            actuated=True,
            damping=0.0,
            # reflected rotor inertia: conditions the mass matrix (dummy
            # stacked-hinge links are otherwise near-singular in f32) and is
            # physically present in any geared actuator [K-med]
            armature=0.01,
        )
    names = None

    # collision spheres: feet as 2×2 CORNER sets (heel/toe × inner/outer
    # edge) so a foot resting half-on a stone edge keeps a stable support
    # polygon — the reference's box-foot contact manifold, approximated
    # (SURVEY.md §2.3 createCollisionShape row; VERDICT r2 #5; gated by
    # tests/test_contact.py edge-balance regression). The pairs also feed
    # the per-foot contact flags (B4). Pelvis/torso/hands cover termination
    # + general ground interaction.
    for side in ("right", "left"):
        foot = f"{side}_ankle_x"
        for fx in (-0.05, 0.12):
            for fy in (-FOOT_HALF_W, FOOT_HALF_W):
                b.add_sphere(foot, (fx, fy, -0.05), FOOT_RADIUS,
                             foot=f"{side}_foot")
        b.add_sphere(f"{side}_elbow", (0.0, 0.0, -0.26), 0.04)
        b.add_sphere(f"{side}_knee", (0.0, 0.0, -0.2), 0.05)
    b.add_sphere("base", (0.0, 0.0, 0.0), 0.11)
    b.add_sphere("abdomen_x", (0.0, 0.0, 0.2), 0.12)

    model = b.build()
    return model.replace(
        mirror_act_perm=_mirror_action_permutation(model),
        mirror_act_sign=_mirror_action_signs(model),
    )


def _mirror_action_permutation(model: RobotModel):
    """Swap left/right joint slots (mocca mirror indices, SURVEY.md C5)."""
    import jax.numpy as jnp

    perm = []
    for n in model.joint_names:
        if n.startswith("right_"):
            perm.append(model.joint_names.index("left_" + n[len("right_"):]))
        elif n.startswith("left_"):
            perm.append(model.joint_names.index("right_" + n[len("left_"):]))
        else:
            perm.append(model.joint_names.index(n))
    return jnp.asarray(np.array(perm, dtype=np.int32))


def _mirror_action_signs(model: RobotModel):
    """Negate roll(x)/yaw(z) hinge actions under left-right reflection."""
    import jax.numpy as jnp

    signs = [
        -1.0 if (n.endswith("_x") or n.endswith("_z")) else 1.0
        for n in model.joint_names
    ]
    return jnp.asarray(np.array(signs, dtype=np.float32))


# Indices of links whose ground contact terminates the episode (torso/pelvis
# falling — reference behavior B5 termination [K-med]).
def terminal_links(model: RobotModel) -> tuple:
    bad = ("base", "abdomen_x", "abdomen_y", "abdomen_z")
    return tuple(model.link_names.index(n) for n in bad if n in model.link_names)
