"""RobotModel: the precompiled kinematic-tree pytree.

TPU-native replacement for the reference's runtime model loading
(``mocca_envs/robots.py::Robot.load_robot_model`` calling pybullet
``loadURDF``/``loadMJCF`` — SURVEY.md §2.1 C5, §2.3). Parsing and tree
canonicalization happen *offline* (host-side, at build time); the hot path
only ever sees static-shape arrays.

Canonical form produced by :class:`ModelBuilder`:

- Links are topologically ordered: ``parent[i] < i``; link 0 is the base.
- Every non-base link hangs off exactly ONE 1-DoF joint (revolute or
  prismatic). Joint ``j`` moves link ``j + 1``; ``nj == nl - 1``.
- Fixed joints are folded at build time: the child's inertia, collision
  spheres, and outgoing joints are merged into the parent with the composed
  transform (pybullet does the same merge inside ``loadURDF`` unless
  ``URDF_MERGE_FIXED_LINKS`` is off; we always merge).
- The base is either floating (free joint: 7 position / 6 velocity
  coordinates prepended) or fixed (test rigs, pendulum gates).

Generalized coordinates (floating base):
    q  = [base_pos(3), base_quat_wxyz(4), joint_q(nj)]        — size 7 + nj
    qd = [base_linvel_world(3), base_angvel_world(3), joint_qd(nj)] — 6 + nj

Collision geometry is canonicalized to spheres attached to links (feet get
several; capsules are emitted as end/mid spheres). This keeps narrowphase
against planes / heightfields / stone boxes fully analytic and branchless
under ``vmap`` — the TPU-native answer to Bullet's general mesh narrowphase
(SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp
from flax import struct

# Joint type codes (static ints).
REVOLUTE = 0
PRISMATIC = 1
FIXED = 2  # builder-only; folded away before RobotModel is emitted


def _np_quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def _np_quat_rotate(q, v):
    w, qv = q[0], q[1:]
    t = np.cross(qv, np.cross(qv, v) + w * v)
    return v + 2.0 * t


def _np_quat_to_mat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def rpy_to_quat(rpy) -> np.ndarray:
    """URDF fixed-axis rpy → wxyz quaternion (host-side, build time)."""
    r, p, y = np.asarray(rpy, dtype=np.float64) * 0.5
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    return np.array(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ]
    )


class RobotModel(struct.PyTreeNode):
    """Static-shape robot description; a leaf-bearing pytree.

    Envs close over a concrete ``RobotModel`` so XLA constant-folds every
    array below into the compiled step — there is no model-loading cost on
    the hot path at all.
    """

    # ---- static topology (hashable aux data, drives Python-level unrolls)
    nl: int = struct.field(pytree_node=False)          # number of links
    nj: int = struct.field(pytree_node=False)          # number of 1-DoF joints
    parent: tuple = struct.field(pytree_node=False)    # len nl; parent[0] = -1
    jtype: tuple = struct.field(pytree_node=False)     # len nj; REVOLUTE/PRISMATIC
    floating: bool = struct.field(pytree_node=False)
    link_names: tuple = struct.field(pytree_node=False)
    joint_names: tuple = struct.field(pytree_node=False)
    # link indices whose sphere contacts feed the obs "foot contact" flags
    # (reference behavior B4: binary foot contact from getContactPoints)
    foot_links: tuple = struct.field(pytree_node=False)

    # ---- joint frame data, indexed by joint j (moving link j+1)
    joint_pos: jnp.ndarray       # (nj, 3)  anchor in parent link frame
    joint_quat: jnp.ndarray      # (nj, 4)  parent frame → child pre-frame
    joint_axis: jnp.ndarray      # (nj, 3)  unit axis in child frame
    limit_lo: jnp.ndarray        # (nj,)
    limit_hi: jnp.ndarray        # (nj,)
    damping: jnp.ndarray         # (nj,)    passive viscous damping
    stiffness: jnp.ndarray       # (nj,)    passive spring k (Cassie, B3)
    spring_ref: jnp.ndarray      # (nj,)    spring setpoint angle
    armature: jnp.ndarray        # (nj,)    reflected rotor inertia
    # actuation (reference behavior B2: τ = power · power_coef · clip(a))
    actuated: jnp.ndarray        # (nj,)    1.0 where motorized
    power_coef: jnp.ndarray      # (nj,)    per-joint gain
    # PD gains (Cassie low-level servo, reference behavior B3)
    kp: jnp.ndarray              # (nj,)
    kd: jnp.ndarray              # (nj,)

    # ---- inertial data, indexed by link i
    mass: jnp.ndarray            # (nl,)
    com: jnp.ndarray             # (nl, 3)  COM offset in link frame
    inertia: jnp.ndarray         # (nl, 3, 3) about COM, link frame

    # ---- collision spheres
    sph_link: jnp.ndarray        # (ns,) int32 owning link
    sph_pos: jnp.ndarray         # (ns, 3) offset in link frame
    sph_radius: jnp.ndarray      # (ns,)
    sph_foot: jnp.ndarray        # (ns, nfeet) one-hot: sphere s belongs to foot f
    # 1.0 = sphere skips BAR capsules (grabbing palms wrap the bar; pushing
    # them out would fight the grab constraint — behavior B8)
    sph_no_bar: jnp.ndarray      # (ns,)

    # ---- ancestry: anc[i, j] = 1.0 iff joint j is on the base→link-i chain
    anc: jnp.ndarray             # (nl, nj)

    # ---- symmetry (mocca mirror-index arrays, SURVEY.md §2.1 C5 [K-med]);
    # obs-side maps are task-layout-dependent and built by tasks/base.mirror_spec
    mirror_act_perm: jnp.ndarray   # (nj,) int32 permutation of actions
    mirror_act_sign: jnp.ndarray   # (nj,)

    @property
    def ns(self) -> int:
        return self.sph_radius.shape[0]

    @property
    def nq(self) -> int:
        return (7 if self.floating else 0) + self.nj

    @property
    def nv(self) -> int:
        return (6 if self.floating else 0) + self.nj

    @property
    def nu(self) -> int:
        return self.nj


@dataclasses.dataclass
class _Link:
    name: str
    parent: int
    jtype: int
    joint_pos: np.ndarray
    joint_quat: np.ndarray
    joint_axis: np.ndarray
    limit: tuple
    damping: float
    stiffness: float
    spring_ref: float
    armature: float
    actuated: bool
    power_coef: float
    kp: float
    kd: float
    mass: float
    com: np.ndarray
    inertia: np.ndarray


class ModelBuilder:
    """Host-side builder: add links, fold fixed joints, emit a RobotModel."""

    def __init__(self, name: str, floating: bool = True):
        self.name = name
        self.floating = floating
        self.links: list[_Link] = [
            _Link(
                "base", -1, FIXED,
                np.zeros(3), np.array([1.0, 0, 0, 0]), np.array([0.0, 0, 1]),
                (0.0, 0.0), 0.0, 0.0, 0.0, 0.0, False, 0.0, 0.0, 0.0,
                0.0, np.zeros(3), np.zeros((3, 3)),
            )
        ]
        self.spheres: list[tuple] = []   # (link_idx, pos, radius, foot_name)
        self.foot_names: list[str] = []

    # ------------------------------------------------------------------ links
    def base_inertial(self, mass, com, inertia_diag=None, inertia=None):
        b = self.links[0]
        b.mass = float(mass)
        b.com = np.asarray(com, dtype=np.float64)
        b.inertia = self._inertia(inertia_diag, inertia)
        return self

    @staticmethod
    def _inertia(diag, full):
        if full is not None:
            return np.asarray(full, dtype=np.float64)
        return np.diag(np.asarray(diag, dtype=np.float64))

    def add_link(
        self,
        name: str,
        parent: str,
        *,
        jtype: int = REVOLUTE,
        joint_pos=(0, 0, 0),
        joint_rpy=(0, 0, 0),
        joint_quat=None,   # wxyz; overrides joint_rpy when given (exact —
                           # MJCF body quats need no rpy round-trip)
        joint_axis=(0, 0, 1),
        limit=(-np.pi, np.pi),
        damping: float = 0.0,
        stiffness: float = 0.0,
        spring_ref: float = 0.0,
        armature: float = 0.0,
        actuated: bool = True,
        power_coef: float = 0.0,
        kp: float = 0.0,
        kd: float = 0.0,
        mass: float = 0.0,
        com=(0, 0, 0),
        inertia_diag=(0, 0, 0),
        inertia=None,
    ) -> "ModelBuilder":
        pidx = self.link_index(parent)
        axis = np.asarray(joint_axis, dtype=np.float64)
        n = np.linalg.norm(axis)
        axis = axis / n if n > 0 else np.array([0.0, 0.0, 1.0])
        if joint_quat is not None:
            jq = np.asarray(joint_quat, dtype=np.float64)
            jq = jq / np.linalg.norm(jq)
        else:
            jq = rpy_to_quat(joint_rpy)
        self.links.append(
            _Link(
                name, pidx, jtype,
                np.asarray(joint_pos, dtype=np.float64), jq, axis,
                (float(limit[0]), float(limit[1])), float(damping), float(stiffness),
                float(spring_ref), float(armature), bool(actuated), float(power_coef),
                float(kp), float(kd), float(mass),
                np.asarray(com, dtype=np.float64),
                self._inertia(inertia_diag, inertia),
            )
        )
        return self

    def add_sphere(
        self,
        link: str,
        pos,
        radius: float,
        foot: str | None = None,
        no_bar: bool = False,
    ):
        """Attach a collision sphere; ``foot`` groups spheres into obs flags;
        ``no_bar`` excludes it from bar-capsule narrowphase (grabbing palms)."""
        if foot is not None and foot not in self.foot_names:
            self.foot_names.append(foot)
        self.spheres.append(
            (
                self.link_index(link), np.asarray(pos, dtype=np.float64),
                float(radius), foot, bool(no_bar),
            )
        )
        return self

    def link_index(self, name: str) -> int:
        for i, l in enumerate(self.links):
            if l.name == name:
                return i
        raise KeyError(f"unknown link {name!r} in model {self.name!r}")

    # ------------------------------------------------------------- fixed fold
    def _fold_fixed(self):
        """Merge FIXED-jointed links into their parents (offline, exact)."""
        keep = [l for i, l in enumerate(self.links) if i == 0 or l.jtype != FIXED]
        while True:
            fixed_idx = next(
                (i for i, l in enumerate(self.links) if i > 0 and l.jtype == FIXED), None
            )
            if fixed_idx is None:
                break
            child = self.links[fixed_idx]
            p = child.parent
            parent = self.links[p]
            # transform child frame → parent frame
            R = _np_quat_to_mat(child.joint_quat)
            t = child.joint_pos
            # merge inertia (parallel axis about combined COM)
            m1, m2 = parent.mass, child.mass
            c2_in_p = t + R @ child.com
            if m1 + m2 > 0:
                c_new = (m1 * parent.com + m2 * c2_in_p) / (m1 + m2)
            else:
                c_new = parent.com
            I2_p = R @ child.inertia @ R.T
            def _shift(I, m, d):
                return I + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
            I_new = _shift(parent.inertia, m1, parent.com - c_new) + _shift(
                I2_p, m2, c2_in_p - c_new
            )
            parent.mass = m1 + m2
            parent.com = c_new
            parent.inertia = I_new
            # re-anchor grandchildren and spheres
            for l in self.links:
                if l.parent == fixed_idx:
                    l.parent = p
                    l.joint_pos = t + R @ l.joint_pos
                    l.joint_quat = _np_quat_mul(child.joint_quat, l.joint_quat)
            self.spheres = [
                (p, t + R @ pos, r, foot, nb)
                if li == fixed_idx
                else (li, pos, r, foot, nb)
                for (li, pos, r, foot, nb) in self.spheres
            ]
            # delete child, remap indices
            del self.links[fixed_idx]
            for l in self.links:
                if l.parent > fixed_idx:
                    l.parent -= 1
            self.spheres = [
                (li - 1 if li > fixed_idx else li, pos, r, foot, nb)
                for (li, pos, r, foot, nb) in self.spheres
            ]
        del keep

    # ---------------------------------------------------------------- finish
    def build(self, dtype=jnp.float32) -> RobotModel:
        self._fold_fixed()
        nl = len(self.links)
        nj = nl - 1
        # verify topological order
        for i, l in enumerate(self.links):
            if i > 0 and not (0 <= l.parent < i):
                raise ValueError(
                    f"link {l.name!r}: parent index {l.parent} breaks topological order"
                )
        J = self.links[1:]
        anc = np.zeros((nl, nj), dtype=np.float64)
        for i in range(1, nl):
            k = i
            while k > 0:
                anc[i, k - 1] = 1.0
                k = self.links[k].parent

        nfeet = max(1, len(self.foot_names))
        sph_foot = np.zeros((max(1, len(self.spheres)), nfeet))
        sph_no_bar = np.zeros((max(1, len(self.spheres)),))
        if self.spheres:
            sph_link = np.array([s[0] for s in self.spheres], dtype=np.int32)
            sph_pos = np.stack([s[1] for s in self.spheres])
            sph_radius = np.array([s[2] for s in self.spheres])
            for si, (_, _, _, foot, no_bar) in enumerate(self.spheres):
                if foot is not None:
                    sph_foot[si, self.foot_names.index(foot)] = 1.0
                if no_bar:
                    sph_no_bar[si] = 1.0
        else:  # keep shapes static and non-empty
            sph_link = np.zeros((1,), dtype=np.int32)
            sph_pos = np.zeros((1, 3))
            sph_radius = np.full((1,), -1e6)  # never collides

        def a(x, shape=None):
            arr = np.asarray(x, dtype=np.float64)
            if shape is not None:
                arr = arr.reshape(shape)
            return jnp.asarray(arr, dtype=dtype)

        return RobotModel(
            nl=nl,
            nj=nj,
            parent=tuple(l.parent for l in self.links),
            jtype=tuple(l.jtype for l in J),
            floating=self.floating,
            link_names=tuple(l.name for l in self.links),
            joint_names=tuple(l.name for l in J),
            foot_links=tuple(self.foot_names),
            joint_pos=a([l.joint_pos for l in J], (nj, 3)),
            joint_quat=a([l.joint_quat for l in J], (nj, 4)),
            joint_axis=a([l.joint_axis for l in J], (nj, 3)),
            limit_lo=a([l.limit[0] for l in J]),
            limit_hi=a([l.limit[1] for l in J]),
            damping=a([l.damping for l in J]),
            stiffness=a([l.stiffness for l in J]),
            spring_ref=a([l.spring_ref for l in J]),
            armature=a([l.armature for l in J]),
            actuated=a([1.0 if l.actuated else 0.0 for l in J]),
            power_coef=a([l.power_coef for l in J]),
            kp=a([l.kp for l in J]),
            kd=a([l.kd for l in J]),
            mass=a([l.mass for l in self.links]),
            com=a([l.com for l in self.links]),
            inertia=a([l.inertia for l in self.links]),
            sph_link=jnp.asarray(sph_link),
            sph_pos=a(sph_pos),
            sph_radius=a(sph_radius),
            sph_foot=a(sph_foot),
            sph_no_bar=a(sph_no_bar),
            anc=a(anc),
            mirror_act_perm=jnp.arange(nj, dtype=jnp.int32),
            mirror_act_sign=a(np.ones(nj)),
        )
