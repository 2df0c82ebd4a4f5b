"""Forward kinematics and Jacobians, world-frame formulation.

TPU-native replacement for Bullet's internal multibody kinematics plus the
pybullet state getters the reference calls every control step
(``getJointStates`` / ``getLinkStates`` / ``getBasePositionAndOrientation`` /
``getBaseVelocity`` — SURVEY.md §2.3, call stack §3.3). Here link state is a
pure function of ``(q, qd)``; there is no readback, only values flowing
through the compiled step.

Shapes are for ONE env; batch by ``vmap``. The link loop is unrolled at trace
time over the static topology (nl ≈ 8–20 links), producing a fused
elementwise chain that XLA vectorizes across the env batch on the VPU.

Generalized coordinate layout (floating base, see models/schema.py):
    q  = [base_pos(3), base_quat_wxyz(4), joint_q(nj)]
    qd = [base_linvel(3), base_angvel_world(3), joint_qd(nj)]
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mocca_envs_tpu.core import quat as quat_ops
from mocca_envs_tpu.core.spatial import skew
from mocca_envs_tpu.models.schema import PRISMATIC, REVOLUTE, RobotModel


class FrameData(struct.PyTreeNode):
    """World-frame per-link / per-joint kinematic quantities for one env."""

    pos: jnp.ndarray     # (nl, 3)  link frame origins
    rot: jnp.ndarray     # (nl, 3, 3) link orientations
    omega: jnp.ndarray   # (nl, 3)  angular velocities
    vel: jnp.ndarray     # (nl, 3)  linear velocities of link origins
    com_w: jnp.ndarray   # (nl, 3)  world COM positions
    jp: jnp.ndarray      # (nj, 3)  world joint anchor points (on joint axis)
    ja: jnp.ndarray      # (nj, 3)  world joint axes
    inertia_w: jnp.ndarray  # (nl, 3, 3) world-frame inertia about COM


def joint_q(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    return q[7:] if model.floating else q


def joint_qd(model: RobotModel, qd: jnp.ndarray) -> jnp.ndarray:
    return qd[6:] if model.floating else qd


def base_pose(model: RobotModel, q: jnp.ndarray):
    if model.floating:
        return q[0:3], q[3:7]
    z = jnp.zeros(3, dtype=q.dtype)
    return z, jnp.array([1.0, 0.0, 0.0, 0.0], dtype=q.dtype)


def base_vel(model: RobotModel, qd: jnp.ndarray):
    if model.floating:
        return qd[0:3], qd[3:6]
    z = jnp.zeros(3, dtype=qd.dtype)
    return z, z


def forward_kinematics(model: RobotModel, q: jnp.ndarray, qd: jnp.ndarray) -> FrameData:
    """Compute all world-frame link states from generalized coordinates.

    The sequential parent→child chain carries QUATERNIONS, not matrices:
    under ``vmap`` a per-link 3×3 matmul chain lowers to ~2·nl tiny batched
    dot_generals that cannot fuse (measured ~3.8 ms at B=4096 on TPU v5
    lite), while quaternion composition is a pure elementwise chain the
    compiler fuses into a handful of VPU kernels. Rotation matrices are
    materialized once, vectorized over all links, at the end.
    """
    qj = joint_q(model, q)
    qdj = joint_qd(model, qd)
    bp, bq = base_pose(model, q)
    bv, bw = base_vel(model, qd)

    pos = [bp]
    quats = [bq]
    omega = [bw]
    vel = [bv]
    jp_list, ja_list = [], []

    for i in range(1, model.nl):
        j = i - 1
        p = model.parent[i]
        qp, pp = quats[p], pos[p]
        wp, vp = omega[p], vel[p]
        q_pre = quat_ops.mul(qp, model.joint_quat[j])
        a_w = quat_ops.rotate(q_pre, model.joint_axis[j])
        anchor = pp + quat_ops.rotate(qp, model.joint_pos[j])
        if model.jtype[j] == REVOLUTE:
            q_i = quat_ops.mul(
                q_pre, quat_ops.from_axis_angle(model.joint_axis[j], qj[j])
            )
            p_i = anchor
            w_i = wp + a_w * qdj[j]
            v_i = vp + jnp.cross(wp, p_i - pp)
        elif model.jtype[j] == PRISMATIC:
            q_i = q_pre
            p_i = anchor + a_w * qj[j]
            w_i = wp
            v_i = vp + jnp.cross(wp, p_i - pp) + a_w * qdj[j]
        else:  # pragma: no cover - fixed joints are folded at build time
            raise ValueError("fixed joint reached the hot path")
        pos.append(p_i)
        quats.append(q_i)
        omega.append(w_i)
        vel.append(v_i)
        jp_list.append(anchor)
        ja_list.append(a_w)

    pos = jnp.stack(pos)
    rot = quat_ops.to_matrix(jnp.stack(quats))   # one vectorized op, all links
    omega = jnp.stack(omega)
    vel = jnp.stack(vel)
    com_w = pos + jnp.einsum("lij,lj->li", rot, model.com)
    inertia_w = _rot_inertia(rot, model.inertia)
    return FrameData(
        pos=pos, rot=rot, omega=omega, vel=vel, com_w=com_w,
        jp=jnp.stack(jp_list) if jp_list else jnp.zeros((0, 3), dtype=q.dtype),
        ja=jnp.stack(ja_list) if ja_list else jnp.zeros((0, 3), dtype=q.dtype),
        inertia_w=inertia_w,
    )


def _rot_inertia(rot: jnp.ndarray, inertia: jnp.ndarray) -> jnp.ndarray:
    """Per-link R I Rᵀ without cross-link mixing: (nl,3,3)."""
    return jnp.einsum("lij,ljk->lik", jnp.einsum("lij,ljk->lik", rot, inertia), rot.transpose(0, 2, 1))


def _joint_is_prismatic(model: RobotModel) -> jnp.ndarray:
    import numpy as np

    return jnp.asarray(
        np.array([1.0 if t == PRISMATIC else 0.0 for t in model.jtype], dtype=np.float32)
    )


def point_jacobian(
    model: RobotModel, fd: FrameData, link: jnp.ndarray, point: jnp.ndarray
) -> jnp.ndarray:
    """Translational Jacobian (3, nv) of world ``point`` fixed to ``link``.

    ``link`` may be a traced int (contact points gather their owning link at
    runtime); ancestry masking keeps this branchless. Used for contact rows,
    equality-constraint rows, and grab constraints (reference behaviors
    B3/B7/B8 — SURVEY.md §2.2).
    """
    anc_row = model.anc[link]                    # (nj,)
    prism = _joint_is_prismatic(model)           # (nj,)
    rev_cols = jnp.cross(fd.ja, point[None, :] - fd.jp)   # (nj, 3)
    cols = anc_row[:, None] * (
        (1.0 - prism)[:, None] * rev_cols + prism[:, None] * fd.ja
    )                                            # (nj, 3)
    Jj = cols.T                                  # (3, nj)
    if not model.floating:
        return Jj
    Jlin = jnp.eye(3, dtype=point.dtype)
    Jang = -skew(point - fd.pos[0])
    return jnp.concatenate([Jlin, Jang, Jj], axis=1)


def link_jacobians(model: RobotModel, fd: FrameData):
    """COM translational + angular Jacobians for EVERY link, vectorized.

    Returns ``(Jv, Jw)`` of shape (nl, 3, nv). These feed the mass matrix as
    batched matmuls (ops/dynamics.py) — under ``vmap`` they become MXU-shaped
    einsums, which is the point of the Jacobian-space CRBA on TPU.
    """
    prism = _joint_is_prismatic(model)            # (nj,)
    # revolute columns: a_j × (c_i − jp_j);  prismatic: a_j
    diff = fd.com_w[:, None, :] - fd.jp[None, :, :]          # (nl, nj, 3)
    rev = jnp.cross(fd.ja[None, :, :], diff)                 # (nl, nj, 3)
    colsv = model.anc[:, :, None] * (
        (1.0 - prism)[None, :, None] * rev + prism[None, :, None] * fd.ja[None, :, :]
    )                                                        # (nl, nj, 3)
    colsw = model.anc[:, :, None] * (1.0 - prism)[None, :, None] * fd.ja[None, :, :]
    Jvj = colsv.transpose(0, 2, 1)                           # (nl, 3, nj)
    Jwj = colsw.transpose(0, 2, 1)
    if not model.floating:
        return Jvj, Jwj
    nl = model.nl
    eye = jnp.broadcast_to(jnp.eye(3, dtype=fd.pos.dtype), (nl, 3, 3))
    zeros = jnp.zeros((nl, 3, 3), dtype=fd.pos.dtype)
    Jv = jnp.concatenate([eye, -skew(fd.com_w - fd.pos[0]), Jvj], axis=2)
    Jw = jnp.concatenate([zeros, eye, Jwj], axis=2)
    return Jv, Jw
