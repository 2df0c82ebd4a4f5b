"""Articulated rigid-body dynamics: mass matrix + bias forces.

TPU-native replacement for Bullet's ``btMultiBody`` Featherstone
articulated-body pipeline inside ``stepSimulation`` (SURVEY.md §2.3). Rather
than translating Bullet's O(n) ABA recursion (deep sequential dependency
chains, scalar-heavy — a poor fit for the MXU/VPU), we assemble joint-space
quantities explicitly:

- ``mass_matrix``: CRBA expressed through per-link COM Jacobians,
  ``M = Σ_l m_l Jv_lᵀ Jv_l + Jw_lᵀ I_l Jw_l  (+ armature)``.
  Under ``vmap`` these contractions become batched (B, nv, 3)×(B, 3, nv)
  matmuls that XLA tiles onto the MXU. For locomotion-scale trees
  (nv ≤ ~30) this costs O(nl · nv²) flops — trivially worth the hardware
  mapping it buys over the sequential O(nv) recursion.
- ``bias_forces``: world-frame recursive Newton–Euler with ``q̈ = 0`` and the
  standard gravity trick (base carries fictitious acceleration ``−g``),
  returning ``C(q, q̇)q̇ + g(q)`` in one pass.

Then ``q̈ = M⁻¹ (τ − bias)`` via a batched Cholesky solve, and the same
factorization is reused by the constraint solver (ops/solver.py) for the
Delassus operator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mocca_envs_tpu.models.schema import PRISMATIC, REVOLUTE, RobotModel
from mocca_envs_tpu.ops import linalg
from mocca_envs_tpu.ops.kinematics import (
    FrameData,
    joint_qd,
    link_jacobians,
)

GRAVITY = jnp.array([0.0, 0.0, -9.8])
# NOTE: pybullet's default is setGravity(0, 0, -9.8) and the reference keeps
# it (SURVEY.md §2.3 setGravity row [K-high]); override via EngineConfig.


def mass_matrix(model: RobotModel, fd: FrameData) -> jnp.ndarray:
    """Joint-space inertia matrix M (nv, nv), symmetric positive definite."""
    Jv, Jw = link_jacobians(model, fd)                       # (nl, 3, nv)
    Mv = jnp.einsum("l,lak,lam->km", model.mass, Jv, Jv)
    IwJw = jnp.einsum("lab,lbk->lak", fd.inertia_w, Jw)
    Mw = jnp.einsum("lak,lam->km", Jw, IwJw)
    M = Mv + Mw
    if model.floating:
        arm = jnp.concatenate([jnp.zeros(6, dtype=M.dtype), model.armature])
    else:
        arm = model.armature
    return M + jnp.diag(arm)


def bias_forces(model: RobotModel, fd: FrameData, qd: jnp.ndarray,
                gravity: jnp.ndarray = GRAVITY) -> jnp.ndarray:
    """Generalized bias ``C(q, q̇)q̇ + g(q)`` (nv,) via world-frame RNEA.

    Sign convention: the equation of motion is ``M q̈ + bias = τ_applied``.
    """
    qdj = joint_qd(model, qd)

    # ---- forward pass: accelerations with q̈ = 0, base acc = −g (gravity trick)
    alpha = [jnp.zeros(3, dtype=qd.dtype)]
    acc = [-gravity.astype(qd.dtype)]
    for i in range(1, model.nl):
        j = i - 1
        p = model.parent[i]
        r = fd.pos[i] - fd.pos[p]
        wp = fd.omega[p]
        a_w = fd.ja[j]
        conv = acc[p] + jnp.cross(alpha[p], r) + jnp.cross(wp, jnp.cross(wp, r))
        if model.jtype[j] == REVOLUTE:
            alpha.append(alpha[p] + jnp.cross(wp, a_w * qdj[j]))
            acc.append(conv)
        else:  # PRISMATIC
            alpha.append(alpha[p])
            acc.append(conv + 2.0 * jnp.cross(wp, a_w * qdj[j]))

    # ---- per-link net inertial wrench about its COM
    F = []
    N = []
    for i in range(model.nl):
        rc = fd.com_w[i] - fd.pos[i]
        a_com = (
            acc[i]
            + jnp.cross(alpha[i], rc)
            + jnp.cross(fd.omega[i], jnp.cross(fd.omega[i], rc))
        )
        F.append(model.mass[i] * a_com)
        Iw = fd.inertia_w[i]
        N.append(Iw @ alpha[i] + jnp.cross(fd.omega[i], Iw @ fd.omega[i]))

    # ---- backward pass: accumulate child wrenches up the tree
    f = list(F)
    n = [N[i] + jnp.cross(fd.com_w[i] - fd.pos[i], F[i]) for i in range(model.nl)]
    for i in range(model.nl - 1, 0, -1):
        p = model.parent[i]
        f[p] = f[p] + f[i]
        n[p] = n[p] + n[i] + jnp.cross(fd.pos[i] - fd.pos[p], f[i])

    # ---- project onto joint axes
    tau = []
    for j in range(model.nj):
        i = j + 1
        if model.jtype[j] == REVOLUTE:
            tau.append(jnp.dot(fd.ja[j], n[i]))
        else:
            tau.append(jnp.dot(fd.ja[j], f[i]))
    tau = jnp.stack(tau) if tau else jnp.zeros(0, dtype=qd.dtype)
    if not model.floating:
        return tau
    return jnp.concatenate([f[0], n[0], tau])


def forward_dynamics(
    model: RobotModel,
    fd: FrameData,
    qd: jnp.ndarray,
    tau: jnp.ndarray,
    gravity: jnp.ndarray = GRAVITY,
    joint_diag: jnp.ndarray | None = None,
):
    """Unconstrained ``q̈`` plus the explicit inverse mass matrix.

    Returns ``(qdd_free, Minv)``. The explicit inverse (via the unrolled
    Cholesky in ops/linalg.py — XLA's batched factorization is ~30× slower
    at this size on TPU) turns every downstream M⁻¹ application (Delassus
    build, impulse map) into a plain MXU matmul.

    ``joint_diag`` adds an extra diagonal on the joint block of M — the
    implicit (first-order) treatment of joint dampers and springs,
    ``dt·c + dt²·k``. Cassie's leaf springs (k ≈ 1250–1500 N·m/rad on
    gram-scale links — behavior B3) are explicit-unstable at any practical
    dt; folding them into the system matrix is unconditionally stable for
    the diagonal part, the same device MuJoCo's implicit damping uses.
    """
    M = mass_matrix(model, fd)
    b = bias_forces(model, fd, qd, gravity)
    if joint_diag is not None:
        if model.floating:
            extra = jnp.concatenate([jnp.zeros(6, dtype=M.dtype), joint_diag])
        else:
            extra = joint_diag
        M = M + jnp.diag(extra)
    L = linalg.chol_factor(M)
    Minv = linalg.chol_inverse(L)
    qdd = Minv @ (tau - b)
    return qdd, Minv
