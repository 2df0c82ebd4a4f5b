"""The assembled physics step: one pure function, compiled once.

TPU-native replacement for the reference's entire hot loop — the
``scene.global_step()`` → ``sim_frame_skip × stepSimulation()`` pipeline of
SURVEY.md §3.3, which in the reference crosses the Python↔C++ boundary many
times per control step. Here the whole three-rate hierarchy (behavior B1)
is a single jitted function over pytree state:

    control step
      └─ llc frame × llc_frames:   actuation recomputed (PD / torque)
           └─ substep × sim_substeps:
                FK → collide → bias/mass (Newton–Euler + CRBA)
                → impulse PGS (contacts ∪ equality ∪ grabs)
                → semi-implicit integrate

Shapes are for ONE env; batch with ``vmap``, shard with ``shard_map``
(parallel/). Everything static lives in closures (model, EngineConfig,
ConstraintSpec); everything dynamic (state, scene, grab anchors, curriculum)
is data.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from mocca_envs_tpu.core import quat as quat_ops
from mocca_envs_tpu.models.schema import RobotModel
from mocca_envs_tpu.ops import collide as collide_mod
from mocca_envs_tpu.ops.dynamics import forward_dynamics
from mocca_envs_tpu.ops.integrate import LIMIT_SLOP, integrate
from mocca_envs_tpu.ops.kinematics import (
    FrameData,
    forward_kinematics,
    joint_q,
    joint_qd,
    point_jacobian,
)
from mocca_envs_tpu.ops.solver import delassus, pgs_solve, tangent_basis
from mocca_envs_tpu.terrain.scene import Scene
from mocca_envs_tpu.utils.config import EngineConfig


@dataclasses.dataclass(frozen=True)
class ConstraintSpec:
    """Static equality-constraint structure for an env family.

    - ``p2p_*``: permanent point-to-point rods between two robot links —
      Cassie's achilles/plantar four-bar linkages (reference behavior B3,
      ``createConstraint(JOINT_POINT2POINT)`` — SURVEY.md §2.2/2.3).
    - ``planar``: locks base y-translation, roll and yaw for the 2D env
      variants (Walker2D/Crab2D/Cassie2D).
    - ``num_grabs``: world-anchor constraints whose activation and anchor
      are runtime data — monkey-bar grabs (behavior B8).
    """

    p2p_link_a: tuple = ()
    p2p_link_b: tuple = ()
    p2p_anchor_a: tuple = ()   # local points on link_a, tuple of 3-tuples
    p2p_anchor_b: tuple = ()
    planar: bool = False
    num_grabs: int = 0
    grab_links: tuple = ()
    grab_anchors: tuple = ()   # local palm point per grab

    @property
    def num_p2p(self) -> int:
        return len(self.p2p_link_a)

    @property
    def ne(self) -> int:
        return 3 * self.num_p2p + (3 if self.planar else 0) + 3 * self.num_grabs


LIMIT_RANGE_CAP = 12.0  # joints with a wider range get no limit row [rad|m]


def limited_joints(model: RobotModel) -> tuple:
    """Static indices of joints that get a solver limit row.

    Shared by the JAX path and the fused kernel so both build the same row
    layout ``[equality | limits | contacts]``. Joints with effectively
    unbounded ranges (continuous rotors) are excluded at trace time.
    """
    import numpy as np

    lo = np.asarray(model.limit_lo)
    hi = np.asarray(model.limit_hi)
    return tuple(int(j) for j in range(model.nj) if hi[j] - lo[j] < LIMIT_RANGE_CAP)


class StepInfo(struct.PyTreeNode):
    """Per-step diagnostics surfaced to tasks and metrics.

    Replaces the reference's post-step pybullet queries: ``getContactPoints``
    for foot flags / termination (B4, B5) and the step-hit predicate's
    foot-force test (B7).
    """

    contacts: collide_mod.Contacts
    normal_impulse: jnp.ndarray     # (ns,) per-sphere normal impulse
    foot_contact: jnp.ndarray       # (nfeet,) binary flags
    link_contact: jnp.ndarray       # (nl,) binary flags


def _zero_info(model: RobotModel) -> StepInfo:
    ns = model.ns
    z = jnp.zeros
    contacts = collide_mod.Contacts(
        pos=z((ns, 3)), normal=z((ns, 3)), depth=jnp.full((ns,), -1e9),
        link=model.sph_link, active=z((ns,)),
    )
    return StepInfo(
        contacts=contacts,
        normal_impulse=z((ns,)),
        foot_contact=z((len(model.foot_links) or 1,)),
        link_contact=z((model.nl,)),
    )


def make_substep(
    model: RobotModel,
    config: EngineConfig,
    constraints: ConstraintSpec = ConstraintSpec(),
    extra_damping: jnp.ndarray | None = None,
):
    """Build the single-substep function ``(q, qd, tau_j, scene, grabs) → …``.

    ``extra_damping`` (nj,) adds per-joint viscous damping handled
    IMPLICITLY every substep — the home of a PD servo's −k_d·q̇ term. A
    zero-order-hold explicit k_d·q̇ (the naive reading of reference behavior
    B3) is unstable whenever ``dt > 2·I_joint/k_d``, which Cassie's toe
    (k_d = 5, I ≈ 5·10⁻⁴ kg·m²) violates at ANY practical engine rate; the
    reference survives only because Bullet's velocity-level motor model is
    itself implicit. Folding k_d into the system matrix reproduces that
    stability property.
    """
    gravity = jnp.asarray(config.gravity, dtype=jnp.float32)
    dt = config.dt
    ns = model.ns
    ne = constraints.ne
    lim_idx = limited_joints(model)
    nlim = len(lim_idx)
    damping = model.damping + (0.0 if extra_damping is None else extra_damping)

    def _eq_target(err):
        # Baumgarte drift correction for equality rows, velocity-capped like
        # contact push-out — an uncapped β/dt factor (120 s⁻¹ at Cassie's
        # 600 Hz) turns any residual closure error into solver-breaking
        # impulse targets.
        return jnp.clip(
            -(config.baumgarte / dt) * err, -config.max_push_vel, config.max_push_vel
        )

    def minv_of(fd):
        """Explicit inverse inertia for a configuration — the factor that
        ``config.reuse_factor`` holds fixed across a frame's substeps."""
        from mocca_envs_tpu.ops import linalg
        from mocca_envs_tpu.ops.dynamics import mass_matrix

        M = mass_matrix(model, fd)
        joint_diag = dt * (damping + dt * model.stiffness)
        extra = (
            jnp.concatenate([jnp.zeros(6, dtype=M.dtype), joint_diag])
            if model.floating
            else joint_diag
        )
        return linalg.chol_inverse(linalg.chol_factor(M + jnp.diag(extra)))

    def substep(q, qd, tau_joint, scene: Scene, grab_active=None,
                grab_target=None, Minv_in=None, lam_in=None):
        fd = forward_kinematics(model, q, qd)
        contacts = collide_mod.collide(model, fd, scene, config.contact_margin)

        # passive joint forces: viscous damping + Cassie spring joints (B3)
        qj = joint_q(model, q)
        qdj = joint_qd(model, qd)
        tau_passive = -damping * qdj - model.stiffness * (qj - model.spring_ref)
        tau_j = tau_joint + tau_passive
        if model.floating:
            tau = jnp.concatenate([jnp.zeros(6, dtype=q.dtype), tau_j])
        else:
            tau = tau_j

        if Minv_in is None:
            # implicit spring/damper diagonal (see dynamics.forward_dynamics)
            joint_diag = dt * (damping + dt * model.stiffness)
            qdd_free, Minv = forward_dynamics(
                model, fd, qd, tau, gravity, joint_diag=joint_diag
            )
        else:
            from mocca_envs_tpu.ops.dynamics import bias_forces

            Minv = Minv_in
            qdd_free = Minv @ (tau - bias_forces(model, fd, qd, gravity))
        v_free = qd + dt * qdd_free

        # ---------------- constraint rows (static layout: equality | contacts)
        rows_J, rows_tgt, rows_act = [], [], []

        for k in range(constraints.num_p2p):
            la, lb = constraints.p2p_link_a[k], constraints.p2p_link_b[k]
            aa = jnp.asarray(constraints.p2p_anchor_a[k], dtype=q.dtype)
            ab = jnp.asarray(constraints.p2p_anchor_b[k], dtype=q.dtype)
            xa = fd.pos[la] + fd.rot[la] @ aa
            xb = fd.pos[lb] + fd.rot[lb] @ ab
            Jk = point_jacobian(model, fd, la, xa) - point_jacobian(model, fd, lb, xb)
            rows_J.append(Jk)
            rows_tgt.append(_eq_target(xa - xb))
            rows_act.append(jnp.ones(3, dtype=q.dtype))

        if constraints.planar:
            nv = model.nv
            Jp = jnp.zeros((3, nv), dtype=q.dtype)
            Jp = Jp.at[0, 1].set(1.0)   # base linear y
            Jp = Jp.at[1, 3].set(1.0)   # base angular x (roll rate)
            Jp = Jp.at[2, 5].set(1.0)   # base angular z (yaw rate)
            # roll/yaw drift via sine surrogates (first-order-exact on the
            # locked manifold; matches the fused kernel, which has no atan2)
            w_, x_, y_, z_ = q[3], q[4], q[5], q[6]
            err = jnp.stack(
                [q[1], 2.0 * (w_ * x_ + y_ * z_), 2.0 * (w_ * z_ + x_ * y_)]
            )
            rows_J.append(Jp)
            rows_tgt.append(_eq_target(err))
            rows_act.append(jnp.ones(3, dtype=q.dtype))

        for g in range(constraints.num_grabs):
            lg = constraints.grab_links[g]
            ag = jnp.asarray(constraints.grab_anchors[g], dtype=q.dtype)
            xg = fd.pos[lg] + fd.rot[lg] @ ag
            Jg = point_jacobian(model, fd, lg, xg)
            err = xg - grab_target[g]
            rows_J.append(Jg)
            rows_tgt.append(_eq_target(err))
            rows_act.append(jnp.full((3,), grab_active[g], dtype=q.dtype))

        # joint-limit rows: unilateral, signed toward the nearer bound.
        # Solver rows (not projection clamps) so limit impulses exchange
        # momentum with the whole tree — see ops/solver.py module docstring.
        bias_l = None
        if nlim:
            li = jnp.asarray(lim_idx, dtype=jnp.int32)
            d_lo = qj[li] - model.limit_lo[li]
            d_hi = model.limit_hi[li] - qj[li]
            sgn = jnp.where(d_lo <= d_hi, 1.0, -1.0).astype(q.dtype)
            gap = jnp.minimum(d_lo, d_hi)
            base_off = 6 if model.floating else 0
            Jl = jnp.zeros((nlim, model.nv), dtype=q.dtype)
            Jl = Jl.at[jnp.arange(nlim), base_off + li].set(sgn)
            viol = -gap
            bias_l = jnp.minimum(
                (config.baumgarte / dt) * jnp.maximum(viol - LIMIT_SLOP, 0.0),
                config.max_push_vel,
            )
            push_l = bias_l - jnp.maximum(-viol, 0.0) / dt
            if config.split_impulse:
                # push-out moves to the position pass (pseudo-impulses);
                # the velocity solve only forbids further approach
                push_l = push_l - bias_l
            rows_J.append(Jl)
            rows_tgt.append(push_l)
            rows_act.append((gap < config.limit_margin).astype(q.dtype))

        # contact rows, one block per collision sphere
        Jc = jax.vmap(lambda l, x: point_jacobian(model, fd, l, x))(
            contacts.link, contacts.pos
        )                                                    # (ns, 3, nv)
        t1, t2 = tangent_basis(contacts.normal)
        Jn = jnp.einsum("si,sik->sk", contacts.normal, Jc)   # (ns, nv)
        Jt1 = jnp.einsum("si,sik->sk", t1, Jc)
        Jt2 = jnp.einsum("si,sik->sk", t2, Jc)
        # Penetrating: Baumgarte push-out (capped). Separated-but-within-margin
        # rows must still permit approach up to closing the gap this substep —
        # otherwise contacts act at a distance and bodies hover at the margin.
        bias_n = jnp.minimum(
            (config.baumgarte / dt) * jnp.maximum(contacts.depth - config.slop, 0.0),
            config.max_push_vel,
        )
        push = bias_n - jnp.maximum(-contacts.depth, 0.0) / dt
        if config.split_impulse:
            push = push - bias_n
        Jcon = jnp.stack([Jn, Jt1, Jt2], axis=1).reshape(3 * ns, -1)
        tgt_con = jnp.stack(
            [push, jnp.zeros_like(push), jnp.zeros_like(push)], axis=1
        ).reshape(-1)
        act_con = jnp.repeat(contacts.active, 3)

        J = jnp.concatenate(rows_J + [Jcon], axis=0) if rows_J else Jcon
        target = jnp.concatenate(rows_tgt + [tgt_con]) if rows_tgt else tgt_con
        active = jnp.concatenate(rows_act + [act_con]) if rows_act else act_con

        A, MinvJT = delassus(Minv, J, config.cfm)
        c = J @ v_free - target
        mu = jnp.full((ns,), scene.friction, dtype=q.dtype)
        lam = pgs_solve(
            A, c, active, mu, ne, ns, config.solver_iters,
            nlim=nlim, block=config.block_pgs,
            lam0=lam_in if config.warm_start else None,
        )

        qd_new = v_free + MinvJT @ lam

        qd_pos = None
        if config.split_impulse:
            # position pass (Bullet split impulse): pseudo-impulses against
            # the push-out bias alone, over the unilateral rows only
            # (limits + contact normals — friction and equality masked).
            # Pseudo-velocities start at zero, so the residual at λ=0 is
            # −bias; the solve reuses A and MinvJT.
            bias = jnp.zeros_like(c)
            if nlim:
                bias = bias.at[ne:ne + nlim].set(bias_l)
            n_rows = ne + nlim + 3 * jnp.arange(ns)
            bias = bias.at[n_rows].set(bias_n)
            act_pos = jnp.zeros_like(active).at[ne:].set(active[ne:])
            # friction rows stay in the solve but with μ=0 their box bound
            # is [0,0] — they contribute nothing
            lam_pos = pgs_solve(
                A, -bias, act_pos, jnp.zeros((ns,), dtype=q.dtype), ne, ns,
                config.solver_iters, nlim=nlim, block=False,
            )
            qd_pos = MinvJT @ lam_pos

        q_new, qd_new = integrate(model, q, qd_new, dt, qd_pos=qd_pos)

        normal_impulse = lam[ne + nlim:].reshape(ns, 3)[:, 0]
        info = StepInfo(
            contacts=contacts,
            normal_impulse=normal_impulse,
            foot_contact=collide_mod.foot_contact_flags(model, contacts),
            link_contact=collide_mod.link_contact_mask(model, contacts),
        )
        # Uniform signature regardless of warm_start: always expose λ so the
        # llc unit can carry it into the next substep (callers that don't
        # warm-start just drop it — a config-dependent return arity proved
        # fragile the moment warm_start became the default).
        return q_new, qd_new, info, lam

    substep.minv_of = minv_of
    return substep


def make_control_step(
    model: RobotModel,
    config: EngineConfig,
    constraints: ConstraintSpec = ConstraintSpec(),
    actuation: Callable | None = None,
    extra_damping: jnp.ndarray | None = None,
    pd_targets: Callable | None = None,
):
    """Build the control-rate step: the function the task envs drive.

    ``actuation(q, qd, action) → tau_joint`` runs at the llc rate (reference
    behavior B1/B3: Cassie's PD servo recomputes each llc frame; walker
    torques are constant across the control step — B2). Returns
    ``(q', qd', StepInfo)`` with diagnostics from the LAST substep, matching
    when the reference queries contacts (§3.3: after ``global_step``).
    """
    substep = make_substep(model, config, constraints, extra_damping=extra_damping)
    if actuation is None:
        actuation = lambda q, qd, a: a  # raw joint torques

    if pd_targets is not None:
        # PD-servo families (Cassie, B3): the whole control step — PD
        # proportional torque recomputed per llc frame × sim substeps — is
        # ONE unit (one fused kernel launch on TPU; an internal scan on the
        # JAX path). Derivative gains ride extra_damping (implicit).
        pd_unit = _make_llc_unit(
            model, config, substep, constraints, extra_damping, pd_mode=True
        )

        def control_step(q, qd, action, scene: Scene, grab_active=None, grab_target=None):
            targets = pd_targets(action)
            return pd_unit(q, qd, targets, scene, grab_active, grab_target)

        return control_step

    llc_unit = _make_llc_unit(model, config, substep, constraints, extra_damping)

    def control_step(q, qd, action, scene: Scene, grab_active=None, grab_target=None):
        def llc_frame(carry, _):
            q, qd = carry
            tau_j = actuation(q, qd, action)
            q, qd, info = llc_unit(q, qd, tau_j, scene, grab_active, grab_target)
            return (q, qd), info

        (q, qd), infos = jax.lax.scan(
            llc_frame, (q, qd), None, length=config.llc_frames
        )
        info = jax.tree.map(lambda x: x[-1], infos)
        return q, qd, info

    return control_step


def _make_llc_unit(model: RobotModel, config: EngineConfig, substep,
                   constraints: ConstraintSpec = ConstraintSpec(),
                   extra_damping=None, pd_mode: bool = False):
    """One llc frame = ``sim_substeps`` physics substeps at fixed torques.

    When the fused Pallas kernel covers this configuration and we are
    compiling for TPU, the per-env function carries a ``custom_vmap`` rule
    that dispatches the WHOLE vmapped batch to the kernel
    (ops/pallas/engine.py) — so ``jax.vmap(env.step)`` transparently runs
    fused. Any other case (CPU tests, equality constraints, stone scenes,
    batch not a tile multiple) uses the JAX path.
    """

    nr_ws = constraints.ne + len(limited_joints(model)) + 3 * model.ns

    def jax_unit(q, qd, tau_or_targets, scene, grab_active=None, grab_target=None):
        # stone/tri-culling fast path (EngineConfig.stone_window /
        # tri_window): narrowphase only the window nearest the root,
        # re-selected once per control step. Applied on BOTH engine paths
        # so CPU ≡ TPU trajectories.
        from mocca_envs_tpu.terrain.scene import cull_stones, cull_tris

        scene = cull_stones(scene, q[0:2], config.stone_window)
        scene = cull_tris(scene, q[0:2], config.tri_window)

        def one_llc(q, qd, lam=None):
            if pd_mode:
                qj = q[7:] if model.floating else q
                tau_j = model.actuated * model.kp * (tau_or_targets - qj)
            else:
                tau_j = tau_or_targets

            # frame-start factor, held fixed for this frame's substeps when
            # reuse_factor is on (matches the fused kernel's approximation)
            Minv0 = (
                substep.minv_of(forward_kinematics(model, q, qd))
                if (config.reuse_factor and config.sim_substeps > 1)
                else None
            )

            if config.warm_start:
                def sim(carry, _):
                    q, qd, lam = carry
                    q, qd, info, lam = substep(
                        q, qd, tau_j, scene, grab_active, grab_target,
                        Minv_in=Minv0, lam_in=lam,
                    )
                    return (q, qd, lam), info

                (q, qd, lam), infos = jax.lax.scan(
                    sim, (q, qd, lam), None, length=config.sim_substeps
                )
                return q, qd, lam, jax.tree.map(lambda x: x[-1], infos)

            def sim(carry, _):
                q, qd = carry
                q, qd, info, _lam = substep(
                    q, qd, tau_j, scene, grab_active, grab_target, Minv_in=Minv0
                )
                return (q, qd), info

            (q, qd), infos = jax.lax.scan(
                sim, (q, qd), None, length=config.sim_substeps
            )
            return q, qd, jax.tree.map(lambda x: x[-1], infos)

        # zeros_like (not zeros): under shard_map the scan-carried λ is
        # varying over the mesh axis, and a fresh constant would be
        # unvarying — deriving from q inherits its varying-axes type.
        lam0 = jnp.zeros_like(q, shape=(nr_ws,)) if config.warm_start else None

        if not pd_mode:
            if config.warm_start:
                q, qd, _lam, info = one_llc(q, qd, lam0)
                return q, qd, info
            return one_llc(q, qd)

        if config.warm_start:
            def llc_ws(carry, _):
                q, qd, lam = carry
                q, qd, lam, info = one_llc(q, qd, lam)
                return (q, qd, lam), info

            (q, qd, _lam), infos = jax.lax.scan(
                llc_ws, (q, qd, lam0), None, length=config.llc_frames
            )
            return q, qd, jax.tree.map(lambda x: x[-1], infos)

        def llc(carry, _):
            q, qd = carry
            q, qd, info = one_llc(q, qd)
            return (q, qd), info

        (q, qd), infos = jax.lax.scan(
            llc, (q, qd), None, length=config.llc_frames
        )
        return q, qd, jax.tree.map(lambda x: x[-1], infos)

    use_pallas = config.use_pallas
    if use_pallas:
        try:
            from mocca_envs_tpu.ops.pallas import engine as pallas_engine

            use_pallas = (
                pallas_engine.supports(model, constraints)
                and jax.default_backend() == "tpu"
            )
        except Exception:  # pragma: no cover - pallas unavailable
            use_pallas = False
    if not use_pallas:
        return jax_unit

    from jax.custom_batching import custom_vmap

    from mocca_envs_tpu.ops.pallas import engine as pallas_engine

    TILE = pallas_engine.current_tile()
    HF_PATCH = pallas_engine.current_hf_patch()
    has_grabs = constraints.num_grabs > 0
    _units: dict = {}   # (num_stones, has_hf) → custom_vmap'd llc unit

    def _get_unit(num_stones: int, has_hf: bool = False, num_bars: int = 0,
                  num_tris: int = 0):
        ukey = (num_stones, has_hf, num_bars, num_tris)
        if ukey in _units:
            return _units[ukey]
        fused = pallas_engine.make_pallas_substep(
            model, config, num_stones=num_stones,
            constraints=constraints, extra_damping=extra_damping,
            pd_mode=pd_mode, hf_patch=HF_PATCH if has_hf else 0,
            num_bars=num_bars, num_tris=num_tris,
        )

        # The oracle fallback sees the SAME inputs as the kernel — for hf
        # scenes that means the extracted local patch as a small Scene
        # heightfield, so kernel and fallback agree for any batch size.
        def _base(q, qd, tau_j, ground_z, friction, *rest):
            rest = list(rest)
            kw = dict(ground_z=ground_z, friction=friction)
            if num_stones > 0:
                kw.update(
                    has_stones=True, stone_pos=rest.pop(0),
                    stone_quat=rest.pop(0), stone_half=rest.pop(0),
                    stone_active=rest.pop(0),
                )
            if has_hf:
                patch, px0, py0, cell = rest[:4]
                rest = rest[4:]
                kw.update(
                    has_hf=True, hf_height=patch,
                    hf_xy0=jnp.stack([px0, py0]), hf_cell=cell,
                )
            if num_tris > 0:
                kw.update(
                    tri_a=rest.pop(0), tri_b=rest.pop(0),
                    tri_c=rest.pop(0), tri_active=rest.pop(0),
                )
            if num_bars > 0:
                kw.update(
                    has_bars=True, bar_a=rest.pop(0), bar_b=rest.pop(0),
                    bar_r=rest.pop(0), bar_active=rest.pop(0),
                )
            ga_gt = tuple(rest)   # (grab_active, grab_target) or ()
            qq, dd, info = jax_unit(q, qd, tau_j, Scene(**kw), *ga_gt)
            return qq, dd, info.contacts.depth, info.normal_impulse

        unit = custom_vmap(_base)

        @unit.def_vmap
        def _rule(axis_size, in_batched, *args):
            assert all(in_batched), "fused path expects fully batched state"
            if axis_size % TILE == 0:
                out = fused(*args)
            else:
                out = jax.vmap(_base)(*args)
            return out, (True, True, True, True)

        _units[ukey] = unit
        return unit

    def _hf_patch_args(q, scene: Scene):
        """P×P local patch around the root (per control step — the robot
        moves ~cm per step vs the ~2 m patch margin). Shared primitive:
        terrain/scene.extract_patch (one-hot MXU contraction; see its
        docstring for the precision and clamping argument). A scene whose
        grid already IS a patch — the terrain env pre-extracts so its obs
        probes can ride the same window — passes through untouched."""
        from mocca_envs_tpu.terrain import scene as scene_mod

        p = scene_mod.extract_patch(scene, q[0:2], HF_PATCH)
        return (
            p.hf_height, p.hf_xy0[0], p.hf_xy0[1],
            jnp.broadcast_to(p.hf_cell, ()),
        )

    def pallas_unit(q, qd, tau_j, scene: Scene, grab_active=None, grab_target=None):
        # same culling as jax_unit — the kernel then compiles for K=window
        # boxes/faces (the fallback inside _get_unit sees the culled set
        # too, so kernel ≡ oracle is preserved by construction)
        from mocca_envs_tpu.terrain.scene import cull_stones, cull_tris

        scene = cull_stones(scene, q[0:2], config.stone_window)
        scene = cull_tris(scene, q[0:2], config.tri_window)
        has_hf = scene.has_hf
        if has_hf and min(scene.hf_height.shape) < HF_PATCH:
            # grid smaller than a patch: stay on the JAX path (trace-time)
            return jax_unit(q, qd, tau_j, scene, grab_active, grab_target)
        grabs = (grab_active, grab_target) if has_grabs else ()
        # disable the plane for no-ground scenes by sinking it (the fused
        # kernel always evaluates a plane term; at −1e9 it never wins).
        # Derived from the batched leaf so custom_vmap sees it as batched.
        gz = scene.ground_z if scene.has_ground else scene.ground_z * 0.0 - 1e9
        stones = ()
        ksize = 0
        if scene.has_stones:
            ksize = scene.stone_pos.shape[-2]
            stones = (
                scene.stone_pos, scene.stone_quat,
                scene.stone_half, scene.stone_active,
            )
        hf_args = _hf_patch_args(q, scene) if has_hf else ()
        tris = ()
        kt = 0
        if scene.has_tris:
            kt = scene.tri_a.shape[-2]
            tris = (scene.tri_a, scene.tri_b, scene.tri_c, scene.tri_active)
        bars = ()
        kb = 0
        if scene.has_bars:
            kb = scene.bar_a.shape[-2]
            bars = (scene.bar_a, scene.bar_b, scene.bar_r, scene.bar_active)
        unit = _get_unit(ksize, has_hf, kb, kt)
        qq, dd, depth, nimp = unit(
            q, qd, tau_j, gz, scene.friction, *stones, *hf_args, *tris,
            *bars, *grabs
        )
        contacts = collide_mod.Contacts(
            pos=jnp.zeros((model.ns, 3), dtype=qq.dtype),
            normal=jnp.broadcast_to(
                jnp.array([0.0, 0.0, 1.0], dtype=qq.dtype), (model.ns, 3)
            ),
            depth=depth,
            link=model.sph_link,
            active=(depth > -config.contact_margin).astype(qq.dtype),
        )
        info = StepInfo(
            contacts=contacts,
            normal_impulse=nimp,
            foot_contact=collide_mod.foot_contact_flags(model, contacts),
            link_contact=collide_mod.link_contact_mask(model, contacts),
        )
        return qq, dd, info

    return pallas_unit
