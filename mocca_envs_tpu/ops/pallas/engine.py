"""Fused Pallas physics substep — the whole engine in one TPU kernel.

WHY: profiled at B=4096 on TPU v5 lite, the XLA substep costs ~8 ms and is
dominated by launch overhead + HBM round-trips of tiny intermediates (FK
chain ≈ 3 ms for ~0.05 ms of math; growing the batch to 16k made throughput
WORSE — bandwidth-bound). The arithmetic is ~60k MACs/env/substep: at VPU
rates a fused kernel's ceiling is ~0.2 ms. This is exactly the "Pallas
where XLA fusion falls short" case the north star names (BASELINE.json:
"rewrite the contact solver and terrain raycast as Pallas kernels").

DESIGN
- Layout: batch-in-lanes. Each grid step processes a tile of 1024 envs held
  as (8, 128) f32 tiles; every physical scalar (a joint angle, a quaternion
  component, a mass-matrix entry) is one such tile. Host arrays are
  (C, B) component-major; BlockSpec carves (C, 8, 128) bricks.
- The model is baked in as PYTHON FLOATS (host-side constants from the
  RobotModel), so all structural sparsity — ancestor masks, zero inertia
  products, diagonal inertias, flat-ground normals — constant-folds at
  trace time through the tiny `_z`-aware helpers below.
- One kernel runs a whole control step (``llc_frames × sim_substeps``
  substeps, PD torque refreshed in-kernel at the llc rate in pd_mode) via
  nested fori loops: FK (quaternion chain) → narrowphase (plane ∪ oriented
  stone boxes) → Newton–Euler bias → composite-body CRBA mass matrix
  (world-frame spatial composites about the base) → unrolled Cholesky →
  W = L⁻¹Jᵀ (so A = WᵀW needs no explicit M⁻¹) → projected Gauss–Seidel
  over [equality rows (Cassie rods, planar locks, runtime grabs) |
  joint-limit rows (unilateral) | contact blocks] with box friction →
  impulse map L⁻ᵀ(Wλ) → semi-implicit integrate with a slop-band
  joint-limit backstop and a velocity cap.
- The row dimension of the constraint system (nr = ne + nlim + 3·ns) is kept as a
  REAL array axis ((nr, 8, 128) values) so substitution/Delassus/PGS trace
  to ~hundreds of vector ops instead of tens of thousands of scalar ops.

Scope: floating-base all-revolute models over plane ∪ stone-box ∪
heightfield scenes (heightfields via a per-env local patch + one-hot
bilinear sampling — no Mosaic gather needed). ops/step.py remains the
oracle for every configuration and for CPU; equivalence is gated by
tests/test_pallas_engine.py in interpret mode and by on-TPU numeric checks.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mocca_envs_tpu.models.schema import REVOLUTE, RobotModel
from mocca_envs_tpu.utils.config import EngineConfig

import os as _os

# envs per grid step. Overridable for perf experiments (MOCCA_TILE=2048
# python bench.py): matrix-free PGS frees the ~14 MB Delassus block from
# VMEM, which may admit larger tiles (better pipelining amortization).
# Read at BUILD time (current_tile), not import time, so one process can
# sweep tile sizes by setting the env var between env constructions.
def current_tile() -> int:
    return int(_os.environ.get("MOCCA_TILE", "1024"))


def current_dimsem() -> tuple | None:
    """Optional grid dimension_semantics hint (MOCCA_DIMSEM=parallel|
    arbitrary). The single grid axis walks independent 1024-env tiles, so
    "parallel" is semantically true; whether Mosaic's pipeliner uses it
    profitably is an empirical question (round-5 roofline probe)."""
    v = _os.environ.get("MOCCA_DIMSEM", "")
    return (v,) if v in ("parallel", "arbitrary") else None


TILE = current_tile()              # import-time snapshot (back-compat)
SUB = (TILE // 128, 128)   # physical tile shape


# ----------------------------------------------------------------- helpers
# Scalars are either python floats (compile-time constants) or (8,128)
# arrays. These helpers fold constants so structural zeros vanish.

def _isf(v):
    return isinstance(v, (int, float))


def _z(v):
    return _isf(v) and v == 0.0


def add(a, b):
    if _z(a):
        return b
    if _z(b):
        return a
    return a + b


def sub_(a, b):
    if _z(b):
        return a
    if _z(a):
        return -b if not _isf(b) else -b
    return a - b


def mul(a, b):
    if _z(a) or _z(b):
        return 0.0
    if _isf(a) and a == 1.0:
        return b
    if _isf(b) and b == 1.0:
        return a
    return a * b


def madd(acc, a, b):
    return add(acc, mul(a, b))


def dot3(a, b):
    return madd(madd(mul(a[0], b[0]), a[1], b[1]), a[2], b[2])


def cross(a, b):
    return (
        sub_(mul(a[1], b[2]), mul(a[2], b[1])),
        sub_(mul(a[2], b[0]), mul(a[0], b[2])),
        sub_(mul(a[0], b[1]), mul(a[1], b[0])),
    )


def v3add(a, b):
    return (add(a[0], b[0]), add(a[1], b[1]), add(a[2], b[2]))


def v3sub(a, b):
    return (sub_(a[0], b[0]), sub_(a[1], b[1]), sub_(a[2], b[2]))


def v3scale(a, s):
    return (mul(a[0], s), mul(a[1], s), mul(a[2], s))


def qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        sub_(sub_(sub_(mul(aw, bw), mul(ax, bx)), mul(ay, by)), mul(az, bz)),
        sub_(add(add(mul(aw, bx), mul(ax, bw)), mul(ay, bz)), mul(az, by)),
        add(sub_(add(mul(aw, by), mul(ay, bw)), mul(ax, bz)), mul(az, bx)),
        add(add(sub_(mul(aw, bz), mul(ay, bx)), mul(ax, by)), mul(az, bw)),
    )


def qrot(q, v):
    """Rotate v by quaternion q: v + 2 q_v × (q_v × v + q_w v)."""
    qv = (q[1], q[2], q[3])
    t = cross(qv, v3add(cross(qv, v), v3scale(v, q[0])))
    return v3add(v, v3scale(t, 2.0))


def qmat(q):
    """Quaternion → 9 rotation-matrix scalars (rows of R)."""
    w, x, y, z = q
    xx, yy, zz = mul(x, x), mul(y, y), mul(z, z)
    xy, xz, yz = mul(x, y), mul(x, z), mul(y, z)
    wx, wy, wz = mul(w, x), mul(w, y), mul(w, z)
    two = 2.0
    return (
        (sub_(1.0, mul(two, add(yy, zz))), mul(two, sub_(xy, wz)), mul(two, add(xz, wy))),
        (mul(two, add(xy, wz)), sub_(1.0, mul(two, add(xx, zz))), mul(two, sub_(yz, wx))),
        (mul(two, sub_(xz, wy)), mul(two, add(yz, wx)), sub_(1.0, mul(two, add(xx, yy)))),
    )


def mat_vec(R, v):
    return tuple(madd(madd(mul(R[i][0], v[0]), R[i][1], v[1]), R[i][2], v[2]) for i in range(3))


def rot_inertia(R, I):
    """R I Rᵀ for symmetric constant-or-tile 3×3 I; returns 3×3 rows."""
    # B = I Rᵀ  (columns of Rᵀ are rows of R)
    Bm = [[madd(madd(mul(I[i][0], R[j][0]), I[i][1], R[j][1]), I[i][2], R[j][2])
           for j in range(3)] for i in range(3)]
    return [[madd(madd(mul(R[i][0], Bm[0][j]), R[i][1], Bm[1][j]), R[i][2], Bm[2][j])
             for j in range(3)] for i in range(3)]


def _const_v3(arr):
    return (float(arr[0]), float(arr[1]), float(arr[2]))


def supports(model: RobotModel, constraints=None, scene_has_stones=False) -> bool:
    """Whether the fused kernel covers this configuration (else JAX path).

    Covers: floating all-revolute models; p2p rods, planar locks and
    runtime grab constraints; flat ∪ stone-box ∪ heightfield ∪ bar-capsule
    ∪ triangle-mesh scenes. (Fixed-base rigs and grids smaller than
    HF_PATCH stay on the JAX path.)
    """
    del constraints, scene_has_stones  # all supported now
    return model.floating and all(t == REVOLUTE for t in model.jtype)


HF_PATCH = 16   # side of the per-env local heightfield patch (cells)


def current_hf_patch() -> int:
    """Build-time patch side (MOCCA_HF_PATCH override, default 16).

    The XLA-side extraction einsum is O(B·P·G²) and 2i's decomposition put
    it at ≈ the whole terrain-vs-flat gap, so P is worth sweeping: P=12
    still spans 3.7 m (root-centered ±1.9 m vs ≈1.2 m robot reach)."""
    return int(_os.environ.get("MOCCA_HF_PATCH", str(HF_PATCH)))


def make_pallas_substep(
    model: RobotModel,
    config: EngineConfig,
    interpret: bool = False,
    num_stones: int = 0,
    constraints=None,
    extra_damping=None,
    pd_mode: bool = False,
    hf_patch: int = 0,
    num_bars: int = 0,
    num_tris: int = 0,
):
    """Build the fused substep running ``config.sim_substeps`` physics
    substeps on TPU.

    Signature (in input order):
        ``substep(q, qd, tau, ground_z, friction
                  [, stone_pos (B,K,3), stone_quat (B,K,4),
                     stone_half (B,K,3), stone_active (B,K)]   # K > 0
                  [, hf_patch (B,P,P), hf_x0 (B,), hf_y0 (B,),
                     hf_cell (B,)]                             # hf_patch=P>0
                  [, tri_a (B,Kt,3), tri_b (B,Kt,3),
                     tri_c (B,Kt,3), tri_active (B,Kt)]        # num_tris>0
                  [, bar_a (B,Kb,3), bar_b (B,Kb,3),
                     bar_r (B,Kb), bar_active (B,Kb)]          # num_bars>0
                  [, grab_active (B,ng), grab_target (B,ng,3)] # ng > 0
        ) → (q', qd', depth (B,ns), normal_impulse (B,ns))``

    ``hf_patch=P`` enables heightfield narrowphase against a per-env P×P
    LOCAL grid patch (extracted around the root by ops/step.py once per
    control step — Mosaic has no vector gather, so the full-grid lookup
    happens on the XLA side and the kernel samples the patch by a two-level
    one-hot contraction, ~2(P−1)P MACs/sphere). Depth/normal/contact-point
    formulas are shared verbatim with terrain/scene.{hf_sample, hf_normal},
    so kernel ≡ oracle wherever all spheres stay inside the patch (the
    patch spans P·cell ≈ 5 m; robot reach ≈ 1.2 m).

    ``constraints`` (ops/step.ConstraintSpec) adds equality rows: permanent
    point-to-point rods (Cassie achilles), planar base locks (2D variants)
    and maskable world-anchor grabs (monkey). ``extra_damping`` (nj,) is the
    implicitly-integrated actuator damping (Cassie PD servo k_d).

    ``pd_mode=True`` reinterprets the ``tau`` input as joint POSITION
    TARGETS (nj,) and runs the WHOLE control step in one call:
    ``llc_frames × sim_substeps`` substeps with the PD proportional torque
    ``actuated·k_p·(target − q)`` recomputed at each llc frame in-kernel
    (reference behavior B1/B3 three-rate hierarchy) — one kernel launch per
    control step instead of one per llc frame.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU) — the
    equivalence-test path against the JAX oracle."""
    assert supports(model), "unsupported model for the fused kernel"
    # Shadow the module-level tile shape with the build-time value so the
    # whole kernel body (closures below) uses one consistent tile.
    TILE = current_tile()
    SUB = (TILE // 128, 128)
    dimsem = current_dimsem()
    K = int(num_stones)
    PHF = int(hf_patch)
    KB = int(num_bars)
    KT = int(num_tris)
    from mocca_envs_tpu.ops.integrate import LIMIT_SLOP
    from mocca_envs_tpu.ops.step import ConstraintSpec, limited_joints

    spec = constraints or ConstraintSpec()
    n_p2p = spec.num_p2p
    planar = bool(spec.planar)
    ng = int(spec.num_grabs)
    ne = spec.ne
    nl, nj = model.nl, model.nj
    nv, nq = model.nv, model.nq
    ns = model.ns
    lim_idx = limited_joints(model)
    nlim = len(lim_idx)
    nr = ne + nlim + 3 * ns
    lim_slop = float(LIMIT_SLOP)
    lim_margin = float(config.limit_margin)
    dt = float(config.dt)
    n_sub = int(config.sim_substeps)
    beta_dt = float(config.baumgarte) / dt
    slop = float(config.slop)
    maxpush = float(config.max_push_vel)
    margin = float(config.contact_margin)
    cfm = float(config.cfm)
    iters = int(config.solver_iters)
    block_pgs = bool(config.block_pgs)
    matfree = bool(config.matfree_pgs)
    warm = bool(config.warm_start)
    split = bool(config.split_impulse)
    gx, gy, gz_acc = (float(g) for g in config.gravity)

    # ---- host-side constants from the model. NOTE: convert whole arrays to
    # numpy FIRST — this builder may run lazily inside an active trace
    # (step.py builds the stones variant on first stepper trace), where any
    # jnp op (even indexing a concrete array) would stage a tracer.
    parent = model.parent
    _jq = np.asarray(model.joint_quat)
    _jaxis = np.asarray(model.joint_axis)
    _jpos = np.asarray(model.joint_pos)
    _com = np.asarray(model.com)
    _mass = np.asarray(model.mass)
    _inertia = np.asarray(model.inertia)
    _sph_pos = np.asarray(model.sph_pos)
    _sph_r = np.asarray(model.sph_radius)
    jq_c = [tuple(float(v) for v in _jq[j]) for j in range(nj)]
    jax_c = [_const_v3(_jaxis[j]) for j in range(nj)]
    jpos_c = [_const_v3(_jpos[j]) for j in range(nj)]
    com_c = [_const_v3(_com[l]) for l in range(nl)]
    mass_c = [float(_mass[l]) for l in range(nl)]
    inertia_c = [np.asarray(_inertia[l], dtype=np.float64) for l in range(nl)]
    anc = np.asarray(model.anc) > 0.5                      # (nl, nj) bools
    sph_link = [int(v) for v in np.asarray(model.sph_link)]
    sph_pos_c = [_const_v3(_sph_pos[s]) for s in range(ns)]
    sph_r = [float(_sph_r[s]) for s in range(ns)]
    sph_no_bar = [bool(v > 0.5) for v in np.asarray(model.sph_no_bar)]
    damping_c = np.asarray(model.damping, dtype=np.float64)
    if extra_damping is not None:
        damping_c = damping_c + np.asarray(extra_damping, dtype=np.float64)
    stiffness_c = np.asarray(model.stiffness, dtype=np.float64)
    springref_c = np.asarray(model.spring_ref, dtype=np.float64)
    armature_c = np.asarray(model.armature, dtype=np.float64)
    lim_lo = np.asarray(model.limit_lo, dtype=np.float64)
    lim_hi = np.asarray(model.limit_hi, dtype=np.float64)
    kp_c = np.asarray(model.kp, dtype=np.float64)
    act_c = np.asarray(model.actuated, dtype=np.float64)
    n_llc = int(config.llc_frames) if pd_mode else 1
    joint_diag = dt * (damping_c + dt * stiffness_c) + armature_c

    def inertia_rows(l):
        I = inertia_c[l]
        return [[float(I[i, j]) for j in range(3)] for i in range(3)]

    # equality-constraint constants
    p2p_c = [
        (
            int(spec.p2p_link_a[k]), _const_v3(np.asarray(spec.p2p_anchor_a[k])),
            int(spec.p2p_link_b[k]), _const_v3(np.asarray(spec.p2p_anchor_b[k])),
        )
        for k in range(n_p2p)
    ]
    grab_c = [
        (int(spec.grab_links[g]), _const_v3(np.asarray(spec.grab_anchors[g])))
        for g in range(ng)
    ]

    def kernel(q_ref, qd_ref, tau_ref, gz_ref, fric_ref, *rest):
        rest = list(rest)
        if K > 0:
            stone_ref = rest.pop(0)
            # stone data rows: per stone k, components [p(3), q(4), h(3), act]
            st = lambda c: jnp.stack([stone_ref[k * 11 + c] for k in range(K)])
            stp = (st(0), st(1), st(2))        # (K, 8, 128) each
            stq = (st(3), st(4), st(5), st(6))
            sth = (st(7), st(8), st(9))
            sta = st(10)
        if PHF > 0:
            hf_ref = rest.pop(0)
            # channels: [patch row-major (P·P), x0, y0, cell]
            hfp = [hf_ref[c] for c in range(PHF * PHF)]
            hf_x0 = hf_ref[PHF * PHF]
            hf_y0 = hf_ref[PHF * PHF + 1]
            hf_icell = 1.0 / hf_ref[PHF * PHF + 2]
        if KT > 0:
            tris_ref = rest.pop(0)
            # per face k, components: [a(3), b(3), c(3), active]
            tt = lambda c: jnp.stack([tris_ref[k * 10 + c] for k in range(KT)])
            tA = (tt(0), tt(1), tt(2))          # (KT, 8, 128) each
            tBv = (tt(3), tt(4), tt(5))
            tCv = (tt(6), tt(7), tt(8))
            tACT = tt(9)
        if KB > 0:
            bars_ref = rest.pop(0)
            # per bar k, components: [a(3), b(3), r, active]
            bt = lambda c: jnp.stack([bars_ref[k * 8 + c] for k in range(KB)])
            bA = (bt(0), bt(1), bt(2))          # (KB, 8, 128) each
            bB = (bt(3), bt(4), bt(5))
            bR = bt(6)
            bACT = bt(7)
        if ng > 0:
            grab_ref = rest.pop(0)
            # per grab g: [active, target_x, target_y, target_z]
            g_act = [grab_ref[g * 4] for g in range(ng)]
            g_tgt = [
                (grab_ref[g * 4 + 1], grab_ref[g * 4 + 2], grab_ref[g * 4 + 3])
                for g in range(ng)
            ]
        qo_ref, qdo_ref, depth_ref, nimp_ref = rest
        ground = gz_ref[0]
        fric = fric_ref[0]
        tau_in = [tau_ref[j] for j in range(nj)]

        def one_substep(q_s, qd_s, tau_cur, factor=None, lam_in=None):
            bp = q_s[0:3]
            bq = q_s[3:7]
            qj = q_s[7:]
            bv = qd_s[0:3]
            bw = qd_s[3:6]
            qdj = qd_s[6:]

            # ---------------- FK (quaternion chain)
            pos = [tuple(bp)]
            quat = [tuple(bq)]
            omega = [tuple(bw)]
            vel = [tuple(bv)]
            jp = [None] * nj
            ja = [None] * nj
            for i in range(1, nl):
                j = i - 1
                p = parent[i]
                q_pre = qmul(quat[p], jq_c[j])
                a_w = qrot(q_pre, jax_c[j])
                anchor = v3add(pos[p], qrot(quat[p], jpos_c[j]))
                half = qj[j] * 0.5
                ch, sh = jnp.cos(half), jnp.sin(half)
                q_i = qmul(q_pre, (ch, mul(jax_c[j][0], sh), mul(jax_c[j][1], sh), mul(jax_c[j][2], sh)))
                w_i = v3add(omega[p], v3scale(a_w, qdj[j]))
                v_i = v3add(vel[p], cross(omega[p], v3sub(anchor, pos[p])))
                pos.append(anchor)
                quat.append(q_i)
                omega.append(w_i)
                vel.append(v_i)
                jp[j] = anchor
                ja[j] = a_w

            R = [qmat(quat[l]) for l in range(nl)]
            com_w = [v3add(pos[l], mat_vec(R[l], com_c[l])) for l in range(nl)]
            Iw = [rot_inertia(R[l], inertia_rows(l)) for l in range(nl)]

            # ---------------- collide: spheres vs ground ∪ heightfield ∪ boxes
            # merge order (strict > on depth) matches the oracle
            # ops/collide.collide: ground, then heightfield, then stones.
            centers = [v3add(pos[sph_link[s]], mat_vec(R[sph_link[s]], sph_pos_c[s]))
                       for s in range(ns)]
            depth = []
            normal = []   # per-sphere contact normal (v3; floats when flat)
            cpoint = []   # per-sphere contact point
            for s in range(ns):
                c = centers[s]
                best_d = sub_(sph_r[s], sub_(c[2], ground))
                best_n = (0.0, 0.0, 1.0)
                best_x = (c[0], c[1], ground)

                if PHF > 0:
                    # bilinear sample of the local patch by two-level one-hot
                    # (row pair gather, then column weights) — formulas shared
                    # with terrain/scene.hf_corners/hf_sample/hf_normal
                    u = jnp.clip((c[0] - hf_x0) * hf_icell, 0.0, PHF - 1.001)
                    v = jnp.clip((c[1] - hf_y0) * hf_icell, 0.0, PHF - 1.001)
                    iu = jnp.floor(u)
                    iv = jnp.floor(v)
                    fu = u - iu
                    fv = v - iv
                    ohr = [(iu == float(k)).astype(jnp.float32)
                           for k in range(PHF - 1)]
                    ohc = [(iv == float(k)).astype(jnp.float32)
                           for k in range(PHF - 1)]
                    row_a = []   # heights along row iu
                    row_b = []   # heights along row iu + 1
                    for j in range(PHF):
                        sa = ohr[0] * hfp[j]
                        sb = ohr[0] * hfp[PHF + j]
                        for k in range(1, PHF - 1):
                            sa = sa + ohr[k] * hfp[k * PHF + j]
                            sb = sb + ohr[k] * hfp[(k + 1) * PHF + j]
                        row_a.append(sa)
                        row_b.append(sb)
                    h00 = ohc[0] * row_a[0]
                    h01 = ohc[0] * row_a[1]
                    h10 = ohc[0] * row_b[0]
                    h11 = ohc[0] * row_b[1]
                    for j in range(1, PHF - 1):
                        h00 = h00 + ohc[j] * row_a[j]
                        h01 = h01 + ohc[j] * row_a[j + 1]
                        h10 = h10 + ohc[j] * row_b[j]
                        h11 = h11 + ohc[j] * row_b[j + 1]
                    gu = 1.0 - fu
                    gv = 1.0 - fv
                    hgt = h00 * gu * gv + h10 * fu * gv + h01 * gu * fv + h11 * fu * fv
                    dhdu = (h10 - h00) * gv + (h11 - h01) * fv
                    dhdv = (h01 - h00) * gu + (h11 - h10) * fu
                    ngx = -dhdu * hf_icell
                    ngy = -dhdv * hf_icell
                    ninv = jax.lax.rsqrt(ngx * ngx + ngy * ngy + 1.0)
                    d_hf = sph_r[s] - (c[2] - hgt) * ninv
                    take = d_hf > best_d
                    best_d = jnp.where(take, d_hf, best_d)
                    best_n = tuple(
                        jnp.where(take, nh, bn)
                        for nh, bn in zip((ngx * ninv, ngy * ninv, ninv), best_n)
                    )
                    best_x = tuple(
                        jnp.where(take, xh, bx)
                        for xh, bx in zip((c[0], c[1], hgt), best_x)
                    )

                if K > 0:
                    # sphere vs K boxes, vectorized over the stone axis
                    cb = (c[0][None], c[1][None], c[2][None])  # (1,8,128)
                    rel = v3sub(cb, stp)
                    qc = (stq[0], -stq[1], -stq[2], -stq[3])
                    dl = qrot(qc, rel)                         # box frame
                    cl = tuple(jnp.clip(dl[a], -sth[a], sth[a]) for a in range(3))
                    delta = v3sub(dl, cl)
                    dist = jnp.sqrt(dot3(delta, delta) + 1e-18)
                    outside = dist > 1e-6
                    fd = tuple(sth[a] - jnp.abs(dl[a]) for a in range(3))
                    fmin = jnp.minimum(jnp.minimum(fd[0], fd[1]), fd[2])
                    n_in = tuple(
                        jnp.sign(dl[a]) * (fd[a] <= fmin).astype(jnp.float32)
                        for a in range(3)
                    )
                    n_loc = tuple(
                        jnp.where(outside, delta[a] / dist, n_in[a]) for a in range(3)
                    )
                    d_k = jnp.where(outside, sph_r[s] - dist, sph_r[s] + fmin)
                    d_k = jnp.where(sta > 0.5, d_k, -1e9)
                    surf = tuple(
                        jnp.where(outside, cl[a], dl[a] + n_loc[a] * fmin)
                        for a in range(3)
                    )
                    n_w = qrot(stq, n_loc)
                    x_w = v3add(stp, qrot(stq, surf))
                    best = jnp.max(d_k, axis=0)
                    oh = (d_k == best).astype(jnp.float32)
                    cnt = jnp.maximum(jnp.sum(oh, axis=0), 1.0)
                    sel = lambda comp: jnp.sum(comp * oh, axis=0) / cnt
                    take = best > best_d
                    best_d = jnp.where(take, best, best_d)
                    best_n = tuple(
                        jnp.where(take, sel(n_w[a]), best_n[a]) for a in range(3)
                    )
                    best_x = tuple(
                        jnp.where(take, sel(x_w[a]), best_x[a]) for a in range(3)
                    )

                if KT > 0:
                    # sphere vs KT mesh triangles: barycentric region walk
                    # (first-listed-condition-wins where chain), formulas
                    # shared with terrain/scene.sphere_triangle_depth
                    cb = (c[0][None], c[1][None], c[2][None])
                    abv = v3sub(tBv, tA)
                    acv = v3sub(tCv, tA)
                    apv = v3sub(cb, tA)
                    d1 = dot3(abv, apv)
                    d2 = dot3(acv, apv)
                    bpv = v3sub(cb, tBv)
                    d3 = dot3(abv, bpv)
                    d4 = dot3(acv, bpv)
                    cpv = v3sub(cb, tCv)
                    d5 = dot3(abv, cpv)
                    d6 = dot3(acv, cpv)
                    va = d3 * d6 - d5 * d4
                    vb = d5 * d2 - d1 * d6
                    vc = d1 * d4 - d3 * d2
                    teps = 1e-12
                    p_ab = v3add(tA, v3scale(abv, d1 / jnp.maximum(d1 - d3, teps)))
                    p_ac = v3add(tA, v3scale(acv, d2 / jnp.maximum(d2 - d6, teps)))
                    w_bc = (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), teps)
                    p_bc = v3add(tBv, v3scale(v3sub(tCv, tBv), w_bc))
                    denom = 1.0 / jnp.maximum(va + vb + vc, teps)
                    p_t = v3add(tA, v3add(v3scale(abv, vb * denom),
                                          v3scale(acv, vc * denom)))
                    tconds = [
                        ((d1 <= 0.0) & (d2 <= 0.0), tA),
                        ((d3 >= 0.0) & (d4 <= d3), tBv),
                        ((d6 >= 0.0) & (d5 <= d6), tCv),
                        ((vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0), p_ab),
                        ((vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0), p_ac),
                        ((va <= 0.0) & (d4 - d3 >= 0.0) & (d5 - d6 >= 0.0),
                         p_bc),
                    ]
                    for cond, cand in reversed(tconds):
                        p_t = tuple(jnp.where(cond, cand[a2], p_t[a2])
                                    for a2 in range(3))
                    delta = v3sub(cb, p_t)
                    dist = jnp.sqrt(dot3(delta, delta) + 1e-18)
                    fn_ = cross(abv, acv)
                    fmag = jax.lax.rsqrt(dot3(fn_, fn_) + 1e-24)
                    fside = jnp.where(dot3(apv, fn_) >= 0.0, 1.0, -1.0) * fmag
                    okn = dist > 1e-9
                    n_k = tuple(
                        jnp.where(okn, delta[a2] / jnp.maximum(dist, 1e-9),
                                  fside * fn_[a2])
                        for a2 in range(3)
                    )
                    d_k = sph_r[s] - dist
                    d_k = jnp.where(tACT > 0.5, d_k, -1e9)
                    tbest = jnp.max(d_k, axis=0)
                    oh = (d_k == tbest).astype(jnp.float32)
                    cnt = jnp.maximum(jnp.sum(oh, axis=0), 1.0)
                    sel = lambda comp: jnp.sum(comp * oh, axis=0) / cnt
                    take = tbest > best_d
                    best_d = jnp.where(take, tbest, best_d)
                    best_n = tuple(
                        jnp.where(take, sel(n_k[a2]), best_n[a2])
                        for a2 in range(3)
                    )
                    best_x = tuple(
                        jnp.where(take, sel(p_t[a2]), best_x[a2])
                        for a2 in range(3)
                    )

                if KB > 0 and not sph_no_bar[s]:
                    # sphere vs KB bar capsules (grabbing palms statically
                    # excluded — they wrap the bar, behavior B8)
                    cb = (c[0][None], c[1][None], c[2][None])
                    rel = v3sub(cb, bA)
                    abv = v3sub(bB, bA)
                    denom = jnp.maximum(dot3(abv, abv), 1e-12)
                    tpar = jnp.clip(dot3(rel, abv) / denom, 0.0, 1.0)
                    closest = v3add(bA, v3scale(abv, tpar))
                    delta = v3sub(cb, closest)
                    dist = jnp.sqrt(dot3(delta, delta) + 1e-18)
                    okn = dist > 1e-9
                    n_k = tuple(
                        jnp.where(okn, delta[a] / jnp.maximum(dist, 1e-9),
                                  1.0 if a == 2 else 0.0)
                        for a in range(3)
                    )
                    d_k = sph_r[s] + bR - dist
                    d_k = jnp.where(bACT > 0.5, d_k, -1e9)
                    x_k = tuple(
                        closest[a] + n_k[a] * bR for a in range(3)
                    )
                    bbest = jnp.max(d_k, axis=0)
                    oh = (d_k == bbest).astype(jnp.float32)
                    cnt = jnp.maximum(jnp.sum(oh, axis=0), 1.0)
                    sel = lambda comp: jnp.sum(comp * oh, axis=0) / cnt
                    take = bbest > best_d
                    best_d = jnp.where(take, bbest, best_d)
                    best_n = tuple(
                        jnp.where(take, sel(n_k[a]), best_n[a]) for a in range(3)
                    )
                    best_x = tuple(
                        jnp.where(take, sel(x_k[a]), best_x[a]) for a in range(3)
                    )

                depth.append(best_d)
                normal.append(best_n)
                cpoint.append(best_x)
            active = [(depth[s] > -margin).astype(jnp.float32) for s in range(ns)]

            def tangent_frame(n):
                """Duff ONB, componentized; constant-folds for the flat case."""
                if all(_isf(c) for c in n):   # flat ground: n = +z
                    return (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)
                nx, ny, nz = n
                sign = jnp.where(nz >= 0.0, 1.0, -1.0)
                a = -1.0 / (sign + nz)
                b = nx * ny * a
                t1 = (1.0 + sign * nx * nx * a, sign * b, -sign * nx)
                t2 = (b, sign + ny * ny * a, -ny)
                return t1, t2

            # ---------------- passive + applied joint torques
            tau_j = [
                add(tau_cur[j],
                    sub_(mul(-float(damping_c[j]), qdj[j]),
                         mul(float(stiffness_c[j]), sub_(qj[j], float(springref_c[j])))))
                for j in range(nj)
            ]

            # ---------------- Newton–Euler bias (q̈=0, base acc = −g)
            alpha = [(0.0, 0.0, 0.0)]
            acc = [(-gx, -gy, -gz_acc)]
            for i in range(1, nl):
                j = i - 1
                p = parent[i]
                r = v3sub(pos[i], pos[p])
                conv = v3add(acc[p], v3add(cross(alpha[p], r),
                                           cross(omega[p], cross(omega[p], r))))
                alpha.append(v3add(alpha[p], cross(omega[p], v3scale(ja[j], qdj[j]))))
                acc.append(conv)
            F = []
            Nt = []
            for l in range(nl):
                rc = v3sub(com_w[l], pos[l])
                a_com = v3add(acc[l], v3add(cross(alpha[l], rc),
                                            cross(omega[l], cross(omega[l], rc))))
                F.append(v3scale(a_com, mass_c[l]))
                Iw_a = tuple(dot3(Iw[l][i2], alpha[l]) for i2 in range(3))
                Iw_w = tuple(dot3(Iw[l][i2], omega[l]) for i2 in range(3))
                Nt.append(v3add(Iw_a, cross(omega[l], Iw_w)))
            facc = list(F)
            nacc = [v3add(Nt[l], cross(v3sub(com_w[l], pos[l]), F[l])) for l in range(nl)]
            for i in range(nl - 1, 0, -1):
                p = parent[i]
                facc[p] = v3add(facc[p], facc[i])
                nacc[p] = v3add(nacc[p], v3add(nacc[i], cross(v3sub(pos[i], pos[p]), facc[i])))
            bias = [None] * nv
            bias[0:3] = list(facc[0])
            bias[3:6] = list(nacc[0])
            for j in range(nj):
                bias[6 + j] = dot3(ja[j], nacc[j + 1])

            # With a reused factor (config.reuse_factor) the frame-start
            # L replaces this substep's CRBA + factorization entirely.
            if factor is None:
                # ---------------- CRBA: composites about the base origin O = bp
                # per-link 10-parameter composite: m, h = m·(com−O), I about O
                O = pos[0]
                comp_m = [mass_c[l] for l in range(nl)]
                comp_h = []
                comp_I = []
                for l in range(nl):
                    d = v3sub(com_w[l], O)
                    comp_h.append(v3scale(d, mass_c[l]))
                    dd = dot3(d, d)
                    Il = [[add(Iw[l][a][b],
                               mul(mass_c[l], sub_(mul(dd if a == b else 0.0, 1.0),
                                                   mul(d[a], d[b]))))
                           for b in range(3)] for a in range(3)]
                    comp_I.append(Il)
                for i in range(nl - 1, 0, -1):
                    p = parent[i]
                    comp_m[p] = add(comp_m[p], comp_m[i])
                    comp_h[p] = v3add(comp_h[p], comp_h[i])
                    comp_I[p] = [[add(comp_I[p][a][b], comp_I[i][a][b]) for b in range(3)]
                                 for a in range(3)]

                def momentum(mc, hc, Ic, w, v):
                    """Spatial momentum (L about O, p) of composite for motion (w, v@O)."""
                    L = tuple(add(dot3(Ic[a], w), cross(hc, v)[a]) for a in range(3))
                    P = tuple(add(v3scale(v, mc)[a], cross(w, hc)[a]) for a in range(3))
                    return L, P

                # joint motion axes about O
                S = []
                for j in range(nj):
                    S.append((ja[j], cross(ja[j], v3sub(O, jp[j]))))
                # F (momenta) for joints (their own composite) and base axes (total)
                Fj = []
                for j in range(nj):
                    l = j + 1
                    Fj.append(momentum(comp_m[l], comp_h[l], comp_I[l], S[j][0], S[j][1]))
                e = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]
                Fb = []
                for k in range(3):   # base linear axes: w=0, v=e_k
                    Fb.append(momentum(comp_m[0], comp_h[0], comp_I[0], (0.0, 0.0, 0.0), e[k]))
                for k in range(3):   # base angular axes: w=e_k, v=0
                    Fb.append(momentum(comp_m[0], comp_h[0], comp_I[0], e[k], (0.0, 0.0, 0.0)))

                def pair(Sa, Fb_):
                    Lb, Pb = Fb_
                    return add(dot3(Sa[0], Lb), dot3(Sa[1], Pb))

                M = {}
                base_S = [((0.0, 0.0, 0.0), e[k]) for k in range(3)] + [
                    (e[k], (0.0, 0.0, 0.0)) for k in range(3)
                ]
                for a in range(6):
                    for b2 in range(a, 6):
                        M[(b2, a)] = pair(base_S[a], Fb[b2])
                for j in range(nj):
                    col = 6 + j
                    M[(col, col)] = add(pair(S[j], Fj[j]), float(joint_diag[j]))
                    # ancestors of joint j (joints on path of link j+1) + base rows
                    for k in range(nj):
                        if k != j and anc[j + 1][k]:   # k is ancestor of j
                            lo, hi = (k, j) if k < j else (j, k)
                            M[(6 + hi, 6 + lo)] = pair(S[lo], Fj[hi])
                    for a in range(6):
                        M[(col, a)] = pair(base_S[a], Fj[j])

                def Mget(i2, j2):
                    if i2 < j2:
                        i2, j2 = j2, i2
                    return M.get((i2, j2), 0.0)

                # ---------------- Cholesky, column-vector form: L cols (nv,8,128)

                def col_of_M(j2):
                    vals = []
                    for i2 in range(nv):
                        v = Mget(i2, j2) if i2 >= j2 else 0.0
                        vals.append(jnp.broadcast_to(jnp.asarray(v, jnp.float32), SUB) if _isf(v) else v)
                    return jnp.stack(vals)          # (nv, 8, 128)

                Lc = []       # list of (nv, 8, 128) columns
                Ld_inv = []   # per-column reciprocal of the diagonal
                for j2 in range(nv):
                    s = col_of_M(j2)
                    for k in range(j2):
                        s = s - Lc[k] * Lc[k][j2][None]
                    dinv = jax.lax.rsqrt(jnp.maximum(s[j2], 1e-9))
                    Lc.append(s * dinv[None])
                    Ld_inv.append(dinv)
            else:
                Lc, Ld_inv = factor

            def fwd_subst(b_list):
                """Solve L y = b for b given as list of nv tiles → list."""
                y = []
                for i2 in range(nv):
                    s2 = b_list[i2]
                    if _isf(s2):
                        s2 = jnp.broadcast_to(jnp.asarray(s2, jnp.float32), SUB)
                    for k in range(i2):
                        s2 = s2 - Lc[k][i2] * y[k]
                    y.append(s2 * Ld_inv[i2])
                return y

            def bwd_subst(y):
                x = [None] * nv
                for i2 in range(nv - 1, -1, -1):
                    s2 = y[i2]
                    for k in range(i2 + 1, nv):
                        s2 = s2 - Lc[i2][k] * x[k]
                    x[i2] = s2 * Ld_inv[i2]
                return x

            # ---------------- free velocity
            rhs = [sub_(0.0, bias[0]), sub_(0.0, bias[1]), sub_(0.0, bias[2]),
                   sub_(0.0, bias[3]), sub_(0.0, bias[4]), sub_(0.0, bias[5])]
            for j in range(nj):
                rhs.append(sub_(tau_j[j], bias[6 + j]))
            qdd = bwd_subst(fwd_subst(rhs))
            v_free = [add(qd_s[i2], mul(dt, qdd[i2])) for i2 in range(nv)]

            # ---------------- constraint rows: [equality (ne) | contacts]
            def jac_cols(l, x):
                """Columns of the point Jacobian at world point ``x`` on
                link ``l``: one v3 per dof."""
                rel = v3sub(x, pos[0])
                e = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]
                cols = [e[0], e[1], e[2]]
                cols += [cross(e[k], rel) for k in range(3)]
                for j in range(nj):
                    if anc[l][j]:
                        cols.append(cross(ja[j], v3sub(x, jp[j])))
                    else:
                        cols.append((0.0, 0.0, 0.0))
                return cols

            def eq_target(err):
                return jnp.clip(-beta_dt * err, -maxpush, maxpush)

            Jrows = []      # nr rows, each a list of nv scalars
            targets = []
            act_rows = []
            mu_rows = []

            # permanent point-to-point rods (Cassie achilles, behavior B3)
            for (la, aa, lb, ab) in p2p_c:
                xa = v3add(pos[la], mat_vec(R[la], aa))
                xb = v3add(pos[lb], mat_vec(R[lb], ab))
                ca = jac_cols(la, xa)
                cb = jac_cols(lb, xb)
                for d in range(3):
                    Jrows.append([sub_(ca[c][d], cb[c][d]) for c in range(nv)])
                    targets.append(eq_target(sub_(xa[d], xb[d])))
                    act_rows.append(1.0)
                    mu_rows.append(0.0)

            # planar base lock (2D variants): y-translation, roll, yaw rates.
            # Drift error uses the sine surrogates 2(wx+yz), 2(wz+xy) — equal
            # to the angles to first order on the locked manifold (and Mosaic
            # has no atan2); ops/step.py uses the same surrogate.
            if planar:
                w_, x_, y_, z_ = quat[0]
                roll = 2.0 * (w_ * x_ + y_ * z_)
                yaw = 2.0 * (w_ * z_ + x_ * y_)
                for col_idx, err in ((1, pos[0][1]), (3, roll), (5, yaw)):
                    row = [0.0] * nv
                    row[col_idx] = 1.0
                    Jrows.append(row)
                    targets.append(eq_target(err))
                    act_rows.append(1.0)
                    mu_rows.append(0.0)

            # maskable world-anchor grabs (monkey, behavior B8)
            for g, (lg, ag) in enumerate(grab_c):
                xg = v3add(pos[lg], mat_vec(R[lg], ag))
                cg = jac_cols(lg, xg)
                for d in range(3):
                    Jrows.append([cg[c][d] for c in range(nv)])
                    targets.append(eq_target(sub_(xg[d], g_tgt[g][d])))
                    act_rows.append(g_act[g])
                    mu_rows.append(0.0)

            # joint-limit rows: unilateral toward the nearer bound, mirroring
            # ops/step.py (row layout [equality | limits | contacts])
            # split_impulse: push-out bias per row, kept OUT of the velocity
            # targets and solved separately in the position pass below.
            # Python-0.0 for rows the position pass never visits
            # (equality, friction) — the visit list is static.
            bias_rows = [0.0] * len(targets)

            for j in lim_idx:
                d_lo = qj[j] - float(lim_lo[j])
                d_hi = float(lim_hi[j]) - qj[j]
                sgn = jnp.where(d_lo <= d_hi, 1.0, -1.0)
                gap = jnp.minimum(d_lo, d_hi)
                row = [0.0] * nv
                row[6 + j] = sgn
                Jrows.append(row)
                viol = -gap
                b_l = jnp.minimum(
                    beta_dt * jnp.maximum(viol - lim_slop, 0.0), maxpush
                )
                targets.append(
                    (0.0 if split else b_l) - jnp.maximum(-viol, 0.0) / dt
                )
                bias_rows.append(b_l)
                act_rows.append((gap < lim_margin).astype(jnp.float32))
                mu_rows.append(0.0)

            for s in range(ns):
                cols = jac_cols(sph_link[s], cpoint[s])
                t1, t2 = tangent_frame(normal[s])
                Jrows.append([dot3(normal[s], cols[c]) for c in range(nv)])
                Jrows.append([dot3(t1, cols[c]) for c in range(nv)])
                Jrows.append([dot3(t2, cols[c]) for c in range(nv)])
                b_n = jnp.minimum(
                    beta_dt * jnp.maximum(depth[s] - slop, 0.0), maxpush
                )
                push = (0.0 if split else b_n) \
                    - jnp.maximum(-depth[s], 0.0) / dt
                targets += [push, 0.0, 0.0]
                bias_rows += [b_n, 0.0, 0.0]
                act_rows += [active[s]] * 3
                mu_rows += [fric] * 3

            # ---------------- W = L⁻¹ Jᵀ, built PER ROW with structural-zero
            # folding. J is sparse by construction — each of the nlim limit
            # rows has ONE nonzero (column 6+j), planar rows one, and contact
            # rows zero out every non-ancestor joint — and L⁻¹ is lower
            # triangular, so w_r[i] is exactly zero for all i before row r's
            # first nonzero column. Keeping those zeros as python floats lets
            # the `_z`-aware helpers skip them through the substitution AND
            # through every PGS sweep below. For the walker (nv=27, 21 limit
            # rows) this removes ~Σ(6+j)² ≈ 6k of the ~7.6k tile-FMAs the
            # limit rows' share of a dense (nv·nr·nv/2) column build costs,
            # plus ~(6+j) terms per limit row per sweep — measured round 3:
            # [see BENCH.md round-3 kernel table].
            Wrow = []    # Wrow[r][i2]: tile or exact-0.0 float
            for r in range(nr):
                y = []
                for i2 in range(nv):
                    s2 = Jrows[r][i2]
                    for k in range(i2):
                        s2 = sub_(s2, mul(Lc[k][i2], y[k]))
                    y.append(mul(s2, Ld_inv[i2]))
                Wrow.append(y)

            # c = J v_free − target
            cvec = []
            for r in range(nr):
                s2 = 0.0
                for c2 in range(nv):
                    s2 = madd(s2, Jrows[r][c2], v_free[c2])
                s2 = sub_(s2, targets[r])
                cvec.append(s2 if not _isf(s2) else jnp.broadcast_to(jnp.asarray(s2, jnp.float32), SUB))

            def _tile(v):
                return (
                    jnp.broadcast_to(jnp.asarray(v, jnp.float32), SUB)
                    if _isf(v) else v
                )

            # warm start (config.warm_start): seed λ from the previous
            # substep, masked by this substep's row activity — mirrors
            # ops/solver.pgs_solve's lam0 handling exactly
            lam_ws = None
            if warm and lam_in is not None:
                lam_ws = [_tile(mul(act_rows[r], lam_in[r])) for r in range(nr)]

            if matfree:
                # ------------ matrix-free PGS (config.matfree_pgs): never
                # form A = WᵀW. Carry λ as nr per-row tiles (python-list
                # "scatter" — zero vector ops) and z = W·λ as nv tiles; each
                # row residual on demand: c_r + W_rᵀz + cfm·λ_r. Identical
                # iteration to the A-form below, ~nv/nr² less setup work.
                def wdot(r1, r2):
                    s2 = 0.0
                    for i2 in range(nv):
                        s2 = madd(s2, Wrow[r1][i2], Wrow[r2][i2])
                    return s2

                diag = [jnp.maximum(_tile(wdot(r, r) + cfm), 1e-9) for r in range(nr)]
                if block_pgs and ns:
                    finv = []
                    for s in range(ns):
                        t1r = ne + nlim + 3 * s + 1
                        t2r = t1r + 1
                        a11 = jnp.maximum(wdot(t1r, t1r) + cfm, 1e-9)
                        a22 = jnp.maximum(wdot(t2r, t2r) + cfm, 1e-9)
                        a12 = wdot(t1r, t2r)
                        det = jnp.maximum(a11 * a22 - a12 * a12, 1e-12)
                        finv.append((a22 / det, a11 / det, -a12 / det))

                def sweep_mf(_, carry):
                    lam_t, z_t = carry
                    lam = list(lam_t)
                    z = list(z_t)

                    def row_res(r):
                        s2 = cvec[r] + cfm * lam[r]
                        for i2 in range(nv):
                            s2 = madd(s2, Wrow[r][i2], z[i2])
                        return s2

                    def apply(r, new):
                        d = new - lam[r]
                        lam[r] = new
                        for i2 in range(nv):
                            if not _z(Wrow[r][i2]):
                                z[i2] = z[i2] + Wrow[r][i2] * d

                    for r in range(ne):
                        apply(r, (lam[r] - row_res(r) / diag[r]) * act_rows[r])
                    for r in range(ne, ne + nlim):
                        apply(r, jnp.maximum(0.0, lam[r] - row_res(r) / diag[r])
                              * act_rows[r])
                    for s in range(ns):
                        b0 = ne + nlim + 3 * s
                        apply(b0, jnp.maximum(0.0, lam[b0] - row_res(b0) / diag[b0])
                              * act_rows[b0])
                        bound = mu_rows[b0] * lam[b0]
                        if block_pgs:
                            i11, i22, i12 = finv[s]
                            r1 = row_res(b0 + 1)
                            r2 = row_res(b0 + 2)
                            d1 = -(i11 * r1 + i12 * r2)
                            d2 = -(i12 * r1 + i22 * r2)
                            n1 = jnp.clip(lam[b0 + 1] + d1, -bound, bound) \
                                * act_rows[b0 + 1]
                            n2 = jnp.clip(lam[b0 + 2] + d2, -bound, bound) \
                                * act_rows[b0 + 2]
                            e1 = n1 - lam[b0 + 1]
                            e2 = n2 - lam[b0 + 2]
                            lam[b0 + 1] = n1
                            lam[b0 + 2] = n2
                            for i2 in range(nv):
                                upd = madd(mul(Wrow[b0 + 1][i2], e1),
                                           Wrow[b0 + 2][i2], e2)
                                if not _z(upd):
                                    z[i2] = z[i2] + upd
                        else:
                            for t in (b0 + 1, b0 + 2):
                                apply(t, jnp.clip(lam[t] - row_res(t) / diag[t],
                                                  -bound, bound) * act_rows[t])
                    return tuple(lam), tuple(z)

                zt_mf = jnp.zeros(SUB, dtype=jnp.float32)
                if lam_ws is not None:
                    z_ws = []
                    for i2 in range(nv):
                        s2 = 0.0
                        for r in range(nr):
                            s2 = madd(s2, Wrow[r][i2], lam_ws[r])
                        z_ws.append(_tile(s2))
                    init_mf = (tuple(lam_ws), tuple(z_ws))
                else:
                    init_mf = ((zt_mf,) * nr, (zt_mf,) * nv)
                lam_t, z_t = jax.lax.fori_loop(0, iters, sweep_mf, init_mf)
                lam_rows = list(lam_t)
                # z IS W·λ — the velocity update's contraction comes free
                u = list(z_t)
                dv = bwd_subst(u)

                dvp = None
                if split:
                    # position pass (split impulse): pseudo-impulses against
                    # the push-out bias alone, visiting ONLY the unilateral
                    # rows (limits + contact normals) — the static visit
                    # list keeps the sweep at ~(nlim+ns)/nr of the velocity
                    # sweep's cost. Residual at λ=0 is −bias; z carries W·λ.
                    pos_rows = list(range(ne, ne + nlim)) + [
                        ne + nlim + 3 * s for s in range(ns)
                    ]

                    def sweep_pos(_, carry):
                        lam_t2, z_t2 = carry
                        lamp = list(lam_t2)
                        zp = list(z_t2)
                        for k2, r in enumerate(pos_rows):
                            s2 = cfm * lamp[k2] - bias_rows[r]
                            for i2 in range(nv):
                                s2 = madd(s2, Wrow[r][i2], zp[i2])
                            new = jnp.maximum(
                                0.0, lamp[k2] - s2 / diag[r]
                            ) * act_rows[r]
                            d = new - lamp[k2]
                            lamp[k2] = new
                            for i2 in range(nv):
                                if not _z(Wrow[r][i2]):
                                    zp[i2] = zp[i2] + Wrow[r][i2] * d
                        return tuple(lamp), tuple(zp)

                    zt_p = jnp.zeros(SUB, dtype=jnp.float32)
                    _, z_pt = jax.lax.fori_loop(
                        0, iters, sweep_pos,
                        ((zt_p,) * len(pos_rows), (zt_p,) * nv),
                    )
                    dvp = bwd_subst(list(z_pt))
            else:
                # the A-form path wants W dense: materialize the per-row
                # build as nv stacked (nr, 8, 128) blocks
                W = [
                    jnp.stack([_tile(Wrow[r][i2]) for r in range(nr)])
                    for i2 in range(nv)
                ]
                resid0 = jnp.stack(cvec)                      # (nr, 8, 128)

                # A = WᵀW + cfm I : (nr, nr, 8, 128)
                A = W[0][:, None] * W[0][None, :]
                for i2 in range(1, nv):
                    A = A + W[i2][:, None] * W[i2][None, :]
                # cfm regularization on the diagonal via iota (no array consts)
                ri = jax.lax.broadcasted_iota(jnp.int32, (nr, nr, 1, 1), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (nr, nr, 1, 1), 1)
                A = A + cfm * (ri == ci).astype(jnp.float32)

                # ---------------- PGS sweeps (fori over iterations)
                diag = jnp.maximum(jnp.stack([A[r, r] for r in range(nr)]), 1e-9)
                # one-hot row selectors — Mosaic has no scatter, so row updates
                # are arithmetic: lam += onehot_r · Δ. Built in-kernel via iota
                # (Pallas kernels cannot capture array constants).
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (nr, 1, 1), 0)
                onehot = [(row_ids == r).astype(jnp.float32) for r in range(nr)]

                if block_pgs and ns:
                    # per-contact 2×2 friction-block inverses, precomputed once
                    # (A is constant across sweeps) — mirrors ops/solver.pgs_solve
                    # block mode exactly
                    finv = []
                    for s in range(ns):
                        t1r = ne + nlim + 3 * s + 1
                        t2r = t1r + 1
                        a11 = jnp.maximum(A[t1r, t1r], 1e-9)
                        a22 = jnp.maximum(A[t2r, t2r], 1e-9)
                        a12 = A[t1r, t2r]
                        det = jnp.maximum(a11 * a22 - a12 * a12, 1e-12)
                        finv.append((a22 / det, a11 / det, -a12 / det))

                def sweep(_, carry):
                    lam, resid = carry

                    def row_update(lam, resid, r, new):
                        d = new - lam[r]
                        lam = lam + onehot[r] * d[None]
                        resid = resid + A[:, r] * d[None]
                        return lam, resid

                    # equality rows: unbounded impulses, activity-masked
                    for r in range(ne):
                        new = (lam[r] - resid[r] / diag[r]) * act_rows[r]
                        lam, resid = row_update(lam, resid, r, new)
                    # joint-limit rows: unilateral (λ ≥ 0)
                    for r in range(ne, ne + nlim):
                        new = jnp.maximum(0.0, lam[r] - resid[r] / diag[r]) * act_rows[r]
                        lam, resid = row_update(lam, resid, r, new)
                    for s in range(ns):
                        b0 = ne + nlim + 3 * s
                        new = jnp.maximum(0.0, lam[b0] - resid[b0] / diag[b0]) * act_rows[b0]
                        lam, resid = row_update(lam, resid, b0, new)
                        bound = mu_rows[b0] * lam[b0]
                        if block_pgs:
                            # coupled 2×2 friction solve, then box clamp
                            i11, i22, i12 = finv[s]
                            d1 = -(i11 * resid[b0 + 1] + i12 * resid[b0 + 2])
                            d2 = -(i12 * resid[b0 + 1] + i22 * resid[b0 + 2])
                            n1 = jnp.clip(lam[b0 + 1] + d1, -bound, bound) * act_rows[b0 + 1]
                            n2 = jnp.clip(lam[b0 + 2] + d2, -bound, bound) * act_rows[b0 + 2]
                            e1 = n1 - lam[b0 + 1]
                            e2 = n2 - lam[b0 + 2]
                            lam = lam + onehot[b0 + 1] * e1[None] + onehot[b0 + 2] * e2[None]
                            resid = resid + A[:, b0 + 1] * e1[None] + A[:, b0 + 2] * e2[None]
                        else:
                            for t in (b0 + 1, b0 + 2):
                                new = jnp.clip(lam[t] - resid[t] / diag[t], -bound, bound) * act_rows[t]
                                lam, resid = row_update(lam, resid, t, new)
                    return lam, resid

                if lam_ws is not None:
                    lam0 = jnp.stack(lam_ws)
                    for r in range(nr):
                        resid0 = resid0 + A[:, r] * lam_ws[r][None]
                else:
                    lam0 = jnp.zeros((nr,) + SUB, dtype=jnp.float32)
                lam, _ = jax.lax.fori_loop(0, iters, sweep, (lam0, resid0))
                lam_rows = [lam[r] for r in range(nr)]

                # ---------------- velocity update: qd' = v_free + L⁻ᵀ(Wλ)
                u = [jnp.sum(W[i2] * lam, axis=0) for i2 in range(nv)]
                dv = bwd_subst(u)

                dvp = None
                if split:
                    # position pass, A-form: reuse A/diag/onehot; residual
                    # starts at −bias, unilateral rows only (see matfree
                    # branch for the rationale)
                    pos_rows = list(range(ne, ne + nlim)) + [
                        ne + nlim + 3 * s for s in range(ns)
                    ]
                    residp0 = jnp.stack([
                        jnp.zeros(SUB, jnp.float32) if _isf(bias_rows[r])
                        else -bias_rows[r]
                        for r in range(nr)
                    ])

                    def sweep_p(_, carry):
                        lamp, residp = carry
                        for r in pos_rows:
                            new = jnp.maximum(
                                0.0, lamp[r] - residp[r] / diag[r]
                            ) * act_rows[r]
                            d = new - lamp[r]
                            lamp = lamp + onehot[r] * d[None]
                            residp = residp + A[:, r] * d[None]
                        return lamp, residp

                    lamp, _ = jax.lax.fori_loop(
                        0, iters, sweep_p,
                        (jnp.zeros((nr,) + SUB, jnp.float32), residp0),
                    )
                    up = [jnp.sum(W[i2] * lamp, axis=0) for i2 in range(nv)]
                    dvp = bwd_subst(up)
            # velocity hard cap — must mirror ops/integrate.MAX_VEL
            qd_n = [jnp.clip(add(v_free[i2], dv[i2]), -100.0, 100.0) for i2 in range(nv)]
            # split-impulse pseudo-velocity: advances POSITIONS only below,
            # never enters qd_out (ops/integrate.integrate qd_pos channel)
            qd_i = qd_n if dvp is None else [
                add(qd_n[i2], dvp[i2]) for i2 in range(nv)
            ]

            # ---------------- integrate + joint limits
            bp_n = [add(bp[k], mul(dt, qd_i[k])) for k in range(3)]
            wmag = 0.5 * dt
            hx, hy, hz = mul(qd_i[3], wmag), mul(qd_i[4], wmag), mul(qd_i[5], wmag)
            theta = jnp.sqrt(hx * hx + hy * hy + hz * hz + 1e-24)
            sc = jnp.sin(theta) / theta
            dq = (jnp.cos(theta), hx * sc, hy * sc, hz * sc)
            bq_n = qmul(dq, tuple(bq))
            qn2 = jax.lax.rsqrt(
                bq_n[0] * bq_n[0] + bq_n[1] * bq_n[1] + bq_n[2] * bq_n[2] + bq_n[3] * bq_n[3]
            )
            bq_n = tuple(mul(c, qn2) for c in bq_n)
            # joint-limit BACKSTOP beyond the solver rows (mirrors
            # ops/integrate._limit_backstop): clamp past the slop band and
            # zero only the outward velocity component.
            qj_n = []
            qdj_n = []
            for j in range(nj):
                raw = add(qj[j], mul(dt, qd_i[6 + j]))
                lo_b = float(lim_lo[j]) - lim_slop
                hi_b = float(lim_hi[j]) + lim_slop
                cl = jnp.clip(raw, lo_b, hi_b)
                v = qd_n[6 + j]
                v = jnp.where((raw > hi_b) & (v > 0.0), 0.0, v)
                v = jnp.where((raw < lo_b) & (v < 0.0), 0.0, v)
                qj_n.append(cl)
                qdj_n.append(v)
            q_out = list(bp_n) + list(bq_n) + qj_n
            qd_out = [qd_n[k] for k in range(6)] + qdj_n
            nimp = [lam_rows[ne + nlim + 3 * s] for s in range(ns)]
            return q_out, qd_out, depth, nimp, (Lc, Ld_inv), tuple(lam_rows)

        q_s = [q_ref[c] for c in range(nq)]
        qd_s = [qd_ref[c] for c in range(nv)]

        def tau_of(q_c):
            if not pd_mode:
                return tau_in  # raw torques, constant over the control step
            # PD proportional term at the llc rate (B3); derivative term is
            # the implicitly-integrated extra_damping
            return [
                mul(float(act_c[j] * kp_c[j]), sub_(tau_in[j], q_c[7 + j]))
                for j in range(nj)
            ]

        reuse = bool(config.reuse_factor) and n_sub > 1
        if n_llc == 1 and n_sub == 1:
            q_s, qd_s, depth, nimp, _f, _l = one_substep(q_s, qd_s, tau_of(q_s))
        else:
            # nested fori loops: llc frames (tau refresh) × substeps —
            # kernel body traced ONCE per loop level (twice with reuse: the
            # frame's first substep factorizes, the fori'd rest reuse).
            # With warm_start the impulse vector λ rides the carry (tuple of
            # nr tiles), seeding each substep from the previous one — zeros
            # at the control step's first substep, like the oracle.
            zt = jnp.zeros(SUB, dtype=jnp.float32)

            def llc_body(_, carry):
                if warm:
                    q_c, qd_c, _d, _n, lam_c = carry
                else:
                    q_c, qd_c, _d, _n = carry
                    lam_c = None
                tau_cur = tau_of(list(q_c))

                if reuse:
                    q1, qd1, d1, n1, fac, l1 = one_substep(
                        list(q_c), list(qd_c), tau_cur, lam_in=lam_c
                    )

                    def sub_body_r(_, c2):
                        if warm:
                            q2, qd2, _d2, _n2, l2 = c2
                        else:
                            q2, qd2, _d2, _n2 = c2
                            l2 = None
                        q_n, qd_n, d_n, n_n, _f2, l_n = one_substep(
                            list(q2), list(qd2), tau_cur, factor=fac, lam_in=l2
                        )
                        out = (tuple(q_n), tuple(qd_n), tuple(d_n), tuple(n_n))
                        return out + ((l_n,) if warm else ())

                    init_r = (tuple(q1), tuple(qd1), tuple(d1), tuple(n1))
                    if warm:
                        init_r = init_r + (l1,)
                    return jax.lax.fori_loop(0, n_sub - 1, sub_body_r, init_r)

                def sub_body(_, c2):
                    if warm:
                        q2, qd2, _d2, _n2, l2 = c2
                    else:
                        q2, qd2, _d2, _n2 = c2
                        l2 = None
                    q_n, qd_n, d_n, n_n, _f2, l_n = one_substep(
                        list(q2), list(qd2), tau_cur, lam_in=l2
                    )
                    out = (tuple(q_n), tuple(qd_n), tuple(d_n), tuple(n_n))
                    return out + ((l_n,) if warm else ())

                init_s = (q_c, qd_c, _d, _n)
                if warm:
                    init_s = init_s + (carry[4],)
                return jax.lax.fori_loop(0, n_sub, sub_body, init_s)

            init = (tuple(q_s), tuple(qd_s), (zt,) * ns, (zt,) * ns)
            if warm:
                init = init + ((zt,) * nr,)
                q_s, qd_s, depth, nimp, _lam = jax.lax.fori_loop(
                    0, n_llc, llc_body, init
                )
            else:
                q_s, qd_s, depth, nimp = jax.lax.fori_loop(0, n_llc, llc_body, init)

        for c in range(nq):
            qo_ref[c] = q_s[c]
        for c in range(nv):
            qdo_ref[c] = qd_s[c]
        for s in range(ns):
            depth_ref[s] = depth[s]
            nimp_ref[s] = nimp[s]

    # ------------------------------------------------------------ host side
    def reshape_in(x, C):
        # (B, C) → (C, B/128, 128)
        B = x.shape[0]
        return x.T.reshape(C, B // 128, 128)

    def reshape_out(x, C):
        B = x.shape[1] * x.shape[2]
        return x.reshape(C, B).T

    @jax.jit
    def substep_batched(q, qd, tau, ground_z, friction, *extra):
        B = q.shape[0]
        if B % TILE != 0:
            raise ValueError(f"batch {B} must be a multiple of {TILE}")
        grid = (B // TILE,)

        def spec(C):
            return pl.BlockSpec(
                (C,) + SUB, lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )

        in_specs = [spec(nq), spec(nv), spec(nj), spec(1), spec(1)]
        inputs = [
            reshape_in(q, nq),
            reshape_in(qd, nv),
            reshape_in(tau, nj),
            reshape_in(ground_z[:, None], 1),
            reshape_in(friction[:, None], 1),
        ]
        ei = 0
        if K > 0:
            stone_pos, stone_quat, stone_half, stone_active = extra[0:4]
            ei = 4
            packed = jnp.concatenate(
                [stone_pos, stone_quat, stone_half, stone_active[:, :, None]],
                axis=2,
            )                                  # (B, K, 11)
            inputs.append(reshape_in(packed.reshape(B, K * 11), K * 11))
            in_specs.append(spec(K * 11))
        if PHF > 0:
            patch, hf_x0, hf_y0, hf_cell = extra[ei:ei + 4]
            ei += 4
            packed_h = jnp.concatenate(
                [
                    patch.reshape(B, PHF * PHF),
                    hf_x0[:, None], hf_y0[:, None], hf_cell[:, None],
                ],
                axis=1,
            )                                  # (B, P·P + 3)
            inputs.append(reshape_in(packed_h, PHF * PHF + 3))
            in_specs.append(spec(PHF * PHF + 3))
        if KT > 0:
            tri_a, tri_b, tri_c, tri_active = extra[ei:ei + 4]
            ei += 4
            packed_t = jnp.concatenate(
                [tri_a, tri_b, tri_c, tri_active[:, :, None]], axis=2
            )                                  # (B, Kt, 10)
            inputs.append(reshape_in(packed_t.reshape(B, KT * 10), KT * 10))
            in_specs.append(spec(KT * 10))
        if KB > 0:
            bar_a, bar_b, bar_r, bar_active = extra[ei:ei + 4]
            ei += 4
            packed_b = jnp.concatenate(
                [bar_a, bar_b, bar_r[:, :, None], bar_active[:, :, None]],
                axis=2,
            )                                  # (B, Kb, 8)
            inputs.append(reshape_in(packed_b.reshape(B, KB * 8), KB * 8))
            in_specs.append(spec(KB * 8))
        if ng > 0:
            g_active, g_target = extra[ei:ei + 2]
            packed_g = jnp.concatenate(
                [g_active[:, :, None], g_target], axis=2
            )                                  # (B, ng, 4)
            inputs.append(reshape_in(packed_g.reshape(B, ng * 4), ng * 4))
            in_specs.append(spec(ng * 4))

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[spec(nq), spec(nv), spec(ns), spec(ns)],
            out_shape=[
                jax.ShapeDtypeStruct((nq, B // 128, 128), jnp.float32),
                jax.ShapeDtypeStruct((nv, B // 128, 128), jnp.float32),
                jax.ShapeDtypeStruct((ns, B // 128, 128), jnp.float32),
                jax.ShapeDtypeStruct((ns, B // 128, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=dimsem,
            ),
            interpret=interpret,
        )(*inputs)
        qo, qdo, depth, nimp = out
        return (
            reshape_out(qo, nq),
            reshape_out(qdo, nv),
            reshape_out(depth, ns),
            reshape_out(nimp, ns),
        )

    return substep_batched
