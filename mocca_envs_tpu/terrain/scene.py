"""Scene: the static world the robot collides with, as dynamic pytree data.

TPU-native replacement for the reference's scene objects
(``mocca_envs/bullet_objects.py``: ``Plank``/``Pillar``/``LargePlank``/
``HeightField``/``MonkeyBar`` and ``bullet_utils.py::StadiumScene`` ground
plane — SURVEY.md §2.1 C7/C8). In Bullet these are separate collision bodies
repositioned by ``resetBasePositionAndOrientation``; here the whole scene is
ONE pytree of arrays that lives in env state, so stone layouts vary per env
slot in a vmapped batch, and the curriculum regenerates them at reset with no
recompilation (SURVEY.md §3.5).

Feature switches (``has_*``) are static fields: an env family compiled for
flat ground contains zero box-narrowphase code, a stepper env contains no
heightfield sampling, etc.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mocca_envs_tpu.core import quat as quat_ops


class Scene(struct.PyTreeNode):
    # static switches — select compiled collision paths per env family
    has_ground: bool = struct.field(pytree_node=False, default=True)
    has_stones: bool = struct.field(pytree_node=False, default=False)
    has_hf: bool = struct.field(pytree_node=False, default=False)
    has_bars: bool = struct.field(pytree_node=False, default=False)

    # infinite ground plane z = ground_z
    ground_z: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros(()))

    # oriented stone boxes (stepping stones: Plank/Pillar tops)
    stone_pos: jnp.ndarray | None = None     # (K, 3) box centers
    stone_quat: jnp.ndarray | None = None    # (K, 4) wxyz
    stone_half: jnp.ndarray | None = None    # (K, 3) half extents
    stone_active: jnp.ndarray | None = None  # (K,) 1.0 = solid

    # heightfield grid (uneven terrain)
    hf_height: jnp.ndarray | None = None     # (H, W)
    hf_xy0: jnp.ndarray | None = None        # (2,) world xy of grid[0, 0]
    hf_cell: jnp.ndarray | None = None       # () cell size [m]

    # bar capsules (MonkeyBar handholds — reference bullet_objects.MonkeyBar)
    bar_a: jnp.ndarray | None = None         # (Kb, 3) segment start
    bar_b: jnp.ndarray | None = None         # (Kb, 3) segment end
    bar_r: jnp.ndarray | None = None         # (Kb,) capsule radius
    bar_active: jnp.ndarray | None = None    # (Kb,) 1.0 = solid

    # static triangle mesh (pybullet createCollisionShape(GEOM_MESH) /
    # loadURDF <mesh> world geometry — SURVEY.md §2.3): per-face world-space
    # vertices. Narrowphase is sphere-vs-triangle closest point, culled to
    # EngineConfig.tri_window faces around the root like stones.
    tri_a: jnp.ndarray | None = None         # (Kt, 3) vertex 0 per face
    tri_b: jnp.ndarray | None = None         # (Kt, 3) vertex 1
    tri_c: jnp.ndarray | None = None         # (Kt, 3) vertex 2
    tri_active: jnp.ndarray | None = None    # (Kt,) 1.0 = solid

    friction: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.8))

    @property
    def has_tris(self) -> bool:
        return self.tri_a is not None


def flat(ground_z: float = 0.0, friction: float = 0.8) -> Scene:
    """Flat infinite plane — the StadiumScene analog (SURVEY.md C8)."""
    return Scene(
        has_ground=True,
        ground_z=jnp.asarray(ground_z, dtype=jnp.float32),
        friction=jnp.asarray(friction, dtype=jnp.float32),
    )


def with_stones(
    stone_pos: jnp.ndarray,
    stone_quat: jnp.ndarray,
    stone_half: jnp.ndarray,
    stone_active: jnp.ndarray | None = None,
    ground_z: float = -1e3,
    friction: float = 0.8,
) -> Scene:
    """Stepping-stone world: union of oriented boxes, ground far below.

    The deep ground plane stands in for "falling between stones ends the
    episode" (reference ``Walker3DStepperEnv`` termination, behavior B7).
    """
    K = stone_pos.shape[0]
    if stone_active is None:
        stone_active = jnp.ones((K,), dtype=stone_pos.dtype)
    return Scene(
        has_ground=True,
        has_stones=True,
        ground_z=jnp.asarray(ground_z, dtype=jnp.float32),
        stone_pos=stone_pos,
        stone_quat=stone_quat,
        stone_half=stone_half,
        stone_active=stone_active,
        friction=jnp.asarray(friction, dtype=jnp.float32),
    )


def cull_stones(scene: Scene, root_xy: jnp.ndarray, window: int) -> Scene:
    """Narrowphase only the ``window`` stones nearest the robot root.

    One env (vmap for a batch). Selection score is xy center distance minus
    the stone's bounding radius (‖half‖ — conservative for any orientation);
    inactive stones rank last. Re-selected once per control step: the root
    moves ~cm per step against a multi-meter window margin, and top_k over
    K≈20 is noise next to the 4-substep kernel it shrinks. EXACT whenever
    every stone within contact range of any collision sphere ranks inside
    the window (robot reach ≈1.2 m; at the tightest stage-0 spacing ≤3
    stones can be near touch range at once — gated by
    tests/test_stepper.py::test_stone_culling_exact).

    Replaces the reference's Bullet broadphase for stone scenes
    (``env_locomotion.py::Walker3DStepperEnv`` scene boxes, SURVEY.md §2.3
    createCollisionShape row) with a shape-static top_k — no tree, no
    dynamic contact counts.
    """
    if not scene.has_stones or window <= 0:
        return scene
    K = scene.stone_pos.shape[-2]
    if window >= K:
        return scene
    d = jnp.linalg.norm(scene.stone_pos[:, :2] - root_xy[None, :], axis=-1)
    score = d - jnp.linalg.norm(scene.stone_half, axis=-1)
    score = jnp.where(scene.stone_active > 0.5, score, 1e9)
    _, idx = jax.lax.top_k(-score, window)
    # select via ONE-HOT contraction, not stone_pos[idx]: a vmapped gather
    # scalarizes on TPU (measured round 3a: gather-culled stepper 2.54M vs
    # 4.08M unculled env-steps/s) while (W,K)@(K,11) rides the MXU
    onehot = (idx[:, None] == jnp.arange(K)[None, :]).astype(
        scene.stone_pos.dtype
    )
    data = jnp.concatenate(
        [scene.stone_pos, scene.stone_quat, scene.stone_half,
         scene.stone_active[:, None]],
        axis=1,
    )                                        # (K, 11)
    sel = jax.lax.dot(onehot, data, precision=jax.lax.Precision.HIGHEST)
    return scene.replace(
        stone_pos=sel[:, 0:3],
        stone_quat=sel[:, 3:7],
        stone_half=sel[:, 7:10],
        stone_active=sel[:, 10],
    )


def hf_corners(scene: Scene, xy: jnp.ndarray):
    """Bilinear cell lookup at world ``xy`` (…, 2): the 4 corner heights and
    the in-cell fractions ``(h00, h10, h01, h11, fu, fv)``; clamped at
    borders. Shared by sampling and the analytic gradient so the JAX path
    and the fused Pallas kernel (ops/pallas/engine.py, which evaluates the
    SAME formulas over an extracted local patch) agree bit-for-bit."""
    H, W = scene.hf_height.shape
    uv = (xy - scene.hf_xy0) / scene.hf_cell
    u = jnp.clip(uv[..., 0], 0.0, H - 1.001)
    v = jnp.clip(uv[..., 1], 0.0, W - 1.001)
    i0 = jnp.floor(u).astype(jnp.int32)
    j0 = jnp.floor(v).astype(jnp.int32)
    fu = u - i0
    fv = v - j0
    h00 = scene.hf_height[i0, j0]
    h10 = scene.hf_height[i0 + 1, j0]
    h01 = scene.hf_height[i0, j0 + 1]
    h11 = scene.hf_height[i0 + 1, j0 + 1]
    return h00, h10, h01, h11, fu, fv


def extract_patch(scene: Scene, xy: jnp.ndarray, P: int) -> Scene:
    """``P×P`` local heightfield window around world ``xy``, as a Scene.

    The shared hot-path primitive behind the fused kernel's terrain
    narrowphase AND the terrain env's obs probes: extract once per control
    step, then every bilinear sample contracts against ``P×P`` instead of
    the full grid (65² → 16²). Selection is a one-hot row/col contraction —
    NOT a dynamic_slice, which under vmap lowers to per-env gathers that
    Mosaic/XLA-TPU implement as scalar loops (measured 21× slower,
    round 2n). One-hot selection is EXACT (each output element has a single
    nonzero product); DEFAULT matmul precision is used deliberately: on TPU
    its bf16 passes round the heights by ≤3.9 mm on ±0.25 m terrain
    (measured, round 2i) — far under the 2 cm contact margin — and cost
    0.21 vs HIGHEST's 0.30 µs/env at B=4096.

    Window-border clamping coincides with full-grid border clamping for any
    query within the patch margin (the patch is pinned to the grid edge
    exactly when the root is near it), so samples of the patch equal samples
    of the full grid for points within ``(P/2 − 2)·cell`` of ``xy`` (the
    window is anchored at ``floor(center) − P/2``; when the center's
    fractional cell coordinate approaches 1 the high side keeps only
    ``P/2 − 2`` whole cells).
    Grids not larger than a patch pass through unchanged (identity window).
    """
    H, W = scene.hf_height.shape
    if H <= P and W <= P:
        return scene
    hf = scene.hf_height
    uv = (xy - scene.hf_xy0) / scene.hf_cell
    si = jnp.clip(jnp.floor(uv[0]).astype(jnp.int32) - P // 2, 0, H - P)
    sj = jnp.clip(jnp.floor(uv[1]).astype(jnp.int32) - P // 2, 0, W - P)
    rows = (
        (si + jnp.arange(P))[:, None] == jnp.arange(H)[None, :]
    ).astype(hf.dtype)                                         # (P, H)
    cols = (
        (sj + jnp.arange(P))[:, None] == jnp.arange(W)[None, :]
    ).astype(hf.dtype)                                         # (P, W)
    patch = jnp.einsum("ph,hw,qw->pq", rows, hf, cols)
    xy0 = scene.hf_xy0 + jnp.stack([si, sj]).astype(hf.dtype) * scene.hf_cell
    return scene.replace(hf_height=patch, hf_xy0=xy0)


def hf_sample(scene: Scene, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear heightfield sample at world ``xy`` (…, 2) → height (…,).

    The on-device analog of Bullet's GEOM_HEIGHTFIELD narrowphase
    (SURVEY.md §2.3); clamped at borders.
    """
    h00, h10, h01, h11, fu, fv = hf_corners(scene, xy)
    return (
        h00 * (1 - fu) * (1 - fv)
        + h10 * fu * (1 - fv)
        + h01 * (1 - fu) * fv
        + h11 * fu * fv
    )


def hf_sample_onehot(scene: Scene, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear heightfield sample via one-hot weight matmuls, (K, 2) → (K,).

    Same bilinear function as :func:`hf_sample` (ulp-level differences only:
    the four corner terms accumulate in matmul order), but with NO gather —
    under ``vmap`` on TPU a gather lowers to scalar loops while this rides
    the MXU. Use for per-step hot paths (obs probes, terrain-aware
    termination); keep :func:`hf_sample` for narrowphase oracles where the
    per-sphere sample count is small and exact corner identities matter."""
    H, W = scene.hf_height.shape
    uv = (xy - scene.hf_xy0) / scene.hf_cell
    u = jnp.clip(uv[..., 0], 0.0, H - 1.001)
    v = jnp.clip(uv[..., 1], 0.0, W - 1.001)
    i0 = jnp.floor(u).astype(jnp.int32)
    j0 = jnp.floor(v).astype(jnp.int32)
    fu = (u - i0)[..., None]
    fv = (v - j0)[..., None]
    ar = jnp.arange(H)
    ac = jnp.arange(W)
    wrow = (
        (i0[..., None] == ar) * (1.0 - fu) + ((i0 + 1)[..., None] == ar) * fu
    ).astype(scene.hf_height.dtype)                            # (K, H)
    wcol = (
        (j0[..., None] == ac) * (1.0 - fv) + ((j0 + 1)[..., None] == ac) * fv
    ).astype(scene.hf_height.dtype)                            # (K, W)
    return jnp.einsum(
        "...h,hw,...w->...", wrow, scene.hf_height, wcol,
        precision=jax.lax.Precision.HIGHEST,
    )


def hf_normal(scene: Scene, xy: jnp.ndarray) -> jnp.ndarray:
    """Surface normal: analytic gradient of the bilinear patch.

    Exact in-cell derivative of ``hf_sample`` (NOT a finite difference — a
    central difference with a fixed eps samples across cell borders and
    cannot be reproduced cheaply in the fused kernel; the analytic form is
    both cheaper and shared verbatim with ops/pallas/engine.py).
    """
    h00, h10, h01, h11, fu, fv = hf_corners(scene, xy)
    dhdu = (h10 - h00) * (1 - fv) + (h11 - h01) * fv
    dhdv = (h01 - h00) * (1 - fu) + (h11 - h10) * fu
    dhdx = dhdu / scene.hf_cell
    dhdy = dhdv / scene.hf_cell
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def sphere_capsule_depth(center, radius, seg_a, seg_b, cap_r):
    """Sphere vs one capsule segment: (depth, normal, contact_point).

    Closest point on the segment to the sphere center; depth measured to the
    capsule SURFACE (cap_r offset). Degenerate normals (center on the axis)
    fall back to +z so the row stays solvable."""
    ab = seg_b - seg_a
    t = jnp.clip(
        jnp.dot(center - seg_a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12), 0.0, 1.0
    )
    closest = seg_a + t * ab
    delta = center - closest
    dist = jnp.linalg.norm(delta)
    n = jnp.where(
        dist > 1e-9,
        delta / jnp.maximum(dist, 1e-9),
        jnp.array([0.0, 0.0, 1.0], dtype=center.dtype),
    )
    depth = radius + cap_r - dist
    point = closest + n * cap_r
    return depth, n, point


def with_trimesh(
    vertices: jnp.ndarray,
    faces,
    ground_z: float = -1e3,
    friction: float = 0.8,
) -> Scene:
    """Static triangle-mesh world — pybullet ``createCollisionShape(
    GEOM_MESH, vertices=…, indices=…)`` / ``loadURDF`` ``<mesh>`` collision
    geometry (SURVEY.md §2.3 createCollisionShape row). ``vertices`` (V, 3)
    world-space, ``faces`` (F, 3) int indices. Stored per-face so the
    narrowphase vectorizes over a culled face window with static shapes."""
    vertices = jnp.asarray(vertices, dtype=jnp.float32)
    import numpy as _np

    f = _np.asarray(faces, dtype=_np.int32)
    return Scene(
        has_ground=True,
        ground_z=jnp.asarray(ground_z, dtype=jnp.float32),
        tri_a=vertices[f[:, 0]],
        tri_b=vertices[f[:, 1]],
        tri_c=vertices[f[:, 2]],
        tri_active=jnp.ones((f.shape[0],), dtype=jnp.float32),
        friction=jnp.asarray(friction, dtype=jnp.float32),
    )


def stairs_trimesh(
    n_steps: int = 6,
    rise: float = 0.15,
    run: float = 0.3,
    width: float = 2.0,
    start_x: float = 0.5,
    ground_z: float = 0.0,
    friction: float = 0.8,
) -> Scene:
    """A staircase as a triangle mesh (treads + risers) — the canonical
    mesh-collider fixture: axis-aligned quads split into triangles, so
    sphere-vs-trimesh behavior is checkable against plane/box intuition."""
    import numpy as _np

    verts = []
    faces = []

    def quad(p0, p1, p2, p3):
        i = len(verts)
        verts.extend([p0, p1, p2, p3])
        faces.append((i, i + 1, i + 2))
        faces.append((i, i + 2, i + 3))

    y0, y1 = -width / 2.0, width / 2.0
    for k in range(n_steps):
        x0 = start_x + k * run
        x1 = x0 + run
        z_top = ground_z + (k + 1) * rise
        z_bot = ground_z + k * rise
        # tread (horizontal)
        quad((x0, y0, z_top), (x1, y0, z_top), (x1, y1, z_top), (x0, y1, z_top))
        # riser (vertical, facing −x)
        quad((x0, y0, z_bot), (x0, y0, z_top), (x0, y1, z_top), (x0, y1, z_bot))
    return with_trimesh(
        _np.asarray(verts, dtype=_np.float32),
        _np.asarray(faces, dtype=_np.int32),
        ground_z=ground_z, friction=friction,
    )


def tri_surface_z(scene: Scene, xy: jnp.ndarray) -> jnp.ndarray:
    """Support height of the mesh under ``xy``: the highest face whose xy
    projection contains the point (barycentric test); falls back to
    ``ground_z`` between faces. Vertical faces (degenerate projection) are
    excluded by the area guard. Used by mesh tasks for the reference's
    height-above-support obs/termination terms (B4/B5)."""
    a2, b2, c2 = scene.tri_a[:, :2], scene.tri_b[:, :2], scene.tri_c[:, :2]
    v0 = b2 - a2
    v1 = c2 - a2
    p = xy[None, :] - a2
    den = v0[:, 0] * v1[:, 1] - v0[:, 1] * v1[:, 0]
    ok = jnp.abs(den) > 1e-9
    inv = 1.0 / jnp.where(ok, den, 1.0)
    u = (p[:, 0] * v1[:, 1] - p[:, 1] * v1[:, 0]) * inv
    v = (v0[:, 0] * p[:, 1] - v0[:, 1] * p[:, 0]) * inv
    inside = ok & (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1.0 + 1e-6)
    if scene.tri_active is not None:
        inside = inside & (scene.tri_active > 0.5)
    z = (
        scene.tri_a[:, 2]
        + u * (scene.tri_b[:, 2] - scene.tri_a[:, 2])
        + v * (scene.tri_c[:, 2] - scene.tri_a[:, 2])
    )
    return jnp.max(jnp.where(inside, z, scene.ground_z))


def cull_tris(scene: Scene, root_xy: jnp.ndarray, window: int) -> Scene:
    """Narrowphase only the ``window`` mesh faces nearest the robot root —
    the trimesh analog of :func:`cull_stones` (same top_k shape-static
    pattern; exact whenever every face within contact range ranks inside
    the window)."""
    if not scene.has_tris or window <= 0:
        return scene
    Kt = scene.tri_a.shape[-2]
    if window >= Kt:
        return scene
    centroid = (scene.tri_a + scene.tri_b + scene.tri_c) / 3.0
    d = jnp.linalg.norm(centroid[:, :2] - root_xy[None, :], axis=-1)
    bound = jnp.maximum(
        jnp.linalg.norm(scene.tri_a - centroid, axis=-1),
        jnp.maximum(
            jnp.linalg.norm(scene.tri_b - centroid, axis=-1),
            jnp.linalg.norm(scene.tri_c - centroid, axis=-1),
        ),
    )
    score = jnp.where(scene.tri_active > 0.5, d - bound, 1e9)
    _, idx = jax.lax.top_k(-score, window)
    # one-hot contraction, not a gather — see cull_stones
    onehot = (idx[:, None] == jnp.arange(Kt)[None, :]).astype(
        scene.tri_a.dtype
    )
    data = jnp.concatenate(
        [scene.tri_a, scene.tri_b, scene.tri_c, scene.tri_active[:, None]],
        axis=1,
    )                                        # (Kt, 10)
    sel = jax.lax.dot(onehot, data, precision=jax.lax.Precision.HIGHEST)
    return scene.replace(
        tri_a=sel[:, 0:3],
        tri_b=sel[:, 3:6],
        tri_c=sel[:, 6:9],
        tri_active=sel[:, 9],
    )


def sphere_triangle_depth(center, radius, a, b, c):
    """Sphere vs one triangle: (depth, normal, contact_point), branchless.

    Closest point on the triangle via the barycentric region walk (Ericson,
    Real-Time Collision Detection §5.1.5) expressed as a first-true-wins
    ``where`` chain so it vectorizes over a face window. Normal points from
    the triangle surface toward the sphere center (into the robot); a
    center ON the face falls back to the oriented face normal so the
    contact row stays solvable."""
    ab = b - a
    ac = c - a
    ap = center - a
    d1 = jnp.dot(ab, ap)
    d2 = jnp.dot(ac, ap)
    bp = center - b
    d3 = jnp.dot(ab, bp)
    d4 = jnp.dot(ac, bp)
    cp = center - c
    d5 = jnp.dot(ab, cp)
    d6 = jnp.dot(ac, cp)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    eps = 1e-12

    # candidate closest points per region
    p_a = a
    p_b = b
    p_c = c
    v_ab = d1 / jnp.maximum(d1 - d3, eps)
    p_ab = a + v_ab * ab
    w_ac = d2 / jnp.maximum(d2 - d6, eps)
    p_ac = a + w_ac * ac
    w_bc = (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), eps)
    p_bc = b + w_bc * (c - b)
    denom = 1.0 / jnp.maximum(va + vb + vc, eps)
    p_in = a + ab * (vb * denom) + ac * (vc * denom)

    conds = [
        ((d1 <= 0.0) & (d2 <= 0.0), p_a),
        ((d3 >= 0.0) & (d4 <= d3), p_b),
        ((d6 >= 0.0) & (d5 <= d6), p_c),
        ((vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0), p_ab),
        ((vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0), p_ac),
        ((va <= 0.0) & (d4 - d3 >= 0.0) & (d5 - d6 >= 0.0), p_bc),
    ]
    p = p_in
    for cond, cand in reversed(conds):
        # reversed application + where = first LISTED condition wins
        p = jnp.where(cond, cand, p)
    delta = center - p
    dist = jnp.linalg.norm(delta)
    face_n = jnp.cross(ab, ac)
    face_n = face_n / jnp.maximum(jnp.linalg.norm(face_n), 1e-12)
    # orient the fallback toward the sphere center's side of the plane
    side = jnp.where(jnp.dot(ap, face_n) >= 0.0, 1.0, -1.0)
    n = jnp.where(
        dist > 1e-9, delta / jnp.maximum(dist, 1e-9), side * face_n
    )
    depth = radius - dist
    return depth, n, p


def sphere_box_depth(center, radius, box_pos, box_quat, box_half):
    """Sphere vs one oriented box: (depth, normal, contact_point), branchless.

    Handles both the outside (closest-point) and fully-inside (min-face
    push-out) cases with ``where`` selects so it vectorizes over stones.
    """
    d = quat_ops.inv_rotate(box_quat, center - box_pos)      # center in box frame
    closest = jnp.clip(d, -box_half, box_half)
    delta = d - closest
    dist = jnp.linalg.norm(delta)
    outside = dist > 1e-9
    n_out = delta / jnp.maximum(dist, 1e-9)
    # inside: push out through nearest face
    face_d = box_half - jnp.abs(d)                            # (3,)
    k = jnp.argmin(face_d)
    n_in = jnp.sign(d) * jnp.eye(3, dtype=d.dtype)[k]
    depth_out = radius - dist
    depth_in = radius + face_d[k]
    n_local = jnp.where(outside, n_out, n_in)
    depth = jnp.where(outside, depth_out, depth_in)
    n_world = quat_ops.rotate(box_quat, n_local)
    surf_local = jnp.where(outside, closest, d + n_local * face_d[k])
    p_world = box_pos + quat_ops.rotate(box_quat, surf_local)
    return depth, n_world, p_world
