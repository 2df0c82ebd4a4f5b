"""Triangle-mesh collision gates (SURVEY.md §2.3 createCollisionShape
GEOM_MESH row): closest-point primitive, resting behavior on mesh fixtures,
culling exactness, and kernel-vs-oracle equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocca_envs_tpu.ops.pallas.engine import TILE, make_pallas_substep
from mocca_envs_tpu.ops.step import make_substep
from mocca_envs_tpu.terrain import scene as scene_mod
from mocca_envs_tpu.terrain.scene import (
    cull_tris,
    sphere_triangle_depth,
    stairs_trimesh,
    with_trimesh,
)
from mocca_envs_tpu.utils.config import EngineConfig

from tests.models_util import ball, foot_box, free_q, free_qd, hopper

CFG = EngineConfig(solver_iters=20)


# ------------------------------------------------------------ primitive
def test_sphere_triangle_regions():
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([2.0, 0.0, 0.0])
    c = jnp.array([0.0, 2.0, 0.0])
    r = 0.1

    # interior: straight above the face
    d, n, p = sphere_triangle_depth(jnp.array([0.5, 0.5, 0.05]), r, a, b, c)
    np.testing.assert_allclose(np.asarray(p), [0.5, 0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n), [0.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(float(d), r - 0.05, atol=1e-6)

    # vertex region A
    d, n, p = sphere_triangle_depth(jnp.array([-1.0, -1.0, 0.0]), r, a, b, c)
    np.testing.assert_allclose(np.asarray(p), np.asarray(a), atol=1e-6)
    assert float(d) < 0  # separated

    # edge AB region: closest point clamps onto the edge
    d, n, p = sphere_triangle_depth(jnp.array([1.0, -0.5, 0.0]), r, a, b, c)
    np.testing.assert_allclose(np.asarray(p), [1.0, 0.0, 0.0], atol=1e-6)

    # below the face: normal flips toward the sphere
    d, n, p = sphere_triangle_depth(jnp.array([0.5, 0.5, -0.05]), r, a, b, c)
    np.testing.assert_allclose(np.asarray(n), [0.0, 0.0, -1.0], atol=1e-6)

    # degenerate: center exactly ON the face → oriented face normal
    d, n, p = sphere_triangle_depth(jnp.array([0.5, 0.5, 0.0]), r, a, b, c)
    assert np.isfinite(np.asarray(n)).all()
    np.testing.assert_allclose(float(jnp.linalg.norm(n)), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(d), r, atol=1e-6)


# ------------------------------------------------------------ resting
def _run(model, substep, q, qd, scene, n):
    tau_j = jnp.zeros(model.nj)

    def body(carry, _):
        q, qd = carry
        q, qd, info, _ = substep(q, qd, tau_j, scene)
        return (q, qd), None

    (q, qd), _ = jax.lax.scan(jax.jit(body), (q, qd), None, length=n)
    return q, qd


def test_ball_rests_on_mesh_quad_like_plane():
    """A big horizontal quad (2 triangles) at z=0.3 must behave like a
    plane: the ball rests at quad height + radius."""
    model = ball(radius=0.1)
    substep = make_substep(model, CFG)
    v = np.array([[-5, -5, 0.3], [5, -5, 0.3], [5, 5, 0.3], [-5, 5, 0.3]],
                 dtype=np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    scene = with_trimesh(v, f, ground_z=-10.0)
    q = jnp.asarray(free_q(pos=(0.3, -0.2, 1.0)))
    qd = jnp.asarray(free_qd())
    q, qd = _run(model, substep, q, qd, scene, 500)
    assert abs(float(q[2]) - 0.4) < 6e-3, q[2]
    np.testing.assert_allclose(np.asarray(qd[0:3]), np.zeros(3), atol=1e-2)


def test_ball_rests_on_stairs_tread_and_falls_beside():
    model = ball(radius=0.08)
    substep = make_substep(model, CFG)
    scene = stairs_trimesh(n_steps=4, rise=0.15, run=0.3, start_x=0.5)
    # over tread 2 (x ∈ [0.8, 1.1], top z = 0.30)
    q = jnp.asarray(free_q(pos=(0.95, 0.0, 0.8)))
    qd = jnp.asarray(free_qd())
    q, qd = _run(model, substep, q, qd, scene, 500)
    assert abs(float(q[2]) - 0.38) < 8e-3, q[2]
    # beside the staircase (y outside width/2) → falls to the ground plane
    q2 = jnp.asarray(free_q(pos=(0.95, 1.6, 0.8)))
    q2, _ = _run(model, substep, q2, jnp.asarray(free_qd()), scene, 500)
    assert abs(float(q2[2]) - 0.08) < 8e-3, q2[2]


def test_foot_box_settles_on_stair_edge():
    """The corner-sphere foot straddling a tread edge settles without
    penetrating — mesh analog of the stone edge-balance gate."""
    model = foot_box()
    substep = make_substep(model, CFG)
    scene = stairs_trimesh(n_steps=3, rise=0.1, run=0.25, start_x=0.0)
    # box center above the x=0.25 edge between tread 1 (z=0.1) and tread 2
    q = jnp.asarray(free_q(pos=(0.25, 0.0, 0.30)))
    qd = jnp.asarray(free_qd())
    tau_j = jnp.zeros(model.nj) if model.nj else jnp.zeros(0)

    def body(carry, _):
        q, qd = carry
        q, qd, info, _ = substep(q, qd, tau_j, scene)
        return (q, qd), info.contacts.depth

    (q, qd), depths = jax.lax.scan(jax.jit(body), (q, qd), None, length=800)
    assert float(jnp.max(jnp.abs(qd[0:3]))) < 0.05
    assert float(jnp.max(depths)) < 0.02, float(jnp.max(depths))
    assert 0.1 < float(q[2]) < 0.35, q[2]


# ------------------------------------------------------------ culling
def test_cull_tris_exact_on_stairs():
    """tri_window culling must be trajectory-exact: same ball drop on the
    full 16-face staircase vs an 8-face window."""
    model = ball(radius=0.08)
    scene = stairs_trimesh(n_steps=4, rise=0.15, run=0.3, start_x=0.5)
    full = make_substep(model, EngineConfig(solver_iters=20))
    q0 = jnp.asarray(free_q(pos=(0.95, 0.1, 0.8)))
    qd0 = jnp.asarray(free_qd())

    def run(substep, sc, win):
        tau_j = jnp.zeros(model.nj)

        def body(carry, _):
            q, qd = carry
            sc_w = cull_tris(sc, q[0:2], win)
            q, qd, info, _ = substep(q, qd, tau_j, sc_w)
            return (q, qd), q

        (_, _), qs = jax.lax.scan(jax.jit(body), (q0, qd0), None, length=400)
        return qs

    qs_full = run(full, scene, 0)
    qs_win = run(full, scene, 8)
    np.testing.assert_array_equal(np.asarray(qs_full), np.asarray(qs_win))
    # selection: nearest faces to a point over tread 2 include its 2 faces
    culled = cull_tris(scene, jnp.array([0.95, 0.0]), 4)
    assert culled.tri_a.shape == (4, 3)


# ------------------------------------------------------------ env
def test_stairs_env_registers_and_steps():
    """Walker3DStairsEnv: the GEOM_MESH consumer — resets on flat ground
    before the staircase, steps finitely, and its surface/tall logic reads
    the mesh (tri_surface_z)."""
    import mocca_envs_tpu
    from mocca_envs_tpu.terrain.scene import tri_surface_z

    env = mocca_envs_tpu.make("Walker3DStairsEnv")
    s = env.init(jax.random.key(0))
    assert s.scene.has_tris and s.scene.tri_a.shape == (24, 3)
    step = jax.jit(env.step)
    for _ in range(10):
        tr = step(s, jnp.zeros(env.act_dim))
        s = tr.state
    assert bool(jnp.all(jnp.isfinite(s.q)))
    # surface model: flat before the stairs, tread height on tread 3
    np.testing.assert_allclose(
        float(tri_surface_z(s.scene, jnp.array([0.0, 0.0]))), 0.0, atol=1e-6
    )
    np.testing.assert_allclose(
        float(tri_surface_z(s.scene, jnp.array([1.8, 0.0]))), 0.48, atol=1e-5
    )


# ------------------------------------------------------------ kernel
@pytest.mark.slow
def test_pallas_trimesh_matches_jax_substep():
    """Triangle narrowphase in the fused kernel vs the JAX oracle."""
    model = hopper()
    B = TILE
    key = jax.random.key(11)
    kq, kd, kt = jax.random.split(key, 3)
    base = jnp.concatenate(
        [jnp.array([0.0, 0.0, 0.58]), jnp.array([1.0, 0.0, 0.0, 0.0]),
         jnp.zeros(model.nj)]
    )
    q = jnp.tile(base, (B, 1)) + 0.03 * jax.random.normal(kq, (B, model.nq))
    qn = q[:, 3:7] / jnp.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    q = q.at[:, 3:7].set(qn)
    qd = 0.3 * jax.random.normal(kd, (B, model.nv))
    tau = 0.3 * jax.random.normal(jax.random.key(12), (B, model.nj))
    gz = jnp.full((B,), -5.0)
    fric = jnp.full((B,), 0.8)

    # per-env triangle pair forming a ramp under the hopper, plus decoys
    KT = 4
    ta = jnp.tile(jnp.array([[-1.0, -1.0, -0.15], [-1.0, -1.0, -0.15],
                             [3.0, 0.0, -0.3], [0.0, 3.0, -0.3]]), (B, 1, 1))
    tb = jnp.tile(jnp.array([[1.0, -1.0, 0.0], [1.0, 1.0, 0.1],
                             [4.0, 0.0, -0.3], [0.0, 4.0, -0.3]]), (B, 1, 1))
    tc = jnp.tile(jnp.array([[1.0, 1.0, 0.1], [-1.0, 1.0, -0.05],
                             [3.5, 1.0, -0.3], [1.0, 3.5, -0.3]]), (B, 1, 1))
    jitter = 0.03 * jax.random.normal(kt, (B, 1, 3))
    ta, tb, tc = ta + jitter, tb + jitter, tc + jitter
    tact = jnp.ones((B, KT))

    cfg = EngineConfig(sim_substeps=2, solver_iters=8, warm_start=False,
                       reuse_factor=False, matfree_pgs=False)
    pal = make_pallas_substep(model, cfg, interpret=True, num_tris=KT)
    q_p, qd_p, depth_p, nimp_p = pal(q, qd, tau, gz, fric, ta, tb, tc, tact)

    sub = make_substep(model, cfg)

    def jax_path(q1, qd1, t1, a1, b1, c1, act1):
        sc = scene_mod.Scene(
            has_ground=True, ground_z=jnp.asarray(-5.0),
            tri_a=a1, tri_b=b1, tri_c=c1, tri_active=act1,
            friction=jnp.asarray(0.8),
        )
        qq, dd = q1, qd1
        for _ in range(cfg.sim_substeps):
            qq, dd, info, _ = sub(qq, dd, t1, sc)
        return qq, dd, info.contacts.depth, info.normal_impulse

    q_j, qd_j, depth_j, nimp_j = jax.vmap(jax_path)(q, qd, tau, ta, tb, tc, tact)

    q_err = np.abs(np.asarray(q_p) - np.asarray(q_j))
    frac_ok = float(np.mean(q_err < 1e-3))
    assert frac_ok > 0.97, f"only {frac_ok:.3f} of q entries agree"
    np.testing.assert_allclose(
        np.sort(np.asarray(depth_p), axis=0),
        np.sort(np.asarray(depth_j), axis=0),
        atol=5e-3,
    )
