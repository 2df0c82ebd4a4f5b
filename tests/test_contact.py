"""Contact-solver gates (SURVEY.md §4.1): LCP conditions on drops, resting
stability, friction, and stone boxes."""

import jax
import jax.numpy as jnp
import numpy as np

from mocca_envs_tpu.ops.step import make_substep
from mocca_envs_tpu.terrain import scene as scene_mod
from mocca_envs_tpu.utils.config import EngineConfig

from tests.models_util import ball, foot_box, free_q, free_qd, hopper


CFG = EngineConfig(solver_iters=20)


def _run(model, substep, q, qd, scene, n, tau=None):
    tau_j = jnp.zeros(model.nj) if tau is None else tau

    def body(carry, _):
        q, qd = carry
        q, qd, info, _ = substep(q, qd, tau_j, scene)
        return (q, qd), None

    (q, qd), _ = jax.lax.scan(jax.jit(body), (q, qd), None, length=n)
    return q, qd


def test_ball_drop_rests_on_plane():
    model = ball(radius=0.1)
    substep = make_substep(model, CFG)
    scene = scene_mod.flat()
    q = jnp.asarray(free_q(pos=(0, 0, 0.5)))
    qd = jnp.asarray(free_qd())
    q, qd = _run(model, substep, q, qd, scene, 400)
    # resting height = radius (within slop), zero velocity
    assert abs(float(q[2]) - 0.1) < 5e-3, q[2]
    np.testing.assert_allclose(qd[0:3], np.zeros(3), atol=1e-2)


def test_ball_never_penetrates_deeply():
    model = ball(radius=0.1)
    substep = make_substep(model, CFG)
    scene = scene_mod.flat()
    q = jnp.asarray(free_q(pos=(0, 0, 1.0)))
    qd = jnp.asarray(free_qd())
    tau_j = jnp.zeros(model.nj)

    def body(carry, _):
        q, qd = carry
        q, qd, info, _ = substep(q, qd, tau_j, scene)
        return (q, qd), q[2]

    (q, qd), zs = jax.lax.scan(jax.jit(body), (q, qd), None, length=600)
    assert float(jnp.min(zs)) > 0.1 - 0.02, float(jnp.min(zs))


def test_friction_stops_sliding_ball():
    model = ball(radius=0.1)
    substep = make_substep(model, CFG)
    scene = scene_mod.flat(friction=0.8)
    q = jnp.asarray(free_q(pos=(0, 0, 0.1)))
    qd = jnp.asarray(free_qd(lin=(2.0, 0, 0)))
    q, qd = _run(model, substep, q, qd, scene, 500)
    # rolling resistance isn't modeled, so the ball ends up rolling without
    # slipping: contact-point velocity v + ω×r ≈ 0
    v_contact = qd[0:3] + jnp.cross(qd[3:6], jnp.array([0.0, 0.0, -0.1]))
    np.testing.assert_allclose(v_contact, np.zeros(3), atol=5e-2)


def test_frictionless_ball_keeps_sliding():
    model = ball(radius=0.1)
    substep = make_substep(model, CFG)
    scene = scene_mod.flat(friction=0.0)
    q = jnp.asarray(free_q(pos=(0, 0, 0.1)))
    qd = jnp.asarray(free_qd(lin=(2.0, 0, 0)))
    q, qd = _run(model, substep, q, qd, scene, 200)
    np.testing.assert_allclose(qd[0], 2.0, rtol=5e-2)


def test_hopper_settles_upright():
    model = hopper()
    substep = make_substep(model, CFG)
    scene = scene_mod.flat()
    q = jnp.asarray(free_q(pos=(0, 0, 0.62), joints=(0.0,)))
    qd = jnp.asarray(free_qd(joints=(0.0,)))
    q, qd = _run(model, substep, q, qd, scene, 600)
    assert jnp.all(jnp.isfinite(q)), q
    # foot sphere (leg tip) should rest at about its radius above ground
    assert float(q[2]) > 0.4, q


def test_ball_rests_on_stone_box():
    model = ball(radius=0.05)
    substep = make_substep(model, CFG)
    scene = scene_mod.with_stones(
        stone_pos=jnp.array([[0.0, 0.0, -0.1]]),
        stone_quat=jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        stone_half=jnp.array([[0.25, 0.25, 0.1]]),
    )
    q = jnp.asarray(free_q(pos=(0.05, -0.03, 0.4)))
    qd = jnp.asarray(free_qd())
    q, qd = _run(model, substep, q, qd, scene, 400)
    # rests on the box top (z=0) at sphere radius
    assert abs(float(q[2]) - 0.05) < 6e-3, q[2]


def test_ball_falls_off_stone_edge():
    model = ball(radius=0.05)
    substep = make_substep(model, CFG)
    scene = scene_mod.with_stones(
        stone_pos=jnp.array([[0.0, 0.0, -0.1]]),
        stone_quat=jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        stone_half=jnp.array([[0.1, 0.1, 0.1]]),
        ground_z=-3.0,
    )
    q = jnp.asarray(free_q(pos=(0.5, 0.0, 0.3)))  # beside the stone
    qd = jnp.asarray(free_qd())
    q, qd = _run(model, substep, q, qd, scene, 400)
    assert float(q[2]) < -2.0, q[2]  # fell to the deep ground


def test_foot_box_half_on_stone_edge_settles():
    """Edge-balance regression (VERDICT r2 #5 / SURVEY.md §2.3
    createCollisionShape row): a box foot dropped HALF-ON a stone must not
    jitter or rotate through the edge. With 2×2 corner spheres the box tips
    about the on-stone sphere line, catches itself on the ground with the
    off-stone corners, and RESTS straddling the edge — a stable multi-point
    manifold, where a midline sphere pair pivots freely."""
    model = foot_box()
    substep = make_substep(model, CFG)
    # stone occupies y ∈ [0, 0.5], top at z = 0.06; ground at z = 0
    scene = scene_mod.with_stones(
        stone_pos=jnp.array([[0.0, 0.25, 0.03]]),
        stone_quat=jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        stone_half=jnp.array([[0.5, 0.25, 0.03]]),
        ground_z=0.0,
    )
    # center over the edge (+y spheres above the stone, −y spheres hanging),
    # released 2 cm above contact — a step-down, not a flip-inducing slam
    q = jnp.asarray(free_q(pos=(0.0, 0.0, 0.12)))
    qd = jnp.asarray(free_qd())
    tau_j = jnp.zeros(model.nj) if model.nj else jnp.zeros(0)

    def body(carry, _):
        q, qd = carry
        q, qd, info, _ = substep(q, qd, tau_j, scene)
        return (q, qd), (q, info.contacts.depth)

    (q, qd), (qs, depths) = jax.lax.scan(
        jax.jit(body), (q, qd), None, length=900
    )
    # settled: negligible residual velocity
    assert float(jnp.max(jnp.abs(qd[0:3]))) < 0.05, qd[0:3]
    assert float(jnp.max(jnp.abs(qd[3:6]))) < 0.3, qd[3:6]
    # never rotated/penetrated through the edge: depths stay within the
    # Baumgarte slop band at all times
    assert float(jnp.max(depths)) < 0.02, float(jnp.max(depths))
    # ends at a REST state — tipped onto the ground or straddling the edge —
    # not flipped, not jittering (a CoM-past-the-edge box tipping off is
    # correct physics; rotating THROUGH the stone is the bug)
    assert -0.4 < float(q[1]) < 0.12, q[1]
    assert 0.02 < float(q[2]) < 0.12, q[2]
    w_, x_ = float(q[3]), float(q[4])
    roll = abs(2.0 * np.arctan2(x_, w_))
    assert roll < 1.05, roll
    # no late-time jitter: z steady over the last 200 substeps
    z_tail = qs[-200:, 2]
    assert float(jnp.std(z_tail)) < 1e-3, float(jnp.std(z_tail))


def test_foot_box_com_inside_corners_does_not_tip():
    """The discriminating manifold gate: CoM inside the corner-sphere
    rectangle but NEAR the stone edge (hanging corners past it) must rest
    FLAT. A midline sphere pair (the pre-round-3 feet) has zero support
    width here and pivots; the 2×2 corner set holds a support polygon."""
    model = foot_box()
    substep = make_substep(model, CFG)
    scene = scene_mod.with_stones(
        stone_pos=jnp.array([[0.0, 0.25, 0.03]]),
        stone_quat=jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        stone_half=jnp.array([[0.5, 0.25, 0.03]]),
        ground_z=0.0,
    )
    # spheres at y = +0.02 (on, near edge) and +0.14 (on): support spans
    # [0.02, 0.14]; CoM at 0.08 is inside, 6 cm from the stone edge
    q = jnp.asarray(free_q(pos=(0.0, 0.08, 0.11)))
    qd = jnp.asarray(free_qd())
    tau_j = jnp.zeros(model.nj) if model.nj else jnp.zeros(0)

    def body(carry, _):
        q, qd = carry
        q, qd, info, _ = substep(q, qd, tau_j, scene)
        return (q, qd), None

    (q, qd), _ = jax.lax.scan(jax.jit(body), (q, qd), None, length=700)
    # flat on the stone top: z = top + hz + r, roll ≈ 0, no drift off
    assert abs(float(q[2]) - 0.10) < 8e-3, q[2]
    w_, x_ = float(q[3]), float(q[4])
    assert abs(2.0 * np.arctan2(x_, w_)) < 0.1
    assert abs(float(q[1]) - 0.08) < 0.02, q[1]
    np.testing.assert_allclose(np.asarray(qd[0:6]), np.zeros(6), atol=0.05)


def test_energy_dissipates_not_gains():
    model = ball(radius=0.1)
    substep = make_substep(model, CFG)
    scene = scene_mod.flat()
    q = jnp.asarray(free_q(pos=(0, 0, 0.6)))
    qd = jnp.asarray(free_qd())
    tau_j = jnp.zeros(model.nj)

    m = float(model.mass[0])
    inertia0 = np.asarray(model.inertia[0])

    def energy(q, qd):
        ke = 0.5 * m * jnp.sum(qd[0:3] ** 2) + 0.5 * jnp.sum(
            qd[3:6] * (inertia0 @ qd[3:6])
        )
        pe = m * 9.8 * q[2]
        return ke + pe

    e0 = energy(q, qd)

    def body(carry, _):
        q, qd = carry
        q, qd, _, _ = substep(q, qd, tau_j, scene)
        return (q, qd), energy(q, qd)

    _, es = jax.lax.scan(jax.jit(body), (q, qd), None, length=500)
    assert float(jnp.max(es)) <= float(e0) * 1.01 + 1e-3


def test_warm_start_contact_behaviors_with_fewer_sweeps():
    """EngineConfig.warm_start at 4 sweeps reproduces the behavioral gates
    that row-PGS runs at 20: the carried λ means each substep only corrects
    the CHANGE in contact state. Driven through make_control_step (which
    owns the λ threading)."""
    from mocca_envs_tpu.ops.step import make_control_step

    cfg = EngineConfig(solver_iters=4, warm_start=True, use_pallas=False)
    model = ball(radius=0.1)
    ctrl = jax.jit(
        lambda q, qd, scene: make_control_step(model, cfg)(
            q, qd, jnp.zeros(model.nj), scene
        )
    )

    def run(q, qd, scene, n_ctrl):
        def body(carry, _):
            q, qd = carry
            q, qd, info = ctrl(q, qd, scene)
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=n_ctrl)
        return q, qd

    # drop → rest at radius with zero velocity
    q, qd = run(
        jnp.asarray(free_q(pos=(0, 0, 0.5))), jnp.asarray(free_qd()),
        scene_mod.flat(), 100,
    )
    assert abs(float(q[2]) - 0.1) < 5e-3, q[2]
    np.testing.assert_allclose(qd[0:3], np.zeros(3), atol=1e-2)

    # friction brings a sliding ball to rolling without slip
    q, qd = run(
        jnp.asarray(free_q(pos=(0, 0, 0.1))),
        jnp.asarray(free_qd(lin=(2.0, 0, 0))),
        scene_mod.flat(friction=0.8), 125,
    )
    v_contact = qd[0:3] + jnp.cross(qd[3:6], jnp.array([0.0, 0.0, -0.1]))
    np.testing.assert_allclose(v_contact, np.zeros(3), atol=5e-2)

    # frictionless glide preserves velocity
    q, qd = run(
        jnp.asarray(free_q(pos=(0, 0, 0.1))),
        jnp.asarray(free_qd(lin=(2.0, 0, 0))),
        scene_mod.flat(friction=0.0), 50,
    )
    np.testing.assert_allclose(qd[0], 2.0, rtol=5e-2)


def test_block_pgs_contact_behaviors_with_fewer_sweeps():
    """EngineConfig.block_pgs at 8 sweeps reproduces the row-PGS behavioral
    gates that run at 20: resting height, roll-without-slip, frictionless
    glide. This is the accuracy-per-sweep claim the flag exists for."""
    cfg = EngineConfig(solver_iters=8, block_pgs=True)

    model = ball(radius=0.1)
    substep = make_substep(model, cfg)

    q, qd = _run(
        model, substep,
        jnp.asarray(free_q(pos=(0, 0, 0.5))), jnp.asarray(free_qd()),
        scene_mod.flat(), 400,
    )
    assert abs(float(q[2]) - 0.1) < 5e-3, q[2]
    np.testing.assert_allclose(qd[0:3], np.zeros(3), atol=1e-2)

    q, qd = _run(
        model, substep,
        jnp.asarray(free_q(pos=(0, 0, 0.1))),
        jnp.asarray(free_qd(lin=(2.0, 0, 0))),
        scene_mod.flat(friction=0.8), 500,
    )
    v_contact = qd[0:3] + jnp.cross(qd[3:6], jnp.array([0.0, 0.0, -0.1]))
    np.testing.assert_allclose(v_contact, np.zeros(3), atol=5e-2)

    q, qd = _run(
        model, substep,
        jnp.asarray(free_q(pos=(0, 0, 0.1))),
        jnp.asarray(free_qd(lin=(2.0, 0, 0))),
        scene_mod.flat(friction=0.0), 200,
    )
    np.testing.assert_allclose(qd[0], 2.0, rtol=5e-2)
