"""CPU accuracy probe: the full contact behavioral gate set at
solver_iters=3 through the SHIPPED path (make_control_step: warm-started
λ threading, block PGS) — evidence for/against a sweep-count reduction
(BENCH.md roofline candidates; measured on TPU by tpu_round4f_perf.py).

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/probe_iters3.py [iters]
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from models_util import ball, foot_box, free_q, free_qd, hopper
from mocca_envs_tpu.ops.step import make_control_step
from mocca_envs_tpu.terrain import scene as scene_mod
from mocca_envs_tpu.utils.config import EngineConfig

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
CFG = EngineConfig(solver_iters=ITERS, use_pallas=False)
RESULTS = []


def run(model, q, qd, scene, n_sub, collect=None):
    """n_sub substeps through control steps (4 substeps each)."""
    ctrl = make_control_step(model, CFG)
    tau = jnp.zeros(model.nj)

    def body(carry, _):
        q, qd = carry
        q, qd, info = ctrl(q, qd, tau, scene)
        out = None if collect is None else collect(q, qd, info)
        return (q, qd), out

    (q, qd), outs = jax.lax.scan(
        jax.jit(body), (q, qd), None, length=max(n_sub // 4, 1)
    )
    return q, qd, outs


def gate(name, ok, detail):
    RESULTS.append((name, bool(ok)))
    print(f"{'PASS' if ok else 'FAIL'}  {name}: {detail}")


def main():
    # 1. ball rest height
    m = ball(radius=0.1)
    q, qd, _ = run(m, jnp.asarray(free_q(pos=(0, 0, 0.5))),
                   jnp.asarray(free_qd()), scene_mod.flat(), 400)
    gate("ball_rest", abs(float(q[2]) - 0.1) < 5e-3
         and float(jnp.abs(qd[0:3]).max()) < 1e-2,
         f"z={float(q[2]):.4f}")

    # 2. no deep penetration on a 1 m drop
    q, qd, zs = run(m, jnp.asarray(free_q(pos=(0, 0, 1.0))),
                    jnp.asarray(free_qd()), scene_mod.flat(), 600,
                    collect=lambda q, qd, i: q[2])
    gate("ball_no_penetration", float(jnp.min(zs)) > 0.1 - 0.02,
         f"min_z={float(jnp.min(zs)):.4f}")

    # 3. friction → rolling without slip
    q, qd, _ = run(m, jnp.asarray(free_q(pos=(0, 0, 0.1))),
                   jnp.asarray(free_qd(lin=(2.0, 0, 0))),
                   scene_mod.flat(friction=0.8), 500)
    vc = np.asarray(qd[0:3]) + np.cross(np.asarray(qd[3:6]), [0, 0, -0.1])
    gate("friction_roll", np.abs(vc).max() < 5e-2,
         f"slip={np.linalg.norm(vc):.4f}")

    # 4. frictionless glide preserves velocity
    q, qd, _ = run(m, jnp.asarray(free_q(pos=(0, 0, 0.1))),
                   jnp.asarray(free_qd(lin=(2.0, 0, 0))),
                   scene_mod.flat(friction=0.0), 200)
    gate("frictionless_glide", abs(float(qd[0]) - 2.0) < 0.1,
         f"vx={float(qd[0]):.4f}")

    # 5. hopper settles upright
    mh = hopper()
    q, qd, _ = run(mh, jnp.asarray(free_q(pos=(0, 0, 0.62), joints=(0.0,))),
                   jnp.asarray(free_qd(joints=(0.0,))), scene_mod.flat(),
                   600)
    gate("hopper_settle", bool(jnp.all(jnp.isfinite(q))) and float(q[2]) > 0.4,
         f"z={float(q[2]):.3f}")

    # 6. ball rests on a stone box
    ms = ball(radius=0.05)
    sc = scene_mod.with_stones(
        stone_pos=jnp.array([[0.0, 0.0, -0.1]]),
        stone_quat=jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        stone_half=jnp.array([[0.25, 0.25, 0.1]]),
    )
    q, qd, _ = run(ms, jnp.asarray(free_q(pos=(0.05, -0.03, 0.4))),
                   jnp.asarray(free_qd()), sc, 400)
    gate("ball_on_stone", abs(float(q[2]) - 0.05) < 6e-3,
         f"z={float(q[2]):.4f}")

    # 7. foot box half on a stone edge settles (manifold gate)
    mf = foot_box()
    sc = scene_mod.with_stones(
        stone_pos=jnp.array([[0.0, 0.25, 0.03]]),
        stone_quat=jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        stone_half=jnp.array([[0.5, 0.25, 0.03]]),
        ground_z=0.0,
    )
    q, qd, outs = run(mf, jnp.asarray(free_q(pos=(0.0, 0.0, 0.12))),
                      jnp.asarray(free_qd()), sc, 900,
                      collect=lambda q, qd, i: (q[2],
                                                i.contacts.depth.max()))
    z_tail = outs[0][-50:]
    roll = abs(2.0 * np.arctan2(float(q[4]), float(q[3])))
    gate("foot_box_edge",
         float(jnp.abs(qd[0:3]).max()) < 0.05
         and float(jnp.abs(qd[3:6]).max()) < 0.3
         and float(jnp.max(outs[1])) < 0.02
         and -0.4 < float(q[1]) < 0.12
         and 0.02 < float(q[2]) < 0.12
         and roll < 1.05
         and float(jnp.std(z_tail)) < 1e-3,
         f"z={float(q[2]):.3f} roll={roll:.3f} "
         f"max_depth={float(jnp.max(outs[1])):.4f} "
         f"z_tail_std={float(jnp.std(z_tail)):.5f}")

    # 8. CoM-inside-corners rests flat
    q, qd, _ = run(mf, jnp.asarray(free_q(pos=(0.0, 0.08, 0.11))),
                   jnp.asarray(free_qd()), sc, 700)
    roll = abs(2.0 * np.arctan2(float(q[4]), float(q[3])))
    gate("foot_box_flat",
         abs(float(q[2]) - 0.10) < 8e-3 and roll < 0.1
         and abs(float(q[1]) - 0.08) < 0.02
         and float(jnp.abs(qd[0:6]).max()) < 0.05,
         f"z={float(q[2]):.4f} roll={roll:.3f}")

    # 9. energy never grows on a contact drop
    md = ball(radius=0.1)
    mass = float(md.mass[0])
    inertia0 = np.asarray(md.inertia[0])

    def energy(q, qd, _i):
        ke = 0.5 * mass * jnp.sum(qd[0:3] ** 2) + 0.5 * jnp.sum(
            qd[3:6] * (jnp.asarray(inertia0) @ qd[3:6])
        )
        return ke + mass * 9.8 * q[2]

    q0 = jnp.asarray(free_q(pos=(0, 0, 0.6)))
    qd0 = jnp.asarray(free_qd())
    e0 = 0.5 * mass * 0.0 + mass * 9.8 * float(q0[2])
    _, _, es = run(md, q0, qd0, scene_mod.flat(), 500, collect=energy)
    gate("energy_dissipates", float(jnp.max(es)) <= e0 * 1.01 + 1e-3,
         f"max_e={float(jnp.max(es)):.4f} e0={e0:.4f}")

    n_pass = sum(ok for _, ok in RESULTS)
    print(f"\niters={ITERS}: {n_pass}/{len(RESULTS)} gates pass")


main()
