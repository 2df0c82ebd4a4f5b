"""Small hand-built test models shared by the unit gates."""

import numpy as np

from mocca_envs_tpu.models.schema import ModelBuilder


def pendulum(m=1.3, l=0.8):
    """Fixed-base point-mass pendulum about +y; closed form M = m l²."""
    b = ModelBuilder("pendulum", floating=False)
    b.add_link(
        "rod", "base", joint_axis=(0, 1, 0), mass=m, com=(0, 0, -l),
        inertia_diag=(0, 0, 0), limit=(-10, 10),
    )
    return b.build()


def double_pendulum(m1=1.1, m2=0.7, l1=0.9, lc1=0.5, lc2=0.35, i1=0.02, i2=0.01):
    b = ModelBuilder("double_pendulum", floating=False)
    b.add_link(
        "link1", "base", joint_axis=(0, 1, 0), mass=m1, com=(0, 0, -lc1),
        inertia_diag=(0, i1, 0), limit=(-10, 10),
    )
    b.add_link(
        "link2", "link1", joint_pos=(0, 0, -l1), joint_axis=(0, 1, 0), mass=m2,
        com=(0, 0, -lc2), inertia_diag=(0, i2, 0), limit=(-10, 10),
    )
    return b.build()


def free_body(m=2.0, com=(0.05, -0.02, 0.1)):
    b = ModelBuilder("free_body", floating=True)
    b.base_inertial(m, com, inertia_diag=(0.1, 0.2, 0.3))
    return b.build()


def floating_chain():
    """Floating base + 2 links with mixed axes/origins: a general 3D case."""
    b = ModelBuilder("chain", floating=True)
    b.base_inertial(3.0, (0.0, 0.0, 0.1), inertia_diag=(0.15, 0.12, 0.1))
    b.add_link(
        "thigh", "base", joint_pos=(0.1, 0.0, -0.2), joint_rpy=(0.1, 0.0, 0.3),
        joint_axis=(0, 1, 0), mass=1.2, com=(0, 0, -0.2),
        inertia_diag=(0.02, 0.02, 0.004), limit=(-2, 2),
    )
    b.add_link(
        "shin", "thigh", joint_pos=(0.0, 0.0, -0.4), joint_axis=(1, 0, 0),
        mass=0.8, com=(0, 0, -0.18), inertia_diag=(0.012, 0.012, 0.002),
        limit=(-2, 2),
    )
    b.add_sphere("shin", (0.0, 0.0, -0.4), 0.06, foot="foot")
    return b.build()


def hopper():
    """Floating one-legged hopper with a foot sphere — contact test rig."""
    b = ModelBuilder("hopper", floating=True)
    b.base_inertial(5.0, (0, 0, 0), inertia_diag=(0.1, 0.1, 0.1))
    b.add_link(
        "leg", "base", joint_pos=(0, 0, -0.1), joint_axis=(0, 1, 0), mass=1.0,
        com=(0, 0, -0.25), inertia_diag=(0.02, 0.02, 0.002), limit=(-1.5, 1.5),
        damping=0.1, power_coef=40.0,
    )
    b.add_sphere("leg", (0, 0, -0.5), 0.05, foot="foot")
    b.add_sphere("base", (0, 0, 0.1), 0.1)
    return b.build()


def foot_box(hx=0.08, hy=0.06, hz=0.02, r=0.02, m=1.0):
    """Free box with 2×2 corner collision spheres — the foot-manifold rig.

    Mirrors how the walker feet approximate the reference's box-foot contact
    manifold (models/walker3d.py corner sets): support polygon = the sphere
    rectangle."""
    ix = m * (hy * hy + hz * hz) / 3.0
    iy = m * (hx * hx + hz * hz) / 3.0
    iz = m * (hx * hx + hy * hy) / 3.0
    b = ModelBuilder("foot_box", floating=True)
    b.base_inertial(m, (0, 0, 0), inertia_diag=(ix, iy, iz))
    for sx in (-hx, hx):
        for sy in (-hy, hy):
            b.add_sphere("base", (sx, sy, -hz), r)
    return b.build()


def ball(radius=0.1, m=1.0):
    """Free sphere — the box-drop / restitution / friction gate."""
    i = 0.4 * m * radius * radius
    b = ModelBuilder("ball", floating=True)
    b.base_inertial(m, (0, 0, 0), inertia_diag=(i, i, i))
    b.add_sphere("base", (0, 0, 0), radius)
    return b.build()


def free_q(pos=(0, 0, 1.0), quat=(1, 0, 0, 0), joints=()):
    return np.array(list(pos) + list(quat) + list(joints), dtype=np.float32)


def free_qd(lin=(0, 0, 0), ang=(0, 0, 0), joints=()):
    return np.array(list(lin) + list(ang) + list(joints), dtype=np.float32)
