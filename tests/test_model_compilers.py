"""URDF / MJCF offline-compiler golden gates (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mocca_envs_tpu.models.mjcf import parse_mjcf
from mocca_envs_tpu.models.urdf import parse_urdf

PENDULUM_URDF = """
<robot name="pend">
  <link name="world_base">
    <inertial><mass value="0"/><origin xyz="0 0 0"/>
      <inertia ixx="0" iyy="0" izz="0" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <link name="rod">
    <inertial><mass value="1.3"/><origin xyz="0 0 -0.8"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.001" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 -0.8"/><geometry><sphere radius="0.05"/></geometry></collision>
  </link>
  <joint name="hinge" type="revolute">
    <parent link="world_base"/><child link="rod"/>
    <origin xyz="0 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-3" upper="3" effort="50"/>
    <dynamics damping="0.2"/>
  </joint>
</robot>
"""

WALKER_URDF = """
<robot name="mini">
  <link name="torso">
    <inertial><mass value="5"/><origin xyz="0 0 0"/>
      <inertia ixx="0.1" iyy="0.1" izz="0.05" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><sphere radius="0.1"/></geometry></collision>
  </link>
  <link name="thigh">
    <inertial><mass value="2"/><origin xyz="0 0 -0.2"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.004" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 -0.2"/>
      <geometry><capsule radius="0.04" length="0.3"/></geometry></collision>
  </link>
  <link name="foot">
    <inertial><mass value="0.5"/><origin xyz="0.05 0 0"/>
      <inertia ixx="0.001" iyy="0.002" izz="0.002" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0.05 0 -0.02"/>
      <geometry><box size="0.2 0.08 0.04"/></geometry></collision>
  </link>
  <link name="head_fixed">
    <inertial><mass value="1"/><origin xyz="0 0 0.1"/>
      <inertia ixx="0.005" iyy="0.005" izz="0.005" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <joint name="hip" type="revolute">
    <parent link="torso"/><child link="thigh"/>
    <origin xyz="0 0 -0.2"/><axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.5" effort="80"/>
  </joint>
  <joint name="ankle" type="revolute">
    <parent link="thigh"/><child link="foot"/>
    <origin xyz="0 0 -0.4"/><axis xyz="0 1 0"/>
    <limit lower="-0.8" upper="0.8" effort="30"/>
  </joint>
  <joint name="neck" type="fixed">
    <parent link="torso"/><child link="head_fixed"/>
    <origin xyz="0 0 0.3"/>
  </joint>
</robot>
"""

MJCF_HOPPER = """
<mujoco model="hop">
  <compiler angle="radian"/>
  <worldbody>
    <body name="torso" pos="0 0 1">
      <freejoint/>
      <inertial mass="5" pos="0 0 0" diaginertia="0.1 0.1 0.05"/>
      <geom type="sphere" size="0.1"/>
      <body name="leg" pos="0 0 -0.2">
        <joint name="hip" type="hinge" axis="0 1 0" range="-1.5 1.5" damping="0.3" armature="0.01"/>
        <inertial mass="2" pos="0 0 -0.2" diaginertia="0.02 0.02 0.004"/>
        <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.04"/>
        <body name="foot" pos="0 0 -0.4">
          <joint name="ankle" type="hinge" axis="0 1 0" range="-0.8 0.8"/>
          <inertial mass="0.5" pos="0.05 0 0" diaginertia="0.001 0.002 0.002"/>
          <geom type="sphere" pos="0.05 0 -0.02" size="0.04"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="hip" gear="80"/>
    <motor joint="ankle" gear="30"/>
  </actuator>
</mujoco>
"""


def test_urdf_pendulum_matches_handbuilt():
    model = parse_urdf(PENDULUM_URDF, floating=False)
    assert model.nl == 2 and model.nj == 1
    np.testing.assert_allclose(model.mass, [0.0, 1.3])
    np.testing.assert_allclose(model.com[1], [0, 0, -0.8])
    np.testing.assert_allclose(model.joint_axis[0], [0, 1, 0])
    np.testing.assert_allclose(model.damping, [0.2])
    np.testing.assert_allclose(model.power_coef, [50.0])
    # dynamics agree with the analytic pendulum
    import jax.numpy as jnp

    from mocca_envs_tpu.ops.dynamics import mass_matrix
    from mocca_envs_tpu.ops.kinematics import forward_kinematics

    fd = forward_kinematics(model, jnp.array([0.3]), jnp.array([0.0]))
    M = mass_matrix(model, fd)
    np.testing.assert_allclose(M, [[1.3 * 0.64 + 0.01]], rtol=1e-5)


def test_urdf_fixed_joint_folded():
    model = parse_urdf(WALKER_URDF, floating=True)
    # head_fixed merged into torso: 3 moving links remain
    assert model.nl == 3
    assert "head_fixed" not in model.link_names
    # torso mass includes the head
    base_idx = model.link_names.index("base")
    assert abs(float(model.mass[base_idx]) - 6.0) < 1e-6


def test_urdf_collision_canonicalization():
    model = parse_urdf(WALKER_URDF, floating=True)
    # box → 8 corner spheres, long capsule → 2 ends + middle, torso → 1
    assert model.ns == 12
    # foot link spheres tagged as foot contacts
    assert any("foot" in f for f in model.foot_links)


def test_mjcf_hopper_structure():
    model = parse_mjcf(MJCF_HOPPER)
    assert model.floating
    assert model.nj == 2
    assert model.link_names == ("base", "leg", "foot")
    np.testing.assert_allclose(model.power_coef, [80.0, 30.0])
    np.testing.assert_allclose(model.armature, [0.01, 0.0])
    np.testing.assert_allclose(model.damping, [0.3, 0.0])
    np.testing.assert_allclose(model.limit_lo, [-1.5, -0.8])
    # body offsets preserved
    np.testing.assert_allclose(model.joint_pos[0], [0, 0, -0.2])
    np.testing.assert_allclose(model.joint_pos[1], [0, 0, -0.4])


MJCF_ROTATED = """
<mujoco model="rot">
  <compiler angle="radian"/>
  <worldbody>
    <body name="torso" pos="0 0 1">
      <freejoint/>
      <inertial mass="5" pos="0 0 0" diaginertia="0.1 0.1 0.05"/>
      <body name="arm" pos="0.1 0 0" quat="0.7071068 0.7071068 0 0">
        <joint name="shoulder" type="hinge" axis="0 1 0" pos="0 0 0.05" range="-1 1"/>
        <inertial mass="1" pos="0 0 -0.2" diaginertia="0.01 0.01 0.002"/>
        <geom type="sphere" pos="0 0 -0.4" size="0.05"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="shoulder" gear="10"/></actuator>
</mujoco>
"""


def test_mjcf_body_quat_folded():
    """A body rotated 90° about +x: its joint axis, anchor, geoms and com
    must land where MuJoCo semantics put them (the round-1 compiler dropped
    body quats entirely — joint_quat stayed identity)."""
    import jax.numpy as jnp

    from mocca_envs_tpu.ops.kinematics import forward_kinematics
    from mocca_envs_tpu.ops.collide import sphere_centers

    model = parse_mjcf(MJCF_ROTATED)
    # body quat folded into the joint frame (90° about x)
    np.testing.assert_allclose(
        model.joint_quat[0], [0.7071068, 0.7071068, 0, 0], atol=1e-6
    )
    # anchor: body pos + R(quat) @ jpos; R maps +z → +y
    np.testing.assert_allclose(model.joint_pos[0], [0.1, -0.05, 0.0], atol=1e-6)
    # com re-rooted at the anchor: inertial pos (0,0,-0.2) − jpos (0,0,0.05)
    arm = model.link_names.index("arm")
    np.testing.assert_allclose(model.com[arm], [0, 0, -0.25], atol=1e-6)
    # FK at zero pose: geom at body-frame (0,0,-0.4) → world: Rx(90°) maps
    # (0,0,-0.4) to (0,+0.4,0), so the sphere sits at (0.1, 0.4, 0)
    q = jnp.concatenate(
        [jnp.zeros(3), jnp.array([1.0, 0, 0, 0]), jnp.zeros(model.nj)]
    )
    fd = forward_kinematics(model, q, jnp.zeros(model.nv))
    c = sphere_centers(model, fd)
    np.testing.assert_allclose(np.asarray(c[0]), [0.1, 0.4, 0.0], atol=1e-5)
    # joint axis (0,1,0 in body frame) acts about world (0,0,1) after the
    # 90°-about-x body rotation: rotating the joint swings the geom in xy
    q1 = q.at[7].set(0.5)
    fd1 = forward_kinematics(model, q1, jnp.zeros(model.nv))
    c1 = np.asarray(sphere_centers(model, fd1)[0])
    assert abs(c1[2] - 0.0) < 1e-5  # stays in the z=0 plane
    assert abs(c1[0] - 0.1) > 0.05  # actually moved


def test_mjcf_simulates():
    import jax

    model = parse_mjcf(MJCF_HOPPER)
    from mocca_envs_tpu.ops.step import make_substep
    from mocca_envs_tpu.terrain import scene as scene_mod
    from mocca_envs_tpu.utils.config import EngineConfig

    sub = jax.jit(make_substep(model, EngineConfig()))
    import jax.numpy as jnp

    q = jnp.concatenate([jnp.array([0.0, 0.0, 0.8]), jnp.array([1.0, 0, 0, 0]), jnp.zeros(2)])
    qd = jnp.zeros(model.nv)
    for _ in range(100):
        q, qd, info, _ = sub(q, qd, jnp.zeros(2), scene_mod.flat())
    assert bool(jnp.all(jnp.isfinite(q)))
    assert float(q[2]) > 0.0
