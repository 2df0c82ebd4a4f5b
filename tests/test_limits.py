"""Joint-limit enforcement gate."""

import jax
import jax.numpy as jnp

from mocca_envs_tpu.ops.step import make_substep
from mocca_envs_tpu.terrain import scene as scene_mod
from mocca_envs_tpu.utils.config import EngineConfig

from tests.models_util import hopper


def test_torque_cannot_push_past_limit():
    model = hopper()  # leg joint limit (-1.5, 1.5)
    sub = jax.jit(make_substep(model, EngineConfig()))
    scene = scene_mod.flat(ground_z=-100.0)  # free space
    q = jnp.concatenate(
        [jnp.array([0.0, 0.0, 2.0]), jnp.array([1.0, 0, 0, 0]), jnp.zeros(1)]
    )
    qd = jnp.zeros(model.nv)
    tau = jnp.full((model.nj,), 100.0)  # slam into the upper limit
    for _ in range(300):
        q, qd, _, _ = sub(q, qd, tau, scene)
    qj = float(q[7])
    assert qj <= float(model.limit_hi[0]) + 1e-5, qj
    # velocity at the limit is killed, not accumulating
    assert abs(float(qd[6])) < 1e-4
