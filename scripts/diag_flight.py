"""Isolate the energy-injection path that sends walkers to z=50m.

Test A: airborne walker (z=5, no contacts possible) + violent random
torques. Newtonian invariant: COM linear acceleration == gravity exactly;
any drift means actuation/dynamics leaks net force onto the base.

Test B: on-ground walker + random torques, log base z / vz over time to see
whether contacts launch it.

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/diag_flight.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from mocca_envs_tpu.models import walker3d
from mocca_envs_tpu.ops.step import make_control_step
from mocca_envs_tpu.ops.kinematics import forward_kinematics
from mocca_envs_tpu.terrain import scene as scene_mod
from mocca_envs_tpu.utils.config import EngineConfig

model = walker3d.make_model()
config = EngineConfig(use_pallas=False)


def actuation(q, qd, a):
    return model.power_coef * model.actuated * jnp.clip(a, -1.0, 1.0)


control = make_control_step(model, config, actuation=actuation)
scene = scene_mod.flat()


def com_state(q, qd):
    fd = forward_kinematics(model, q, qd)
    m = model.mass
    com = jnp.sum(fd.com_w * m[:, None], axis=0) / jnp.sum(m)
    # link_vel may not exist; fall back to base vz
    return com


def rollout(z0, steps, seed):
    qj = jnp.zeros(model.nj)
    q = jnp.concatenate([jnp.array([0.0, 0.0, z0]), jnp.array([1.0, 0.0, 0.0, 0.0]), qj])
    qd = jnp.zeros(model.nv)

    def body(carry, k):
        q, qd = carry
        a = jax.random.uniform(k, (model.nj,), minval=-1.0, maxval=1.0)
        q2, qd2, info = control(q, qd, a, scene)
        return (q2, qd2), (com_state(q2, qd2), q2[2], qd2[2], jnp.max(jnp.abs(qd2[6:])))

    keys = jax.random.split(jax.random.key(seed), steps)
    (_, _), (coms, z, vz, qdmax) = jax.lax.scan(body, (q, qd), keys)
    return coms, z, vz, qdmax


# Test A: airborne — COM must free-fall: com_z(t) = z0 - 0.5 g t^2
coms, z, vz, qdmax = map(np.asarray, jax.jit(lambda: rollout(50.0, 60, 0))())
dt = config.control_dt
t = (np.arange(60) + 1) * dt
expect = coms[0, 2] + 9.8 * 0.5 * dt**2 - 0.5 * 9.8 * t**2  # rough
print("A: airborne, random torques")
print("   com_z[0]=%.4f com_z[-1]=%.4f  freefall predicts %.4f" % (
    coms[0, 2], coms[-1, 2], 50.0 - 0.5 * 9.8 * (60 * dt) ** 2))
print("   com_xy drift: %.4f m" % np.linalg.norm(coms[-1, :2] - coms[0, :2]))
print("   base vz[-1]=%.3f (freefall: %.3f)  qdmax=%.1f" % (vz[-1], -9.8 * 60 * dt, qdmax.max()))

# Test B: on ground
coms, z, vz, qdmax = map(np.asarray, jax.jit(lambda: rollout(walker3d.INITIAL_Z + 0.02, 150, 1))())
print("B: grounded, random torques")
for i in range(0, 150, 25):
    print("   t=%3d base_z=%7.2f vz=%7.2f com_z=%7.2f qdmax=%6.1f" % (i, z[i], vz[i], coms[i, 2], qdmax[i]))

# Test C: tiny torques airborne (no limit hits, no MAX_VEL) — continuous dynamics only
def rollout_scaled(z0, steps, seed, scale, model_=None):
    mdl = model_ or model
    ctl = make_control_step(mdl, config, actuation=lambda q, qd, a: mdl.power_coef * mdl.actuated * jnp.clip(a, -1.0, 1.0))
    qj = jnp.zeros(mdl.nj)
    q = jnp.concatenate([jnp.array([0.0, 0.0, z0]), jnp.array([1.0, 0.0, 0.0, 0.0]), qj])
    qd = jnp.zeros(mdl.nv)

    def body(carry, k):
        q, qd = carry
        a = scale * jax.random.uniform(k, (mdl.nj,), minval=-1.0, maxval=1.0)
        q2, qd2, info = ctl(q, qd, a, scene)
        fd = forward_kinematics(mdl, q2, qd2)
        com = jnp.sum(fd.com_w * mdl.mass[:, None], axis=0) / jnp.sum(mdl.mass)
        return (q2, qd2), (com, qd2[2], jnp.max(jnp.abs(qd2[6:])))

    keys = jax.random.split(jax.random.key(seed), steps)
    (_, _), out = jax.lax.scan(body, (q, qd), keys)
    return out

coms, vz, qdmax = map(np.asarray, jax.jit(lambda: rollout_scaled(50.0, 60, 0, 0.03))())
T = 60 * dt
print("C: airborne, 3%% torques: com_z[-1]=%.4f (freefall %.4f) xy drift %.5f vz[-1]=%.3f (ff %.3f) qdmax=%.2f" % (
    coms[-1, 2], 50.0 - 0.5 * 9.8 * T * T, np.linalg.norm(coms[-1, :2] - coms[0, :2]), vz[-1], -9.8 * T, qdmax.max()))

# Test D: full torques, limits widened to +-50 rad (never hit)
import dataclasses as _dc
wide = model.replace(limit_lo=model.limit_lo * 0 - 50.0, limit_hi=model.limit_hi * 0 + 50.0)
coms, vz, qdmax = map(np.asarray, jax.jit(lambda: rollout_scaled(50.0, 60, 1, 1.0, wide))())
print("D: airborne, full torques, no limits: com_z[-1]=%.4f (freefall %.4f) xy drift %.4f vz[-1]=%.3f qdmax=%.1f" % (
    coms[-1, 2], 50.0 - 0.5 * 9.8 * T * T, np.linalg.norm(coms[-1, :2] - coms[0, :2]), vz[-1], qdmax.max()))
