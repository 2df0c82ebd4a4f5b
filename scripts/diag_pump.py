"""Quantify contact/limit Baumgarte energy pumping under random torques.

Round-2r steady-state benches exposed a slow upward drift of torque-driven
families over long random-torque rollouts (walker z_mean 8.8 after ~3000
control steps; Child3D 104.8), while PD-driven families stay at normal
heights. Hypothesis: the ERP bias (capped at EngineConfig.max_push_vel,
default 1.0 m/s) is mixed into the REAL velocity, so every limb slam
converts penetration depth into kinetic energy (the classic Baumgarte-pump;
engines fix it with split impulse — roadmap).

This script measures z drift vs max_push_vel (kernel and oracle share the
bias formula) so the default can be chosen on evidence. Run it on the TPU
(fused kernel engages at B a multiple of 1024; the CPU oracle path takes
~8 min per config at B=64):

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_pump.py
"""

import dataclasses
import json

import jax
import jax.numpy as jnp

import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.utils.config import EngineConfig

B, T = 1024, 2000


def run(env_id, push):
    env = mocca_envs_tpu.make(
        env_id, config=dataclasses.replace(EngineConfig(), max_push_vel=push)
    )
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)

    @jax.jit
    def roll(state, key):
        def body(carry, _):
            state, key = carry
            key, ka = jax.random.split(key)
            a = jax.random.uniform(ka, (B, env.act_dim), minval=-1.0, maxval=1.0)
            tr = jax.vmap(env.step)(state, a)
            return (tr.state, key), tr.state.q[:, 2]

        (state, key), zs = jax.lax.scan(body, (state, key), None, length=T)
        return state, zs

    state, zs = roll(state, jax.random.key(1))
    return {
        "env": env_id,
        "max_push_vel": push,
        "z_mean_final": round(float(zs[-1].mean()), 3),
        "z_max_final": round(float(zs[-1].max()), 3),
        "z_mean_t500": round(float(zs[499].mean()), 3),
        "finite": bool(jnp.all(jnp.isfinite(state.q))),
    }


if __name__ == "__main__":
    for env_id in ("Walker3DCustomEnv", "Child3DCustomEnv"):
        for push in (1.0, 0.25, 0.05):
            print(json.dumps(run(env_id, push)), flush=True)
