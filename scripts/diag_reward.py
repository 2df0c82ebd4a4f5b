"""Decompose Walker3DCustomEnv reward per term under a random policy.

Chasing the -100/step pretrain reward (tpu_allsteps_results.jsonl): the
written terms bound at ~±5/step, so something (qd blowup, potential spike,
auto-reset seam) is off-model. Run on CPU:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/diag_reward.py
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

import mocca_envs_tpu
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.models import walker3d
from mocca_envs_tpu.tasks import base as T

env = mocca_envs_tpu.make("Walker3DCustomEnv-v0")
model = walker3d.make_model()
N, STEPS = 16, 150

keys = rng_mod.env_keys(rng_mod.root_key(0), N)
st = jax.jit(jax.vmap(env.init))(keys)


@jax.jit
def roll(state, key):
    def body(carry, _):
        s, k = carry
        k, ka = jax.random.split(k)
        a = 0.6 * jax.random.normal(ka, (N, env.act_dim))
        tr = jax.vmap(env.step)(s, a)
        # recompute terms from the PRE-step state for attribution
        qd = s.qd
        from mocca_envs_tpu.ops.kinematics import joint_qd
        qdj = jax.vmap(lambda v: joint_qd(model, v))(qd)
        elec = 2.0 * jnp.mean(jnp.abs(jnp.clip(a, -1, 1) * 0.1 * qdj), axis=-1)
        out = dict(
            reward=tr.reward,
            done=tr.done.astype(jnp.float32),
            progress=tr.metrics["progress"],
            fallen=tr.metrics["fallen"],
            elec_prestate=elec,
            qd_max=jnp.max(jnp.abs(qdj), axis=-1),
            q_z=tr.state.q[:, 2],
        )
        return (tr.state, k), out

    (s, k), outs = jax.lax.scan(body, (state, key), None, length=STEPS)
    return s, outs


s, outs = roll(st, jax.random.key(7))
outs = {k: np.asarray(v) for k, v in outs.items()}
r = outs["reward"]
print("reward/step mean %.2f  min %.2f  p1 %.2f  p50 %.2f" % (
    r.mean(), r.min(), np.percentile(r, 1), np.percentile(r, 50)))
print("progress mean %.2f min %.2f max %.2f  p1 %.2f p99 %.2f" % (
    outs["progress"].mean(), outs["progress"].min(), outs["progress"].max(),
    np.percentile(outs["progress"], 1), np.percentile(outs["progress"], 99)))
print("elec(prestate) mean %.3f max %.3f" % (
    outs["elec_prestate"].mean(), outs["elec_prestate"].max()))
print("qd_max mean %.1f  p99 %.1f  max %.1f" % (
    outs["qd_max"].mean(), np.percentile(outs["qd_max"], 99), outs["qd_max"].max()))
print("done rate %.4f  fallen rate %.4f" % (outs["done"].mean(), outs["fallen"].mean()))
print("q_z mean %.2f min %.2f" % (outs["q_z"].mean(), outs["q_z"].min()))

# where do the most negative rewards happen?
idx = np.unravel_index(np.argmin(r), r.shape)
t, i = idx
print("worst reward %.2f at t=%d env=%d: progress=%.2f fallen=%.0f done=%.0f qd_max=%.1f" % (
    r[t, i], t, i, outs["progress"][t, i], outs["fallen"][t, i],
    outs["done"][t, i], outs["qd_max"][t, i]))
# correlate: is reward ~ progress?
flat_r, flat_p = r.ravel(), outs["progress"].ravel()
print("corr(reward, progress) = %.3f" % np.corrcoef(flat_r, flat_p)[0, 1])
mask = flat_r < -10
print("steps with reward<-10: %.4f of all; their mean progress %.2f" % (
    mask.mean(), flat_p[mask].mean() if mask.any() else float("nan")))
