"""Is train_step RETRACING every call? (CPU, tiny shapes.)

The 3j profile showed the timed 'warm' train_steps spending ~100% of
their wall time in jax tracing (cache_miss x1719, trace_to_jaxpr x12) —
i.e. the jit cache missed on every call. If a TrainState leaf's abstract
signature is unstable across updates (weak_type flap, dtype drift), the
cache misses forever; if it stabilizes after one update, only call 2
retraces. Count the pjit cache size across calls for walker vs stepper.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import time

import jax

import mocca_envs_tpu
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner


def probe(env_id):
    env = mocca_envs_tpu.make(env_id)
    cfg = PPOConfig(horizon=4, num_epochs=1, num_minibatches=2,
                    hidden=(16, 16), reward_scale=0.1, log_std_min=-1.0)
    learner = PPOLearner(env, cfg, num_envs=8)
    s = learner.init(seed=0)
    f = learner.train_step
    sizes, times = [], []
    for i in range(6):
        t0 = time.perf_counter()
        s, _ = f(s)
        jax.block_until_ready(s.params)
        times.append(time.perf_counter() - t0)
        try:
            sizes.append(f._cache_size())
        except Exception:
            sizes.append(-1)
    print(f"{env_id:26s} cache sizes {sizes}  times "
          + " ".join(f"{t:.3f}" for t in times))
    return s


s_w = probe("Walker3DCustomEnv-v0")
s_s = probe("Walker3DStepperEnv-v0")


def leaf_sig(state):
    return [
        (jax.tree_util.keystr(path), getattr(x, "dtype", type(x)),
         getattr(x, "weak_type", None), getattr(x, "shape", None))
        for path, x in jax.tree_util.tree_flatten_with_path(state)[0]
    ]


# diff signatures between consecutive stepper states to find the flapper
env = mocca_envs_tpu.make("Walker3DStepperEnv-v0")
cfg = PPOConfig(horizon=4, num_epochs=1, num_minibatches=2,
                hidden=(16, 16), reward_scale=0.1, log_std_min=-1.0)
learner = PPOLearner(env, cfg, num_envs=8)
s0 = learner.init(seed=0)
sig0 = leaf_sig(s0)
s1, _ = learner.train_step(s0)
sig1 = leaf_sig(s1)
s2, _ = learner.train_step(s1)
sig2 = leaf_sig(s2)
for a, b, tag in ((sig0, sig1, "init->1"), (sig1, sig2, "1->2")):
    diffs = [(pa, da, wa, db, wb) for (pa, da, wa, sa), (pb, db, wb, sb)
             in zip(a, b) if (da, wa, sa) != (db, wb, sb)]
    print(f"{tag}: {len(diffs)} leaf signature changes")
    for d in diffs[:20]:
        print("   ", d)
