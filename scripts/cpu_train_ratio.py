"""CPU timing probe: walker vs stepper train_step at identical PPOConfig.

On TPU the stepper trains 7.7x slower than the walker under the SAME
learner (live round-4a numbers: 0.37 vs 2.81 s/update at b4096 h128).
The CPU HLO probe found near-identical op counts/FLOPs. If the wall-time
ratio reproduces on CPU (oracle engine path), the pathology is
backend-agnostic scheduling, and fixable with fast local iteration; if
CPU is ~1x, it's TPU-specific (layout/Mosaic interaction around the
fused kernel) and needs the queued on-device 3j rows + profile."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import mocca_envs_tpu
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner

B, H = 256, 16


def bench(env_id):
    env = mocca_envs_tpu.make(env_id)
    cfg = PPOConfig(horizon=H, num_epochs=4, num_minibatches=4,
                    reward_scale=0.1, log_std_min=-1.0)
    learner = PPOLearner(env, cfg, num_envs=B)
    s = learner.init(seed=0)
    s, _ = learner.train_step(s)           # compile
    jax.block_until_ready(s.params)
    t0 = time.perf_counter()
    for _ in range(3):
        s, _ = learner.train_step(s)
    jax.block_until_ready(s.params)
    dt = (time.perf_counter() - t0) / 3
    print(f"{env_id:28s} {dt:8.4f} s/update  {B*H/dt:12,.0f} steps/s")
    return dt


w = bench("Walker3DCustomEnv-v0")
s = bench("Walker3DStepperEnv-v0")
print(f"stepper/walker ratio: {s/w:.2f}x")
