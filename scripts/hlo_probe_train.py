"""CPU HLO probe: compare optimized train_step HLO between walker and
stepper (same PPOConfig) — hunting the stepper's 2.8 s/update vs the
walker's 0.37 s/update on TPU (live round-4a pipeline numbers, identical
learner). The rollout body differs across backends (oracle vs fused
kernel), but the epilogue (GAE/norm/flatten/shuffle/epochs) compiles from
the same code; a stepper-only scatter/transpose/while blowup would show
in these counts on any backend."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import collections
import re
import sys

import jax

import mocca_envs_tpu
from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner

B, H = 256, 16  # small but structurally identical graph


def op_stats(env_id):
    env = mocca_envs_tpu.make(env_id)
    cfg = PPOConfig(horizon=H, num_epochs=4, num_minibatches=4,
                    reward_scale=0.1, mirror_coef=4.0, log_std_min=-1.0)
    learner = PPOLearner(env, cfg, num_envs=B)
    state = learner.init(seed=0)
    lowered = jax.jit(learner.train_step.__wrapped__
                      if hasattr(learner.train_step, "__wrapped__")
                      else learner.train_step)
    comp = learner.train_step.lower(state).compile()
    txt = comp.as_text()
    ops = collections.Counter()
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.-]+\s*=\s*[\w\[\]{},/ ]+\s+(\w+)\(", line)
        if m:
            ops[m.group(1)] += 1
    ca = comp.cost_analysis()
    flops = ca.get("flops", float("nan")) if ca else float("nan")
    bytes_ = ca.get("bytes accessed", float("nan")) if ca else float("nan")
    return env_id, len(txt.splitlines()), ops, flops, bytes_


rows = [op_stats(e) for e in
        ("Walker3DCustomEnv-v0", "Walker3DStepperEnv-v0")]
keys = sorted({k for _, _, ops, _, _ in rows for k in ops},
              key=lambda k: -max(ops.get(k, 0) for _, _, ops, _, _ in rows))
print(f"{'op':24s} " + " ".join(f"{r[0][:18]:>20s}" for r in rows))
for k in keys[:30]:
    print(f"{k:24s} " + " ".join(f"{r[2].get(k, 0):>20d}" for r in rows))
print("\nHLO lines:", [r[1] for r in rows])
print("flops:", [f"{r[3]:.3e}" for r in rows])
print("bytes:", [f"{r[4]:.3e}" for r in rows])
