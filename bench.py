"""Headline benchmark: batched Walker3D env throughput on one chip.

Measures BASELINE.json config 2 (``Walker3DCustomEnv batched 4096 under
jit+vmap, flat terrain``) and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "env_steps/s", "vs_baseline": N/1e6}
``vs_baseline`` is the ratio against the 1M env-steps/s/chip north-star
target (BASELINE.md — the reference itself publishes no numbers).

Env knobs:
    BENCH_ENV     (default Walker3DCustomEnv-v0)  any registered env ID
    BENCH_BATCH   (default 4096)   env batch size
    BENCH_STEPS   (default 600)    control steps per timed round
    BENCH_ROUNDS  (default 3)      timed rounds (best-of reported)
    BENCH_QUICK=1                  tiny smoke config for CPU

Methodology note: the timed region is a jitted ``lax.scan`` of T full env
steps. T must be large enough to amortize the per-execution dispatch
overhead of the axon PJRT plugin (~30 ms/execute measured in round 2p —
at the old T=50 that overhead was ~45% of the reported time). T=600 sits
within 5% of the asymptotic steady-state rate fit in
``scripts/tpu_round2p_results.jsonl`` while keeping rounds short; it
matches production rollouts, which scan hundreds of steps per dispatch.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    import mocca_envs_tpu
    from mocca_envs_tpu.core import rng as rng_mod

    quick = os.environ.get("BENCH_QUICK") == "1"
    B = int(os.environ.get("BENCH_BATCH", "64" if quick else "4096"))
    T = int(os.environ.get("BENCH_STEPS", "5" if quick else "600"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "1" if quick else "3"))

    env_id = os.environ.get("BENCH_ENV", "Walker3DCustomEnv-v0")
    if env_id == "Walker3DCustomEnv-v0" and "MOCCA_TILE" not in os.environ:
        # round-3a tile sweep: the walker kernel runs 3.4% faster at
        # 2048-env tiles (12.03M vs 11.63M env-steps/s at B=4096 —
        # scripts/tpu_round3a_results.jsonl). Family-specific: other
        # kernels carry more VMEM per lane (terrain patches, stone
        # windows), so only the headline env flips the default.
        os.environ["MOCCA_TILE"] = "2048"
    env = mocca_envs_tpu.make(env_id)

    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    state = jax.jit(jax.vmap(env.init))(keys)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, ka = jax.random.split(key)
            actions = jax.random.uniform(
                ka, (B, env.act_dim), minval=-1.0, maxval=1.0
            )
            tr = jax.vmap(env.step)(state, actions)
            return (tr.state, key), ()

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=T)
        return state, key

    key = jax.random.key(1)
    t_compile = time.perf_counter()
    state, key = rollout(state, key)
    jax.block_until_ready(state.q)
    compile_s = time.perf_counter() - t_compile

    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        state, key = rollout(state, key)
        jax.block_until_ready(state.q)
        best = min(best, time.perf_counter() - t0)

    steps_per_s = B * T / best
    slug = (
        "walker3d"
        if env_id == "Walker3DCustomEnv-v0"
        else env_id.replace("-v0", "").lower()
    )
    result = {
        "metric": "%s_env_steps_per_s_b%d" % (slug, B),
        "value": round(steps_per_s, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(steps_per_s / 1_000_000.0, 4),
    }
    print(json.dumps(result))
    print(
        f"# device={jax.devices()[0].device_kind} batch={B} steps={T} "
        f"best_round={best:.3f}s compile+first={compile_s:.1f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
