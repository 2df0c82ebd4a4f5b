"""Multi-host bring-up test via spawned CPU processes (SURVEY.md §4.4 #4).

Two real OS processes form a jax.distributed cluster over localhost (the
CPU stand-in for a multi-host TPU slice), build the global env mesh, step a
globally-sharded env batch, and psum-verify coherence — exercising
parallel/multihost.initialize and the cross-host path of parallel/sharded.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, "__REPO__")

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from mocca_envs_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address="__COORD__",
        num_processes=2,
        process_id=__PID__,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import mocca_envs_tpu
    from mocca_envs_tpu.core import rng as rng_mod

    mesh = Mesh(np.array(jax.devices()), ("env",))
    env = mocca_envs_tpu.make("Walker3DCustomEnv")

    B = 8  # 2 per device
    keys = rng_mod.env_keys(rng_mod.root_key(0), B)
    sh = NamedSharding(mesh, P("env"))
    state = jax.jit(jax.vmap(env.init), out_shardings=sh)(keys)
    step = jax.jit(jax.vmap(env.step), in_shardings=(sh, sh), out_shardings=sh)
    tr = step(state, jnp.zeros((B, env.act_dim)))

    # global coherence: every process sees the same global reward sum
    total = float(jnp.sum(tr.reward))
    print(f"proc {jax.process_index()} total_reward {total:.6f}", flush=True)
    assert np.isfinite(total)
    print("MULTIHOST_OK", flush=True)
    """
)


_MIXED_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, "__REPO__")

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join("__REPO__", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from mocca_envs_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address="__COORD__", num_processes=2, process_id=__PID__,
    )
    assert jax.process_count() == 2

    # Initialize the Gloo collective context NOW, while both workers are at
    # the same (cheap) point: the context is created lazily at the first
    # collective, whose key-value rendezvous times out after 30 s — less
    # than the compile-time skew of the mixed-suite train_step on a loaded
    # machine (observed DEADLINE_EXCEEDED on cpu:gloo GetKeyValue).
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("gloo_warmup")

    import numpy as np
    from jax.sharding import Mesh

    from mocca_envs_tpu.harness.mixed import MixedSuite
    from mocca_envs_tpu.harness.ppo import PPOConfig, PPOLearner

    # BASELINE config 5: mixed Walker3D+Cassie+Monkey suite, global batch
    # sharded over all 4 devices of the 2-process cluster, ONE learner.
    mesh = Mesh(np.array(jax.devices()), ("env",))
    suite = MixedSuite(MixedSuite.DEFAULT, (4, 4, 4))
    # mirror_coef ACTIVE: the suite's family-stacked mirror spec must build
    # and train under the mesh (VERDICT r2 #7)
    cfg = PPOConfig(horizon=2, num_epochs=1, num_minibatches=1, hidden=(16, 16),
                    mirror_coef=0.1)
    learner = PPOLearner(suite, cfg, mesh=mesh)
    assert learner.mirror is not None and learner.mirror.get("family")
    state = learner.init(seed=0)

    # AOT-compile BEFORE executing, then rendezvous on the coordination
    # service (long timeout): XLA:CPU's Gloo context init gives a worker
    # only 30 s at the first collective DISPATCH, which is less than the
    # compile-time skew of this program on a loaded machine. Compiling on
    # both workers first and barriering keeps dispatch skew at ~0.
    compiled = learner.train_step.lower(state).compile()
    from jax._src import distributed
    distributed.global_state.client.wait_at_barrier(
        "mixed_compiled", timeout_in_ms=900_000)
    for _ in range(2):
        state, metrics = compiled(state)
    jax.block_until_ready(state.params)

    # per-family metric channels survive the mixed merge (VERDICT r2 #7):
    # every family contributes namespaced env/ channels with finite means
    for ch in ("env/Walker3DCustomEnv/progress", "env/CassieEnv/speed",
               "env/Monkey3DStepperEnv/bars_reached"):
        assert ch in metrics, sorted(metrics)
        assert np.isfinite(float(metrics[ch])), ch

    # replicated learner params must be bit-identical across hosts
    assert multihost.check_replica_divergence(state.params)
    fp = multihost.fingerprint(jax.device_get(state.params))
    print(f"proc {jax.process_index()} params_fp {fp[0]:.17g} {fp[1]:.17g}",
          flush=True)
    print("MIXED_OK", flush=True)
    """
)


def _spawn_two(script_template, repo, coord, env):
    procs = []
    for pid in range(2):
        script = (script_template.replace("__REPO__", repo)
                  .replace("__COORD__", coord)
                  .replace("__PID__", str(pid)))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env,
            )
        )
    return procs


@pytest.mark.slow
def test_two_process_mixed_suite_trains_one_learner():
    """Config 5 end-to-end: 2-process cluster trains 2 PPO updates of the
    mixed multi-family suite; learner params identical on both hosts."""
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = _spawn_two(_MIXED_WORKER, repo, coord, env)
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("mixed-suite workers timed out:\n" + "\n---\n".join(outs))

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "MIXED_OK" in out, f"worker {i} incomplete:\n{out}"

    import re

    fps = [re.search(r"params_fp (\S+ \S+)", o).group(1) for o in outs]
    assert fps[0] == fps[1], fps


@pytest.mark.slow
def test_two_process_cluster_steps_sharded_envs(tmp_path):
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    procs = []
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU from workers
    env["JAX_PLATFORMS"] = "cpu"
    for pid in range(2):
        script = (_WORKER.replace("__REPO__", repo)
                  .replace("__COORD__", coord)
                  .replace("__PID__", str(pid)))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host workers timed out:\n" + "\n---\n".join(outs))

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "MULTIHOST_OK" in out, f"worker {i} incomplete:\n{out}"

    # both processes computed the SAME global reward sum
    import re

    totals = [re.search(r"total_reward (-?[\d.]+)", o).group(1) for o in outs]
    assert totals[0] == totals[1], totals
