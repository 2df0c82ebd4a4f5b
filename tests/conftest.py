"""Test harness configuration.

Per SURVEY.md §4.4 ("distributed-without-a-cluster"): tests run on CPU with 8
virtual devices so mesh/collective tests exercise real shardings without TPU
hardware. Must run before the first ``import jax`` anywhere in the test
process.
"""

import os

# Force CPU. The box's sitecustomize imports jax and registers an axon TPU
# backend before conftest runs, and jax snapshots JAX_PLATFORMS at import —
# so env-var edits here are too late for THIS process (they still matter for
# subprocesses spawned by tests). Update jax.config directly instead; this
# works any time before first backend use. Tests must never claim the
# (single, exclusively-locked) TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite is compile-dominated (hundreds of
# distinct jitted step/env variants); caching executables on disk makes
# repeated runs minutes faster.
#
# Flake note (observed rounds 3 and 4): under a COLD cache plus heavy
# concurrent host load (e.g. two suites at once, or a TPU training process
# alongside), the C++ layer under compilation_cache.put_executable_and_time
# can SIGABRT the whole pytest process mid-write — the pattern matches
# compile-thread memory pressure, not any test. Warm-cache sequential reruns
# have always been green. Run ONE suite at a time; don't chase the abort
# into the tests.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
