"""Multi-host bring-up (SURVEY.md §5.8, §2.4).

The reference has no distributed code; here multi-host runs are standard
JAX: ``jax.distributed.initialize`` per process, a global mesh over all
devices, env batch sharded on the ``env`` axis (collective-free stepping),
and learner gradients psum'd over ICI within a slice / DCN across slices.

Also hosts the cross-host divergence check (the engine's analog of race
detection — SURVEY.md §5.2): pure functions make races impossible, but
non-deterministic compilation or hardware faults could silently desynchronize
replicated params; the check hashes the replicated pytree on every host and
compares.
"""

from __future__ import annotations

import logging

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op on a single host).

    With no arguments, relies on the cluster environment (TPU pods set the
    coordinator automatically).
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except (ValueError, RuntimeError) as e:
        logger.info("single-process run (%s)", e)


def fingerprint(tree) -> np.ndarray:
    """Order-independent digest of a pytree's values (host-side)."""
    acc = np.zeros(2, dtype=np.float64)
    for leaf in jax.tree.leaves(tree):
        a = np.asarray(leaf, dtype=np.float64).ravel()
        acc[0] += float(a.sum())
        acc[1] += float(np.abs(a).sum())
    return acc


def check_replica_divergence(tree, mesh=None) -> bool:
    """True if the replicated pytree is identical across all hosts.

    Host-divergent values must NOT be fed into a jitted computation with
    replicated in_specs (undefined behavior — the compiler may assume
    replication and elide the reduction), so the local fingerprint is
    ``process_allgather``'d and the gathered rows compared host-side.
    ``mesh`` is accepted for API compatibility and unused.
    """
    del mesh
    local = fingerprint(tree)
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    gathered = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(local))
    ).reshape(jax.process_count(), -1)
    return bool(np.allclose(gathered, gathered[0:1], rtol=1e-6, atol=0.0))
