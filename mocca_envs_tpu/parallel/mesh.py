"""Device mesh construction.

The reference has no parallelism at all (SURVEY.md §2.4: one pybullet client
per process); scaling is a first-class subsystem here. The canonical layout
is a 1-D ``env`` axis for pure data-parallel env stepping (zero collectives
in the step itself — which is why env-steps/s scales linearly over ICI) plus
an optional ``learner`` axis used by the PPO harness for gradient
reduce-scatter (BASELINE.json config 5).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def env_mesh(num_devices: int | None = None) -> Mesh:
    """1-D mesh over all (or the first N) addressable devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding: env batch dim split across the mesh."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
