"""On-device metrics aggregation + host logging.

The reference's only observability is the Gym ``info`` dict and the GUI
(SURVEY.md §5.5). Here every step already emits a metrics dict
(envs/env.Transition.metrics); this module aggregates them ON DEVICE across
batch and time (so logging at cadence N costs one small transfer, not N×B
dicts) and writes host-side logs.
"""

from __future__ import annotations

import json
import logging
import time
from typing import Iterable

import jax
import jax.numpy as jnp

logger = logging.getLogger("mocca_envs_tpu")


def aggregate(metrics: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
    """Mean-reduce every metric over all leading axes (time, batch)."""
    return {k: jnp.mean(v) for k, v in metrics.items()}


def merge_means(dicts: Iterable[dict]) -> dict:
    out: dict = {}
    n = 0
    for d in dicts:
        n += 1
        for k, v in d.items():
            out[k] = out.get(k, 0.0) + float(v)
    return {k: v / max(n, 1) for k, v in out.items()}


class MetricsLogger:
    """Host logger: python logging + optional JSONL + optional TensorBoard."""

    def __init__(self, jsonl_path: str | None = None, tensorboard_dir: str | None = None):
        self._jsonl = open(jsonl_path, "a") if jsonl_path else None
        self._tb = None
        if tensorboard_dir is not None:
            try:
                from flax.metrics import tensorboard as ftb

                self._tb = ftb.SummaryWriter(tensorboard_dir)
            except Exception:  # pragma: no cover - TB optional
                logger.warning("tensorboard writer unavailable; skipping")
        self._t0 = time.time()

    def log(self, step: int, metrics: dict) -> None:
        scalars = {k: float(v) for k, v in metrics.items()}
        scalars["wall_s"] = round(time.time() - self._t0, 1)
        logger.info("step %d: %s", step, json.dumps(scalars, sort_keys=True))
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.scalar(k, v, step)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.flush()
