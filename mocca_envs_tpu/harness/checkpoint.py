"""Checkpoint / resume via orbax.

The reference never serializes env state (SURVEY.md §5.4: episodes are cheap
to restart; training repos checkpointed policy weights only). Here env state
is a pytree, so full-fidelity checkpointing is one orbax call: a checkpoint
captures (env states, PRNG keys, curriculum stage, learner params/opt state,
update count) and a multi-host run resumes bit-exact modulo recompilation.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper holding the save/restore policy in one place."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        """Save a pytree (e.g. harness/ppo.TrainState) at ``step``."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_like: Any, step: int | None = None) -> Any:
        """Restore the latest (or given) step into ``state_like``'s structure."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
