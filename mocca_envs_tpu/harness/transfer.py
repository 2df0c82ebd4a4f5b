"""Policy transfer across env families (ALLSTEPS pretrain → stepper).

ALLSTEPS (SURVEY.md §3.5; paper §4) trains the stepping-stone skill by
CURRICULUM on top of a walking policy, not from scratch. The obs layouts
here make that a structural embed: the walker obs
``[body, q, q̇, feet]`` is an exact PREFIX of the stepper obs
``[body, q, q̇, feet, targets(6)]`` and act layouts are identical, so the
pretrained first-layer weights drop into the top rows of the stepper's
first Dense kernel (the new target dims keep their fresh init and are
learned during curriculum), and every other leaf copies verbatim. The
running obs-normalizer embeds the same way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def embed_pytree(src, dst):
    """Copy ``src`` into ``dst`` leaf-wise; where a leaf grew (same rank,
    every src dim ≤ dst dim), place src in the leading block and keep dst's
    values (fresh init / stats) for the remainder."""

    def leaf(s, d):
        s = jnp.asarray(s)
        d = jnp.asarray(d)
        if s.shape == d.shape:
            # COPY (jnp.array), never a view: same-dtype astype would alias
            # ``src``'s buffer, and training donates the transferred state —
            # a later reuse of src (e.g. transferring one pretrain into two
            # curriculum variants) would hit deleted buffers.
            return jnp.array(s, dtype=d.dtype)
        if s.ndim == d.ndim and all(a <= b for a, b in zip(s.shape, d.shape)):
            return d.at[tuple(slice(0, n) for n in s.shape)].set(
                s.astype(d.dtype)
            )
        raise ValueError(f"cannot embed leaf {s.shape} into {d.shape}")

    return jax.tree.map(leaf, src, dst)


def transfer_train_state(src_state, dst_state, reset_log_std: float | None = None):
    """Embed a pretrained TrainState into a freshly-initialized one.

    Params and the obs-normalizer transfer (prefix-embedded); the optimizer
    state, env states and keys stay fresh — curriculum starts clean.

    ``reset_log_std`` re-opens exploration on the new task: by the end of
    pretraining PPO has annealed the Gaussian's state-independent log_std
    toward (or onto) PPOConfig.log_std_min, and a near-deterministic policy
    cannot discover the new task's contact-gated bonuses (measured: stepper
    transfer stuck at steps_reached≈1 with entropy < 0). Pass e.g. −0.5 to
    restore the fresh-init exploration level while keeping the gait.
    """
    params = embed_pytree(src_state.params, dst_state.params)
    if reset_log_std is not None:
        def reset(path, leaf):
            if any(getattr(p, "key", None) == "log_std" for p in path):
                return jnp.full_like(leaf, reset_log_std)
            return leaf

        params = jax.tree_util.tree_map_with_path(reset, params)
    return dst_state.replace(
        params=params,
        obs_norm=embed_pytree(src_state.obs_norm, dst_state.obs_norm),
    )
