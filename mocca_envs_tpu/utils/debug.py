"""Debug modes: NaN hunting and state validation (SURVEY.md §5.2).

The reference is single-threaded Python over one Bullet client — races are
impossible and NaNs just produce garbage episodes. Here the analogous
hazards are NaN propagation through a batch and silent divergence; the
tools:

- ``nan_debug()``: context manager enabling ``jax_debug_nans`` (per-op NaN
  tracebacks — slow, opt-in only);
- ``validate_state``: checkify-style finite-ness assertion over an EnvState
  pytree, usable inside jitted debug builds;
- production runs instead rely on the in-graph health mask
  (envs/env.make_fn_env: blow-ups force an auto-reset and are counted).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def nan_debug():
    """Enable per-op NaN checks inside the block (debug builds only)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def finite_fraction(tree) -> jnp.ndarray:
    """Fraction of finite scalars across a pytree — a cheap health metric."""
    total = 0
    finite = jnp.zeros((), jnp.float32)
    for leaf in jax.tree.leaves(tree):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            total += leaf.size
            finite = finite + jnp.sum(jnp.isfinite(leaf).astype(jnp.float32))
    return finite / max(total, 1)


def validate_state(state, name: str = "state"):
    """checkify assertion that a state pytree is fully finite.

    Use under ``jax.experimental.checkify.checkify`` in debug builds:

        err, out = checkify.checkify(lambda s: validate_state(s))(state)
        err.throw()
    """
    from jax.experimental import checkify

    for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            checkify.check(
                jnp.all(jnp.isfinite(leaf)),
                f"non-finite values in {name}{jax.tree_util.keystr(path)}",
            )
    return state
