"""Env registry: the public entry point.

TPU-native replacement for the reference's gym-ID registration module
(``mocca_envs/__init__.py`` — SURVEY.md §2.1 C1). The reference registers
entry points with gym as an import side effect and users call
``gym.make("Walker3DCustomEnv-v0")``; here :func:`make` returns a *batched
functional env* (envs/env.py) and the same IDs are accepted for familiarity.
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register(env_id: str, factory: Callable) -> None:
    if env_id in _REGISTRY:
        raise ValueError(f"env id {env_id!r} already registered")
    _REGISTRY[env_id] = factory


def registered_envs() -> tuple[str, ...]:
    _ensure_populated()
    return tuple(sorted(_REGISTRY))


_DEFAULT_CACHE: dict[str, object] = {}


def make(env_id: str, **kwargs):
    """Instantiate a batched functional env by reference-compatible ID.

    Accepts the reference's gym IDs (``Walker3DCustomEnv-v0`` …) with or
    without the ``-v0`` suffix. Default-config envs are cached so repeated
    ``make`` calls share one set of (compiled-once) step closures — jit
    caches key on function identity, so rebuilding closures would recompile.
    """
    _ensure_populated()
    key = env_id if env_id in _REGISTRY else env_id.removesuffix("-v0")
    if key not in _REGISTRY:
        raise KeyError(
            f"unknown env id {env_id!r}; known: {', '.join(sorted(_REGISTRY))}"
        )
    if not kwargs:
        if key not in _DEFAULT_CACHE:
            _DEFAULT_CACHE[key] = _REGISTRY[key]()
        return _DEFAULT_CACHE[key]
    return _REGISTRY[key](**kwargs)


def _ensure_populated() -> None:
    # Import env family modules lazily; each registers its factories on import.
    if _REGISTRY:
        return
    from mocca_envs_tpu.envs import families  # noqa: F401
