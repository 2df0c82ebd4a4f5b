"""Host-side heightfield generation (native C++ with python fallback).

The reference's ``HeightField`` scene object (SURVEY.md §2.1 C7) supplies
uneven terrain; here grids are generated host-side — natively
(native/heightfield.cpp via ctypes, built on demand with the repo Makefile)
because generation sits on the reset-population path for large batched
worlds — then sampled on device by terrain/scene.hf_sample.

Determinism: generation is part of the seeded-reset contract (behavior B9);
both the native SplitMix64 path and the NumPy fallback are exactly
reproducible per (seed), though the two paths differ from each other — the
active path is pinned per process and recorded in parity metadata.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np
import jax.numpy as jnp

from mocca_envs_tpu.terrain.scene import Scene

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None
_LIB_TRIED = False


def _native_lib():
    """Load (building if needed) the native terrain library; None if absent."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libmocca_native.so"))
    # ALWAYS run make (it is incremental): a stale committed/foreign binary
    # must never shadow heightfield.cpp edits — the seeded-terrain
    # determinism contract depends on the .so matching the source.
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
    except Exception as e:  # pragma: no cover - toolchain missing
        logger.warning("native terrain build failed (%s)", e)
        if not os.path.exists(so):
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.hf_generate.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.c_ulonglong, ctypes.c_int,
        ]
        lib.hf_generate.restype = None
        _LIB = lib
    except OSError as e:  # pragma: no cover
        logger.warning("native terrain load failed (%s); using python fallback", e)
    return _LIB


def fractal_heightfield(
    n: int = 129,
    roughness: float = 0.55,
    amplitude: float = 0.5,
    seed: int = 0,
    smooth_iters: int = 1,
    use_native: bool = True,
) -> np.ndarray:
    """Diamond-square fractal terrain, (n, n) float32, zero-mean.

    ``n`` must be 2^k + 1.
    """
    if n < 3 or ((n - 1) & (n - 2)) != 0:
        raise ValueError(f"n must be a power of two plus one, got {n}")
    lib = _native_lib() if use_native else None
    if lib is not None:
        out = np.zeros((n, n), dtype=np.float32)
        lib.hf_generate(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, float(roughness), float(amplitude), int(seed) & (2**64 - 1),
            int(smooth_iters),
        )
        return out
    return _fractal_py(n, roughness, amplitude, seed, smooth_iters)


def _fractal_py(n, roughness, amplitude, seed, smooth_iters) -> np.ndarray:
    """Pure-NumPy diamond-square fallback (same structure, numpy RNG)."""
    rng = np.random.default_rng(seed)
    h = np.zeros((n, n), dtype=np.float64)
    h[0, 0], h[0, -1], h[-1, 0], h[-1, -1] = rng.uniform(-1, 1, 4) * amplitude
    scale = amplitude
    step = n - 1
    while step > 1:
        half = step // 2
        # diamond
        for r in range(half, n, step):
            for c in range(half, n, step):
                avg = (
                    h[r - half, c - half] + h[r - half, c + half]
                    + h[r + half, c - half] + h[r + half, c + half]
                ) / 4.0
                h[r, c] = avg + rng.uniform(-1, 1) * scale
        # square
        for r in range(0, n, half):
            cstart = half if (r // half) % 2 == 0 else 0
            for c in range(cstart, n, step):
                vals = []
                if r >= half:
                    vals.append(h[r - half, c])
                if r + half < n:
                    vals.append(h[r + half, c])
                if c >= half:
                    vals.append(h[r, c - half])
                if c + half < n:
                    vals.append(h[r, c + half])
                h[r, c] = float(np.mean(vals)) + rng.uniform(-1, 1) * scale
        scale *= roughness
        step //= 2
    for _ in range(smooth_iters):
        p = np.pad(h, 1, mode="edge")
        h = sum(
            p[1 + dr: 1 + dr + n, 1 + dc: 1 + dc + n]
            for dr in (-1, 0, 1) for dc in (-1, 0, 1)
        ) / 9.0
    h -= h.mean()
    return h.astype(np.float32)


def with_heightfield(
    heights: np.ndarray,
    extent: float = 20.0,
    friction: float = 0.8,
) -> Scene:
    """Scene over a heightfield centered at the origin."""
    H, W = heights.shape
    cell = extent / (H - 1)
    return Scene(
        has_ground=False,
        has_hf=True,
        hf_height=jnp.asarray(heights),
        hf_xy0=jnp.asarray([-extent / 2.0, -extent / 2.0], dtype=jnp.float32),
        hf_cell=jnp.asarray(cell, dtype=jnp.float32),
        friction=jnp.asarray(friction, dtype=jnp.float32),
    )
