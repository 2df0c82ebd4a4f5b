"""Batched terrain raycast — Pallas kernel.

The north star names "terrain raycast" as a Pallas target (BASELINE.json;
SURVEY.md §2.3 ``rayTest(Batch)`` [K-med]: the reference ecosystem used ray
probes for terrain queries). Use cases here: terrain-aware observations
(height probes under/ahead of the robot for heightfield envs) and visibility
checks for vision-based footstep planning experiments.

Kernel shape: rays are marched against the heightfield by fixed-step
sampling with one bilinear height fetch per step. Batch-in-lanes like the
engine kernel: each (8, 128) tile holds 1024 rays; the heightfield grid
lives in VMEM (typical 65²–257² grids fit easily). Mosaic has no per-lane
vector gather, so the fetch is a two-level one-hot contraction over
STATICALLY indexed grid scalars — ~2·H·W MACs per march step, which lowers
on today's Mosaic (the engine kernel's heightfield patch sampling uses the
same trick at patch scale).

Returns the hit parameter t ∈ [0, max_t] (max_t when no hit) and the hit
height. A pure-JAX reference implementation (``raycast_reference``) is the
correctness oracle and the CPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
SUB = (8, 128)


def _march(origin, direction, hf, xy0, cell, max_t, num_steps, sample):
    """Shared marching loop: first step where the ray dips under terrain.

    ``sample(x, y) → h`` abstracts the height fetch so the same loop serves
    the JAX oracle and the kernel.
    """
    dt = max_t / num_steps
    H, W = hf.shape

    def body(i, carry):
        t_hit, h_hit = carry
        t = (i + 1) * dt
        px = origin[0] + t * direction[0]
        py = origin[1] + t * direction[1]
        pz = origin[2] + t * direction[2]
        h = sample(px, py)
        below = pz <= h
        first = below & (t_hit >= max_t)
        t_hit = jnp.where(first, t, t_hit)
        h_hit = jnp.where(first, h, h_hit)
        return t_hit, h_hit

    t0 = jnp.full_like(origin[0], max_t)
    h0 = jnp.zeros_like(origin[0])
    return jax.lax.fori_loop(0, num_steps, body, (t0, h0))


def _bilinear(hf, xy0, cell, px, py):
    H, W = hf.shape
    u = jnp.clip((px - xy0[0]) / cell, 0.0, H - 1.001)
    v = jnp.clip((py - xy0[1]) / cell, 0.0, W - 1.001)
    i0 = jnp.floor(u).astype(jnp.int32)
    j0 = jnp.floor(v).astype(jnp.int32)
    fu = u - i0
    fv = v - j0
    h00 = hf[i0, j0]
    h10 = hf[i0 + 1, j0]
    h01 = hf[i0, j0 + 1]
    h11 = hf[i0 + 1, j0 + 1]
    return (
        h00 * (1 - fu) * (1 - fv) + h10 * fu * (1 - fv)
        + h01 * (1 - fu) * fv + h11 * fu * fv
    )


def raycast_reference(origins, directions, hf, xy0, cell, max_t=10.0, num_steps=64):
    """Pure-JAX oracle: (B,3) origins/directions → (t_hit (B,), h_hit (B,))."""
    o = tuple(origins[:, i] for i in range(3))
    d = tuple(directions[:, i] for i in range(3))
    return _march(
        o, d, hf, xy0, cell, max_t, num_steps,
        lambda px, py: _bilinear(hf, xy0, cell, px, py),
    )


def make_raycaster(
    hf_shape: tuple,
    max_t: float = 10.0,
    num_steps: int = 64,
    interpret: bool = False,
):
    """Build ``raycast(origins (B,3), dirs (B,3), hf, xy0, cell) → (t, h)``.

    The kernel samples by one-hot contraction (no gather), so it lowers on
    Mosaic. The builder still probes the lowering once (backends change) and
    falls back to the jitted XLA oracle if the probe fails.
    """
    H, W = hf_shape

    def _march_tiles(origin, direction, sample):
        dt = max_t / num_steps

        def body(i, carry):
            t_hit, h_hit = carry
            t = (i + 1).astype(jnp.float32) * dt
            px = origin[0] + t * direction[0]
            py = origin[1] + t * direction[1]
            pz = origin[2] + t * direction[2]
            h = sample(px, py)
            below = pz <= h
            first = below & (t_hit >= max_t)
            t_hit = jnp.where(first, t, t_hit)
            h_hit = jnp.where(first, h, h_hit)
            return t_hit, h_hit

        t0 = jnp.full(SUB, max_t, dtype=jnp.float32)
        h0 = jnp.zeros(SUB, dtype=jnp.float32)
        return jax.lax.fori_loop(0, num_steps, body, (t0, h0))

    def kernel(o_ref, d_ref, hf_ref, meta_ref, t_ref, h_ref):
        origin = (o_ref[0], o_ref[1], o_ref[2])
        direction = (d_ref[0], d_ref[1], d_ref[2])
        x0 = meta_ref[0, 0]
        y0 = meta_ref[0, 1]
        cell = meta_ref[0, 2]
        hf = hf_ref[...]

        def sample(px, py):
            u = jnp.clip((px - x0) / cell, 0.0, H - 1.001)
            v = jnp.clip((py - y0) / cell, 0.0, W - 1.001)
            iu = jnp.floor(u)
            iv = jnp.floor(v)
            fu = u - iu
            fv = v - iv
            # two-level one-hot bilinear fetch: grid entries are STATIC
            # scalar loads; per-lane selection is arithmetic (no gather) —
            # same trick as the engine kernel's heightfield patch, at full
            # grid scale. Column stage first (shared across the row pair).
            ohc = [(iv == float(j)).astype(jnp.float32) for j in range(W - 1)]
            s0 = []  # Σ_j ohc[j]·hf[k, j]     per row k
            s1 = []  # Σ_j ohc[j]·hf[k, j+1]
            for k in range(H):
                a = ohc[0] * hf[k, 0]
                b = ohc[0] * hf[k, 1]
                for j in range(1, W - 1):
                    a = a + ohc[j] * hf[k, j]
                    b = b + ohc[j] * hf[k, j + 1]
                s0.append(a)
                s1.append(b)
            ohr = [(iu == float(k)).astype(jnp.float32) for k in range(H - 1)]
            h00 = ohr[0] * s0[0]
            h01 = ohr[0] * s1[0]
            h10 = ohr[0] * s0[1]
            h11 = ohr[0] * s1[1]
            for k in range(1, H - 1):
                h00 = h00 + ohr[k] * s0[k]
                h01 = h01 + ohr[k] * s1[k]
                h10 = h10 + ohr[k] * s0[k + 1]
                h11 = h11 + ohr[k] * s1[k + 1]
            return (
                h00 * (1 - fu) * (1 - fv) + h10 * fu * (1 - fv)
                + h01 * (1 - fu) * fv + h11 * fu * fv
            )

        t_hit, h_hit = _march_tiles(origin, direction, sample)
        t_ref[0] = t_hit
        h_ref[0] = h_hit

    @jax.jit
    def reference(origins, directions, hf, xy0, cell):
        return raycast_reference(origins, directions, hf, xy0, cell, max_t, num_steps)

    @jax.jit
    def raycast(origins, directions, hf, xy0, cell):
        B = origins.shape[0]
        if B % TILE != 0:
            # oracle fallback for odd batches
            return raycast_reference(
                origins, directions, hf, xy0, cell, max_t, num_steps
            )
        meta = jnp.concatenate([xy0, cell[None]]).reshape(1, 3)

        def spec(C):
            return pl.BlockSpec((C, 8, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

        o = origins.T.reshape(3, B // 128, 128)
        d = directions.T.reshape(3, B // 128, 128)
        t, h = pl.pallas_call(
            kernel,
            grid=(B // TILE,),
            in_specs=[
                spec(3), spec(3),
                pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[spec(1), spec(1)],
            out_shape=[
                jax.ShapeDtypeStruct((1, B // 128, 128), jnp.float32),
                jax.ShapeDtypeStruct((1, B // 128, 128), jnp.float32),
            ],
            interpret=interpret,
        )(o, d, hf, meta)
        return t.reshape(B), h.reshape(B)

    if interpret:
        return raycast

    # probe the Mosaic lowering once; fall back to the XLA oracle if the
    # kernel cannot lower on this backend (no vector gather yet)
    try:
        probe = (
            jnp.zeros((TILE, 3)), jnp.zeros((TILE, 3)),
            jnp.zeros((H, W)), jnp.zeros(2), jnp.asarray(0.1),
        )
        jax.jit(raycast).lower(*probe).compile()
        return raycast
    except Exception:  # pragma: no cover - backend-dependent
        return reference
