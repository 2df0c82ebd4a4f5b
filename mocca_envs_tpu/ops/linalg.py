"""Small-matrix batched linear algebra, unrolled for TPU.

XLA's ``lax.linalg.cholesky``/``triangular_solve`` lower to dynamic-slice
loops that run catastrophically slowly for the locomotion-scale systems this
engine solves (nv ≈ 10–30, batch ≥ 4096): measured ~12 ms for a (4096, 27,
27) factorization on TPU v5 lite — the single largest cost in the whole
step. These routines unroll the recurrences over the STATIC matrix dimension
so XLA sees straight-line vector code over the batch (VPU lanes), with no
dynamic slicing and no per-column kernel launches.

All functions take a single matrix/vector and are designed to be ``vmap``-ed
over the env batch; n is read from the static shape.
"""

from __future__ import annotations

import jax.numpy as jnp

_JITTER = 1e-9


def chol_factor(M: jnp.ndarray) -> jnp.ndarray:
    """Lower-Cholesky of SPD ``M`` (n, n), left-looking, fully unrolled.

    ≈ n small fused steps; each step is vectorized over the batch under
    ``vmap``. Diagonal is clamped positive so a marginally non-PD input
    (f32 roundoff on near-singular trees) degrades gracefully instead of
    emitting NaNs into the whole env batch.
    """
    n = M.shape[-1]
    cols = []
    for j in range(n):
        if j == 0:
            s = M[:, 0]
        else:
            Lj = jnp.stack([c[j] for c in cols])          # (j,) row j of L
            Lprev = jnp.stack(cols, axis=1)               # (n, j)
            s = M[:, j] - Lprev @ Lj
        d = jnp.sqrt(jnp.maximum(s[j], _JITTER))
        col = s / d
        # zero the strictly-upper part of this column
        mask = jnp.arange(n) >= j
        cols.append(jnp.where(mask, col, 0.0))
    return jnp.stack(cols, axis=1)


def solve_lower(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Forward substitution ``L y = b`` with lower-triangular L.

    ``b`` may be (n,) or (n, k); unrolled over rows.
    """
    n = L.shape[-1]
    ys = []
    for i in range(n):
        s = b[i]
        if i > 0:
            Yprev = jnp.stack(ys)                         # (i, …)
            s = s - jnp.tensordot(L[i, :i], Yprev, axes=1)
        ys.append(s / L[i, i])
    return jnp.stack(ys)


def solve_upper_from_lower(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Back substitution ``Lᵀ x = b`` using the lower factor, unrolled."""
    n = L.shape[-1]
    xs = [None] * n
    for i in range(n - 1, -1, -1):
        s = b[i]
        if i < n - 1:
            Xnext = jnp.stack(xs[i + 1:])                 # (n-1-i, …)
            s = s - jnp.tensordot(L[i + 1:, i], Xnext, axes=1)
        xs[i] = s / L[i, i]
    return jnp.stack(xs)


def cho_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``M x = b`` given ``L = chol_factor(M)``."""
    return solve_upper_from_lower(L, solve_lower(L, b))


def chol_inverse(L: jnp.ndarray) -> jnp.ndarray:
    """Explicit ``M⁻¹`` from its Cholesky factor.

    ``M⁻¹ = L⁻ᵀ L⁻¹`` with the triangular inverse done by substitution
    against the identity. Worth it when M⁻¹ is applied to many right-hand
    sides (Delassus build + impulse map): afterwards every application is a
    single MXU matmul instead of a substitution chain.
    """
    n = L.shape[-1]
    Linv = solve_lower(L, jnp.eye(n, dtype=L.dtype))
    return Linv.T @ Linv
