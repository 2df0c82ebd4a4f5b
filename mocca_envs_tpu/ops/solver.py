"""Impulse-space constraint solver: projected Gauss–Seidel over the Delassus
operator.

TPU-native replacement for Bullet's sequential-impulse (PGS) contact +
constraint solver inside ``stepSimulation`` (SURVEY.md §2.3). Same
mathematical family as the reference engine — velocity-level impulses,
Baumgarte stabilization, box (two-direction) friction — but restructured for
the hardware:

- fixed row count and fixed iteration count (branchless, vmap-safe —
  SURVEY.md §7.3 hard part #1);
- the Delassus matrix ``A = J M⁻¹ Jᵀ`` is formed explicitly with the mass
  matrix Cholesky factor reused from forward dynamics — batched matmuls on
  the MXU rather than per-impulse recursions;
- the Gauss–Seidel sweep maintains the residual incrementally (one axpy per
  row), so a sweep costs nr² flops across the whole batch on the VPU.

Row layout (static per env family):
    [ equality rows (ne) | joint-limit rows (nlim) | contact blocks (nc × [normal, t1, t2]) ]

Equality rows cover the closed-chain rods and planar locks (reference
behavior B3, ``createConstraint(JOINT_POINT2POINT)``) and monkey-bar grabs
(behavior B8) via activity masks — constraint *activation* is data, never
structure.

Joint-limit rows are unilateral (λ ≥ 0, no friction), one per limited
joint, signed toward the nearer bound — Bullet likewise resolves limits as
solver constraint rows (SURVEY.md §2.3). A position-projection clamp is NOT
equivalent: zeroing a joint velocity outside the solver exchanges no
momentum with the rest of the tree, and under strong torques the resulting
limit-chatter pumps energy until the whole robot flies (measured: random
torques sent the walker to z≈50 m — scripts/diag_flight.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def delassus(Minv: jnp.ndarray, J: jnp.ndarray, cfm: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``A = J M⁻¹ Jᵀ + cfm·I`` and ``M⁻¹ Jᵀ`` (kept for the velocity update).

    ``Minv`` is the explicit inverse from ops/dynamics.forward_dynamics, so
    both products are single MXU matmuls under vmap.
    """
    MinvJT = Minv @ J.T                                      # (nv, nr)
    A = J @ MinvJT
    A = A + cfm * jnp.eye(A.shape[0], dtype=A.dtype)
    return A, MinvJT


def pgs_solve(
    A: jnp.ndarray,        # (nr, nr) Delassus + regularization
    c: jnp.ndarray,        # (nr,)  J v_free − target   (residual at λ = 0)
    active: jnp.ndarray,   # (nr,)  1.0 = row participates
    mu: jnp.ndarray,       # (nc,)  per-contact friction coefficient
    ne: int,               # static: number of unbounded equality rows
    nc: int,               # static: number of contact blocks
    iters: int,            # static: fixed sweep count
    nlim: int = 0,         # static: unilateral joint-limit rows after ne
    block: bool = False,   # static: exact 2×2 friction solve per contact
    lam0: jnp.ndarray | None = None,   # warm-start impulses (previous substep)
) -> jnp.ndarray:
    """Return impulses λ (nr,). Complementarity: equality rows unbounded,
    limit rows λ ≥ 0, normal rows λ ≥ 0, friction rows |λ_t| ≤ μ λ_n (box
    friction, matching Bullet's default two-direction friction model).

    ``block=True`` (EngineConfig.block_pgs) upgrades each contact visit to a
    block Gauss–Seidel step: the normal row keeps its exact scalar projected
    update (so normal complementarity is exact per visit), then the two
    friction rows are solved as a coupled 2×2 system and box-clamped —
    the tangent rows couple through A whenever the tangent directions are
    not M⁻¹-orthogonal, and the joint solve removes the t1↔t2 chatter of
    row PGS. While friction bounds are inactive both orders share the unique
    mixed-LCP fixed point; at a saturated bound the box LCP admits distinct
    valid corners per sweep order (Bullet is likewise order-dependent). The
    extra cost is one precomputed 2×2 inverse per contact and 4 madds per
    visit.
    """
    nr = ne + nlim + 3 * nc
    diag = jnp.maximum(jnp.diagonal(A), 1e-9)

    if block and nc:
        # per-contact 2×2 friction-block inverses (A is constant over sweeps)
        tb = ne + nlim + 3 * jnp.arange(nc)
        a11 = jnp.maximum(A[tb + 1, tb + 1], 1e-9)
        a22 = jnp.maximum(A[tb + 2, tb + 2], 1e-9)
        a12 = A[tb + 1, tb + 2]
        det = jnp.maximum(a11 * a22 - a12 * a12, 1e-12)
        fi11, fi22, fi12 = a22 / det, a11 / det, -a12 / det

    def sweep(_, carry):
        lam, r = carry

        def update(lam, r, i, new):
            new = new * active[i]
            d = new - lam[i]
            lam = lam.at[i].set(new)
            r = r + A[:, i] * d
            return lam, r

        def update2(lam, r, i, j, new_i, new_j):
            new_i = new_i * active[i]
            new_j = new_j * active[j]
            di = new_i - lam[i]
            dj = new_j - lam[j]
            lam = lam.at[i].set(new_i).at[j].set(new_j)
            r = r + A[:, i] * di + A[:, j] * dj
            return lam, r

        for i in range(ne):
            lam, r = update(lam, r, i, lam[i] - r[i] / diag[i])
        for i in range(ne, ne + nlim):
            lam, r = update(lam, r, i, jnp.maximum(0.0, lam[i] - r[i] / diag[i]))
        for k in range(nc):
            b = ne + nlim + 3 * k
            lam, r = update(lam, r, b, jnp.maximum(0.0, lam[b] - r[b] / diag[b]))
            bound = mu[k] * lam[b]
            if block:
                d1 = -(fi11[k] * r[b + 1] + fi12[k] * r[b + 2])
                d2 = -(fi12[k] * r[b + 1] + fi22[k] * r[b + 2])
                lam, r = update2(
                    lam, r, b + 1, b + 2,
                    jnp.clip(lam[b + 1] + d1, -bound, bound),
                    jnp.clip(lam[b + 2] + d2, -bound, bound),
                )
            else:
                for t in (b + 1, b + 2):
                    lam, r = update(
                        lam, r, t, jnp.clip(lam[t] - r[t] / diag[t], -bound, bound)
                    )
        return lam, r

    # zeros_like (not zeros): under shard_map the carry must match c's
    # varying-axes type, or the fori_loop carry typecheck fails
    if lam0 is None:
        lam0 = jnp.zeros_like(c)
        r0 = c
    else:
        # warm start (EngineConfig.warm_start): begin from the previous
        # substep's impulses — rows keep their meaning across substeps
        # (static layout), so convergence needs fewer sweeps. Masked rows
        # must start at 0 or their stale impulse leaks into the residual.
        lam0 = lam0 * active
        r0 = c + A @ lam0
    lam, _ = jax.lax.fori_loop(0, iters, sweep, (lam0, r0))
    return lam


def tangent_basis(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two unit tangents orthogonal to normal ``n`` (…, 3), branchless.

    Uses the revised-ONB construction (Duff et al.), stable for all normals
    including n ≈ −z, so friction frames never degenerate under vmap.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t1 = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    t2 = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t1, t2
