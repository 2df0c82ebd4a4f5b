"""PGS solver unit gates: block (2×2 friction) mode vs row mode.

The block mode (EngineConfig.block_pgs → ops/solver.pgs_solve(block=True))
must reach the SAME fixed point as row PGS — it is an in-sweep reordering,
not a different model — while converging in fewer sweeps. Gated here on
random Delassus-like systems away from any env so regressions localize.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mocca_envs_tpu.ops.solver import pgs_solve


def _random_problem(key, nv=24, ne=2, nlim=3, nc=4, mu_scale=1.0):
    """Random J (nr, nv), SPD mass inverse, friction, residual.

    nv > nr keeps A = J M⁻¹ Jᵀ full-rank: with redundant constraints
    (nr > nv) A is singular up to the cfm regularizer and float32 PGS
    stalls in near-nullspace directions — real envs run there too, but
    fixed-point comparisons are only meaningful on the well-posed case.
    """
    nr = ne + nlim + 3 * nc
    assert nv >= nr
    k1, k2, k3, k4 = jax.random.split(key, 4)
    J = jax.random.normal(k1, (nr, nv))
    G = jax.random.normal(k2, (nv, nv)) / np.sqrt(nv)
    Minv = G @ G.T + 0.5 * jnp.eye(nv)
    A = J @ Minv @ J.T + 1e-4 * jnp.eye(nr)
    c = jax.random.normal(k3, (nr,))
    mu = (0.2 + jax.random.uniform(k4, (nc,))) * mu_scale
    active = jnp.ones((nr,))
    return A, c, active, mu, ne, nlim, nc


def _complementarity_violation(A, c, lam, ne, nlim, nc):
    """Max violation of the KKT/complementarity conditions at lam."""
    r = c + A @ lam
    v = jnp.max(jnp.abs(r[:ne])) if ne else 0.0
    for i in range(ne, ne + nlim):
        # lam >= 0, r >= 0 (up to tol), lam*r == 0
        v = jnp.maximum(v, jnp.maximum(-lam[i], jnp.maximum(-r[i], jnp.abs(lam[i] * r[i]))))
    for k in range(nc):
        b = ne + nlim + 3 * k
        v = jnp.maximum(v, jnp.maximum(-lam[b], jnp.maximum(-r[b], jnp.abs(lam[b] * r[b]))))
    return v


def test_block_pgs_same_fixed_point_when_frictionless():
    """μ = 0 reduces the system to a mixed LCP in the equality/limit/normal
    rows, whose solution is UNIQUE for SPD A — both sweep orders must land on
    it exactly. (With friction the coupled box bound μλ_n changes every
    sweep — a quasi-variational inequality where distinct sweep orders can
    settle on distinct valid points, and extreme-μ synthetic problems even
    cycle; Bullet is likewise order-dependent there. The frictional regime
    is gated by validity below and by the behavioral contact gates in
    tests/test_contact.py instead.)"""
    for seed in range(4):
        A, c, active, mu, ne, nlim, nc = _random_problem(
            jax.random.key(seed), mu_scale=0.0
        )
        row = pgs_solve(A, c, active, mu, ne, nc, 400, nlim=nlim, block=False)
        blk = pgs_solve(A, c, active, mu, ne, nc, 400, nlim=nlim, block=True)
        np.testing.assert_allclose(np.asarray(row), np.asarray(blk), atol=1e-4)
        assert float(_complementarity_violation(A, c, blk, ne, nlim, nc)) < 1e-3


def test_block_pgs_solution_is_valid_under_saturation():
    """Realistic μ: block solution satisfies normal/limit complementarity and
    keeps friction inside the box."""
    for seed in range(4):
        A, c, active, mu, ne, nlim, nc = _random_problem(jax.random.key(seed))
        blk = pgs_solve(A, c, active, mu, ne, nc, 400, nlim=nlim, block=True)
        assert float(_complementarity_violation(A, c, blk, ne, nlim, nc)) < 1e-3
        for k in range(nc):
            b = ne + nlim + 3 * k
            bound = float(mu[k] * blk[b]) + 1e-6
            assert abs(float(blk[b + 1])) <= bound
            assert abs(float(blk[b + 2])) <= bound


def test_block_pgs_converges_no_slower():
    """At a practical sweep count each mode is compared against ITS OWN
    converged point (the frictional fixed points legitimately differ — see
    above); block must be no slower on average."""
    errs_row, errs_blk = [], []
    for seed in range(8):
        A, c, active, mu, ne, nlim, nc = _random_problem(jax.random.key(100 + seed))
        ref_r = pgs_solve(A, c, active, mu, ne, nc, 600, nlim=nlim, block=False)
        ref_b = pgs_solve(A, c, active, mu, ne, nc, 600, nlim=nlim, block=True)
        row = pgs_solve(A, c, active, mu, ne, nc, 8, nlim=nlim, block=False)
        blk = pgs_solve(A, c, active, mu, ne, nc, 8, nlim=nlim, block=True)
        errs_row.append(float(jnp.linalg.norm(row - ref_r)))
        errs_blk.append(float(jnp.linalg.norm(blk - ref_b)))
    assert np.mean(errs_blk) <= np.mean(errs_row) + 1e-3, (errs_blk, errs_row)


def test_block_pgs_inactive_rows_stay_zero():
    A, c, active, mu, ne, nlim, nc = _random_problem(jax.random.key(7))
    active = active.at[ne + nlim : ne + nlim + 3].set(0.0)  # kill contact 0
    lam = pgs_solve(A, c, active, mu, ne, nc, 50, nlim=nlim, block=True)
    np.testing.assert_array_equal(np.asarray(lam[ne + nlim : ne + nlim + 3]), 0.0)
