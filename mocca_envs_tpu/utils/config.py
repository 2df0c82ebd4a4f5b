"""Engine and environment configuration.

Reference mapping (SURVEY.md §5.6): the reference configures everything via
constructor kwargs and class attributes (``EnvBase.__init__``, timing class
attrs ``control_step`` / ``llc_frame_skip`` / ``sim_frame_skip``). Here that
splits into:

- :class:`EngineConfig` — frozen, hashable, *static*: anything that changes
  compiled code shape (rates, solver iterations). Env factories close over
  it, so changing it triggers exactly one recompile, by design.
- ``EnvParams`` (per task module) — dynamic pytree data: reward weights,
  curriculum stage, sampling ranges. Vmappable, so curricula can vary per
  env slot with NO recompile (SURVEY.md §3.5, §7.3 hard part #4).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static physics-step configuration.

    Timing reproduces the reference's three-rate hierarchy (behavior B1,
    ``env_base.py::EnvBase`` — SURVEY.md §2.2): policy acts once per control
    step; actuation (PD for Cassie) recomputes every ``llc`` frame; physics
    integrates ``sim_substeps`` times per llc frame at ``dt`` seconds.
    Walker default: 1 llc × 4 substeps at 240 Hz ⇒ 60 Hz control [K-med].
    """

    dt: float = 1.0 / 240.0
    sim_substeps: int = 4
    llc_frames: int = 1
    solver_iters: int = 4
    baumgarte: float = 0.2          # ERP-style position correction factor
    slop: float = 2e-3              # penetration allowed before correction [m]
    max_push_vel: float = 1.0       # cap on correction velocity [m/s]
    cfm: float = 1e-6               # constraint force mixing (A-diag reg.)
    contact_margin: float = 0.02    # rows activate within this distance [m]
    # Solve each contact's two friction rows as a coupled 2×2 system per
    # sweep (ops/solver.pgs_solve block mode) — same fixed point as row PGS,
    # faster convergence, so fewer solver_iters buy equal accuracy. Default
    # ON since round 2d (+20% walker throughput at 8 sweeps); since round 2i
    # the default pairs block mode with warm_start at 4 sweeps (see below),
    # full physics gate suite green (BENCH.md round-2 tables).
    block_pgs: bool = True
    # Reuse the mass-matrix Cholesky factor across the sim_substeps of one
    # llc frame (computed from the frame-start configuration). The inertia
    # matrix drifts O(|q̇|·dt) within a frame — negligible at Cassie's
    # 600 Hz × 2 substeps — while CRBA + factorization are a large share of
    # substep cost. Applied identically by the JAX oracle and the fused
    # kernel (parity-gated in tests/test_pallas_engine.py). With the
    # materialized Delassus it LOST 5-8% (round 2e: the carried (nv²,lane)
    # factor raised VMEM pressure); with matfree_pgs freeing the A block it
    # WINS (round 2i hardware matrix: mf_w4 4.51M → mf_w4_rf 4.60M walker
    # env-steps/s at B=4096). Default ON since round 2i, paired with
    # matfree_pgs.
    reuse_factor: bool = True
    # Matrix-free PGS in the fused kernel: never materialize the Delassus
    # matrix A = WᵀW. The sweep instead carries z = W·λ (nv tiles) and
    # computes each row residual on demand as c_r + W_rᵀz + cfm·λ_r — the
    # iteration is algebraically IDENTICAL to the A-form (same fixed point,
    # same per-sweep trajectory), only the state representation changes.
    # Why it wins: the A build costs nv·nr² tile-FMAs (walker: 27·60² ≈ 97k —
    # more than the 8 sweeps combined) and holds an (nr²,8,128) ≈ 14 MB
    # block in VMEM; matrix-free replaces both with 2·nv-per-row sweeps
    # (54 vs 120 ops/row for the walker) and nv carried tiles. Kernel-only
    # (the XLA oracle keeps the explicit A — its matmuls ride the MXU).
    # Default ON since round 2i: walker 2.43M → 3.94M env-steps/s alone,
    # 4.60M combined with warm_start@4 + reuse_factor (BENCH.md).
    matfree_pgs: bool = True
    # Warm-start PGS: seed each substep's impulses with the previous
    # substep's λ (zeros at each control step's first substep). The row
    # layout is static, so rows keep their meaning across substeps; the
    # solver then only has to correct the CHANGE in the contact state,
    # which converges in fewer sweeps (pair with a lower solver_iters —
    # Bullet warm-starts through persistent manifolds for the same reason).
    # Applied identically by the JAX oracle and the fused kernel. With
    # warm_start on, the oracle substep returns (q', qd', info, λ) and
    # accepts lam_in — callers that enable it must thread the carry.
    # Default ON at solver_iters=4 since round 2i: equal-accuracy physics
    # gates at half the sweeps (w4 2.75M vs default 2.43M alone; 4.60M in
    # the shipped mf_w4_rf combination — BENCH.md round-2i matrix).
    warm_start: bool = True
    # Split-impulse position correction (Bullet: btContactSolverInfo
    # .m_splitImpulse / pybullet setPhysicsEngineParameter(useSplitImpulse)).
    # With it OFF, penetration push-out rides the velocity solve as a
    # Baumgarte bias (capped at max_push_vel) — every limb slam converts
    # position error into REAL kinetic energy, which is the measured z-drift
    # pump of long random-torque rollouts (scripts/diag_pump.py: walker
    # z̄→8.8 m @ ~3000 steps; BENCH.md round-2 "known wart"). With it ON, the
    # velocity solve sees only the non-penetration target (stop approaching,
    # no push-out) and a SECOND solve over the unilateral rows (limits +
    # contact normals; friction and equality rows masked) computes
    # pseudo-impulses from the position error alone. The resulting
    # pseudo-velocity advances POSITIONS only and is discarded — depth decays
    # at the same ERP rate with zero momentum injected. Both engine paths
    # (ops/step.py oracle, fused kernel) apply it identically; the kernel's
    # second sweep visits only the ~(nlim+ns) unilateral rows.
    split_impulse: bool = False
    limit_margin: float = 0.15      # joint-limit rows activate within [rad|m]
    # Stone-culling fast path (SURVEY.md §7.3 hard part #1 / VERDICT r2 #6):
    # narrowphase only the ``stone_window`` stones nearest the robot root
    # (xy center distance minus the stone's bounding radius; 0 = off). The
    # window is re-selected once per CONTROL step via top_k — dynamic data,
    # static shapes — so the fused kernel compiles for K=window boxes
    # instead of the scene's full set (stepper: 20 → 6, ~3.3× fewer box
    # tests/substep). Exact whenever every stone within contact margin of
    # any collision sphere ranks inside the window — guaranteed for paths
    # sampled by terrain/stones.py since ≤3 stones can be near touch range
    # at once; 6 leaves 2× headroom over that (tests/test_stepper.py
    # culling gate). Default 6 from the round-3d hardware sweep with the
    # one-hot select (window {0,6,8,12} → {4.92, 6.47, 6.06, 5.05} M
    # env-steps/s — the first, gather-based cull LOST 38%, see BENCH.md).
    stone_window: int = 6
    # Same windowing for static triangle-mesh scenes (scene.tri_*): the
    # fused kernel compiles tri_window faces; re-selected per control step
    # by centroid distance minus face bounding radius (terrain/scene.
    # cull_tris). 0 = narrowphase every face.
    tri_window: int = 16
    gravity: tuple = (0.0, 0.0, -9.8)  # pybullet default, SURVEY.md §2.3
    # Use the fused Pallas substep kernel (ops/pallas/engine.py) when the
    # configuration supports it AND the default backend is TPU AND the
    # vmapped batch is a multiple of its tile; transparently falls back to
    # the JAX path otherwise (CPU tests, odd batches, constrained models).
    use_pallas: bool = True

    @property
    def control_dt(self) -> float:
        return self.dt * self.sim_substeps * self.llc_frames
