"""Cassie reference-motion machinery (CassiePhase* variants).

The reference's phase envs track REFERENCE MOTIONS (``env_cassie.py``
CassiePhase* [K-med] — SURVEY.md §2.1 C4): a phase variable indexes a gait
table of motor positions and the reward tracks it. The reference's mocap
tables ship as assets; the mount is empty (SURVEY.md §0), so the machinery
here is complete and table-driven — :func:`from_npz` drops a real mocap
table in the moment assets exist — with a SYNTHESIZED parametric walking
gait as the default table:

- hip pitch: sinusoid, legs π out of phase (alternating gait);
- knee: flexion bump during each leg's swing half-cycle (ground clearance),
  slight extension in stance;
- ankle/foot: counter-rotates the knee to keep the foot level;
- hip roll/yaw/abduction: zero (straight-line walk).

The table form matches how mocap-tracking pipelines index clips (phase →
row, linear interpolation between rows), so the tracking reward, the obs
clock, and the contact clock are IDENTICAL machinery whether the table came
from mocap or from the parametric generator.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import struct


class GaitTable(struct.PyTreeNode):
    """Clock-indexed reference motion.

    ``q_motors`` rows are motor-space poses (same order/scale as the action
    head's PD targets); ``stance`` rows are per-foot stance indicators
    (1 = expected on the ground) for the contact clock.
    """

    q_motors: jnp.ndarray   # (T, n_motors) reference motor positions
    stance: jnp.ndarray     # (T, 2) right/left expected ground contact
    period_steps: jnp.ndarray  # () control steps per gait cycle

    @property
    def length(self) -> int:
        return self.q_motors.shape[0]

    def at_phase(self, phase: jnp.ndarray):
        """Linear interpolation at ``phase`` ∈ [0, period_steps).

        → (q_ref (n_motors,), stance (2,)). Gather-free: one-hot row
        weights ride the MXU under vmap (cf. terrain/scene.hf_sample_onehot).
        """
        T = self.length
        u = jnp.mod(phase, self.period_steps) / self.period_steps * T
        i0 = jnp.floor(u).astype(jnp.int32)
        f = u - i0
        ar = jnp.arange(T)
        w = (
            (i0 == ar) * (1.0 - f) + (jnp.mod(i0 + 1, T) == ar) * f
        ).astype(self.q_motors.dtype)                       # (T,)
        q_ref = w @ self.q_motors
        st = w @ self.stance
        return q_ref, st


def synthesized_walk(
    n_motors: int = 10,
    period_steps: float = 40.0,
    rows: int = 64,
    hip_amp: float = 0.30,
    knee_amp: float = 0.45,
    knee_stance: float = 0.08,
    foot_level: float = 0.7,
) -> GaitTable:
    """Parametric alternating walking gait → GaitTable.

    Motor layout follows models/cassie.py: per leg
    [abduction, yaw, hip_pitch, knee, foot]; right leg first.
    PROVENANCE: amplitudes are plausible cassie-scale values [K-med]; the
    reference's actual mocap numbers are unavailable (empty mount).
    """
    t = np.linspace(0.0, 2 * np.pi, rows, endpoint=False)
    q = np.zeros((rows, n_motors), dtype=np.float32)
    stance = np.zeros((rows, 2), dtype=np.float32)
    for leg, phase_off in ((0, 0.0), (1, np.pi)):           # right, left
        ph = t + phase_off
        hip = hip_amp * np.sin(ph)
        # swing = sin(ph) > 0 half-cycle (leg moving forward): flex the knee
        swing = (np.sin(ph) > 0).astype(np.float32)
        bump = np.maximum(np.sin(ph), 0.0) ** 2
        knee = knee_stance + knee_amp * bump
        foot = -foot_level * knee                            # keep foot level
        base = leg * 5
        q[:, base + 2] = hip
        q[:, base + 3] = knee
        q[:, base + 4] = foot
        stance[:, leg] = 1.0 - swing
    return GaitTable(
        q_motors=jnp.asarray(q),
        stance=jnp.asarray(stance),
        period_steps=jnp.asarray(float(period_steps)),
    )


def from_npz(path: str, period_steps: float) -> GaitTable:
    """Load a real reference-motion table (mocap) — the asset seam.

    Expected arrays: ``q_motors (T, n_motors)`` and optionally
    ``stance (T, 2)`` (derived from q if absent: a leg whose knee is near
    its row-minimum flexion is assumed in stance).
    """
    data = np.load(path)
    q = np.asarray(data["q_motors"], dtype=np.float32)
    if "stance" in data:
        st = np.asarray(data["stance"], dtype=np.float32)
    else:
        st = np.zeros((q.shape[0], 2), dtype=np.float32)
        for leg in range(2):
            knee = q[:, leg * 5 + 3]
            st[:, leg] = (knee < np.median(knee)).astype(np.float32)
    return GaitTable(
        q_motors=jnp.asarray(q),
        stance=jnp.asarray(st),
        period_steps=jnp.asarray(float(period_steps)),
    )
