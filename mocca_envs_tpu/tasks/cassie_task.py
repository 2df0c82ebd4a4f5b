"""CassieEnv family — PD-servoed closed-chain biped walking.

Reconstructs ``mocca_envs/env_cassie.py`` (SURVEY.md §2.1 C4, call stack
§3.4, behavior B3): the policy outputs 10 motor position *targets*; a PD
servo recomputes torques every llc frame while passive spring joints and the
closed-chain achilles rods act inside the solver every substep. BASELINE
config 3 runs this family batched.

Families:
- ``CassieEnv``      — 3D walk forward at a target speed.
- ``Cassie2DEnv``    — sagittal-plane variant via planar constraint rows
  (reference Cassie2D [K-med]).
- ``CassiePhaseEnv`` (mocap/phase-reward variants [K-med]) — adds a cyclic
  phase variable to the obs and a periodic gait-shaping reward; the
  reference's mocap variant tracks reference motions, reconstructed here as
  a clock-based periodic cost in the same spirit.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from mocca_envs_tpu.core import quat as quat_ops
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.envs.env import EnvState, Transition, make_fn_env
from mocca_envs_tpu.models import cassie
from mocca_envs_tpu.models.schema import RobotModel
from mocca_envs_tpu.ops.step import ConstraintSpec, make_control_step
from mocca_envs_tpu.tasks import base as T
from mocca_envs_tpu.terrain import scene as scene_mod
from mocca_envs_tpu.utils.config import EngineConfig

# Cassie three-rate timing (behavior B1 [K-med]): physics 600 Hz × 2
# substeps per llc frame, PD servo at 300 Hz, control at 30 Hz.
CASSIE_CONFIG = EngineConfig(
    dt=1.0 / 600.0,
    sim_substeps=2,
    llc_frames=10,
    # Inherits the round-2i shipped solver defaults (block-PGS + matfree +
    # warm-start@4 + reuse_factor): 2.78M control-steps/s on hardware vs
    # 1.35M for round-2e's block@8 (scripts/tpu_round2i_results.jsonl),
    # same physics gates. reuse_factor spans one llc frame's 2 substeps at
    # 600 Hz — inertia drift within a frame is negligible at that rate.
)


class CassieParams(struct.PyTreeNode):
    target_speed: jnp.ndarray       # m/s forward
    init_noise: jnp.ndarray
    terminal_height: jnp.ndarray
    w_speed: jnp.ndarray            # speed-tracking weight
    tall_bonus: jnp.ndarray
    fall_penalty: jnp.ndarray
    w_action_rate: jnp.ndarray      # smoothness cost on Δtargets
    w_torque: jnp.ndarray
    w_orientation: jnp.ndarray      # pelvis upright cost
    max_steps: jnp.ndarray
    # phase-variant fields (CassiePhase*, [K-med])
    phase_period: jnp.ndarray       # control steps per gait cycle
    w_phase: jnp.ndarray            # weight of the contact-clock reward
    w_imitation: jnp.ndarray        # weight of the reference-motion tracking

    @classmethod
    def default(cls) -> "CassieParams":
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return cls(
            target_speed=f(0.8),
            init_noise=f(0.02),
            terminal_height=f(0.65),
            w_speed=f(2.0),
            tall_bonus=f(2.0),
            fall_penalty=f(1.0),
            w_action_rate=f(0.1),
            w_torque=f(5e-5),
            w_orientation=f(1.0),
            max_steps=jnp.asarray(1000, jnp.int32),
            phase_period=f(40.0),
            w_phase=f(0.5),
            w_imitation=f(1.0),
        )


class CassieTaskState(struct.PyTreeNode):
    prev_action: jnp.ndarray   # (10,) for action-rate cost
    phase: jnp.ndarray         # cyclic phase counter (phase variants)


def make_cassie(
    config: EngineConfig | None = None,
    params: CassieParams | None = None,
    name: str = "CassieEnv",
    planar: bool = False,
    phase_obs: bool = False,
    ref_gait=None,
    reset_obs: str = "zero",
):
    """``ref_gait`` (models/cassie_gait.GaitTable) turns a phase variant into
    a reference-motion TRACKING env (the reference's CassiePhase* mocap
    behavior): the phase indexes the gait table; reward adds motor-space
    tracking of the table row (deviations from stand) and the contact clock
    follows the table's stance pattern instead of a bare sinusoid."""
    model = cassie.make_model()
    initial_z = cassie.initial_z()
    config = config or CASSIE_CONFIG
    params = params or CassieParams.default()
    spec = cassie.constraints()
    if planar:
        spec = ConstraintSpec(
            p2p_link_a=spec.p2p_link_a,
            p2p_link_b=spec.p2p_link_b,
            p2p_anchor_a=spec.p2p_anchor_a,
            p2p_anchor_b=spec.p2p_anchor_b,
            planar=True,
        )

    motor_idx = jnp.asarray(
        np.nonzero(np.asarray(model.actuated) > 0.5)[0], dtype=jnp.int32
    )
    n_motors = int(motor_idx.shape[0])
    stand = jnp.asarray(cassie.stand_q(model))
    pelvis_idx = 0

    def pd_targets(action):
        """action = Δtargets around the stand pose (B3); the PD servo —
        proportional torque at the llc rate, implicit derivative damping —
        runs inside the control unit (fused in-kernel on TPU)."""
        return stand.at[motor_idx].add(jnp.clip(action, -1.0, 1.0))

    control = make_control_step(
        model, config, constraints=spec,
        pd_targets=pd_targets,
        extra_damping=model.actuated * model.kd,
    )
    nfeet = len(model.foot_links)
    obs_dim = 8 + 2 * model.nj + nfeet + (2 if phase_obs else 0)

    def full_obs(state: EnvState, foot_contact) -> jnp.ndarray:
        q, qd = state.q, state.qd
        # walk-forward task: "target" is straight ahead (+x) — angle 0
        body = T.body_obs(model, q, qd, initial_z, jnp.zeros(()))
        q_s, qd_s = T.joint_obs(model, q, qd)
        parts = [body, q_s, qd_s, foot_contact]
        if phase_obs:
            ph = 2 * jnp.pi * state.task.phase / params.phase_period
            parts.append(jnp.stack([jnp.sin(ph), jnp.cos(ph)]))
        return jnp.concatenate(parts)

    def obs_fn(state: EnvState) -> jnp.ndarray:
        return full_obs(
            state, T.reset_foot_flags(model, config.contact_margin, state)
        )

    # cheap frame-0 obs at auto-reset (see FnEnv.reset_obs_fn)
    if reset_obs == "zero":
        nfeet = len(model.foot_links)

        def reset_obs_fn(state: EnvState) -> jnp.ndarray:
            return full_obs(state, jnp.zeros(nfeet, state.q.dtype))

    elif reset_obs == "exact":
        reset_obs_fn = None
    else:
        raise ValueError(f"unknown reset_obs mode {reset_obs!r}")

    def reset(key: jax.Array, reset_count, prev: EnvState | None = None) -> EnvState:
        ek = rng_mod.reset_key(key, reset_count)
        kj, kv = jax.random.split(ek)
        qj = stand + params.init_noise * jax.random.uniform(
            kj, (model.nj,), minval=-1.0, maxval=1.0
        )
        qj = jnp.clip(qj, model.limit_lo, model.limit_hi)
        q = jnp.concatenate(
            [
                jnp.array([0.0, 0.0, initial_z + 0.01]),
                jnp.array([1.0, 0.0, 0.0, 0.0]),
                qj,
            ]
        )
        qd = jnp.zeros(model.nv)
        return EnvState(
            q=q, qd=qd, key=key,
            reset_count=jnp.asarray(reset_count, jnp.int32),
            steps=jnp.zeros((), jnp.int32),
            task=CassieTaskState(
                prev_action=jnp.zeros(n_motors), phase=jnp.zeros(())
            ),
            scene=scene_mod.flat(),
            done=jnp.zeros((), jnp.bool_),
            blowup_count=jnp.zeros((), jnp.int32),
        )

    def raw_step(state: EnvState, action: jnp.ndarray) -> Transition:
        q, qd, info = control(state.q, state.qd, action, state.scene)

        vx = qd[0]
        speed_err = jnp.abs(vx - params.target_speed)
        speed_reward = params.w_speed * jnp.exp(-2.0 * jnp.square(speed_err))

        roll, pitch, _ = quat_ops.to_rpy(q[3:7])
        orient_cost = params.w_orientation * (jnp.square(roll) + jnp.square(pitch))

        rate_cost = params.w_action_rate * jnp.mean(
            jnp.square(action - state.task.prev_action)
        )
        torque_proxy = params.w_torque * jnp.sum(
            jnp.square(model.kp * model.actuated)
        ) * jnp.mean(jnp.square(action))

        tall = q[2] - state.scene.ground_z > params.terminal_height
        pelvis_touch = info.link_contact[pelvis_idx] > 0.5
        fallen = (~tall) | pelvis_touch
        alive = jnp.where(fallen, -params.fall_penalty, params.tall_bonus)

        reward = speed_reward + alive - orient_cost - rate_cost - torque_proxy

        phase = jnp.mod(state.task.phase + 1.0, params.phase_period)
        if ref_gait is not None:
            # reference-motion tracking (CassiePhase* mocap behavior):
            # phase indexes the gait table; track its motor-space row and
            # its stance pattern
            q_ref_dev, stance_ref = ref_gait.at_phase(state.task.phase)
            q_ref = stand[motor_idx] + q_ref_dev
            track_err = jnp.mean(jnp.square(q[7:][motor_idx] - q_ref))
            reward = reward + params.w_imitation * jnp.exp(-8.0 * track_err)
            fc = info.foot_contact[:2]
            clock_match = jnp.mean(
                jnp.where(stance_ref > 0.5, fc, 1.0 - fc)
            )
            reward = reward + params.w_phase * clock_match
        elif phase_obs:
            # clock-only shaping (no reference table): alternate-foot contact
            ph = 2 * jnp.pi * state.task.phase / params.phase_period
            want_right = jnp.sin(ph) > 0
            fc = info.foot_contact
            match = jnp.where(want_right, fc[0], fc[1])
            reward = reward + params.w_phase * match

        steps = state.steps + 1
        done = fallen | (steps >= params.max_steps)
        new_state = state.replace(
            q=q, qd=qd, steps=steps,
            task=CassieTaskState(prev_action=action, phase=phase),
        )
        obs = full_obs(new_state, info.foot_contact)
        metrics = {
            "speed": vx,
            "speed_reward": speed_reward,
            "fallen": fallen.astype(q.dtype),
            "pelvis_height": q[2],
        }
        if ref_gait is not None:
            metrics["track_err"] = track_err
            metrics["clock_match"] = clock_match
        return Transition(
            state=new_state, obs=obs, reward=reward, done=done, metrics=metrics
        )

    return make_fn_env(
        name=name,
        obs_dim=obs_dim,
        act_dim=n_motors,
        reset=reset,
        raw_step=raw_step,
        obs_fn=obs_fn,
        control_dt=config.control_dt,
        model=model,
        reset_obs_fn=reset_obs_fn,
    )
