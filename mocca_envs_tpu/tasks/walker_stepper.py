"""Walker3DStepperEnv — stepping-stone curriculum locomotion (ALLSTEPS).

Reconstructs ``mocca_envs/env_locomotion.py::Walker3DStepperEnv`` (SURVEY.md
§2.1 C3; behaviors B6 stone generation, B7 step-advance state machine;
BASELINE.json config 4: batched 8192 with on-device procedural terrain).

Mechanics (B7 [K-high]):
- a chain of stones is sampled at reset (terrain/stones.py) with per-env
  curriculum stage — stones are scene boxes, robot starts on stone 0;
- the env tracks the current target stone index; the observation appends
  the next TWO step targets in the heading frame (ALLSTEPS lookahead of 2);
- a target counts hit when the swing foot (feet alternate) touches within a
  radius of the stone's top center [K-med predicate]; on hit: target bonus,
  advance, shift the two-target window;
- episode ends on fall or after the final stone (success).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mocca_envs_tpu.core import quat as quat_ops
from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.envs.env import EnvState, Transition, make_fn_env
from mocca_envs_tpu.models import walker3d
from mocca_envs_tpu.models.schema import RobotModel
from mocca_envs_tpu.ops.kinematics import forward_kinematics
from mocca_envs_tpu.ops.step import make_control_step
from mocca_envs_tpu.tasks import base as T
from mocca_envs_tpu.tasks.walker_custom import WalkerParams
from mocca_envs_tpu.terrain import scene as scene_mod
from mocca_envs_tpu.terrain.stones import (
    StoneParams,
    sample_stones,
    stones_to_scene_boxes,
)
from mocca_envs_tpu.utils.config import EngineConfig


class StepperParams(struct.PyTreeNode):
    walker: WalkerParams
    stones: StoneParams
    step_radius: jnp.ndarray       # xy radius counting a stone as hit
    step_bonus: jnp.ndarray        # reward per stone hit
    success_bonus: jnp.ndarray     # completing the chain
    # PER-ENV adaptive curriculum (ALLSTEPS §4 / SURVEY.md §3.5): an env that
    # ends an episode having reached ≥ adv_threshold stones advances ITS OWN
    # stage at the in-graph auto-reset — no trainer round-trip, no recompile,
    # envs progress independently. Set ≥ num_steps to disable.
    adv_threshold: jnp.ndarray
    # Near-miss shaping (round-5 lever for the stage-8/9 wall, BENCH.md
    # round 4 "end-stage assault" conclusion): dense potential-based reward
    # on the SWING FOOT's 3-D distance to the current target stone, in
    # addition to the root-xy progress term. At the end stages (pitch ±50°,
    # r→1.35 m) the root progress gradient barely distinguishes a near-miss
    # from a short step; this term does. 0.0 (default) = exact round-4
    # reward. Potential basis resets on hit/advance (gated, like progress).
    w_nearmiss: jnp.ndarray

    @classmethod
    def default(cls) -> "StepperParams":
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)
        stones = StoneParams()
        return cls(
            walker=WalkerParams.default(),
            stones=stones,
            step_radius=f(0.3),
            step_bonus=f(6.0),
            success_bonus=f(20.0),
            adv_threshold=f(stones.num_steps - 2),
            w_nearmiss=f(0.0),
        )

    def set_curriculum(self, stage) -> "StepperParams":
        """Reference trainer API: env.set_curriculum(k) (SURVEY.md §3.5)."""
        return self.replace(stones=self.stones.set_stage(stage))


class StepperTaskState(struct.PyTreeNode):
    stone_top: jnp.ndarray     # (K, 3) top-center positions
    stone_quat: jnp.ndarray    # (K, 4)
    next_step: jnp.ndarray     # int32 current target stone index
    potential: jnp.ndarray     # −dist(root→target)/dt potential (B7 [K-med])
    foot_potential: jnp.ndarray  # −dist3(swing foot→target)/dt (near-miss
                               # shaping basis; carried even at w=0 so the
                               # pytree structure is recipe-independent)
    stage: jnp.ndarray         # per-env curriculum stage (DYNAMIC, carried
                               # across auto-resets — SURVEY.md §3.5: stage
                               # updates are data, never recompiles)


def set_stage(state: EnvState, stage) -> EnvState:
    """Trainer-facing curriculum setter on (possibly batched) env state.

    Reference API shape: ``env.set_curriculum(k)`` (SURVEY.md §3.5). Takes
    effect at each env's next reset; accepts a scalar or per-env array.
    """
    new = jnp.broadcast_to(
        jnp.asarray(stage, jnp.float32), state.task.stage.shape
    )
    return state.replace(task=state.task.replace(stage=new))


def make_walker3d_stepper(
    config: EngineConfig | None = None,
    params: StepperParams | None = None,
    model: RobotModel | None = None,
    name: str = "Walker3DStepperEnv",
    initial_z: float | None = None,
    orient_obs: bool = True,
    reset_obs: str = "zero",
):
    model = model or walker3d.make_model()
    config = config or EngineConfig()
    params = params or StepperParams.default()
    initial_z = walker3d.INITIAL_Z if initial_z is None else initial_z
    terminal_links = walker3d.terminal_links(model)
    K = params.stones.num_steps
    wp = params.walker

    foot_link_idx = tuple(
        model.link_names.index(n)
        for n in ("right_ankle_x", "left_ankle_x")
        if n in model.link_names
    )

    def actuation(q, qd, a):
        return wp.power * model.power_coef * model.actuated * jnp.clip(a, -1.0, 1.0)

    control = make_control_step(model, config, actuation=actuation)
    # obs: walker block + two lookahead targets (Δxyz in heading frame);
    # orient_obs appends the two stones' top-normal xy in the heading frame
    # (SURVEY.md §2.2 B4 [K-med] "stone orientation terms" — end-stage
    # stones tilt ±25°, so foothold tilt is task-relevant). Appended at the
    # TAIL so the walker-prefix transfer embed stays valid. Default ON since
    # round 4: two independent seeds climbed the ALLSTEPS curriculum to mean
    # stage 8.5/8.4 with tilt vision vs 5.8 blind (BENCH.md round 4), so
    # blindness was the capability bottleneck. Round-3 stepper checkpoints
    # (trained blind) need an explicit orient_obs=False to load.
    obs_dim = 8 + 2 * model.nj + len(model.foot_links) + 6 + (4 if orient_obs else 0)

    def _row(arr, idx):
        """arr[idx] via a one-hot contraction: a vmapped row gather
        scalarizes on TPU (the round-3a culling lesson), a (K,)·(K,D) dot
        rides the VPU/MXU and is EXACT at HIGHEST precision."""
        onehot = (jnp.arange(K) == idx).astype(arr.dtype)
        return jax.lax.dot(onehot, arr,
                           precision=jax.lax.Precision.HIGHEST)

    def targets_obs(q, task: StepperTaskState) -> jnp.ndarray:
        """Next-two stone targets relative to the root, heading frame (B4)."""
        yaw = T.heading_yaw(q)
        idx0 = jnp.minimum(task.next_step, K - 1)
        idx1 = jnp.minimum(task.next_step + 1, K - 1)
        rel0 = T.to_heading_frame(yaw, _row(task.stone_top, idx0) - q[0:3])
        rel1 = T.to_heading_frame(yaw, _row(task.stone_top, idx1) - q[0:3])
        parts = [rel0, rel1]
        if orient_obs:
            from mocca_envs_tpu.core import quat as quat_ops

            up = jnp.array([0.0, 0.0, 1.0])
            n0 = quat_ops.rotate(_row(task.stone_quat, idx0), up)
            n1 = quat_ops.rotate(_row(task.stone_quat, idx1), up)
            parts.append(T.to_heading_frame(yaw, n0)[0:2])
            parts.append(T.to_heading_frame(yaw, n1)[0:2])
        return jnp.concatenate(parts)

    def full_obs(state: EnvState, foot_contact) -> jnp.ndarray:
        q, qd = state.q, state.qd
        tgt = _row(state.task.stone_top,
                   jnp.minimum(state.task.next_step, K - 1))
        to_t = tgt[:2] - q[0:2]
        angle = jnp.arctan2(to_t[1], to_t[0]) - T.heading_yaw(q)
        body = T.body_obs(model, q, qd, initial_z, angle)
        q_s, qd_s = T.joint_obs(model, q, qd)
        return jnp.concatenate(
            [body, q_s, qd_s, foot_contact, targets_obs(q, state.task)]
        )

    def obs_fn(state: EnvState) -> jnp.ndarray:
        return full_obs(
            state, T.reset_foot_flags(model, config.contact_margin, state)
        )

    # reset_obs="zero": frame-0 contact flags are zeros instead of the
    # narrowphase predicate. The spawn pose is deliberately airborne
    # (z = initial_z + 0.02) so the exact flags are zero anyway (gated by
    # tests/test_reset_obs.py), and pybullet reports no contacts before
    # the first stepSimulation — but the narrowphase subgraph traced into
    # the auto-reset of every scan step dominated stepper TRAINING 13×
    # (round-4 3j rows). "exact" keeps the full predicate.
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
        kj, ks = jax.random.split(ek)
        noise = wp.init_joint_noise * jax.random.uniform(
            kj, (model.nj,), minval=-1.0, maxval=1.0
        )
        qj = jnp.clip(noise, model.limit_lo, model.limit_hi)
        start_top = jnp.array([0.0, 0.0, 0.0])
        # curriculum stage is per-env dynamic data carried across episodes;
        # a finished episode that reached ≥ adv_threshold stones advances
        # this env's stage (ALLSTEPS per-env adaptive curriculum)
        if prev is None:
            stage = params.stones.stage
        else:
            adv = (
                prev.task.next_step.astype(jnp.float32) >= params.adv_threshold
            ).astype(jnp.float32)
            stage = jnp.minimum(prev.task.stage + adv, params.stones.max_stage)
        stone_top, stone_quat = sample_stones(
            params.stones.replace(stage=stage), ks, start_top
        )
        center, half = stones_to_scene_boxes(params.stones, stone_top, stone_quat)
        scene = scene_mod.with_stones(
            stone_pos=center, stone_quat=stone_quat, stone_half=half,
            ground_z=-20.0,
        )
        q = jnp.concatenate(
            [
                jnp.array([0.0, 0.0, initial_z + 0.02]),
                jnp.array([1.0, 0.0, 0.0, 0.0]),
                qj,
            ]
        )
        qd = jnp.zeros(model.nv)
        tgt = stone_top[1]
        dist = jnp.linalg.norm(tgt[:2] - q[0:2])
        task = StepperTaskState(
            stone_top=stone_top,
            stone_quat=stone_quat,
            next_step=jnp.asarray(1, jnp.int32),
            potential=-dist / config.control_dt,
            # real basis needs FK at the reset pose; the first raw_step is
            # gated (steps==0) so a placeholder 0 never reaches the reward —
            # and reset stays FK-free (the round-4 3j lesson: compute traced
            # into the auto-reset path taxes every training scan step)
            foot_potential=jnp.zeros((), jnp.float32),
            stage=jnp.asarray(stage, jnp.float32),
        )
        return EnvState(
            q=q, qd=qd, key=key,
            reset_count=jnp.asarray(reset_count, jnp.int32),
            steps=jnp.zeros((), jnp.int32),
            task=task, scene=scene,
            done=jnp.zeros((), jnp.bool_),
            blowup_count=jnp.zeros((), jnp.int32),
        )

    def raw_step(state: EnvState, action: jnp.ndarray) -> Transition:
        q, qd, info = control(state.q, state.qd, action, state.scene)
        task = state.task

        idx = jnp.minimum(task.next_step, K - 1)
        tgt = _row(task.stone_top, idx)

        # ---- step-advance state machine (B7)
        fd = forward_kinematics(model, q, qd)
        swing = jnp.mod(task.next_step, 2)  # feet alternate [K-med]
        foot_pos = jnp.stack([fd.pos[l] for l in foot_link_idx])  # (2, 3)
        foot_contact = info.foot_contact[: len(foot_link_idx)]
        # branchless 2-way select (a vmapped dynamic index scalarizes)
        swing_pos = jnp.where(swing == 0, foot_pos[0], foot_pos[1])
        swing_touch = jnp.where(
            swing == 0, foot_contact[0], foot_contact[1]
        ) > 0.5
        close = (
            jnp.linalg.norm(swing_pos[:2] - tgt[:2]) < params.step_radius
        ) & (jnp.abs(swing_pos[2] - tgt[2]) < 0.25)
        hit = swing_touch & close
        at_last = task.next_step >= (K - 1)
        success = hit & at_last
        next_step = jnp.where(hit, jnp.minimum(task.next_step + 1, K - 1), task.next_step)

        # ---- reward (progress toward current target + stone bonuses)
        new_tgt = _row(task.stone_top, jnp.minimum(next_step, K - 1))
        dist = jnp.linalg.norm(new_tgt[:2] - q[0:2])
        potential = -dist / config.control_dt
        # on a hit the potential basis changes; gate progress to same-target steps
        progress = jnp.where(
            hit, 0.0, wp.w_progress * (potential - task.potential)
        )

        # near-miss shaping: Δ of −dist3(swing foot → target)/dt, gated to
        # steps where neither the target nor the swing-foot identity changed
        # (hit flips both) and past the placeholder first step (reset()).
        foot_pot_old_basis = (
            -jnp.linalg.norm(swing_pos - tgt) / config.control_dt
        )
        fresh = state.steps == 0
        nearmiss = jnp.where(
            hit | fresh,
            0.0,
            params.w_nearmiss * (foot_pot_old_basis - task.foot_potential),
        )
        # stored basis for the NEXT step: new swing foot vs new target
        new_swing_pos = jnp.where(
            jnp.mod(next_step, 2) == 0, foot_pos[0], foot_pos[1]
        )
        foot_potential = (
            -jnp.linalg.norm(new_swing_pos - new_tgt) / config.control_dt
        )

        tall = q[2] - tgt[2] > wp.terminal_height
        body_touch = jnp.zeros((), q.dtype)
        for l in terminal_links:
            body_touch = jnp.maximum(body_touch, info.link_contact[l])
        fallen = (~tall) | (body_touch > 0.5)

        alive = jnp.where(fallen, -wp.fall_penalty, wp.tall_bonus)
        costs = T.energy_costs(model, action, qd, wp.w_electricity, wp.w_stall)
        costs = costs + T.joints_at_limit_cost(model, q, wp.w_limit)
        reward = (
            progress + nearmiss + alive - costs
            + params.step_bonus * hit.astype(q.dtype)
            + params.success_bonus * success.astype(q.dtype)
        )

        steps = state.steps + 1
        done = fallen | success | (steps >= wp.max_steps)

        new_state = state.replace(
            q=q, qd=qd, steps=steps,
            task=StepperTaskState(
                stone_top=task.stone_top,
                stone_quat=task.stone_quat,
                next_step=next_step,
                potential=potential,
                foot_potential=foot_potential,
                stage=task.stage,
            ),
        )
        obs = full_obs(new_state, info.foot_contact)
        metrics = {
            "progress": progress,
            "nearmiss": nearmiss,
            "steps_reached": next_step.astype(jnp.float32),
            "stone_hit": hit.astype(q.dtype),
            "success": success.astype(q.dtype),
            "fallen": fallen.astype(q.dtype),
            "curriculum_stage": task.stage,
        }
        return Transition(
            state=new_state, obs=obs, reward=reward, done=done, metrics=metrics
        )

    return make_fn_env(
        name=name,
        obs_dim=obs_dim,
        act_dim=model.nj,
        reset=reset,
        raw_step=raw_step,
        obs_fn=obs_fn,
        control_dt=config.control_dt,
        # lookahead targets: Δxyz in heading frame ×2 — y components negate;
        # orientation tail (n_x, n_y) ×2 — n_y negates
        mirror=T.mirror_spec(
            model,
            extra_obs_perm=list(range(6 + (4 if orient_obs else 0))),
            extra_obs_sign=[1.0, -1.0, 1.0, 1.0, -1.0, 1.0]
            + ([1.0, -1.0, 1.0, -1.0] if orient_obs else []),
        ),
        model=model,
        reset_obs_fn=reset_obs_fn,
    )
