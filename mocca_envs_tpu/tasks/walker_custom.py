"""Walker3DCustomEnv — walk-to-target on flat ground.

Reconstructs ``mocca_envs/env_locomotion.py::Walker3DCustomEnv`` (SURVEY.md
§2.1 C3, behaviors B1/B2/B4/B5/B9; hot-loop call stack §3.3) as pure
reset/step functions over pytree state. BASELINE.json configs 1–2 run this
family (single-env CPU parity rollout; 4096-batched flat-ground TPU
throughput).

Episode flow (reference parity):
- reset: base at (0, 0, initial_z + ε), small uniform joint-angle noise,
  target resampled on an annulus around the start [K-med ranges];
- step: torque actuation (B2) → ``llc × substeps`` physics frames →
  obs (B4: 8-dim body block + scaled joints + foot contacts + task terms) →
  reward (B5: potential progress + tall bonus − electricity/stall/limit
  costs) → termination on fall (body height below threshold or torso
  contact) or step cap; target resamples when reached.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.envs.env import EnvState, Transition, make_fn_env
from mocca_envs_tpu.models import walker3d
from mocca_envs_tpu.models.schema import RobotModel
from mocca_envs_tpu.ops.step import make_control_step
from mocca_envs_tpu.tasks import base as T
from mocca_envs_tpu.terrain import scene as scene_mod
from mocca_envs_tpu.utils.config import EngineConfig


class WalkerParams(struct.PyTreeNode):
    """Dynamic task parameters — vmappable, no-recompile (SURVEY.md §5.6).

    Reward weights follow the pybullet/roboschool walker lineage the
    reference descends from (B5 [K-med]); re-fit against the real reference
    during parity testing.
    """

    power: jnp.ndarray              # global actuation scale (B2)
    init_joint_noise: jnp.ndarray   # uniform joint-angle noise at reset
    target_dist_lo: jnp.ndarray
    target_dist_hi: jnp.ndarray
    target_angle_range: jnp.ndarray # target bearing ~ U(−r, r)
    target_reach_radius: jnp.ndarray
    terminal_height: jnp.ndarray    # fall when base z − ground < this
    w_progress: jnp.ndarray
    tall_bonus: jnp.ndarray         # +value while upright
    fall_penalty: jnp.ndarray       # −value on the falling step
    w_electricity: jnp.ndarray
    w_stall: jnp.ndarray
    w_limit: jnp.ndarray
    target_bonus: jnp.ndarray       # on reaching the target
    max_steps: jnp.ndarray          # episode cap (gym registration [K-med])

    @classmethod
    def default(cls) -> "WalkerParams":
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return cls(
            power=f(1.0),
            init_joint_noise=f(0.1),
            target_dist_lo=f(3.0),
            target_dist_hi=f(7.0),
            target_angle_range=f(jnp.pi / 2),
            target_reach_radius=f(0.25),
            terminal_height=f(0.7),
            w_progress=f(1.0),
            tall_bonus=f(2.0),
            fall_penalty=f(1.0),
            w_electricity=f(2.0),
            w_stall=f(0.1),
            w_limit=f(0.1),
            target_bonus=f(2.0),
            max_steps=jnp.asarray(1000, dtype=jnp.int32),
        )


class WalkerTaskState(struct.PyTreeNode):
    target: jnp.ndarray      # (3,) world target position
    potential: jnp.ndarray   # previous −dist/control_dt (B5 potential)


def _obs_dim(model: RobotModel) -> int:
    # 8 body + nj scaled angles + nj scaled speeds + feet flags
    return 8 + 2 * model.nj + len(model.foot_links)


def make_walker3d_custom(
    config: EngineConfig | None = None,
    params: WalkerParams | None = None,
    model: RobotModel | None = None,
    name: str = "Walker3DCustomEnv",
    initial_z: float | None = None,
    constraints=None,
    terminal_link_names: tuple | None = None,
    pd_control: bool = False,
    scene_builder=None,
    reset_obs: str = "zero",
):
    """Build the FnEnv for walk-to-target on flat ground.

    Also parameterizes the reference's model-variant walk-to-target envs:
    ``Walker2DCustomEnv`` / ``Crab2DCustomEnv`` (planar constraint spec) and
    ``Child3DCustomEnv`` (scaled model) — SURVEY.md §2.1 C3 [K-low].
    """
    from mocca_envs_tpu.ops.step import ConstraintSpec

    model = model or walker3d.make_model()
    config = config or EngineConfig()
    params = params or WalkerParams.default()
    constraints = constraints or ConstraintSpec()
    initial_z = walker3d.INITIAL_Z if initial_z is None else initial_z
    if terminal_link_names is None:
        terminal_links = walker3d.terminal_links(model)
    else:
        terminal_links = tuple(
            model.link_names.index(n) for n in terminal_link_names
        )

    if pd_control:
        # PD-servoed variant (BASELINE config 2's "flat terrain, PD control"
        # bench wording): actions are joint-angle targets in the limit range,
        # τ = k_p·(target − q) with the derivative gain handled implicitly
        # (extra_damping — see make_substep). Gains scale with the torque
        # variant's power_coef so both variants saturate comparably [K-med].
        mid = 0.5 * (model.limit_lo + model.limit_hi)
        amp = 0.5 * (model.limit_hi - model.limit_lo)
        kp = model.power_coef * jnp.where(model.actuated > 0, 1.0, 0.0)
        model = model.replace(kp=kp)
        control = make_control_step(
            model, config, constraints=constraints,
            pd_targets=lambda a: mid + amp * jnp.clip(a, -1.0, 1.0),
            extra_damping=kp / 20.0,
        )

        def cost_action(q_new, a):
            # energy costs must price the PD TORQUE, not the target: a held
            # nonzero pose at zero tracking error applies ~zero torque.
            # τ = k_p·(target − q) with k_p = power_coef ⇒ normalized torque
            # ≈ clip(target − q, ±1) (1 rad of error saturates).
            tgt = mid + amp * jnp.clip(a, -1.0, 1.0)
            return jnp.clip(tgt - q_new[7:], -1.0, 1.0)
    else:
        def cost_action(q_new, a):
            return a
        def actuation(q, qd, a):
            # behavior B2 with dynamic global power scale from params
            return params.power * model.power_coef * model.actuated * jnp.clip(a, -1.0, 1.0)

        control = make_control_step(
            model, config, constraints=constraints, actuation=actuation
        )
    obs_dim = _obs_dim(model)
    nfeet = len(model.foot_links)

    def sample_target(key, base_xy, yaw):
        kd, ka = jax.random.split(key)
        dist = rng_mod.uniform(kd, (), params.target_dist_lo, params.target_dist_hi)
        ang = yaw + rng_mod.uniform(
            ka, (), -params.target_angle_range, params.target_angle_range
        )
        return jnp.concatenate(
            [base_xy + dist * jnp.stack([jnp.cos(ang), jnp.sin(ang)]), jnp.zeros(1)]
        )

    def obs_fn(state: EnvState) -> jnp.ndarray:
        q, qd = state.q, state.qd
        to_t = state.task.target[:2] - q[0:2]
        yaw = T.heading_yaw(q)
        angle = jnp.arctan2(to_t[1], to_t[0]) - yaw
        body = T.body_obs(model, q, qd, initial_z, angle)
        q_s, qd_s = T.joint_obs(model, q, qd)
        flags = T.reset_foot_flags(model, config.contact_margin, state)
        return jnp.concatenate([body, q_s, qd_s, flags])

    def obs_with_contacts(state: EnvState, foot_contact) -> jnp.ndarray:
        q, qd = state.q, state.qd
        to_t = state.task.target[:2] - q[0:2]
        yaw = T.heading_yaw(q)
        angle = jnp.arctan2(to_t[1], to_t[0]) - yaw
        body = T.body_obs(model, q, qd, initial_z, angle)
        q_s, qd_s = T.joint_obs(model, q, qd)
        return jnp.concatenate([body, q_s, qd_s, foot_contact])

    # cheap frame-0 obs at auto-reset (see FnEnv.reset_obs_fn): the spawn
    # is airborne by construction, so zero flags equal the exact predicate
    if reset_obs == "zero":
        nfeet = len(model.foot_links)

        def reset_obs_fn(state: EnvState) -> jnp.ndarray:
            return obs_with_contacts(state, jnp.zeros(nfeet, state.q.dtype))

    elif reset_obs == "exact":
        reset_obs_fn = None
    else:
        raise ValueError(f"unknown reset_obs mode {reset_obs!r}")

    def reset(key: jax.Array, reset_count, prev: EnvState | None = None) -> EnvState:
        ek = rng_mod.reset_key(key, reset_count)
        kj, kt = jax.random.split(ek)
        qj0 = 0.5 * (model.limit_lo + model.limit_hi) * 0.0  # zero pose
        noise = params.init_joint_noise * jax.random.uniform(
            kj, (model.nj,), minval=-1.0, maxval=1.0
        )
        qj = jnp.clip(qj0 + noise, model.limit_lo, model.limit_hi)
        q = jnp.concatenate(
            [
                jnp.array([0.0, 0.0, initial_z + 0.02]),
                jnp.array([1.0, 0.0, 0.0, 0.0]),
                qj,
            ]
        )
        qd = jnp.zeros(model.nv)
        target = sample_target(kt, q[0:2], 0.0)
        dist = jnp.linalg.norm(target[:2] - q[0:2])
        task = WalkerTaskState(
            target=target, potential=-dist / config.control_dt
        )
        return EnvState(
            q=q,
            qd=qd,
            key=key,
            reset_count=jnp.asarray(reset_count, jnp.int32),
            steps=jnp.zeros((), jnp.int32),
            task=task,
            scene=scene_builder() if scene_builder is not None
            else scene_mod.flat(),
            done=jnp.zeros((), jnp.bool_),
            blowup_count=jnp.zeros((), jnp.int32),
        )

    def _surface_z(scene, xy):
        # local ground height under ``xy``: heightfield sample when the scene
        # carries one (Walker3DTerrainEnv reuses this raw_step), else the
        # plane. has_hf is a static field, so this resolves at trace time.
        if scene.has_hf:
            # one-hot sampler: gather-free (TPU vmap of a gather is scalar
            # loops; this is an MXU matmul — see scene.hf_sample_onehot)
            return scene_mod.hf_sample_onehot(scene, xy)
        if scene.has_tris:
            # mesh scenes (Walker3DStairsEnv): highest face under xy
            return scene_mod.tri_surface_z(scene, xy)
        return scene.ground_z

    def raw_step(state: EnvState, action: jnp.ndarray) -> Transition:
        q, qd, info = control(state.q, state.qd, action, state.scene)

        dist = jnp.linalg.norm(state.task.target[:2] - q[0:2])
        potential = -dist / config.control_dt
        progress = params.w_progress * (potential - state.task.potential)

        # height above LOCAL terrain — a raw q[2] test over a heightfield
        # falsely terminates in valleys and masks falls on hills
        tall = q[2] - _surface_z(state.scene, q[0:2]) > params.terminal_height
        body_touch = jnp.zeros((), q.dtype)
        for l in terminal_links:
            body_touch = jnp.maximum(body_touch, info.link_contact[l])
        fallen = (~tall) | (body_touch > 0.5)

        reached = dist < params.target_reach_radius
        # resample target on reach (keep walking — reference behavior [K-med])
        kt = jax.random.fold_in(
            rng_mod.reset_key(state.key, state.reset_count), state.steps + 1
        )
        yaw = T.heading_yaw(q)
        new_target = sample_target(kt, q[0:2], yaw)
        if state.scene.has_hf:
            # resampled targets sit on the terrain surface (reset does the
            # same in walker_terrain)
            new_target = new_target.at[2].set(
                scene_mod.hf_sample_onehot(state.scene, new_target[:2])
            )
        elif state.scene.has_tris:
            new_target = new_target.at[2].set(
                scene_mod.tri_surface_z(state.scene, new_target[:2])
            )
        target = jnp.where(reached, new_target, state.task.target)
        dist_after = jnp.linalg.norm(target[:2] - q[0:2])
        potential = -dist_after / config.control_dt

        alive = jnp.where(fallen, -params.fall_penalty, params.tall_bonus)
        costs = T.energy_costs(
            model, cost_action(q, action), qd, params.w_electricity, params.w_stall
        ) + T.joints_at_limit_cost(model, q, params.w_limit)
        reward = (
            progress
            + alive
            - costs
            + params.target_bonus * reached.astype(q.dtype)
        )

        steps = state.steps + 1
        done = fallen | (steps >= params.max_steps)

        new_state = state.replace(
            q=q,
            qd=qd,
            steps=steps,
            task=WalkerTaskState(target=target, potential=potential),
        )
        obs = obs_with_contacts(new_state, info.foot_contact)
        metrics = {
            "progress": progress,
            "dist_to_target": dist,
            "reached_target": reached.astype(q.dtype),
            "fallen": fallen.astype(q.dtype),
            "episode_steps": steps.astype(jnp.float32),
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
        mirror=T.mirror_spec(model),
        model=model,
        reset_obs_fn=reset_obs_fn,
    )
