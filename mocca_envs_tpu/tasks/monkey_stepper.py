"""Monkey3DStepperEnv — brachiation along a generated sequence of handholds.

Reconstructs ``env_locomotion.py::Monkey3DStepperEnv`` + ``robots.py::
Monkey3D`` (SURVEY.md §2.1 C3/C5, behavior B8 [K-med]): targets are a chain
of overhead bars generated like stepping stones; hands attach to a bar when
a grab is signaled with the palm in range (reference: ``createConstraint``
point-to-point; here: maskable world-anchor rows, activation is data) and
release on the opposite signal. The step-advance machine (B7 analog) counts
a bar as reached when a hand attaches to it; hands alternate.

Action layout: ``[joint torques (nj), grab_right, grab_left]`` — grab > 0
engages, < 0 releases [K-med: the reference's grab signaling mechanism].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mocca_envs_tpu.core import rng as rng_mod
from mocca_envs_tpu.envs.env import EnvState, Transition, make_fn_env
from mocca_envs_tpu.models import monkey
from mocca_envs_tpu.ops.kinematics import forward_kinematics
from mocca_envs_tpu.ops.step import make_control_step
from mocca_envs_tpu.tasks import base as T
from mocca_envs_tpu.terrain import scene as scene_mod
from mocca_envs_tpu.utils.config import EngineConfig

DEG = jnp.pi / 180.0


class MonkeyParams(struct.PyTreeNode):
    num_bars: int = struct.field(pytree_node=False, default=16)
    stage: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros(()))
    max_stage: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(9.0))
    # bar spacing ramps with stage (like terrain/stones.py): stage-0 bars sit
    # within DOUBLE-ARM reach (hands on bars k and k+1 can reach k+2 before
    # releasing — a reach-over gait bootstraps), end stages force ballistic
    # release-swing-regrasp at the paper's spacings. Run 2c measured a hard
    # plateau at bar 2 with fixed 0.55–0.65 m spacing: bar 1 is reachable
    # from the hang, bar 2+ needed a swing no gradient path produced.
    r_lo_start: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.35))
    r_lo_end: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.55))
    r_hi_start: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.45))
    r_hi_end: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.1))
    yaw_max_end: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(20.0 * DEG))
    pitch_max_end: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(30.0 * DEG))
    power: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0))
    init_noise: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.05))
    w_progress: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0))
    alive_bonus: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0))
    w_electricity: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(1.0))
    w_stall: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.05))
    bar_bonus: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(6.0))
    success_bonus: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(20.0))
    fall_z: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(-1.8))
    # per-env adaptive curriculum (ALLSTEPS-style, as in walker_stepper):
    # reach ≥ adv_threshold bars in an episode → that env's stage advances
    # at auto-reset. ≥ num_bars disables.
    adv_threshold: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.asarray(14.0)
    )
    max_steps: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.asarray(1000, jnp.int32)
    )
    # RELEASE-TIMING shaping (round-3, VERDICT r2 #4): passive hanging is a
    # local optimum — alive_bonus × max_steps dwarfs risky bar bonuses.
    # ``hold_grace`` caps how many control steps after the last bar hit the
    # alive bonus keeps paying (big default = off, preserving the round-2
    # reward exactly); ``w_swing`` pays horizontal CoM velocity TOWARD the
    # next bar while holding — the gradient path to pumping a swing.
    hold_grace: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.asarray(10_000, jnp.int32)
    )
    w_swing: jnp.ndarray = struct.field(default_factory=lambda: jnp.asarray(0.0))
    # No-progress TERMINATION (stronger than hold_grace, which only stops
    # the alive bonus): end the episode ``progress_timeout`` control steps
    # after the last bar hit. Hanging then isn't just unpaid — the value
    # function sees it as episode death, so bootstrapped returns can't fund
    # it either. Big default = off (preserves existing checkpoints' MDP).
    progress_timeout: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.asarray(1_000_000, jnp.int32)
    )

    def set_curriculum(self, stage) -> "MonkeyParams":
        return self.replace(stage=jnp.asarray(stage, jnp.float32))


class MonkeyTaskState(struct.PyTreeNode):
    bar_pos: jnp.ndarray       # (K, 3) bar centers
    bar_dir: jnp.ndarray       # (K, 3) unit bar axes (horizontal)
    next_bar: jnp.ndarray      # int32
    attached: jnp.ndarray      # (2,) 1.0 = hand holding
    anchor: jnp.ndarray        # (2, 3) world anchor per hand
    hold_bar: jnp.ndarray      # (2,) int32 bar index each hand holds (−1 none)
    potential: jnp.ndarray
    stage: jnp.ndarray         # per-env curriculum stage (dynamic)
    # control steps since the last bar hit (drives the hold_grace window)
    since_hit: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )


def set_stage(state: EnvState, stage) -> EnvState:
    """Trainer-facing curriculum setter (reference §3.5); next-reset effect."""
    new = jnp.broadcast_to(
        jnp.asarray(stage, jnp.float32), state.task.stage.shape
    )
    return state.replace(task=state.task.replace(stage=new))


def _sample_bars(params: MonkeyParams, key: jax.Array):
    K = params.num_bars
    frac = jnp.clip(params.stage / jnp.maximum(params.max_stage, 1.0), 0.0, 1.0)
    r_lo = params.r_lo_start + frac * (params.r_lo_end - params.r_lo_start)
    r_hi = params.r_hi_start + frac * (params.r_hi_end - params.r_hi_start)
    yaw_max = frac * params.yaw_max_end
    pitch_max = frac * params.pitch_max_end
    ks = jax.random.split(key, 3)
    r = rng_mod.uniform(ks[0], (K,), r_lo, r_hi)
    dyaw = rng_mod.uniform(ks[1], (K,), -yaw_max, yaw_max)
    pitch = rng_mod.uniform(ks[2], (K,), -pitch_max, pitch_max)
    easy = jnp.arange(K) < 2
    r = jnp.where(easy, 0.5 * (r_lo + r_hi), r)
    dyaw = jnp.where(easy, 0.0, dyaw)
    pitch = jnp.where(easy, 0.0, pitch)
    heading = jnp.cumsum(dyaw)
    delta = r[:, None] * jnp.stack(
        [jnp.cos(heading) * jnp.cos(pitch), jnp.sin(heading) * jnp.cos(pitch),
         jnp.sin(pitch)], axis=1,
    )
    pos = jnp.concatenate(
        [jnp.zeros((1, 3)), jnp.cumsum(delta[1:], axis=0)], axis=0
    )
    bar_dir = jnp.stack(
        [-jnp.sin(heading), jnp.cos(heading), jnp.zeros_like(heading)], axis=1
    )
    return pos, bar_dir


def _closest_on_bar(bar_pos, bar_dir, p, half_len=monkey.BAR_HALF_LEN):
    t = jnp.clip(jnp.dot(p - bar_pos, bar_dir), -half_len, half_len)
    return bar_pos + t * bar_dir


def _bar_scene(bar_pos, bar_dir):
    """Scene with the handhold chain as SOLID capsules (reference
    ``bullet_objects.py::MonkeyBar`` collision shapes — VERDICT r1 #6): the
    body collides with bars; grabbing palms are statically excluded
    (``sph_no_bar``) because a wrapped hand must not be pushed out."""
    ext = monkey.BAR_HALF_LEN * bar_dir
    return scene_mod.Scene(
        has_ground=True, has_bars=True,
        ground_z=jnp.asarray(-8.0),
        bar_a=bar_pos - ext, bar_b=bar_pos + ext,
        bar_r=jnp.full(bar_pos.shape[:1], monkey.BAR_RADIUS),
        bar_active=jnp.ones(bar_pos.shape[:1]),
    )


def make_monkey3d_stepper(
    config: EngineConfig | None = None,
    params: MonkeyParams | None = None,
    name: str = "Monkey3DStepperEnv",
):
    model = monkey.make_model()
    config = config or EngineConfig()
    params = params or MonkeyParams()
    spec = monkey.constraints()
    K = params.num_bars
    hand_links = spec.grab_links
    palm = jnp.asarray(monkey.PALM_OFFSET)

    def actuation(q, qd, action):
        a = jnp.clip(action[: model.nj], -1.0, 1.0)
        return params.power * model.power_coef * model.actuated * a

    control = make_control_step(model, config, constraints=spec, actuation=actuation)
    obs_dim = 8 + 2 * model.nj + 2 + 6  # body, joints, hand-hold flags, 2 bars

    def _row(arr, idx):
        """arr[idx] via one-hot contraction — vmapped row gathers scalarize
        on TPU (round-3a culling lesson); exact at HIGHEST precision."""
        onehot = (jnp.arange(K) == idx).astype(
            arr.dtype if arr.dtype.kind == "f" else jnp.float32
        )
        if arr.ndim == 1:
            return jax.lax.dot(onehot, arr.astype(jnp.float32),
                               precision=jax.lax.Precision.HIGHEST)
        return jax.lax.dot(onehot, arr,
                           precision=jax.lax.Precision.HIGHEST)

    def palm_positions(q, qd):
        fd = forward_kinematics(model, q, qd)
        return jnp.stack(
            [fd.pos[l] + fd.rot[l] @ palm for l in hand_links]
        )  # (2, 3)

    def bars_obs(q, task) -> jnp.ndarray:
        yaw = T.heading_yaw(q)
        i0 = jnp.minimum(task.next_bar, K - 1)
        i1 = jnp.minimum(task.next_bar + 1, K - 1)
        rel0 = T.to_heading_frame(yaw, _row(task.bar_pos, i0) - q[0:3])
        rel1 = T.to_heading_frame(yaw, _row(task.bar_pos, i1) - q[0:3])
        return jnp.concatenate([rel0, rel1])

    def full_obs(state: EnvState) -> jnp.ndarray:
        q, qd = state.q, state.qd
        task = state.task
        tgt = _row(task.bar_pos, jnp.minimum(task.next_bar, K - 1))
        to_t = tgt[:2] - q[0:2]
        angle = jnp.arctan2(to_t[1], to_t[0]) - T.heading_yaw(q)
        body = T.body_obs(model, q, qd, monkey.INITIAL_Z, angle)
        q_s, qd_s = T.joint_obs(model, q, qd)
        return jnp.concatenate([body, q_s, qd_s, task.attached, bars_obs(q, task)])

    obs_fn = full_obs

    # hanging pose: grab arm overhead, other arm reaching, legs tucked
    _HANG_POSE = {
        "right_shoulder_y": 3.0, "left_shoulder_y": 2.6,
        "right_elbow": -0.1, "left_elbow": -0.3,
        "right_hip": 0.4, "left_hip": 0.4,
        "right_knee": 0.6, "left_knee": 0.6,
    }

    def _hang_qj():
        import numpy as np

        qj = np.zeros(model.nj, dtype=np.float32)
        for j, n in enumerate(model.joint_names):
            if n in _HANG_POSE:
                qj[j] = _HANG_POSE[n]
        return jnp.asarray(qj)

    def reset(key: jax.Array, reset_count, prev: EnvState | None = None) -> EnvState:
        ek = rng_mod.reset_key(key, reset_count)
        kj, kb = jax.random.split(ek)
        if prev is None:
            stage = params.stage
        else:
            adv = (
                prev.task.next_bar.astype(jnp.float32) >= params.adv_threshold
            ).astype(jnp.float32)
            stage = jnp.minimum(prev.task.stage + adv, params.max_stage)
        bar_pos, bar_dir = _sample_bars(params.replace(stage=stage), kb)
        noise = params.init_noise * jax.random.uniform(
            kj, (model.nj,), minval=-1.0, maxval=1.0
        )
        qj = jnp.clip(_hang_qj() + noise, model.limit_lo, model.limit_hi)
        # solve the base position so the grab palm lands exactly on bar 0
        q0 = jnp.concatenate(
            [jnp.zeros(3), jnp.array([1.0, 0.0, 0.0, 0.0]), qj]
        )
        qd = jnp.zeros(model.nv)
        palm0 = palm_positions(q0, qd)[0]
        base = _closest_on_bar(bar_pos[0], bar_dir[0], palm0) - palm0
        q = jnp.concatenate([base, jnp.array([1.0, 0.0, 0.0, 0.0]), qj])
        palms = palm_positions(q, qd)
        anchor0 = _closest_on_bar(bar_pos[0], bar_dir[0], palms[0])
        task = MonkeyTaskState(
            bar_pos=bar_pos,
            bar_dir=bar_dir,
            next_bar=jnp.asarray(1, jnp.int32),
            attached=jnp.array([1.0, 0.0]),   # start hanging by right hand
            anchor=jnp.stack([anchor0, jnp.zeros(3)]),
            hold_bar=jnp.array([0, -1], jnp.int32),
            potential=-jnp.linalg.norm(bar_pos[1] - q[0:3]) / config.control_dt,
            stage=jnp.asarray(stage, jnp.float32),
        )
        return EnvState(
            q=q, qd=qd, key=key,
            reset_count=jnp.asarray(reset_count, jnp.int32),
            steps=jnp.zeros((), jnp.int32),
            task=task,
            scene=_bar_scene(bar_pos, bar_dir),
            done=jnp.zeros((), jnp.bool_),
            blowup_count=jnp.zeros((), jnp.int32),
        )

    def raw_step(state: EnvState, action: jnp.ndarray) -> Transition:
        task = state.task
        grab_sig = action[model.nj:]

        # ---- grab/release decisions from the CURRENT pose (B8)
        palms = palm_positions(state.q, state.qd)

        def hand_update(h, attached, anchor, hold_bar):
            p = palms[h]
            d = jax.vmap(
                lambda bp, bd: jnp.linalg.norm(_closest_on_bar(bp, bd, p) - p)
            )(task.bar_pos, task.bar_dir)
            near = jnp.argmin(d)
            can_grab = jnp.min(d) < monkey.GRAB_RADIUS
            want_grab = grab_sig[h] > 0.0
            want_release = grab_sig[h] < -0.0
            new_attach = (~(attached > 0.5)) & want_grab & can_grab
            release = (attached > 0.5) & want_release
            attached2 = jnp.where(
                new_attach, 1.0, jnp.where(release, 0.0, attached)
            )
            anchor2 = jnp.where(
                new_attach,
                _closest_on_bar(_row(task.bar_pos, near),
                                _row(task.bar_dir, near), p),
                anchor,
            )
            hold2 = jnp.where(
                new_attach, near.astype(jnp.int32),
                jnp.where(release, jnp.asarray(-1, jnp.int32), hold_bar),
            )
            return attached2, anchor2, hold2, new_attach, near

        outs = [hand_update(h, task.attached[h], task.anchor[h], task.hold_bar[h])
                for h in range(2)]
        attached = jnp.stack([o[0] for o in outs])
        anchor = jnp.stack([o[1] for o in outs])
        hold_bar = jnp.stack([o[2] for o in outs])

        q, qd, info = control(
            state.q, state.qd, action, state.scene,
            grab_active=attached, grab_target=anchor,
        )

        # ---- bar-advance machine: a NEW grab on the target bar scores
        tgt_idx = jnp.minimum(task.next_bar, K - 1)
        hit = jnp.zeros((), jnp.bool_)
        for h in range(2):
            new_attach, near = outs[h][3], outs[h][4]
            hit = hit | (new_attach & (near == tgt_idx))
        at_last = task.next_bar >= (K - 1)
        success = hit & at_last
        next_bar = jnp.where(
            hit, jnp.minimum(task.next_bar + 1, K - 1), task.next_bar
        )

        new_tgt = _row(task.bar_pos, jnp.minimum(next_bar, K - 1))
        dist = jnp.linalg.norm(new_tgt - q[0:3])
        potential = -dist / config.control_dt
        progress = jnp.where(
            hit, 0.0, params.w_progress * (potential - task.potential)
        )

        holding = jnp.max(attached) > 0.5
        fell = q[2] < params.fall_z
        costs = T.energy_costs(
            model, action[: model.nj], qd, params.w_electricity, params.w_stall
        )
        # release-timing shaping: the alive bonus stops paying hold_grace
        # steps after the last hit (hanging forever must not dominate), and
        # horizontal CoM speed toward the next bar pays while holding
        since_hit = jnp.where(hit, 0, task.since_hit + 1)
        alive_ok = holding & (since_hit < params.hold_grace)
        to_tgt = new_tgt[0:2] - q[0:2]
        tgt_dir = to_tgt / jnp.maximum(jnp.linalg.norm(to_tgt), 1e-6)
        swing = params.w_swing * jnp.maximum(
            0.0, qd[0] * tgt_dir[0] + qd[1] * tgt_dir[1]
        ) * holding.astype(q.dtype)
        reward = (
            progress
            + jnp.where(alive_ok, params.alive_bonus, 0.0)
            + swing
            - costs
            + params.bar_bonus * hit.astype(q.dtype)
            + params.success_bonus * success.astype(q.dtype)
        )

        steps = state.steps + 1
        stalled = since_hit >= params.progress_timeout
        done = fell | success | (steps >= params.max_steps) | stalled
        new_state = state.replace(
            q=q, qd=qd, steps=steps,
            task=MonkeyTaskState(
                bar_pos=task.bar_pos, bar_dir=task.bar_dir,
                next_bar=next_bar, attached=attached, anchor=anchor,
                hold_bar=hold_bar, potential=potential, stage=task.stage,
                since_hit=since_hit,
            ),
        )
        obs = full_obs(new_state)
        metrics = {
            "bars_reached": next_bar.astype(jnp.float32),
            "holding": attached.sum(),
            "bar_hit": hit.astype(q.dtype),
            "success": success.astype(q.dtype),
            "fell": fell.astype(q.dtype),
        }
        return Transition(
            state=new_state, obs=obs, reward=reward, done=done, metrics=metrics
        )

    return make_fn_env(
        name=name,
        obs_dim=obs_dim,
        act_dim=model.nj + 2,
        reset=reset,
        raw_step=raw_step,
        obs_fn=obs_fn,
        control_dt=config.control_dt,
        model=model,
    )
