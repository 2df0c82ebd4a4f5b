"""Record reference (pybullet mocca_envs) trajectories in the interchange format.

The OTHER half of the parity pair (harness/parity.py): BASELINE.json
config 1 gates our engine against seeded PyBullet rollouts of the reference
``UBCMOCCA/mocca_envs`` package (SURVEY.md §7.4). The reference mount was
empty when this was written, so this module is import-guarded: it must
IMPORT cleanly with neither gym, pybullet nor mocca_envs installed, and run
the moment they exist —

    python -m mocca_envs_tpu.harness.parity_record_pybullet \
        --env Walker3DCustomEnv-v0 --seed 0 --horizon 1000 \
        --out recordings/walker3d_seed0.npz [--actions acts.npz]

then gate with::

    from mocca_envs_tpu.harness.parity import Recording, replay_check
    rec = Recording.load("recordings/walker3d_seed0.npz")
    report = replay_check(our_env, our_model, rec)

Output schema = harness/parity.Recording (npz): q (T+1, nq) with base quat
in pybullet's xyzw, qd (T+1, nv) with world-frame base velocities, action
(T, nu), obs (T, obs_dim), reward (T,), done (T,), meta.engine="pybullet".

State extraction (``_extract_qqd``) targets the reference's Robot wrapper
layout (``robots.py::WalkerBase``: pybullet body id + ordered joint list —
SURVEY.md §2.1 C5 [K-med]) with fallbacks for the attribute-name variants
the wrapper families use; if no convention matches, q/qd rows are NaN and
the recording still carries obs/reward/done (replay_check gates those
channels independently).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _import_reference():
    """Import (gym, pybullet, mocca_envs) or explain exactly what's missing."""
    missing = []
    try:
        import gym  # noqa: F401
    except ImportError:
        try:
            import gymnasium as gym  # noqa: F401
        except ImportError:
            missing.append("gym/gymnasium")
            gym = None
    try:
        import pybullet  # noqa: F401
    except ImportError:
        missing.append("pybullet")
        pybullet = None
    try:
        import mocca_envs  # noqa: F401
    except ImportError:
        missing.append("mocca_envs (the reference package)")
        mocca_envs = None
    if missing:
        raise SystemExit(
            "parity_record_pybullet needs the reference stack; missing: "
            + ", ".join(missing)
            + ".\nInstall pybullet + the reference (pip install -e /root/reference) "
            "and re-run. See SURVEY.md §0 / §7.4."
        )
    return gym, pybullet, mocca_envs


def _bullet_client(env):
    """The env's pybullet client (reference keeps it at ``_p`` [K-med])."""
    for attr in ("_p", "p", "client", "bullet_client"):
        c = getattr(env.unwrapped, attr, None)
        if c is not None and hasattr(c, "getBasePositionAndOrientation"):
            return c
    import pybullet

    return pybullet


def _robot_of(env):
    r = getattr(env.unwrapped, "robot", None)
    if r is None:
        raise RuntimeError("env has no .robot — adjust _robot_of for this family")
    return r


def _body_id(robot):
    for attr in ("id", "object_id", "robot_body"):
        v = getattr(robot, attr, None)
        if isinstance(v, int):
            return v
        # roboschool-lineage BodyPart wrapper: .bodies[.bodyIndex]
        if v is not None and hasattr(v, "bodies"):
            return v.bodies[getattr(v, "bodyIndex", 0)]
    raise RuntimeError("cannot find pybullet body id on robot")


def _joint_indices(robot, client, body):
    js = getattr(robot, "ordered_joints", None)
    if js:
        idx = []
        for j in js:
            for attr in ("jointIndex", "joint_index", "index"):
                v = getattr(j, attr, None)
                if isinstance(v, int):
                    idx.append(v)
                    break
        if len(idx) == len(js):
            return idx
    # fallback: all movable joints in definition order
    n = client.getNumJoints(body)
    movable = []
    for i in range(n):
        info = client.getJointInfo(body, i)
        if info[2] != 4:  # JOINT_FIXED
            movable.append(i)
    return movable


def _extract_qqd(client, body, joint_idx):
    """(q, qd) in the interchange layout: base pos + quat(xyzw) + joint q;
    world-frame base lin/ang velocity + joint q̇."""
    try:
        pos, orn = client.getBasePositionAndOrientation(body)
        lin, ang = client.getBaseVelocity(body)
        states = client.getJointStates(body, joint_idx)
        jq = [s[0] for s in states]
        jqd = [s[1] for s in states]
        q = np.concatenate([pos, orn, jq]).astype(np.float32)
        qd = np.concatenate([lin, ang, jqd]).astype(np.float32)
        return q, qd
    except Exception:
        nan = np.full(7 + len(joint_idx), np.nan, dtype=np.float32)
        return nan, nan[:-1]


def record_pybullet(
    env_id: str,
    seed: int,
    horizon: int,
    actions: np.ndarray | None = None,
) -> dict:
    """Roll the reference env and return the interchange arrays + meta."""
    gym, _, _ = _import_reference()

    env = gym.make(env_id)
    # old-gym (reference era) vs gymnasium seeding
    if hasattr(env, "seed"):
        env.seed(seed)
        obs = env.reset()
    else:
        obs, _ = env.reset(seed=seed)
    client = _bullet_client(env)
    robot = _robot_of(env)
    body = _body_id(robot)
    joint_idx = _joint_indices(robot, client, body)

    act_dim = int(np.prod(env.action_space.shape))
    qs, qds, acts, obss, rews, dones = [], [], [], [], [], []
    q, qd = _extract_qqd(client, body, joint_idx)
    qs.append(q)
    qds.append(qd)
    for t in range(horizon):
        a = (
            actions[t]
            if actions is not None
            else np.zeros(act_dim, dtype=np.float32)
        )
        out = env.step(a)
        if len(out) == 5:  # gymnasium
            obs, r, term, trunc, _ = out
            done = bool(term or trunc)
        else:
            obs, r, done, _ = out
        q, qd = _extract_qqd(client, body, joint_idx)
        acts.append(np.asarray(a, dtype=np.float32))
        obss.append(np.asarray(obs, dtype=np.float32))
        rews.append(float(r))
        dones.append(bool(done))
        qs.append(q)
        qds.append(qd)
        if done:
            break
    env.close()
    meta = {
        "env_id": env_id,
        "seed": seed,
        "engine": "pybullet",
        "model_hash": "",  # reference model: hash unavailable; matched by env_id
        "control_dt": float(getattr(env.unwrapped, "control_step", 1.0 / 60.0))
        if not callable(getattr(env.unwrapped, "control_step", None))
        else 1.0 / 60.0,
        "format_version": 1,
    }
    return {
        "meta": meta,
        "q": np.stack(qs),
        "qd": np.stack(qds),
        "action": np.stack(acts),
        "obs": np.stack(obss),
        "reward": np.asarray(rews, dtype=np.float32),
        "done": np.asarray(dones),
    }


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--env", required=True, help="reference gym env id")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--horizon", type=int, default=1000)
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument(
        "--actions",
        default=None,
        help="npz with an 'action' (T, nu) array to replay (default zeros)",
    )
    args = ap.parse_args(argv)

    actions = None
    if args.actions:
        actions = np.load(args.actions)["action"]
    data = record_pybullet(args.env, args.seed, args.horizon, actions)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(
        args.out,
        meta=json.dumps(data["meta"]),
        q=data["q"], qd=data["qd"], action=data["action"],
        obs=data["obs"], reward=data["reward"], done=data["done"],
    )
    print(f"recorded {data['action'].shape[0]} steps -> {args.out}")


if __name__ == "__main__":
    main()
