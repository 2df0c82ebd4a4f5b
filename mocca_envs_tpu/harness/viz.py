"""Trajectory visualization dumps (host-side, render-path replacement).

The reference's GUI rendering (pybullet GUI + keyboard camera,
``env_base.py::render`` — SURVEY.md §2.1 C2) is out of parity scope
(§2.3); the TPU-native replacement is an offline dump: link poses per frame
as JSON that any external viewer (three.js snippet, blender script,
matplotlib) can replay. Uses only FK — no dependency on the solver.
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp

from mocca_envs_tpu.models.schema import RobotModel
from mocca_envs_tpu.ops.kinematics import forward_kinematics


def link_poses(model: RobotModel, q: np.ndarray, qd: np.ndarray | None = None):
    """World link positions + quaternions for one frame."""
    qd = np.zeros(model.nv, dtype=np.float32) if qd is None else qd
    fd = forward_kinematics(model, jnp.asarray(q), jnp.asarray(qd))
    return np.asarray(fd.pos), np.asarray(fd.rot)


def dump_trajectory(
    model: RobotModel,
    qs: np.ndarray,                  # (T, nq)
    path: str,
    every: int = 1,
    scene_desc: dict | None = None,
) -> None:
    """Write a JSON replay: per frame, per link, [x, y, z] positions.

    Kept minimal on purpose: spheres radii + link names let a ~50-line
    three.js page replay an episode.
    """
    frames = []
    fk = jax.jit(
        lambda q: forward_kinematics(model, q, jnp.zeros(model.nv)).pos
    )
    for t in range(0, qs.shape[0], every):
        pos = np.asarray(fk(jnp.asarray(qs[t])))
        frames.append(np.round(pos, 4).tolist())
    doc = {
        "link_names": list(model.link_names),
        "spheres": {
            "link": np.asarray(model.sph_link).tolist(),
            "pos": np.round(np.asarray(model.sph_pos), 4).tolist(),
            "radius": np.round(np.asarray(model.sph_radius), 4).tolist(),
        },
        "scene": scene_desc or {},
        "fps": None,
        "frames": frames,
    }
    with open(path, "w") as f:
        json.dump(doc, f)
