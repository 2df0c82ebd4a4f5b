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


def scene_to_desc(scene) -> dict:
    """Serialize a terrain/scene.Scene for the replay doc (static geometry:
    ground plane, stone boxes, bar capsules, heightfield grid)."""
    desc: dict = {}
    if scene.has_ground:
        desc["ground_z"] = float(scene.ground_z)
    if scene.has_stones:
        desc["stones"] = {
            "pos": np.round(np.asarray(scene.stone_pos), 4).tolist(),
            "quat": np.round(np.asarray(scene.stone_quat), 4).tolist(),
            "half": np.round(np.asarray(scene.stone_half), 4).tolist(),
            "active": np.asarray(scene.stone_active).tolist(),
        }
    if scene.has_bars:
        desc["bars"] = {
            "a": np.round(np.asarray(scene.bar_a), 4).tolist(),
            "b": np.round(np.asarray(scene.bar_b), 4).tolist(),
            "r": np.round(np.asarray(scene.bar_r), 4).tolist(),
        }
    if scene.has_hf:
        desc["heightfield"] = {
            "xy0": np.asarray(scene.hf_xy0).tolist(),
            "cell": float(scene.hf_cell),
            "height": np.round(np.asarray(scene.hf_height), 3).tolist(),
        }
    if scene.has_tris:
        desc["tris"] = {
            "a": np.round(np.asarray(scene.tri_a), 4).tolist(),
            "b": np.round(np.asarray(scene.tri_b), 4).tolist(),
            "c": np.round(np.asarray(scene.tri_c), 4).tolist(),
        }
    return desc


def dump_trajectory(
    model: RobotModel,
    qs: np.ndarray,                  # (T, nq)
    path: str,
    every: int = 1,
    scene_desc: dict | None = None,
    markers: np.ndarray | None = None,       # (T, M, 3) live marker positions
    marker_desc: list[dict] | None = None,   # M dicts: {name, radius, color}
) -> None:
    """Write a JSON replay: per frame, per link, [x, y, z] positions.

    ``markers`` are the VSphere analog (reference ``bullet_objects.VSphere``
    debug spheres: walk targets, the current stone/bar, grab anchors) — a
    per-frame array of M points drawn alongside the robot; ``marker_desc``
    names and styles them. Kept minimal on purpose: spheres radii + link
    names let a ~50-line three.js page replay an episode.
    """
    frames = []
    sph_frames = []

    def _fk(q):
        fd = forward_kinematics(model, q, jnp.zeros(model.nv))
        centers = fd.pos[model.sph_link] + jnp.einsum(
            "sij,sj->si", fd.rot[model.sph_link], model.sph_pos
        )
        return fd.pos, centers

    fk = jax.jit(_fk)
    sel = list(range(0, qs.shape[0], every))
    for t in sel:
        pos, centers = fk(jnp.asarray(qs[t]))
        frames.append(np.round(np.asarray(pos), 4).tolist())
        sph_frames.append(np.round(np.asarray(centers), 4).tolist())
    doc = {
        "link_names": list(model.link_names),
        "parent": np.asarray(model.parent).tolist(),
        "spheres": {
            "link": np.asarray(model.sph_link).tolist(),
            "pos": np.round(np.asarray(model.sph_pos), 4).tolist(),
            "radius": np.round(np.asarray(model.sph_radius), 4).tolist(),
        },
        "scene": scene_desc or {},
        "fps": None,
        "frames": frames,
        # exact world sphere centers per frame (link rotation applied) —
        # what the interactive viewer (harness/viewer.py) draws
        "sphere_frames": sph_frames,
    }
    if markers is not None:
        m = np.asarray(markers)
        doc["markers"] = {
            "desc": marker_desc
            or [{"name": f"m{i}", "radius": 0.05} for i in range(m.shape[1])],
            "frames": np.round(m[sel], 4).tolist(),
        }
    with open(path, "w") as f:
        json.dump(doc, f)
