"""Viz dump gates: replay JSON carries robot frames, scene geometry, and
VSphere-style live markers (reference bullet_objects.VSphere analog)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

import mocca_envs_tpu
from mocca_envs_tpu.harness.viz import dump_trajectory, scene_to_desc
from mocca_envs_tpu.models import walker3d


def test_dump_with_markers_and_scene(tmp_path):
    env = mocca_envs_tpu.make("Walker3DStepperEnv")
    model = walker3d.make_model()
    state = env.init(jax.random.key(0))
    qs, markers = [np.asarray(state.q)], []
    step = jax.jit(env.step)
    for _ in range(4):
        tr = step(state, jnp.zeros(env.act_dim))
        state = tr.state
        qs.append(np.asarray(state.q))
        # live markers: current target stone + the one after (VSphere analog)
        i = int(state.task.next_step)
        K = state.task.stone_top.shape[0]
        idx = np.array([i, min(i + 1, K - 1)])
        markers.append(np.asarray(state.task.stone_top)[idx])
    markers = [markers[0]] + markers  # align with T+1 frames

    out = tmp_path / "replay.json"
    dump_trajectory(
        model, np.stack(qs), str(out),
        scene_desc=scene_to_desc(state.scene),
        markers=np.stack(markers),
        marker_desc=[
            {"name": "target_stone", "radius": 0.08, "color": "#ff0000"},
            {"name": "next_stone", "radius": 0.06, "color": "#ffaa00"},
        ],
    )
    doc = json.loads(out.read_text())
    assert len(doc["frames"]) == 5
    assert len(doc["frames"][0]) == len(model.link_names)
    assert doc["markers"]["desc"][0]["name"] == "target_stone"
    assert len(doc["markers"]["frames"]) == 5
    assert "stones" in doc["scene"] and "ground_z" in doc["scene"]


def test_scene_desc_bars_and_heightfield():
    menv = mocca_envs_tpu.make("Monkey3DStepperEnv")
    ms = menv.init(jax.random.key(1))
    d = scene_to_desc(ms.scene)
    assert len(d["bars"]["a"]) == ms.scene.bar_a.shape[0]

    tenv = mocca_envs_tpu.make("Walker3DTerrainEnv")
    ts = tenv.init(jax.random.key(2))
    d2 = scene_to_desc(ts.scene)
    assert len(d2["heightfield"]["height"]) == ts.scene.hf_height.shape[0]
