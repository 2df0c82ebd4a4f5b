"""Interactive viewer gates (harness/viewer.py — the GUI render path,
SURVEY.md §2.1 C2 / §2.3 GUI row, TPU-native record→replay shape)."""

import json
import re

import pytest

from mocca_envs_tpu.harness.viewer import export_html, record_rollout_doc


@pytest.fixture(scope="module")
def stairs_doc():
    return record_rollout_doc("Walker3DStairsEnv", steps=6)


def test_record_rollout_doc_structure(stairs_doc):
    d = stairs_doc
    assert len(d["frames"]) == 7           # T+1 including the reset frame
    assert len(d["sphere_frames"]) == 7
    assert len(d["frames"][0]) == len(d["link_names"])
    assert len(d["parent"]) == len(d["link_names"])
    # stairs scene carries the mesh triangles for the renderer
    assert "tris" in d["scene"] and len(d["scene"]["tris"]["a"]) == 24
    # sphere centers are exact world positions (rotation applied): all
    # finite, near the robot
    import numpy as np

    sf = np.asarray(d["sphere_frames"][0])
    assert np.isfinite(sf).all() and sf.shape[1] == 3


def test_export_html_embeds_doc_and_controls(stairs_doc, tmp_path):
    out = export_html(stairs_doc, str(tmp_path / "v.html"))
    html = open(out).read()
    assert "__DOC_JSON__" not in html      # placeholder substituted
    # the embedded doc round-trips
    m = re.search(r"const DOC = (\{.*?\});\n", html, re.S)
    assert m, "DOC embed not found"
    doc = json.loads(m.group(1))
    assert doc["link_names"] == stairs_doc["link_names"]
    # interactive controls present: play/pause, scrub, camera follow,
    # orbit + zoom handlers, animation loop
    for token in ("requestAnimationFrame", "keydown", "mousedown", "wheel",
                  "scrub", "follow", "Space", "ArrowLeft"):
        assert token in html, token
    # cheap syntax guard: script braces/parens balance
    script = html.split("<script>")[1].split("</script>")[0]
    script = re.sub(r"'[^']*'|\"[^\"]*\"|`[^`]*`", "", script)  # strip strings
    for o, c in (("{", "}"), ("(", ")"), ("[", "]")):
        assert script.count(o) == script.count(c), (o, script.count(o),
                                                    script.count(c))


def test_gym_render_human_writes_viewer(tmp_path, monkeypatch):
    """GymEnv.render("human"): accumulate frames, close() writes the
    interactive HTML — the reference's GUI mode, record→replay shape."""
    import jax

    import mocca_envs_tpu
    from mocca_envs_tpu.envs.gym_wrapper import GymEnv

    import numpy as np

    env = GymEnv(mocca_envs_tpu.make("Walker3DCustomEnv"))
    env._human_path = str(tmp_path / "human.html")
    env.reset()
    for _ in range(3):
        env.step(np.zeros(env.action_space_shape))
        path = env.render("human")
    assert path == env._human_path
    env.close()
    html = open(env._human_path).read()
    assert "requestAnimationFrame" in html
    m = re.search(r"const DOC = (\{.*?\});\n", html, re.S)
    assert len(json.loads(m.group(1))["frames"]) == 3


def test_viewer_cli_from_dump(tmp_path, stairs_doc):
    from mocca_envs_tpu.harness import viewer

    dump = tmp_path / "traj.json"
    with open(dump, "w") as f:
        json.dump(stairs_doc, f)
    out = tmp_path / "view.html"
    viewer.main(["--dump", str(dump), "--out", str(out)])
    assert out.exists() and out.stat().st_size > 10_000
