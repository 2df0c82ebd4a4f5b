"""The shipped robot asset files (reference C6: ``mocca_envs/data/**``).

The reference distributes its robots as URDF/MJCF documents and compiles
them with ``loadURDF``/``loadMJCF`` at env construction (SURVEY.md §2.1 C6,
§2.3). Here the canonical robots are the hand-built pytrees in
models/{walker3d,cassie,monkey,child3d,walker2d}; this module materializes
them as standard URDF files under ``mocca_envs_tpu/data/`` (via
models/urdf_export.py) and loads them back through the real URDF compiler
(models/urdf.parse_urdf) — so the asset directory is genuine, the compiler
is exercised on complete full-scale robots, and a pybullet user could load
the same files directly.

``load(name)`` is the ``loadURDF`` equivalent: file → RobotModel. The
round-trip contract — ``load(name)`` equals the hand-built model on every
field — is gated by tests/test_assets.py.
"""

from __future__ import annotations

import os

from mocca_envs_tpu.models.schema import RobotModel

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")


def _families():
    from mocca_envs_tpu.models import cassie, child3d, monkey, walker2d, walker3d

    return {
        "walker3d": walker3d.make_model,
        "child3d": child3d.make_model,
        "cassie": cassie.make_model,
        "monkey3d": monkey.make_model,
        "walker2d": walker2d.make_walker2d,
        "crab2d": walker2d.make_crab2d,
    }


def names() -> tuple:
    return tuple(_families())


def asset_path(name: str) -> str:
    return os.path.abspath(os.path.join(DATA_DIR, f"{name}.urdf"))


def generate(name: str) -> str:
    """Export the hand-built model for ``name`` to its data/ URDF file."""
    from mocca_envs_tpu.models.urdf_export import export_urdf

    model = _families()[name]()
    text = export_urdf(model, name=name)
    path = asset_path(name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)
    return path


def generate_all() -> list:
    out = [generate(n) for n in names()]
    # the walker also ships in plain MJCF (the reference's walker3d format,
    # SURVEY.md C6); regenerate it here so `python -m …models.assets` can't
    # leave it stale while the URDFs move
    from mocca_envs_tpu.models.mjcf_export import export_mjcf
    from mocca_envs_tpu.models.walker3d import make_model as _walker

    xml_path = os.path.join(DATA_DIR, "walker3d.xml")
    with open(xml_path, "w") as f:
        f.write(export_mjcf(_walker(), name="walker3d"))
    out.append(xml_path)
    return out


def load(name: str) -> RobotModel:
    """Compile ``data/<name>.urdf`` into a RobotModel (the ``loadURDF``
    path). Mirror-index arrays are name-derived (not URDF vocabulary), so
    they are re-attached with the same derivation the hand-built models use.
    """
    from mocca_envs_tpu.models.urdf import parse_urdf

    # vendor attributes carry the foot grouping; disable the link-name
    # heuristic so non-foot links named *ankle* don't grow spurious groups
    model = parse_urdf(asset_path(name), foot_link_keywords=())
    # only the families whose hand-built models attach mirrors (walker3d and
    # its scaled child) — others keep the identity default, same as hand-built
    if name in ("walker3d", "child3d"):
        from mocca_envs_tpu.models.walker3d import (
            _mirror_action_permutation,
            _mirror_action_signs,
        )

        model = model.replace(
            mirror_act_perm=_mirror_action_permutation(model),
            mirror_act_sign=_mirror_action_signs(model),
        )
    return model


if __name__ == "__main__":
    for p in generate_all():
        print("wrote", p)
