"""Shipped asset files (data/*.urdf) ↔ hand-built models (reference C6).

The reference distributes robots as URDF files compiled by ``loadURDF``
(SURVEY.md §2.1 C6). Our canonical models are code (models/*.py); the
data/ URDF files are exported from them (models/urdf_export.py) and must
compile back — through the REAL URDF compiler — to the identical pytree.
This both ships a genuine asset directory and exercises parse_urdf on
complete, full-scale robots (21-joint walker, Cassie with springs and
unactuated shin/heel joints, monkey with palm-tagged spheres) instead of
only synthetic snippets.
"""

import numpy as np
import pytest

from mocca_envs_tpu.models import assets

STATIC_FIELDS = (
    "nl", "nj", "parent", "jtype", "floating",
    "link_names", "joint_names", "foot_links",
)
ARRAY_FIELDS = (
    "joint_pos", "joint_quat", "joint_axis", "limit_lo", "limit_hi",
    "damping", "stiffness", "spring_ref", "armature", "actuated",
    "power_coef", "kp", "kd", "mass", "com", "inertia",
    "sph_link", "sph_pos", "sph_radius", "sph_foot", "sph_no_bar",
    "anc", "mirror_act_perm", "mirror_act_sign",
)


@pytest.mark.parametrize("name", assets.names())
def test_asset_roundtrip_exact(name):
    """data/<name>.urdf compiles to the hand-built model, field for field."""
    hand = assets._families()[name]()
    parsed = assets.load(name)
    for f in STATIC_FIELDS:
        assert getattr(hand, f) == getattr(parsed, f), f
    for f in ARRAY_FIELDS:
        a = np.asarray(getattr(hand, f), dtype=np.float64)
        b = np.asarray(getattr(parsed, f), dtype=np.float64)
        assert a.shape == b.shape, (f, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=f)


def test_assets_regenerate_matches_shipped(tmp_path):
    """Exporting the current code models reproduces the shipped files —
    guards silent drift between models/*.py and data/*.urdf."""
    from mocca_envs_tpu.models.urdf_export import export_urdf

    for name in assets.names():
        with open(assets.asset_path(name)) as f:
            shipped = f.read()
        fresh = export_urdf(assets._families()[name](), name=name)
        assert fresh == shipped, f"data/{name}.urdf is stale — rerun " \
            "python -m mocca_envs_tpu.models.assets"


def test_mjcf_asset_roundtrip_walker3d():
    """data/walker3d.xml (plain MJCF — the reference's walker3d format,
    SURVEY.md C6 [K-med]) compiles to a model PHYSICALLY identical to the
    hand-built walker. MJCF nesting linearizes links in DFS order (the
    hand-built order is add-call order), so fields compare under the
    link-name permutation; foot groups compare structurally (the parser
    names them by link keyword, not by our group names)."""
    import os

    from mocca_envs_tpu.models import walker3d
    from mocca_envs_tpu.models.mjcf import parse_mjcf
    from mocca_envs_tpu.models.mjcf_export import export_mjcf

    hand = walker3d.make_model()
    path = os.path.join(assets.DATA_DIR, "walker3d.xml")
    with open(path) as f:
        shipped = f.read()
    assert export_mjcf(hand, name="walker3d") == shipped, \
        "data/walker3d.xml is stale"
    parsed = parse_mjcf(path)

    assert set(hand.link_names) == set(parsed.link_names)
    perm = [parsed.link_names.index(n) for n in hand.link_names]  # hand→parsed
    # topology: parents map through the permutation
    for i in range(1, hand.nl):
        assert parsed.parent[perm[i]] == perm[hand.parent[i]]
    jperm = [perm[i] - 1 for i in range(1, hand.nl)]  # hand joint j → parsed joint
    for f in ("joint_pos", "joint_quat", "joint_axis", "limit_lo", "limit_hi",
              "damping", "stiffness", "armature", "actuated", "power_coef"):
        a = np.asarray(getattr(hand, f), dtype=np.float64)
        b = np.asarray(getattr(parsed, f), dtype=np.float64)[jperm]
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=f)
    for f in ("mass", "com", "inertia"):
        a = np.asarray(getattr(hand, f), dtype=np.float64)
        b = np.asarray(getattr(parsed, f), dtype=np.float64)[perm]
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=f)
    # spheres as canonical sets (link mapped through perm)
    def sph_set(m, link_map):
        out = []
        for s in range(m.ns):
            out.append((
                int(link_map[int(np.asarray(m.sph_link)[s])]),
                tuple(np.round(np.asarray(m.sph_pos)[s], 5)),
                round(float(np.asarray(m.sph_radius)[s]), 5),
            ))
        return sorted(out)

    assert sph_set(hand, perm) == sph_set(parsed, list(range(parsed.nl)))
    # foot grouping: same sphere partition, names differ (keyword heuristic)
    hf = np.asarray(hand.sph_foot)
    assert hf.shape[1] == np.asarray(parsed.sph_foot).shape[1] == 2
    for m, link_map in ((hand, perm), (parsed, list(range(parsed.nl)))):
        fl = np.asarray(m.sph_foot)
        assert int(fl.sum()) == 8  # 2×2 corner spheres per foot


def test_asset_parses_without_vendor_heuristics():
    """The files are legal plain URDF: parsing with default settings (no
    vendor knowledge beyond ignoring unknown attrs) still yields a model
    with the right structure."""
    from mocca_envs_tpu.models.urdf import parse_urdf

    m = parse_urdf(assets.asset_path("walker3d"))
    hand = assets._families()["walker3d"]()
    assert m.nj == hand.nj and m.nl == hand.nl
    assert m.ns == hand.ns
