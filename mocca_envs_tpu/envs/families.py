"""Env family registration — mirrors the reference's gym ID table.

Reference ``mocca_envs/__init__.py`` registers (SURVEY.md §2.1 C1):
Walker3DCustomEnv-v0, Walker3DStepperEnv-v0, CassieEnv-v0, Cassie2DEnv-v0
[K-med], Monkey3DStepperEnv-v0 [K-med], plus 2D variants [K-low]. Families
are added here as they land; each factory returns an envs/env.FnEnv.
"""

from __future__ import annotations

import functools

from mocca_envs_tpu.envs.registry import register
from mocca_envs_tpu.tasks.cassie_task import make_cassie
from mocca_envs_tpu.tasks.walker_custom import make_walker3d_custom
from mocca_envs_tpu.tasks.walker_stepper import make_walker3d_stepper

register("Walker3DCustomEnv", make_walker3d_custom)
# not a reference ID: the PD-servoed walker BASELINE config 2 benches
# ("Walker3DCustomEnv batched 4096 … flat terrain, PD control")
register(
    "Walker3DPDCustomEnv",
    functools.partial(
        make_walker3d_custom, name="Walker3DPDCustomEnv", pd_control=True
    ),
)
register("Walker3DStepperEnv", make_walker3d_stepper)
register("CassieEnv", make_cassie)
register(
    "Cassie2DEnv",
    functools.partial(make_cassie, name="Cassie2DEnv", planar=True),
)
def _make_cassie_phase(planar: bool = False, **kw):
    # phase variants TRACK a reference motion (the reference's mocap
    # behavior — env_cassie.py CassiePhase*); the default table is the
    # synthesized parametric walk, swappable for real mocap via
    # models/cassie_gait.from_npz when assets exist
    from mocca_envs_tpu.models.cassie_gait import synthesized_walk

    name = "CassiePhase2DEnv" if planar else "CassiePhaseEnv"
    return make_cassie(
        name=name, planar=planar, phase_obs=True,
        ref_gait=synthesized_walk(), **kw,
    )


register("CassiePhaseEnv", _make_cassie_phase)
register(
    "CassiePhase2DEnv", functools.partial(_make_cassie_phase, planar=True)
)

from mocca_envs_tpu.tasks.monkey_stepper import make_monkey3d_stepper  # noqa: E402

register("Monkey3DStepperEnv", make_monkey3d_stepper)


def _make_walker2d_custom(**kw):
    from mocca_envs_tpu.models import walker2d

    return make_walker3d_custom(
        model=walker2d.make_walker2d(),
        name="Walker2DCustomEnv",
        initial_z=walker2d.WALKER2D_INITIAL_Z,
        constraints=walker2d.planar_spec(),
        terminal_link_names=("base",),
        **kw,
    )


def _make_crab2d_custom(**kw):
    from mocca_envs_tpu.models import walker2d
    from mocca_envs_tpu.tasks.walker_custom import WalkerParams

    # The crab is low-slung: base spawns at z=0.45, so the walker default
    # terminal_height=0.7 marks the SPAWN pose as fallen (every episode
    # terminal at every step — exposed by the round-4k training sweep;
    # random-torque throughput rows never read `done`). 0.2 ≈ the same
    # fallen fraction of standing height the walkers use (0.7/1.3).
    params = kw.pop("params", None) or WalkerParams.default().replace(
        terminal_height=jnp_f32(0.2)
    )
    return make_walker3d_custom(
        model=walker2d.make_crab2d(),
        name="Crab2DCustomEnv",
        initial_z=walker2d.CRAB2D_INITIAL_Z,
        params=params,
        constraints=walker2d.planar_spec(),
        terminal_link_names=("base",),
        **kw,
    )


def _child3d_params():
    """Child-scaled task params (VERDICT r4 weak #2 — "reward scaled to
    its mass"). The child's natural joint speeds run ~1/√s = 1.4× the
    adult's, so the adult-tuned electricity weight (2.0 on |a·0.1 q̇|)
    swamps the progress term during early exploration; halving it keeps
    the cost/progress ratio the adult trains under. Target distances
    scale with walking speed (∝ √s)."""
    from mocca_envs_tpu.tasks.walker_custom import WalkerParams

    return WalkerParams.default().replace(
        terminal_height=jnp_f32(0.35),
        w_electricity=jnp_f32(1.0),
        target_dist_lo=jnp_f32(2.0),
        target_dist_hi=jnp_f32(5.0),
    )


def _make_child3d_custom(**kw):
    from mocca_envs_tpu.models import child3d

    params = kw.pop("params", None) or _child3d_params()
    return make_walker3d_custom(
        model=kw.pop("model", None) or child3d.make_model(),
        name=kw.pop("name", "Child3DCustomEnv"),
        initial_z=child3d.INITIAL_Z,
        params=params,
        **kw,
    )


def _make_child3d_pd_custom(**kw):
    # not a reference ID: PD-servoed child, the learnable actuation for
    # the scaled model (torque control at s=0.5 sits in the energy-
    # diffusion regime under exploration noise — BENCH.md round-3
    # "energy diffusion"; PD families stay grounded, z̄ ≤ 0.9)
    return _make_child3d_custom(
        name="Child3DPDCustomEnv", pd_control=True, **kw
    )


def jnp_f32(v):
    import jax.numpy as jnp

    return jnp.asarray(v, dtype=jnp.float32)


from mocca_envs_tpu.tasks.walker_terrain import make_walker3d_terrain  # noqa: E402

def _make_walker3d_stairs(**kw):
    """Walker walk-to-target over a triangle-MESH staircase — the consumer
    of the GEOM_MESH collision path (extension family; the reference's
    bullet_objects world geometry loads meshes the same way)."""
    from mocca_envs_tpu.tasks.walker_custom import WalkerParams
    from mocca_envs_tpu.terrain.scene import stairs_trimesh

    params = kw.pop("params", None) or WalkerParams.default().replace(
        target_dist_lo=jnp_f32(1.0), target_dist_hi=jnp_f32(2.5)
    )
    return make_walker3d_custom(
        name="Walker3DStairsEnv",
        params=params,
        scene_builder=lambda: stairs_trimesh(
            n_steps=6, rise=0.12, run=0.35, width=4.0, start_x=0.6
        ),
        **kw,
    )


def _make_walker3d_terrain_lidar(**kw):
    return make_walker3d_terrain(
        name="Walker3DTerrainLidarEnv", lidar=True, **kw
    )


register("Walker3DTerrainEnv", make_walker3d_terrain)
register("Walker3DTerrainLidarEnv", _make_walker3d_terrain_lidar)
register("Walker3DStairsEnv", _make_walker3d_stairs)
register("Walker2DCustomEnv", _make_walker2d_custom)
register("Crab2DCustomEnv", _make_crab2d_custom)
register("Child3DCustomEnv", _make_child3d_custom)
register("Child3DPDCustomEnv", _make_child3d_pd_custom)
