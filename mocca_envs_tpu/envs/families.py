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
register("Walker3DStepperEnv", make_walker3d_stepper)
register("CassieEnv", make_cassie)
register(
    "Cassie2DEnv",
    functools.partial(make_cassie, name="Cassie2DEnv", planar=True),
)
register(
    "CassiePhaseEnv",
    functools.partial(make_cassie, name="CassiePhaseEnv", phase_obs=True),
)
register(
    "CassiePhase2DEnv",
    functools.partial(
        make_cassie, name="CassiePhase2DEnv", planar=True, phase_obs=True
    ),
)
