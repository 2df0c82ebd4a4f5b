from mocca_envs_tpu.ops import collide, dynamics, integrate, kinematics, solver, step

__all__ = ["collide", "dynamics", "integrate", "kinematics", "solver", "step"]
