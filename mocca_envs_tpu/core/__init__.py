from mocca_envs_tpu.core import quat, rng, spatial

__all__ = ["quat", "rng", "spatial"]
