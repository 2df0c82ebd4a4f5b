"""mocca_envs_tpu: TPU-native locomotion environment engine.

A from-scratch reimplementation of the capabilities of UBCMOCCA/mocca_envs
(PyBullet locomotion suite behind the ALLSTEPS work) as pure-JAX batched
steppers. See SURVEY.md at the repo root for the reference structural
analysis this build follows, and README.md for the architecture.
"""

__version__ = "0.1.0"

from mocca_envs_tpu.envs.registry import make, registered_envs  # noqa: E402,F401
