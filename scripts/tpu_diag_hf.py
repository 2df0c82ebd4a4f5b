"""Diagnose the hf-kernel/oracle trajectory spread seen on TPU.

Question: is the round-2 hf_kernel distributional failure (frac_q<1e-3 =
0.06 after ONE control step) a real kernel bug, or chaos amplification of
ulp-level hardware differences (reciprocal/rsqrt/fma) through contact
dynamics?  Method: compare at SINGLE-SUBSTEP granularity where chaos has no
time to amplify, for both flat and heightfield scenes, then watch error
growth over k control steps.

Run:  PYTHONPATH=/root/repo python scripts/tpu_diag_hf.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mocca_envs_tpu.models import walker3d
from mocca_envs_tpu.ops.pallas.engine import HF_PATCH, TILE, make_pallas_substep
from mocca_envs_tpu.ops.step import make_substep
from mocca_envs_tpu.terrain import scene as scene_mod
from mocca_envs_tpu.utils.config import EngineConfig

assert jax.default_backend() == "tpu", jax.default_backend()

model = walker3d.make_model()
B = TILE
P = HF_PATCH

key = jax.random.key(0)
kq, kd, kt, kh = jax.random.split(key, 4)
base = jnp.concatenate(
    [jnp.array([2.25, 2.25, 1.0]), jnp.array([1.0, 0.0, 0.0, 0.0]), jnp.zeros(model.nj)]
)
q = jnp.tile(base, (B, 1)) + 0.03 * jax.random.normal(kq, (B, model.nq))
qn = q[:, 3:7] / jnp.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
q = q.at[:, 3:7].set(qn)
qd = 0.3 * jax.random.normal(kd, (B, model.nv))
tau = 0.3 * jax.random.normal(kt, (B, model.nj))
fric = jnp.full((B,), 0.8)
cell = jnp.full((B,), 0.3)
x0 = jnp.zeros(B)
y0 = jnp.zeros(B)
raw = 0.2 * jax.random.normal(kh, (B, P, P))
hf = (raw + jnp.roll(raw, 1, 1) + jnp.roll(raw, 1, 2) + jnp.roll(raw, (1, 1), (1, 2))) / 4.0


def report(tag, qk, qo, dk, do):
    qe = np.abs(np.asarray(qk) - np.asarray(qo)).max(axis=1)
    de = np.abs(np.asarray(dk) - np.asarray(do)).max(axis=1)
    out = dict(
        tag=tag,
        q_med=float(np.median(qe)), q_max=float(qe.max()),
        frac_q_1e5=float(np.mean(qe < 1e-5)), frac_q_1e3=float(np.mean(qe < 1e-3)),
        qd_med=float(np.median(de)), qd_max=float(de.max()),
    )
    print("DIAG", json.dumps(out), flush=True)


for n_sub, steps in ((1, 1), (2, 1), (2, 8)):
    cfg = EngineConfig(sim_substeps=n_sub, solver_iters=8)
    sub = make_substep(model, cfg)

    # heightfield variant
    pal = make_pallas_substep(model, cfg, hf_patch=P)

    def jax_hf(q1, qd1, t1, hf1, x01, y01, c1):
        sc = scene_mod.Scene(
            has_ground=True, has_hf=True, ground_z=jnp.asarray(-5.0),
            hf_height=hf1, hf_xy0=jnp.stack([x01, y01]), hf_cell=c1,
            friction=jnp.asarray(0.8),
        )
        qq, dd = q1, qd1
        for _ in range(cfg.sim_substeps):
            qq, dd, info = sub(qq, dd, t1, sc)
        return qq, dd

    gz = jnp.full((B,), -5.0)
    qk, dk = q, qd
    qo, do = q, qd
    pal_j = jax.jit(lambda a, b: pal(a, b, tau, gz, fric, hf, x0, y0, cell)[:2])
    ora_j = jax.jit(jax.vmap(jax_hf, in_axes=(0, 0, 0, 0, 0, 0, 0)))
    for s in range(steps):
        qk, dk = pal_j(qk, dk)
        qo, do = ora_j(qo, do, tau, hf, x0, y0, cell)
    jax.block_until_ready(qk)
    report(f"hf_sub{n_sub}_steps{steps}", qk, qo, dk, do)

    # flat variant (control: is the spread hf-specific?)
    pal_f = make_pallas_substep(model, cfg)

    def jax_flat(q1, qd1, t1):
        sc = scene_mod.flat()
        qq, dd = q1, qd1
        for _ in range(cfg.sim_substeps):
            qq, dd, info = sub(qq, dd, t1, sc)
        return qq, dd

    gz0 = jnp.zeros(B)
    qk, dk = q, qd
    qo, do = q, qd
    palf_j = jax.jit(lambda a, b: pal_f(a, b, tau, gz0, fric)[:2])
    oraf_j = jax.jit(jax.vmap(jax_flat))
    for s in range(steps):
        qk, dk = palf_j(qk, dk)
        qo, do = oraf_j(qo, do, tau)
    jax.block_until_ready(qk)
    report(f"flat_sub{n_sub}_steps{steps}", qk, qo, dk, do)

print("DIAG DONE", flush=True)
