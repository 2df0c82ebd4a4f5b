"""Terrain rollout artifact from the 4g transfer checkpoint (CPU).

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/terrain4_artifact.py

Writes docs/terrain4_view.html — interactive replay of the pretrain-
transferred walker running over a fractal heightfield (BENCH.md round-4g:
2.4 m/s, done/step 0.0015).
"""
import numpy as np, jax, jax.numpy as jnp, os
import mocca_envs_tpu
from mocca_envs_tpu.harness.allsteps import AllstepsConfig
from mocca_envs_tpu.harness.checkpoint import CheckpointManager
from mocca_envs_tpu.harness.ppo import PPOLearner
from mocca_envs_tpu.harness.viewer import export_html
from mocca_envs_tpu.harness.viz import dump_trajectory, scene_to_desc
from mocca_envs_tpu.tasks.walker_terrain import make_walker3d_terrain

cfg = AllstepsConfig()
env = make_walker3d_terrain(name="Terrain4g")
learner = PPOLearner(env, cfg.ppo(), num_envs=cfg.num_envs)
mgr = CheckpointManager("ckpt/r4g_terrain")
state = mgr.restore(learner.init(seed=3), mgr.latest_step())
params, norm = state.params, state.obs_norm
net = learner.net
print(f"restored ckpt/r4g_terrain@{mgr.latest_step()}")

@jax.jit
def policy_step(s, obs):
    o = jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10, 10)
    mean, _ls, _v = net.apply(params, o[None])
    tr = env.step_no_reset(s, mean[0])
    return tr, env.obs_fn(tr.state)

best = None
for seed in (11, 42, 77):
    s = env.init(jax.random.key(seed))
    obs = env.obs_fn(s)
    qs = [np.asarray(s.q)]
    for t in range(400):
        tr, obs = policy_step(s, obs)
        s = tr.state
        qs.append(np.asarray(s.q))
        if bool(tr.done):
            break
    dist = float(np.linalg.norm(qs[-1][0:2] - qs[0][0:2]))
    print(f"seed {seed}: frames={len(qs)} dist={dist:.1f} m")
    if best is None or len(qs) > len(best[1]):
        best = (dist, qs, s)
dist, qs, s = best
os.makedirs("docs", exist_ok=True)
dump_trajectory(env.model, np.stack(qs), "docs/_t.json",
                scene_desc=scene_to_desc(s.scene))
export_html("docs/_t.json", "docs/terrain4_view.html")
os.remove("docs/_t.json")
print(f"wrote docs/terrain4_view.html ({len(qs)} frames, {dist:.1f} m crossed)")
