"""Mesh sharding: the data-parallel learner on a virtual 8-device mesh.

The reference has no distributed tests (SURVEY.md §4: "no multi-node tests
and no fake backends"); ours run the REAL collective path — shard_map over
8 virtual CPU devices with psum'd gradients — following the JAX analog of
"test multi-node without a cluster"."""

import jax
import numpy as np
import pytest

from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.parallel.mesh import make_mesh
from microrts_tpu.train.ppo import PPOConfig, PPOTrainer

MAPS = "/root/reference/maps"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_ppo_update_matches_shapes():
    env = GridnetEnv(f"{MAPS}/8x8/basesWorkers8x8.xml")
    mesh = make_mesh(8)
    cfg = PPOConfig(num_envs=16, rollout_len=4, minibatches=2, epochs=1)
    tr = PPOTrainer(env, cfg, mesh=mesh)
    ts = tr.init(jax.random.PRNGKey(0))
    ts2, m = jax.jit(tr.update_sharded)(ts)
    assert np.isfinite(float(m["mean_reward"]))
    assert int(ts2.update_count) == 1
    # params stay replicated and finite
    leaf = jax.tree.leaves(ts2.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()
    # a second update composes
    ts3, m2 = jax.jit(tr.update_sharded)(ts2)
    assert np.isfinite(float(m2["mean_reward"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_unsharded_rollout_shapes():
    env = GridnetEnv(f"{MAPS}/8x8/basesWorkers8x8.xml")
    cfg = PPOConfig(num_envs=8, rollout_len=4, minibatches=2, epochs=1)
    tr_plain = PPOTrainer(env, cfg)
    ts = tr_plain.init(jax.random.PRNGKey(0))
    ts2, m = jax.jit(tr_plain.update)(ts)
    assert np.isfinite(float(m["mean_reward"]))
