"""Mesh sharding: the data-parallel learner on a virtual 8-device mesh.

The reference has no distributed tests (SURVEY.md §4: "no multi-node tests
and no fake backends"); ours run the REAL collective path — shard_map over
8 virtual CPU devices with psum'd gradients — and prove the sharded update
is numerically the SAME program as the single-device one (SURVEY.md §4:
"same trajectory independent of mesh shape")."""

import jax
import numpy as np
import pytest

from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.parallel.mesh import make_mesh
from microrts_tpu.train.ppo import PPOConfig, PPOTrainer
from microrts_tpu.utils.assets import asset_path

MAP8 = asset_path("maps/8x8/basesWorkers8x8.xml")


@pytest.mark.heavy
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_ppo_update_matches_shapes():
    env = GridnetEnv(MAP8)
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


@pytest.mark.heavy
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_two_axis_host_env_mesh_matches_flat():
    """A 2-axis (host, env) = (2, 4) mesh must run the SAME program as the
    flat 8-device mesh: identical trajectories, params equal to psum
    reduction-order rounding (the multi-host harness, SURVEY §2.10)."""
    import jax.numpy as jnp
    import optax

    from microrts_tpu.models.gridnet_policy import ActionSpace, GridnetPolicy

    env = GridnetEnv(MAP8)
    ecfg = env.cfg.engine
    model = GridnetPolicy(ActionSpace(ecfg.num_types, 2 * ecfg.max_range + 1),
                          dtype=jnp.float32)
    cfg = PPOConfig(num_envs=16, rollout_len=4, minibatches=2, epochs=1)
    outs = []
    for mesh in (make_mesh(8), make_mesh((2, 4)), make_mesh((4, 2))):
        tr = PPOTrainer(env, cfg, mesh=mesh, tx=optax.sgd(1e-2),
                        model=model)
        ts, m = jax.jit(tr.update_sharded)(tr.init(jax.random.PRNGKey(3)))
        outs.append((ts, m))
    ts0, m0 = outs[0]
    for ts, m in outs[1:]:
        np.testing.assert_array_equal(np.asarray(ts0.env_states.time),
                                      np.asarray(ts.env_states.time))
        np.testing.assert_array_equal(np.asarray(ts0.env_states.utype),
                                      np.asarray(ts.env_states.utype))
        np.testing.assert_allclose(float(m0["mean_reward"]),
                                   float(m["mean_reward"]), rtol=1e-6)
        for pa, pb in zip(jax.tree.leaves(ts0.params),
                          jax.tree.leaves(ts.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=1e-4, atol=1e-7)


@pytest.mark.heavy
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_rollout_invariant_across_mesh_shapes():
    """The SAME workload on mesh shapes 1/2/4/8 must roll out bit-identical
    env trajectories (per-env RNG keyed by global env index; the env axis
    is only re-laid-out) and agree on rewards exactly (VERDICT r3 item 8)."""
    import jax.numpy as jnp
    import optax

    from microrts_tpu.models.gridnet_policy import ActionSpace, GridnetPolicy

    env = GridnetEnv(MAP8)
    ecfg = env.cfg.engine
    model = GridnetPolicy(ActionSpace(ecfg.num_types, 2 * ecfg.max_range + 1),
                          dtype=jnp.float32)
    cfg = PPOConfig(num_envs=16, rollout_len=4, minibatches=2, epochs=1)
    outs = []
    for n in (1, 2, 4, 8):
        tr = PPOTrainer(env, cfg, mesh=make_mesh(n), tx=optax.sgd(1e-2),
                        model=model)
        ts, m = jax.jit(tr.update_sharded)(tr.init(jax.random.PRNGKey(3)))
        outs.append((n, ts, m))
    n0, ts0, m0 = outs[0]
    for n, ts, m in outs[1:]:
        np.testing.assert_array_equal(np.asarray(ts0.env_states.time),
                                      np.asarray(ts.env_states.time))
        np.testing.assert_array_equal(np.asarray(ts0.env_states.utype),
                                      np.asarray(ts.env_states.utype))
        np.testing.assert_array_equal(np.asarray(ts0.env_states.hp),
                                      np.asarray(ts.env_states.hp))
        np.testing.assert_allclose(float(m0["mean_reward"]),
                                   float(m["mean_reward"]), rtol=1e-6)


@pytest.mark.heavy
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_equals_unsharded_update():
    """Same seed, same env count: one PPO update on 1 vs 8 virtual devices
    must produce the same parameters (per-env RNG keyed by global env index,
    env-interleaved minibatches, global advantage normalization).

    Uses plain SGD + an fp32 model: parameter differences then scale
    linearly with the fp32 reduction-order noise in the psum'd gradients
    (~1e-7 relative).  The production defaults amplify that noise without
    testing the sharding itself: bf16 conv-gradient accumulation differs
    with batch size at the ~1% level, and Adam at step 1 acts like
    lr*sign(g), so grad noise on a near-zero gradient moves a weight by a
    full learning rate."""
    import jax.numpy as jnp
    import optax

    from microrts_tpu.models.gridnet_policy import ActionSpace, GridnetPolicy

    env = GridnetEnv(MAP8)
    cfg = PPOConfig(num_envs=16, rollout_len=8, minibatches=2, epochs=2)
    tx = optax.sgd(1e-2)
    ecfg = env.cfg.engine
    model = GridnetPolicy(ActionSpace(ecfg.num_types, 2 * ecfg.max_range + 1),
                          dtype=jnp.float32)

    tr_plain = PPOTrainer(env, cfg, tx=tx, model=model)
    ts0 = tr_plain.init(jax.random.PRNGKey(7))
    ts_a, m_a = jax.jit(tr_plain.update)(ts0)

    tr_mesh = PPOTrainer(env, cfg, mesh=make_mesh(8), tx=tx, model=model)
    ts_b, m_b = jax.jit(tr_mesh.update_sharded)(ts0)

    # trajectories are identical by construction -> rewards match exactly
    np.testing.assert_allclose(float(m_a["mean_reward"]),
                               float(m_b["mean_reward"]), rtol=1e-6)
    assert int(m_a["episodes"]) == int(m_b["episodes"])
    # parameters agree to reduction-order rounding (SGD: linear in noise)
    for pa, pb in zip(jax.tree.leaves(ts_a.params),
                      jax.tree.leaves(ts_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-4, atol=1e-7)
    # env states advanced identically (env axis was only re-laid-out)
    np.testing.assert_array_equal(np.asarray(ts_a.env_states.time),
                                  np.asarray(ts_b.env_states.time))
    np.testing.assert_array_equal(np.asarray(ts_a.env_states.utype),
                                  np.asarray(ts_b.env_states.utype))
