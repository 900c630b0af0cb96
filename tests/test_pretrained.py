"""Pretrained Bayes import (data/bayesianmodels/pretrained) + informed/MLPS
MCTS variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.ml.pretrained import (compute_features_java,
                                        java_catalog_to_arms,
                                        java_feature_sizes, load_pretrained,
                                        make_prior_fn, pretrained_bayes_bot)
from microrts_tpu.ops.arms import arm_masks, arm_space

MAPS = "/root/reference/maps"
WR_XML = ("/root/reference/data/bayesianmodels/pretrained/"
          "ActionInterdependenceModel-WR.xml")


@pytest.fixture(scope="module")
def env():
    return GridnetEnv(f"{MAPS}/8x8/basesWorkers8x8.xml")


@pytest.fixture(scope="module")
def model(env):
    return load_pretrained(WR_XML, env)


def _legal(env, s, a, player):
    cand = env.decode(s, a, player, env._inflight_claims(s),
                      env._inflight_spent(s, player))[0]
    legal = np.asarray(env.engine.validate(s, cand))
    real = np.asarray(cand.atype) > 0
    return legal[real].all()


def test_java_catalog_maps_every_index(env):
    """Every Java Y index lands on a distinct arm; the fixed sections map
    where the arm catalog puts them (BayesianModel.java:144-172)."""
    cfg = env.cfg.engine
    sp = arm_space(env)
    for ysize in (69, 65):   # historical (7 producible) and current (6)
        m = java_catalog_to_arms(cfg, sp, ysize)
        assert (m >= 0).all()
        assert len(set(m.tolist())) == ysize      # injective
        assert m[0] == 0
        assert list(m[1:13]) == list(range(1, 13))
        assert (m[-1] >= sp.attack_base) and (m[-1] < sp.n_arms)


def test_load_pretrained_shapes(env, model):
    T = env.cfg.engine.num_types
    A = arm_space(env).n_arms
    assert model.log_prior.shape == (T, A)
    assert len(model.log_cpds) == 8
    for f, tab in enumerate(model.log_cpds):
        assert tab.shape[:2] == (T, A)
        assert tab.shape[2] == java_feature_sizes(env.cfg.engine)[f]
    assert model.log_tf.shape == (T, 6, 6)
    cal = np.asarray(model.calibration)
    assert ((cal >= 0) & (cal <= 1.05)).all()


def test_java_features_quirks(env):
    """FeatureGeneratorSimple encoding: neutral resources read as ENEMY
    occupancy (:92-98), walls/oob = 2, free = 0."""
    cfg = env.cfg.engine
    s = env.reset(jax.random.PRNGKey(0))
    f = np.asarray(compute_features_java(s, 0, cfg,
                                         java_feature_sizes(cfg)))
    T = cfg.num_types
    owner = np.asarray(s.owner)
    utype = np.asarray(s.utype)
    H, W = owner.shape
    offs = ((-2, 0), (0, -2), (2, 0), (0, 2))
    checked_neutral = checked_oob = 0
    for y in range(H):
        for x in range(W):
            if not (utype[y, x] > 0 and owner[y, x] == 0):
                continue
            for k, (xo, yo) in enumerate(offs):
                x2, y2 = x - xo, y - yo
                v = f[y, x, 4 + k]
                if not (0 <= x2 < W and 0 <= y2 < H):
                    assert v == 2
                    checked_oob += 1
                elif utype[y2, x2] > 0 and owner[y2, x2] == -1:
                    # neutral resource -> encoded as enemy of its type
                    assert v == 3 + T + (utype[y2, x2] - 1)
                    checked_neutral += 1
    assert checked_oob > 0   # some p0 unit borders the map at reset


def test_pretrained_bot_plays_legally(env, model):
    bot = jax.jit(pretrained_bayes_bot(env, model), static_argnums=1)
    s = env.reset(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(3)
    produced_real = False
    for t in range(30):
        k, k0 = jax.random.split(k)
        a = bot(s, 0, k0)
        assert _legal(env, s, a, 0)
        produced_real |= bool(np.asarray(a[..., 0]).any())
        s, _, done = env.step(s, a, jnp.zeros_like(a))
        if bool(done):
            break
    assert produced_real


def test_prior_fn_normalized_over_legal(env, model):
    pf = make_prior_fn(env, model)
    s = env.reset(jax.random.PRNGKey(1))
    m = env.engine.legal_masks(s, 0)
    la = arm_masks(arm_space(env), m)
    p = np.asarray(pf(s, 0, la))
    acting = np.asarray(m["can_act"])
    assert np.allclose(p.sum(-1)[acting], 1.0, atol=1e-4)
    assert float(np.where(np.asarray(la), 0.0, p).sum()) == 0.0


TINY = dict(n_playouts=6, max_nodes=12, max_children=4, max_depth=3,
            playout_len=8)


@pytest.mark.heavy
def test_informed_naive_mcts_plays_legally(env, model):
    from microrts_tpu.bots.treesearch import informed_naive_mcts_bot
    bot = jax.jit(informed_naive_mcts_bot(env, model, **TINY),
                  static_argnums=1)
    s = env.reset(jax.random.PRNGKey(4))
    a = bot(s, 0, jax.random.PRNGKey(5))
    assert _legal(env, s, a, 0)
    assert bool(np.asarray(a[..., 0]).any())


@pytest.mark.heavy
def test_mlps_mcts_plays_legally(env):
    from microrts_tpu.bots.treesearch import mlps_mcts_bot
    bot = jax.jit(mlps_mcts_bot(env, **TINY), static_argnums=1)
    s = env.reset(jax.random.PRNGKey(6))
    a = bot(s, 0, jax.random.PRNGKey(7))
    assert _legal(env, s, a, 0)
    assert bool(np.asarray(a[..., 0]).any())


def test_registry_has_new_bots(env):
    from microrts_tpu.config import make_bot
    for name in ("InformedNaiveMCTS", "MLPSMCTS",
                 "UnitActionProbabilityDistributionAI",
                 "ai.mcts.mlps.MLPSMCTS"):
        assert callable(make_bot(name, env))
