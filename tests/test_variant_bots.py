"""Second-tier bot variants: TwoPhaseNaiveMCTS, UCTFirstPlayUrgency,
RandomBiasedSingleUnitAI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.bots.scripted import random_biased_single_unit_bot
from microrts_tpu.bots.treesearch import naive_mcts_bot, uct_tree_bot
from microrts_tpu.env.gridnet import GridnetEnv

MAPS = "/root/reference/maps"


@pytest.fixture(scope="module")
def env():
    return GridnetEnv(f"{MAPS}/8x8/basesWorkers8x8.xml")


def _legal(env, s, a, player):
    cand = env.decode(s, a, player, env._inflight_claims(s),
                      env._inflight_spent(s, player))[0]
    legal = np.asarray(env.engine.validate(s, cand))
    real = np.asarray(cand.atype) > 0
    return legal[real].all()


def test_single_unit_bot_acts_one_unit(env):
    bot = jax.jit(random_biased_single_unit_bot(env), static_argnums=1)
    s = env.reset(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    saw_real = False
    for _ in range(20):
        k, k0 = jax.random.split(k)
        a = bot(s, 0, k0)
        n_real = int((np.asarray(a[..., 0]) > 0).sum())
        assert n_real <= 1
        saw_real |= n_real == 1
        assert _legal(env, s, a, 0)
        s, _, done = env.step(s, a, jnp.zeros_like(a))
        if bool(done):
            break
    assert saw_real


TINY = dict(n_playouts=6, max_nodes=12, max_children=4, max_depth=3,
            playout_len=8)


@pytest.mark.heavy
def test_two_phase_naive_mcts_plays_legally(env):
    bot = jax.jit(
        naive_mcts_bot(env, eps0=1.0, eps_l=0.3,
                       phase2=(0.0, 0.3, 0.0), phase1_ratio=0.5, **TINY),
        static_argnums=1)
    s = env.reset(jax.random.PRNGKey(2))
    a = bot(s, 0, jax.random.PRNGKey(3))
    assert _legal(env, s, a, 0)
    assert bool(np.asarray(a[..., 0]).any())


def test_uct_unit_actions_one_unit_per_call(env):
    from microrts_tpu.bots.treesearch import uct_unit_actions_bot
    bot = jax.jit(
        uct_unit_actions_bot(env, n_playouts=8, max_nodes=16,
                             max_children=6, max_depth=4, playout_len=8),
        static_argnums=1)
    s = env.reset(jax.random.PRNGKey(8))
    saw_one = False
    for seed in range(5):
        a = bot(s, 0, jax.random.PRNGKey(9 + seed))
        n_real = int(np.asarray(a[..., 0] > 0).sum())
        assert n_real <= 1      # at most one unit decided per frame
        saw_one |= n_real == 1
        assert _legal(env, s, a, 0)
    assert saw_one


def test_uct_fpu_plays_legally(env):
    bot = jax.jit(
        uct_tree_bot(env, fpu=0.5, n_playouts=6, max_nodes=12,
                     n_candidates=4, max_depth=3, playout_len=8),
        static_argnums=1)
    s = env.reset(jax.random.PRNGKey(4))
    a = bot(s, 0, jax.random.PRNGKey(5))
    assert _legal(env, s, a, 0)
    assert bool(np.asarray(a[..., 0]).any())


def test_variant_registry(env):
    from microrts_tpu.config import make_bot
    for name in ("TwoPhaseNaiveMCTS", "UCTFirstPlayUrgency",
                 "RandomBiasedSingleUnitAI", "UCTUnitActions",
                 "ai.mcts.naivemcts.TwoPhaseNaiveMCTS"):
        assert callable(make_bot(name, env))
