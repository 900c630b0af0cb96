"""CooperativeAI + IDRTMinimaxRandomized + ContinuingNaiveMCTS checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.config import make_bot
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.utils.assets import asset_path


@pytest.fixture(scope="module")
def env():
    return GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))


def _all_legal(env, s, a, player):
    cand, _, _ = env.decode(s, a, player, env._inflight_claims(s),
                            env._inflight_spent(s, player))
    legal = np.asarray(env.engine.validate(s, cand))
    real = np.asarray(cand.atype) > 0
    return legal[real].all()


def test_cooperative_bot_legal_and_evolvable(env):
    """Fresh-genome CooperativeAI emits only legal actions; the genome
    spec wires into the ES stack (the MicroRTSNEAT workload)."""
    from microrts_tpu.bots.cooperative import (cooperative_bot,
                                               cooperative_genome_spec)
    G, dims = cooperative_genome_spec(env)
    T = env.cfg.engine.num_types
    assert dims[-1] == env.h * env.w + T + 1
    genomes = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (T, G))
    bot = jax.jit(cooperative_bot(env, genomes), static_argnums=1)
    s = env.reset(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    for i in range(4):
        k, k0, k1 = jax.random.split(k, 3)
        a = bot(s, 0, k0)
        assert _all_legal(env, s, a, 0)
        opp = make_bot("RandomBiasedAI", env)
        s, _, done = env.step(s, a, opp(s, 1, k1))
        if bool(done):
            break
    # two different genomes must (generically) give different policies
    g2 = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (T, G))
    bot2 = jax.jit(cooperative_bot(env, g2), static_argnums=1)
    s0 = env.reset(jax.random.PRNGKey(0))
    a1 = bot(s0, 0, jax.random.PRNGKey(5))
    a2 = bot2(s0, 0, jax.random.PRNGKey(5))
    assert not np.array_equal(np.asarray(a1), np.asarray(a2))


def test_idrt_minimax_randomized_legal(env):
    bot = jax.jit(make_bot("IDRTMinimaxRandomized", env), static_argnums=1)
    s = env.reset(jax.random.PRNGKey(0))
    a = bot(s, 0, jax.random.PRNGKey(2))
    assert _all_legal(env, s, a, 0)
    assert int(jnp.sum(a[..., 0] > 0)) > 0  # it does something at t=0


@pytest.mark.heavy
def test_continuing_naive_mcts_reuses_tree(env):
    """The ContinuingAI analog must carry tree statistics across moves:
    after a few steps the tree holds MORE nodes than one fresh search
    could have produced.  The game advances DECISION FRAME by decision
    frame exactly like the stateful match loop (believestate.
    play_matches_stateful) — tree node states are simulated at decision
    frames, so only that loop's states can re-root; driving env.step
    tick-by-tick presents mid-flight states no tree node ever holds."""
    from microrts_tpu.bots.treesearch import naive_mcts_continuing
    from microrts_tpu.ops.playout import fast_forward

    n_playouts = 12
    sb = naive_mcts_continuing(env, n_playouts=n_playouts, playout_len=16,
                               max_nodes=64, max_depth=4)
    opp = make_bot("WorkerRush", env)
    s = env.reset(jax.random.PRNGKey(0))
    mem = sb.init(s, 0)
    step = jax.jit(sb.step, static_argnums=2)
    ff = jax.jit(lambda s, d: fast_forward(env, s, d))
    key = jax.random.PRNGKey(1)
    sizes = []
    for i in range(8):
        key, k0, k1 = jax.random.split(key, 3)
        a, mem = step(s, mem, 0, k0)
        assert _all_legal(env, s, a, 0)
        sizes.append(int(mem.nnodes))
        s, _, done = env.step(s, a, opp(s, 1, k1))
        s, done = ff(s, done)
        if bool(done):
            break
    # a fresh tree can reach at most 1 + n_playouts nodes per move;
    # reuse must exceed that bound at some point
    assert max(sizes) > 1 + n_playouts, sizes
