"""Topology-evolving NEAT (train/neat.py): unit + evolution checks.

Covers the jneat capability (ai/jneat/* via rts/MicroRTSNEAT.java):
historical markings compose across lineages, crossover aligns by
innovation, the dense compiled form equals the gene list, the device
relax loop matches a numpy re-evaluation, XOR evolves (the canonical
NEAT correctness probe — it REQUIRES grown hidden structure), and the
compiled nets drive CooperativeAI per-type networks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.train.neat import (NeatConfig, NeatGenome,
                                     NeatPopulation, SIGMOID_SLOPE,
                                     compat_distance, crossover,
                                     fully_connected, InnovationRegistry,
                                     mutate_add_link, mutate_add_node,
                                     neat_evolve, neat_forward)


def test_innovation_markings_shared_across_lineages():
    """The same structural mutation in two genomes must get the same
    gene innovations AND the same node id (Innovation.java semantics)."""
    cfg = NeatConfig(capacity=12)
    reg = InnovationRegistry(first_node_id=4)   # 1 bias + 2 in + 1 out
    rng = np.random.default_rng(0)
    a = fully_connected(2, 1, cfg, reg, rng)
    b = fully_connected(2, 1, cfg, reg, rng)
    assert np.array_equal(a.innov, b.innov)     # same initial wiring ids
    # split the SAME gene (innov 0) in both lineages
    for g in (a, b):
        g.on[:] = False
        g.on[0] = True
        assert mutate_add_node(g, reg, np.random.default_rng(1))
    assert a.hidden_ids() == b.hidden_ids()
    assert np.array_equal(a.innov, b.innov)


def test_crossover_aligns_and_compiles():
    cfg = NeatConfig(capacity=16)
    reg = InnovationRegistry(first_node_id=5)   # 2 in, 2 out
    rng = np.random.default_rng(2)
    mom = fully_connected(2, 2, cfg, reg, rng)
    dad = fully_connected(2, 2, cfg, reg, rng)
    for _ in range(3):
        mutate_add_node(mom, reg, rng)
        mutate_add_link(dad, reg, rng)
    child = crossover(mom, dad, mom_fitter=True, rng=rng)
    # disjoint/excess come from the fitter parent only
    assert set(child.innov.tolist()) == set(mom.innov.tolist())
    assert set(child.hidden_ids()) <= set(mom.hidden_ids())
    W = child.compile()
    assert W.shape == (cfg.capacity, cfg.capacity)
    live = child.on
    # every enabled gene lands in the matrix (slot-mapped)
    assert (np.abs(W) > 0).sum() <= live.sum()
    assert compat_distance(child, mom) <= compat_distance(child, dad) + 1e-9
    assert compat_distance(mom, dad) == pytest.approx(
        compat_distance(dad, mom))


def test_forward_matches_numpy_relax_loop():
    """neat_forward == flush/clamp/relax re-computed by hand (the
    NetworkHelpers.evaluateNetworkContinuous contract)."""
    cfg = NeatConfig(capacity=8, relax_steps=5)
    reg = InnovationRegistry(first_node_id=4)
    rng = np.random.default_rng(3)
    g = fully_connected(2, 1, cfg, reg, rng)
    mutate_add_node(g, reg, rng)
    mutate_add_link(g, reg, rng)
    W = g.compile()
    x = np.array([0.3, -0.7], np.float32)
    h = np.zeros(cfg.capacity, np.float32)
    for _ in range(cfg.relax_steps):
        act = 1.0 / (1.0 + np.exp(-SIGMOID_SLOPE * (h @ W)))
        h = np.concatenate([[1.0], x, act[3:]]).astype(np.float32)
    out = neat_forward(jnp.asarray(W), jnp.asarray(x), 2, 1,
                       cfg.relax_steps)
    np.testing.assert_allclose(np.asarray(out), h[3:4], rtol=1e-5)


def test_xor_evolves_with_topology_growth():
    """XOR is not linearly separable: solving it PROVES hidden nodes
    grew and crossover/speciation preserved them."""
    cfg = NeatConfig(pop_size=96, capacity=10, relax_steps=4,
                     add_node_prob=0.05, add_link_prob=0.2,
                     compat_threshold=3.0)
    pop = NeatPopulation(n_in=2, n_out=1, cfg=cfg, seed=7)
    X = jnp.array([[0., 0.], [0., 1.], [1., 0.], [1., 1.]])
    Y = jnp.array([0., 1., 1., 0.])

    def fitness(Ws, key):
        def one(W):
            out = neat_forward(W, X, 2, 1, cfg.relax_steps)[..., 0]
            return 4.0 - jnp.sum((out - Y) ** 2)
        return jax.vmap(one)(Ws)

    best_hist = []
    fit_j = jax.jit(fitness)
    solved = False
    for gen in range(150):
        fit = np.asarray(fit_j(jnp.asarray(pop.compiled()),
                               jax.random.PRNGKey(gen)))
        best_hist.append(float(fit.max()))
        if fit.max() > 3.6:
            solved = True
            break
        pop.epoch(fit)
    assert solved, f"XOR not solved in 150 generations: {max(best_hist)}"
    # the winning genome must have grown structure beyond the minimal
    # fully-connected start (XOR is unsolvable without a hidden node)
    champs = [g for g in pop.genomes
              if g.n_nodes > g.n_base] + ([pop.best] if pop.best else [])
    assert any(g.n_nodes > g.n_base for g in champs)


def test_neat_evolve_api_runs_and_improves():
    cfg = NeatConfig(pop_size=32, capacity=6, relax_steps=3)
    pop = NeatPopulation(n_in=1, n_out=1, cfg=cfg, seed=1)
    target = 0.25

    def fitness(Ws, key):
        x = jnp.full((1,), 0.5)
        def one(W):
            out = neat_forward(W, x, 1, 1, cfg.relax_steps)[0]
            return -jnp.abs(out - target)
        return jax.vmap(one)(Ws)

    best, hist = neat_evolve(fitness, pop, generations=12,
                             key=jax.random.PRNGKey(0))
    assert best is not None
    assert max(hist[-4:]) >= hist[0] - 1e-6
    assert len(hist) == 12


def test_cooperative_bot_runs_on_neat_nets():
    """Per-unit-type NEAT networks drive CooperativeAI (the
    NEATUnitAI.Think wiring, ai/units/NEATUnitAI.java:18-23) through the
    apply_fn hook; actions must be legal."""
    from microrts_tpu.bots.cooperative import (cooperative_bot,
                                               cooperative_dims)
    from microrts_tpu.config import make_bot
    from microrts_tpu.env.gridnet import GridnetEnv
    from microrts_tpu.utils.assets import asset_path
    from tests.test_cooperative import _all_legal

    env = GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))
    T = env.cfg.engine.num_types
    dims = cooperative_dims(env)
    n_in, n_out = dims[0], dims[-1]
    cfg = NeatConfig(pop_size=T, capacity=1 + n_in + n_out + 4,
                     relax_steps=2)
    pop = NeatPopulation(n_in=n_in, n_out=n_out, cfg=cfg, seed=0)
    Ws = jnp.asarray(pop.compiled())   # one net per unit type

    def apply_fn(ti, xs):
        return neat_forward(Ws[ti], xs, n_in, n_out, cfg.relax_steps)

    bot = jax.jit(cooperative_bot(env, apply_fn=apply_fn),
                  static_argnums=1)
    s = env.reset(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    opp = make_bot("RandomBiasedAI", env)
    for _ in range(2):
        k, k0, k1 = jax.random.split(k, 3)
        a = bot(s, 0, k0)
        assert _all_legal(env, s, a, 0)
        s, _, done = env.step(s, a, opp(s, 1, k1))
        if bool(done):
            break
