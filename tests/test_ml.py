"""Bayes unit-action models + SCV voting bot.

Mirrors the reference coverage for ai/machinelearning/bayes (train from
traces, predict masked distributions, calibration) and ai/scv (per-unit
voting over the strategy pool).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.bots.scripted import passive_bot, random_bot, worker_rush
from microrts_tpu.bots.scv import scv_bot
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.ml.bayes import (NaiveBayesModel, bayes_bot,
                                   compute_features, feature_sizes,
                                   train_from_traces)
from microrts_tpu.utils.assets import asset_path

TRACES = "/root/reference/data/traces"


@pytest.fixture(scope="module")
def env8():
    return GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))


def _legal(env, s, a, player):
    cand = env.decode(s, a, player, env._inflight_claims(s),
                      env._inflight_spent(s, player))[0]
    legal = np.asarray(env.engine.validate(s, cand))
    real = np.asarray(cand.atype) > 0
    return legal[real].all()


def test_features_are_in_range(env8):
    env = env8
    s = env.reset(jax.random.PRNGKey(0))
    f = np.asarray(compute_features(s, 0, env.cfg.engine))
    sizes = feature_sizes(env.cfg.engine)
    assert f.shape == (env.h, env.w, len(sizes))
    for j, x in enumerate(sizes):
        assert f[..., j].min() >= 0 and f[..., j].max() < x, f"feature {j}"


@pytest.mark.skipif(not os.path.isdir(TRACES), reason="traces not mounted")
def test_train_predict_play(env8, tmp_path):
    """Train on a couple of golden traces for an 8x8-compatible layout,
    save/load, and play legally with both sampling and greedy modes
    (CalibratedNaiveBayes.train + UnitActionProbabilityDistributionAI)."""
    import glob
    env = env8
    paths = sorted(glob.glob(
        f"{TRACES}/8x8/basesWorkers8x8/*/trace_0.zip"))[:2]
    assert paths
    # train only on traces whose board matches the env shape
    from microrts_tpu.interop.trace import load_trace
    t0 = load_trace(paths[0])
    if (t0.entries[0].pgs.height != env.h
            or t0.entries[0].pgs.width != env.w):
        pytest.skip("no 8x8 trace available")
    model = train_from_traces(env, paths, max_entries_per_trace=40)
    assert model.prior.sum() > 0
    p = tmp_path / "nb.npz"
    model.save(str(p))
    model2 = NaiveBayesModel.load(str(p))
    np.testing.assert_array_equal(model.prior, model2.prior)

    for greedy in (False, True):
        bot = jax.jit(bayes_bot(env, model2, greedy=greedy),
                      static_argnums=1)
        s = env.reset(jax.random.PRNGKey(1))
        opp = random_bot(env, 5.0)
        k = jax.random.PRNGKey(2)
        for i in range(4):
            k, k0, k1 = jax.random.split(k, 3)
            a = bot(s, 0, k0)
            assert _legal(env, s, a, 0)
            s, _, done = env.step(s, a, opp(s, 1, k1))
            if bool(done):
                break


def test_scv_votes_unanimous_pool(env8):
    """A pool of identical strategies must vote exactly that strategy's
    action (SCV.getBestActionSoFar: majority of equal proposals)."""
    env = env8
    wr = worker_rush(env)
    vote = scv_bot(env, [wr, wr, wr])
    s = env.reset(jax.random.PRNGKey(3))
    k = jax.random.PRNGKey(4)
    a_vote = np.asarray(jax.jit(vote, static_argnums=1)(s, 0, k))
    a_wr = np.asarray(wr(s, 0, jax.random.split(k, 3)[0]))
    np.testing.assert_array_equal(a_vote, a_wr)


def test_scv_plays_legally_and_wins(env8):
    env = env8
    bot = scv_bot(env)
    s = env.reset(jax.random.PRNGKey(5))
    k = jax.random.PRNGKey(6)
    a = bot(s, 0, k)
    assert _legal(env, s, a, 0)
    # majority of deterministic rushes out-votes the random member ->
    # SCV behaves like a coherent rush and beats passive
    step = jax.jit(lambda s, k: env.step(
        s, bot(s, 0, k), passive_bot(env)(s, 1, k)))
    for i in range(900):
        k, sub = jax.random.split(k)
        s, _, done = step(s, sub)
        if bool(done):
            break
    assert int(env.engine.winner(s)) == 0


def test_scv_adaptive_pool_selection(env8):
    """The full pool-selection model (SCV.java:115-175, 356-536): the
    bundled ltdsFinais CSV parses, the opening pool is the per-height
    hardcoded one, and after tick 1000 the in-graph classifier picks a
    battle-statistics pool whose members (and only they) vote."""
    import jax.numpy as jnp
    from microrts_tpu.bots.scv import (POOL_BOTS, _OPENING,
                                       load_pool_tables)

    env = env8
    ltd, mem, names = load_pool_tables(env.h)
    assert ltd.shape[0] == mem.shape[0] == len(names) > 100
    assert mem.shape[1] == len(POOL_BOTS)
    # the Java substring scan: every selectable pool has >= 1 member,
    # and the EMRDeterministico-only pools are dead (quirk reproduced)
    sel = np.isfinite(ltd).all(-1)
    assert (mem[sel].sum(-1) >= 1).all()

    bot = scv_bot(env, adaptive=True)
    s = env.reset(jax.random.PRNGKey(7))
    a = bot(s, 0, jax.random.PRNGKey(8))
    assert _legal(env, s, a, 0)
    # opening (t < 1000) = unanimous vote of the height-8 opening pool
    # members; after t >= 1000 the CSV pool takes over and still plays
    # legally
    s2 = s.replace(time=jnp.int32(1500))
    a2 = bot(s2, 0, jax.random.PRNGKey(9))
    assert _legal(env, s2, a2, 0)


def test_scv_archetype_distribution_responds_to_composition(env8):
    """The transparent enemy classifier (stand-in for the JVM-only weka
    logistic, SCV.java:394-449) must put its mass on the archetype whose
    composition dominates the enemy army."""
    import jax.numpy as jnp
    from microrts_tpu.bots.scv import ARCHETYPES, _archetype_distribution

    env = env8
    s = env.reset(jax.random.PRNGKey(21))

    def plant(s, cells, tid):
        ut = np.asarray(s.utype).copy()
        ow = np.asarray(s.owner).copy()
        hp = np.asarray(s.hp).copy()
        uid = np.asarray(s.uid).copy()
        for i, (y, x) in enumerate(cells):
            ut[y, x] = tid + 1
            ow[y, x] = 1
            hp[y, x] = 4
            uid[y, x] = 900 + i
        return s.replace(utype=jnp.asarray(ut), owner=jnp.asarray(ow),
                         hp=jnp.asarray(hp), uid=jnp.asarray(uid)).canon()

    cases = [(env.cfg.light_id, "POLightRush"),
             (env.cfg.ranged_id, "PORangedRush"),
             (env.cfg.heavy_id, "POHeavyRush")]
    for tid, expect in cases:
        s2 = plant(s, [(4, 2), (4, 3), (5, 2)], tid)
        d = np.asarray(_archetype_distribution(s2, 0, env.cfg))
        assert ARCHETYPES[int(d.argmax())] == expect, (expect, d)
    # pure worker mass with no barracks -> POWorkerRush
    s3 = plant(s, [(4, 2), (4, 3), (5, 2), (5, 3)], env.cfg.worker_id)
    d = np.asarray(_archetype_distribution(s3, 0, env.cfg))
    assert ARCHETYPES[int(d.argmax())] == "POWorkerRush", d
