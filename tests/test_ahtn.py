"""AHTN: domain parsing, decomposition enumeration, adversarial play.

Mirrors the reference semantics (ai/ahtn/, data/ahtn/*.lisp): methods
decompose tasks, variables bind positionally, preconditions gate
applicability, and the adversarial choice is minimax over plan pairs.
"""

import jax
import numpy as np
import pytest

from microrts_tpu.bots.ahtn import (Domain, Method, _default_domain_path,
                                    ahtn_bot, enumerate_plans, load_domain,
                                    parse_sexp)
from microrts_tpu.bots.scripted import random_bot
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.synth.dsl import Attack, Harvest, NAllyOfType, Train
from microrts_tpu.utils.assets import asset_path


@pytest.fixture(scope="module")
def env8():
    return GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))


def test_sexp_parser_roundtrip():
    sexp = parse_sexp("(a (b 1 ?x) ;; comment\n (c))")
    assert sexp == ["a", ["b", 1, "?x"], ["c"]]


def test_portfolio_domain_loads_and_enumerates():
    dom = load_domain(_default_domain_path())
    assert dom.name == "microrts-portfolio"
    plans = enumerate_plans(dom)
    # 6 destroy-player methods, each with a single decomposition chain
    assert len(plans) == 6
    names = {p.path[0] for p in plans}
    assert "dp-worker-rush" in names and "dp-ranged-rush" in names
    wr = next(p for p in plans if p.path[0] == "dp-worker-rush")
    assert wr.commands == (Harvest(1), Train("Base", "Worker", 20),
                           Attack("All", "Closest"))
    # precondition propagates down the path
    hv = next(p for p in plans if p.path[0] == "dp-heavy-push")
    assert NAllyOfType("Worker", 1) in hv.pres


def test_variable_binding_in_methods():
    dom = Domain("t", [
        Method("root", ("destroy-player",), None,
               [["sub", 3]]),
        Method("s", ("sub", "?n"), None, [["!harvest", "?n"]]),
    ])
    plans = enumerate_plans(dom)
    assert plans[0].commands == (Harvest(3),)


def test_low_level_domain_cross_product():
    import os
    p = os.path.join(os.path.dirname(_default_domain_path()),
                     "microrts-ahtn-low-level.lisp")
    dom = load_domain(p)
    plans = enumerate_plans(dom)
    # 4 worker-role methods x 3 army-role methods
    assert len(plans) == 12


def _legal(env, s, a, player):
    cand = env.decode(s, a, player, env._inflight_claims(s),
                      env._inflight_spent(s, player))[0]
    legal = np.asarray(env.engine.validate(s, cand))
    real = np.asarray(cand.atype) > 0
    return legal[real].all()


@pytest.mark.heavy
def test_ahtn_plays_legally(env8):
    env = env8
    bot = jax.jit(ahtn_bot(env, step_playout=10, max_plans=6),
                  static_argnums=1)
    opp = random_bot(env, 5.0)
    s = env.reset(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    produced_real = False
    for i in range(3):
        k, k0, k1 = jax.random.split(k, 3)
        a = bot(s, 0, k0)
        assert _legal(env, s, a, 0)
        produced_real |= bool(np.asarray(a[..., 0]).any())
        s, _, done = env.step(s, a, opp(s, 1, k1))
        if bool(done):
            break
    assert produced_real


@pytest.mark.slow
def test_ahtn_beats_random_biased(env8):
    from microrts_tpu.eval.tournament import play_matches

    env = env8
    bot = ahtn_bot(env, step_playout=60)
    rb = random_bot(env, 5.0)
    w = play_matches(env, bot, rb, n_games=6, max_cycles=800, seed=3)
    assert (w == 0).sum() > (w == 1).sum()
