"""Wall-clock computation budgets (AIWithComputationBudget analog)."""

import jax
import numpy as np
import pytest

from microrts_tpu.bots.search import monte_carlo_bot
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.utils.budget import (TimeBudgetedBot, calibrate_budget,
                                       measure_move_ms)

MAPS = "/root/reference/maps"


@pytest.fixture(scope="module")
def env():
    return GridnetEnv(f"{MAPS}/melee4x4light2.xml")


@pytest.mark.heavy
def test_calibrate_monotone_and_fits(env):
    factory = lambda n: monte_carlo_bot(env, n_candidates=n, playout_len=8)
    ms_small = measure_move_ms(env, factory(2))
    # a generous budget admits at least the smallest rung
    n = calibrate_budget(env, factory, time_budget_ms=ms_small * 50,
                         candidates=(2, 4, 8))
    assert n in (2, 4, 8)
    # a budget below the smallest rung still returns the floor
    n_floor = calibrate_budget(env, factory, time_budget_ms=1e-6,
                               candidates=(2, 4))
    assert n_floor == 2


@pytest.mark.heavy
def test_time_budgeted_bot_plays_legally(env):
    factory = lambda n: monte_carlo_bot(env, n_candidates=n, playout_len=8)
    bot = TimeBudgetedBot(env, factory, time_budget_ms=10_000.0,
                          iterations_budget=4, candidates=(2, 4))
    s = env.reset(jax.random.PRNGKey(0))
    a = bot(s, 0, jax.random.PRNGKey(1))
    assert bot.fitted_budget in (2, 4)
    # all real decoded actions pass engine validation
    cand = env.decode(s, a, 0, env._inflight_claims(s),
                      env._inflight_spent(s, 0))[0]
    legal = np.asarray(env.engine.validate(s, cand))
    real = np.asarray(cand.atype) > 0
    assert real.any() and legal[real].all()
