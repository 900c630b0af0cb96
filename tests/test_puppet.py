"""PuppetSearch: combo space, legality, plan-holding, expansion script.

Mirrors the reference semantics (ai/puppet/): the choice-point cross
product drives script dispatch, searches must emit legal actions and real
moves, and the PLAN mode holds its combo between searches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.bots.puppet import (puppet_ab_bot, puppet_combos,
                                      puppet_mcts_bot, puppet_plan_bot)
from microrts_tpu.bots.scripted import (RushSpec, passive_bot, random_bot,
                                        rush_bot)
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.utils.assets import asset_path


@pytest.fixture(scope="module")
def env8():
    return GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))


def test_combo_space_is_unit_types_x_expand(env8):
    names, scripts = puppet_combos(env8)
    # standard UTT fields Worker/Light/Heavy/Ranged -> 8 combos
    assert len(names) == 8 and len(scripts) == 8
    assert "Worker" in names and "Ranged+exp" in names


def _legal(env, s, a, player):
    cand = env.decode(s, a, player, env._inflight_claims(s),
                      env._inflight_spent(s, player))[0]
    legal = np.asarray(env.engine.validate(s, cand))
    real = np.asarray(cand.atype) > 0
    return legal[real].all()


@pytest.mark.heavy
def test_puppet_ab_plays_legally(env8):
    env = env8
    bot = jax.jit(puppet_ab_bot(env, step_playout=12), static_argnums=1)
    opp = random_bot(env, 5.0)
    s = env.reset(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    produced_real = False
    for i in range(4):
        k, k0, k1 = jax.random.split(k, 3)
        a = bot(s, 0, k0)
        assert _legal(env, s, a, 0)
        produced_real |= bool(np.asarray(a[..., 0]).any())
        s, _, done = env.step(s, a, opp(s, 1, k1))
        if bool(done):
            break
    assert produced_real


@pytest.mark.heavy
def test_puppet_mcts_plays_legally(env8):
    env = env8
    bot = jax.jit(puppet_mcts_bot(env, n_playouts=6, max_nodes=12,
                                  max_depth=2, step_playout=8),
                  static_argnums=1)
    opp = random_bot(env, 5.0)
    s = env.reset(jax.random.PRNGKey(2))
    k = jax.random.PRNGKey(3)
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


@pytest.mark.heavy
def test_puppet_plan_holds_combo_between_searches(env8):
    """PLAN mode (PuppetSearchAB.java:191-230): between searches the
    stored combo replays and last_plan only moves when a search runs."""
    env = env8
    sbot = puppet_plan_bot(env, plan_period=50, step_playout=8)
    s = env.reset(jax.random.PRNGKey(4))
    mem = sbot.init(s, 0)
    step = jax.jit(sbot.step, static_argnums=2)
    a1, mem1 = step(s, mem, 0, jax.random.PRNGKey(5))
    assert int(mem1["last_plan"]) == int(s.time)   # searched at t=0
    # advance a few ticks: no re-search before plan_period
    opp = passive_bot(env)
    k = jax.random.PRNGKey(6)
    for i in range(3):
        k, k0, k1 = jax.random.split(k, 3)
        a, mem2 = step(s, mem1, 0, k0)
        assert int(mem2["last_plan"]) == int(mem1["last_plan"])
        assert int(mem2["combo"]) == int(mem1["combo"])
        s, _, _ = env.step(s, a, opp(s, 1, k1))
        mem1 = mem2


def test_expand_script_builds_second_base(env8):
    """RushSpec(expand=True) (BasicConfigurableScript.java:279-307): with
    a barracks standing, one base, spare resources and a far free
    resource, a worker walks out and plants a second base."""
    env = env8
    bot = jax.jit(rush_bot(env, RushSpec("Light", n_harvesters=-1,
                                         expand=True)),
                  static_argnums=1)
    s = env.reset(jax.random.PRNGKey(7))
    # fabricate the preconditions: a barracks + a fat resource bank
    yx = np.argwhere((np.asarray(s.utype) == 0)
                     & (np.asarray(s.terrain) == 0))
    by, bx = yx[0]
    barracks_t = env.cfg.barracks_id + 1
    s = s.replace(
        utype=s.utype.at[by, bx].set(barracks_t),
        owner=s.owner.at[by, bx].set(0),
        hp=s.hp.at[by, bx].set(4),
        uid=s.uid.at[by, bx].set(999),
        resources=s.resources.at[0].set(30))
    opp = passive_bot(env)
    step = jax.jit(lambda s, k: env.step(s, bot(s, 0, k), opp(s, 1, k)))
    k = jax.random.PRNGKey(8)
    from microrts_tpu.engine.types import PRODUCE
    started = False
    for i in range(300):   # walk across the map (10 ticks/step) + start
        k, sub = jax.random.split(k)
        s, _, done = step(s, sub)
        # a worker producing a Base away from home = the expansion began
        # (Base produce_time is 250 ticks, so completion is out of scope)
        producing = ((np.asarray(s.owner) == 0) & np.asarray(s.busy)
                     & (np.asarray(s.atype) == PRODUCE)
                     & (np.asarray(s.aptype) == env.cfg.base_id))
        if producing.any():
            started = True
            break
        if bool(done):
            break
    assert started, "expansion base build never started"


@pytest.mark.slow
def test_puppet_beats_random_biased(env8):
    from microrts_tpu.eval.tournament import play_matches

    env = env8
    pb = puppet_ab_bot(env, step_playout=60)
    rb = random_bot(env, 5.0)
    w = play_matches(env, pb, rb, n_games=6, max_cycles=800, seed=9)
    assert (w == 0).sum() > (w == 1).sum()
