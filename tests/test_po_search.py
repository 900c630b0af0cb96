"""PO-aware search: believe-state wrappers (BS1/2/3) and LSI.

Mirrors the reference's believe-state semantics
(ai/mcts/believestatemcts/BS3_NaiveMCTS.java): initial hidden units are
remembered, wrong guesses relocate into the fog, and the sampled world
feeds a full-observability searcher.  LSI gets the same compliance tests
as the other search bots (legal actions, real moves).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.bots.believestate import (BelieveMem, believe_state_bot,
                                            play_matches_stateful,
                                            stateless)
from microrts_tpu.bots.lsi import lsi_bot
from microrts_tpu.bots.scripted import po_wrap, random_bot, worker_rush
from microrts_tpu.bots.search import monte_carlo_bot
from microrts_tpu.engine.fog import po_state, visibility
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.utils.assets import asset_path


@pytest.fixture(scope="module")
def env8():
    return GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))


def test_believe_init_remembers_hidden_units(env8):
    """setInitialBelieveState (BS3:144-159): opponent units unobservable
    at the initial state are remembered at their true cells."""
    env = env8
    sbot = believe_state_bot(env, worker_rush(env), level=3)
    s = env.reset(jax.random.PRNGKey(0))
    mem = sbot.init(s, 0)
    vis = np.asarray(visibility(s, 0, env.cfg.engine))
    enemy = (np.asarray(s.utype) > 0) & (np.asarray(s.owner) == 1)
    hidden = enemy & ~vis
    assert hidden.any(), "map must start with hidden enemies for this test"
    np.testing.assert_array_equal(
        np.asarray(mem.b_utype) > 0, hidden)
    # the sampled world then contains those units even though the po view
    # does not
    view = po_state(s, 0, env.cfg.engine)
    assert not ((np.asarray(view.utype) > 0)
                & (np.asarray(view.owner) == 1)).any()


def test_believe_relocates_wrong_guess_into_fog(env8):
    """A believed unit whose cell becomes observable relocates to a nearby
    unobservable free cell (getClosestNotObservableLocationNear:374-414)."""
    env = env8
    sbot = believe_state_bot(env, worker_rush(env), level=3)
    s = env.reset(jax.random.PRNGKey(0))
    mem = sbot.init(s, 0)
    vis = np.asarray(visibility(s, 0, env.cfg.engine))
    # plant a bogus believed enemy worker INSIDE our visible zone
    yx = np.argwhere(vis & (np.asarray(s.utype) == 0))
    y, x = yx[0]
    mem = mem._replace(
        b_utype=mem.b_utype.at[y, x].set(2),
        b_hp=mem.b_hp.at[y, x].set(1),
        b_uid=mem.b_uid.at[y, x].set(777))
    _, mem2 = jax.jit(sbot.step, static_argnums=2)(
        s, mem, 0, jax.random.PRNGKey(1))
    b = np.asarray(mem2.b_utype)
    assert b[y, x] == 0, "believed unit must leave the observed cell"
    uid = np.asarray(mem2.b_uid)
    where = np.argwhere(uid == 777)
    assert len(where) == 1, "unit relocated exactly once"
    ny, nx = where[0]
    assert not vis[ny, nx], "relocated into unobservable territory"


def test_believe_forgets_reappeared_uid(env8):
    """A believed unit is dropped when the real unit (same ID) is seen
    again (BS3:289-306)."""
    env = env8
    sbot = believe_state_bot(env, worker_rush(env), level=3)
    s = env.reset(jax.random.PRNGKey(0))
    mem = sbot.init(s, 0)
    vis = np.asarray(visibility(s, 0, env.cfg.engine))
    # take a VISIBLE enemy... there is none at reset; fabricate one: plant
    # a believed copy of an enemy unit, then make that unit visible by
    # injecting it inside our sight (simulates the enemy walking out of
    # the fog)
    enemy_cells = np.argwhere((np.asarray(s.utype) > 0)
                              & (np.asarray(s.owner) == 1))
    ey, ex = enemy_cells[0]
    real_uid = int(np.asarray(s.uid)[ey, ex])
    # believed ghost of that unit somewhere in the fog
    fog = np.argwhere(~vis & (np.asarray(s.utype) == 0))
    gy, gx = fog[0]
    mem = mem._replace(
        b_utype=mem.b_utype.at[gy, gx].set(2),
        b_hp=mem.b_hp.at[gy, gx].set(1),
        b_uid=mem.b_uid.at[gy, gx].set(real_uid))
    # teleport the real unit into our visible zone
    free_vis = np.argwhere(vis & (np.asarray(s.utype) == 0)
                           & (np.asarray(s.terrain) == 0))
    vy, vx = free_vis[0]
    s2 = s.replace(
        utype=s.utype.at[ey, ex].set(0).at[vy, vx].set(2),
        owner=s.owner.at[ey, ex].set(-1).at[vy, vx].set(1),
        hp=s.hp.at[ey, ex].set(0).at[vy, vx].set(1),
        uid=s.uid.at[ey, ex].set(0).at[vy, vx].set(real_uid))
    _, mem2 = jax.jit(sbot.step, static_argnums=2)(
        s2, mem, 0, jax.random.PRNGKey(1))
    assert not (np.asarray(mem2.b_uid) == real_uid).any(), \
        "believed ghost must vanish once the real unit is seen"


@pytest.mark.heavy
@pytest.mark.parametrize("level", [1, 2, 3])
def test_believe_bot_plays_and_advances(env8, level):
    """Each BS level wraps a searcher and plays full-game ticks; actions
    planned in the sampled world go through issueSafe-style decode, so
    the game must advance and real actions appear."""
    env = env8
    inner = monte_carlo_bot(env, n_candidates=4, playout_len=8)
    sbot = believe_state_bot(env, inner, level=level)
    s = env.reset(jax.random.PRNGKey(3))
    mem = sbot.init(s, 0)
    opp = random_bot(env, 5.0)
    step = jax.jit(lambda s, m, k: (
        lambda a, m2: (env.step(s, a, opp(s, 1, jax.random.fold_in(k, 9))),
                       m2))(*sbot.step(s, m, 0, k)))
    produced_real = False
    k = jax.random.PRNGKey(4)
    for i in range(4):
        k, sub = jax.random.split(k)
        (s, _, done), mem = step(s, mem, sub)
        produced_real |= bool(np.asarray(s.busy).any())
        if bool(done):
            break
    assert produced_real


def _legal(env, s, a, player):
    cand = env.decode(s, a, player, env._inflight_claims(s),
                      env._inflight_spent(s, player))[0]
    legal = np.asarray(env.engine.validate(s, cand))
    real = np.asarray(cand.atype) > 0
    return legal[real].all()


@pytest.mark.heavy
def test_lsi_plays_legally(env8):
    env = env8
    bot = jax.jit(lsi_bot(env, n_probes=8, n_candidates=4,
                          eval_per_round=1, playout_len=8),
                  static_argnums=1)
    opp = random_bot(env, 5.0)
    s = env.reset(jax.random.PRNGKey(5))
    k = jax.random.PRNGKey(6)
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


@pytest.mark.slow
def test_bs_searcher_beats_po_wrapped_mc(env8):
    """VERDICT r1 item 8: in a PO tournament the believe-state searcher
    beats the po-wrapped flat MC (which plans only in its blind view)."""
    env = env8
    inner = monte_carlo_bot(env, n_candidates=8, playout_len=24)
    bs = believe_state_bot(env, inner, level=3)
    po_mc = stateless(po_wrap(env, monte_carlo_bot(env, n_candidates=8,
                                                   playout_len=24)))
    w = play_matches_stateful(env, bs, po_mc, n_games=6,
                              max_cycles=700, seed=7)
    assert (w == 0).sum() > (w == 1).sum()
