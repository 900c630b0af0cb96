"""Expert 13-macro interface, evaluation functions, playout search bots."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.bots.scripted import passive_bot, random_bot
from microrts_tpu.bots.search import monte_carlo_bot, naive_sampling_bot
from microrts_tpu.env.expert import NUM_MACROS, ExpertEnv, ExpertRoles
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.ops.evaluation import (lanchester_eval, simple_eval,
                                         simple_sqrt_eval2, simple_sqrt_eval3)

MAPS = "/root/reference/maps"


@pytest.fixture(scope="module")
def env():
    return GridnetEnv(f"{MAPS}/8x8/basesWorkers8x8.xml")


@pytest.mark.heavy
def test_expert_mask_and_macros(env):
    ex = ExpertEnv(env)
    s = env.reset(jax.random.PRNGKey(0))
    roles = ExpertRoles.init()
    m = np.asarray(ex.action_mask(s, roles, 0)).astype(int)
    # noop, alloc, pull, 4 quads, train-worker (base+5res), build-barracks
    assert m.tolist() == [1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 1]
    pa = passive_bot(env)
    step = jax.jit(lambda s, r, mac, k: ex.step_vs(s, r, mac, pa, k))
    k = jax.random.PRNGKey(1)
    # allocate harvester, then train workers; economy must grow
    seq = [1] + [7] * 3 + [0] * 140
    for i, mac in enumerate(seq):
        k, sub = jax.random.split(k)
        s, roles, r, done = step(s, roles, jnp.int32(mac), sub)
    assert int(roles.harvester.sum()) == 1
    n_workers = int(((np.asarray(s.utype) - 1 == env.cfg.worker_id)
                     & (np.asarray(s.owner) == 0)).sum())
    assert n_workers >= 2  # trained at least one extra worker
    assert int(s.resources[0]) > 0  # harvester gathered


def test_expert_beats_passive(env):
    ex = ExpertEnv(env)
    pa = passive_bot(env)
    s = env.reset(jax.random.PRNGKey(2))
    roles = ExpertRoles.init()
    step = jax.jit(lambda s, r, mac, k: ex.step_vs(s, r, mac, pa, k))
    k = jax.random.PRNGKey(3)
    seq = [1] + [7] * 2 + [6] + [0] * 1000
    done = False
    for mac in seq:
        k, sub = jax.random.split(k)
        s, roles, r, done = step(s, roles, jnp.int32(mac), sub)
        if bool(done):
            break
    assert bool(done) and int(env.engine.winner(s)) == 0


def test_eval_functions_symmetry_and_signs(env):
    cfg = env.cfg.engine
    s = env.reset(jax.random.PRNGKey(0))
    # symmetric start: all evals are (near) zero / 0-centered
    assert float(simple_eval(s, 0, cfg)) == 0.0
    assert abs(float(simple_sqrt_eval3(s, 0, cfg))) < 1e-6
    # kill player 1's units: evals must favor player 0
    wipe = (np.asarray(s.owner) == 1)
    s2 = s.replace(utype=jnp.where(jnp.asarray(wipe), 0, s.utype),
                   owner=jnp.where(jnp.asarray(wipe), -1, s.owner),
                   resources=s.resources.at[1].set(0))
    assert float(simple_eval(s2, 0, cfg)) > 0
    # p1 wiped incl. stockpile -> the Java VICTORY branch fires
    assert float(simple_sqrt_eval2(s2, 0, cfg)) == 10000.0
    assert float(simple_sqrt_eval3(s2, 0, cfg)) == 1.0
    ids = {n: getattr(env.cfg, f"{n.lower()}_id")
           for n in ("Base", "Barracks", "Worker", "Light", "Heavy",
                     "Ranged")}
    assert float(lanchester_eval(s2, 0, cfg, ids)) > 0
    # SimpleOpt: symmetric start is 0; wipe favors p0; upperBound counts
    # free map resources + the richer player's (carried + cost + bank)
    from microrts_tpu.ops.evaluation import (OPT_UNIT_BONUS_MULTIPLIER,
                                             simple_opt_eval,
                                             simple_opt_upper_bound)
    assert float(simple_opt_eval(s, 0, cfg)) == 0.0
    assert float(simple_opt_eval(s2, 0, cfg)) > 0
    free = float(np.where((np.asarray(s.owner) == -1)
                          & (np.asarray(s.utype) > 0),
                          np.asarray(s.carried), 0).sum())
    ub = float(simple_opt_upper_bound(s, cfg))
    assert ub > free * OPT_UNIT_BONUS_MULTIPLIER  # players add material


@pytest.mark.heavy
def test_search_bot_actions_legal():
    env4 = GridnetEnv(f"{MAPS}/melee4x4light2.xml")
    mc = monte_carlo_bot(env4, n_candidates=4, playout_len=8)
    ns = naive_sampling_bot(env4, n_rounds=4, playout_len=8)
    s = env4.reset(jax.random.PRNGKey(0))
    for bot in (mc, ns):
        a = bot(s, 0, jax.random.PRNGKey(1))
        assert a.shape == (4, 4, 7)
        c, _, _ = env4.decode(s, a, 0, env4._inflight_claims(s),
                              env4._inflight_spent(s, 0))
        legal = env4.engine.validate(s, c)
        real = np.asarray(c.atype) > 0
        assert np.asarray(legal)[real].all()


@pytest.mark.heavy
def test_expert_detailed_mode(env):
    """Detailed mode (unit-type x tile policy) steers units and wins."""
    from microrts_tpu.env.expert import ExpertEnv, detailed_to_gridnet

    ex = ExpertEnv(env)
    pa = passive_bot(env)
    s = env.reset(jax.random.PRNGKey(5))
    T = env.cfg.engine.num_types
    tile_logits = jnp.zeros((8, 8)).at[6:, 5:].set(4.0)
    type_logits = jnp.zeros(T).at[env.cfg.worker_id].set(3.0)
    step = jax.jit(lambda s, k: env.step(
        s, detailed_to_gridnet(ex, s, 0, type_logits, tile_logits, k),
        pa(s, 1, k)))
    k = jax.random.PRNGKey(6)
    done = False
    for _ in range(1500):
        k, sub = jax.random.split(k)
        s, _, done = step(s, sub)
        if bool(done):
            break
    assert bool(done) and int(env.engine.winner(s)) == 0
