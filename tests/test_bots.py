"""On-device scripted bots: competence and pathfinding sanity.

Mirrors the reference's bot-pool smoke strategy (tests/CompareAllAIs*, ai
compliance): a rush bot must beat Passive, and the BFS distance fields must
route around walls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.bots.scripted import (light_rush, passive_bot, random_bot,
                                        worker_rush)
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.ops.fields import descend_direction, distance_field

MAPS = "/root/reference/maps"


def _play(env, b0, b1, max_ticks, seed=0):
    s = env.reset(jax.random.PRNGKey(seed))
    step = jax.jit(lambda s, k: env.step(
        s, b0(s, 0, k), b1(s, 1, jax.random.fold_in(k, 1))))
    k = jax.random.PRNGKey(seed + 100)
    for i in range(max_ticks):
        k, sub = jax.random.split(k)
        s, _, done = step(s, sub)
        if bool(done):
            break
    return int(env.engine.winner(s)), i + 1


@pytest.fixture(scope="module")
def env8():
    return GridnetEnv(f"{MAPS}/8x8/basesWorkers8x8.xml")


def test_worker_rush_beats_passive(env8):
    winner, ticks = _play(env8, worker_rush(env8), passive_bot(env8), 1000)
    assert winner == 0 and ticks < 1000


def test_light_rush_builds_and_wins(env8):
    winner, ticks = _play(env8, light_rush(env8), passive_bot(env8), 1500)
    assert winner == 0


def test_passive_mirror_draws(env8):
    winner, ticks = _play(env8, passive_bot(env8), passive_bot(env8), 50)
    assert winner == -1 and ticks == 50


def test_random_bot_legal(env8):
    """Random bot actions must be accepted verbatim (all legal): replaying
    them through decode+issue should never produce an issueSafe NONE(eta)
    replacement for a real action type."""
    bot = random_bot(env8, 5.0)
    s = env8.reset(jax.random.PRNGKey(3))
    k = jax.random.PRNGKey(4)
    for i in range(30):
        k, s1, s2 = jax.random.split(k, 3)
        a = bot(s, 0, s1)
        cand = env8.decode(s, a, 0, env8._inflight_claims(s),
                           env8._inflight_spent(s, 0))[0]
        legal = env8.engine.validate(s, cand)
        real = np.asarray(cand.atype) > 0
        assert np.asarray(legal)[real].all()
        s, _, done = env8.step(s, a, bot(s, 1, s2))
        if bool(done):
            break


def test_distance_field_routes_around_walls():
    # corridor: wall row with a single gap
    H = W = 8
    passable = np.ones((H, W), bool)
    passable[4, :] = False
    passable[4, 6] = True
    sources = np.zeros((H, W), bool)
    sources[7, 0] = True
    d = distance_field(jnp.asarray(sources), jnp.asarray(passable), 2 * (H + W))
    d = np.asarray(d)
    # reference BFS in plain python
    from collections import deque
    ref = np.full((H, W), 10 ** 9)
    ref[7, 0] = 0
    q = deque([(7, 0)])
    while q:
        y, x = q.popleft()
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            ny, nx = y + dy, x + dx
            if (0 <= ny < H and 0 <= nx < W and passable[ny, nx]
                    and ref[ny, nx] > ref[y, x] + 1):
                ref[ny, nx] = ref[y, x] + 1
                q.append((ny, nx))
    reachable = ref < 10 ** 9
    assert (d[reachable] == ref[reachable]).all()
    assert (d[~reachable & passable] >= 10 ** 9).all()
    dd = descend_direction(jnp.asarray(d), jnp.ones((H, W, 4), bool))
    assert int(dd[0, 0]) >= 0
