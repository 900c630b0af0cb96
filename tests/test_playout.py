"""Decision-point fast-forward playout semantics (ops/playout.py).

The fast-forward is the `getNextChangeTime` analog (GameState.java:
532-546): it must only skip ticks where NO unit of either player can
act, so against any fixed policy a fast playout and a dense per-tick
playout must visit the SAME decision points and produce the SAME final
state whenever the policy is deterministic at decision points and the
decision budget is not exhausted.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.engine.types import snapshot
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.ops.playout import (decision_point, decisions_for,
                                      fast_forward, make_playout,
                                      playout_step, run_playout)
from microrts_tpu.utils.assets import asset_path


@pytest.fixture(scope="module")
def env():
    return GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))


def dense_playout(env, act2, s, key, playout_len):
    """Reference: actor every tick (the pre-round-4 playout shape),
    with the same bot-path tick (playout_step) the fast path uses."""
    t_end = s.time + jnp.int32(playout_len)
    done = env.engine.gameover(s)

    def body(carry, k):
        s, done = carry
        live = (~done) & (s.time < t_end)
        a0, a1 = act2(s, k)
        s2, d2 = playout_step(env, s, a0, a1)
        s = jax.tree.map(lambda a, b: jnp.where(live, b, a), s, s2)
        done = jnp.where(live, done | d2, done)
        return (s, done), None

    (s, done), _ = jax.lax.scan(
        body, (s, done), jax.random.split(key, playout_len))
    return s, done


def scripted_act2(env):
    """Deterministic-per-state policy: WorkerRush vs LightRush with a
    state-derived key, so dense and fast playouts choose identically at
    every decision point regardless of how many keys each consumed."""
    from microrts_tpu.bots.scripted import light_rush, worker_rush
    wr, lr = worker_rush(env), light_rush(env)

    def act2(s, _k):
        k = jax.random.fold_in(jax.random.PRNGKey(7), s.time)
        k0, k1 = jax.random.split(k)
        return wr(s, 0, k0), lr(s, 1, k1)

    return act2


@pytest.mark.heavy
def test_fast_matches_dense_on_decision_points(env):
    """Same deterministic policy => identical final state: fast-forward
    may only skip ticks where nothing could have been issued anyway."""
    act2 = scripted_act2(env)
    s0 = env.reset(jax.random.PRNGKey(0))
    L = 60

    dense = jax.jit(lambda s, k: dense_playout(env, act2, s, k, L))
    fast = jax.jit(lambda s, k: run_playout(
        env, act2, s, k, L, n_decisions=L))  # ample decision budget

    k = jax.random.PRNGKey(3)
    sd, dd = dense(s0, k)
    sf, df = fast(s0, k)
    assert snapshot(sd) == snapshot(sf)
    assert int(sd.time) == int(sf.time) == L
    assert bool(dd) == bool(df)


@pytest.mark.heavy
def test_fast_forward_stops_at_decision_point(env):
    s0 = env.reset(jax.random.PRNGKey(0))
    # t=0 is a decision point on basesWorkers8x8 (idle workers+bases)
    assert bool(decision_point(s0))
    s1, d1 = jax.jit(lambda s: fast_forward(
        env, s, env.engine.gameover(s)))(s0)
    assert int(s1.time) == 0 and not bool(d1)

    # issue a full tick of scripted actions -> everyone busy -> the
    # coast must stop exactly at the next completion (a decision point)
    act2 = scripted_act2(env)
    a0, a1 = act2(s0, None)
    s2, _, _ = jax.jit(env.step)(s0, a0, a1)
    s3, _ = jax.jit(lambda s: fast_forward(
        env, s, env.engine.gameover(s)))(s2)
    assert bool(decision_point(s3))
    assert int(s3.time) > int(s2.time)  # skipped at least one dead tick
    # every skipped tick was genuinely dead: re-cycling densely from s2
    # must hit no decision point strictly before s3.time
    s = s2
    for _ in range(int(s3.time) - int(s2.time)):
        assert not bool(decision_point(s))
        s, _ = jax.jit(env.engine.cycle)(s)
    assert snapshot(s) == snapshot(s3)


@pytest.mark.heavy
def test_time_cap_and_decision_budget(env):
    act2 = scripted_act2(env)
    s0 = env.reset(jax.random.PRNGKey(0))
    # time cap respected
    sf, _ = jax.jit(lambda s, k: run_playout(
        env, act2, s, k, 40, n_decisions=40))(s0, jax.random.PRNGKey(1))
    assert int(sf.time) == 40
    # a tiny decision budget truncates early but never exceeds the cap
    sg, _ = jax.jit(lambda s, k: run_playout(
        env, act2, s, k, 40, n_decisions=2))(s0, jax.random.PRNGKey(1))
    assert int(sg.time) <= 40


@pytest.mark.heavy
def test_vmapped_playout(env):
    """Lanes freeze independently under vmap (batched while_loop)."""
    act2 = scripted_act2(env)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    s0 = jax.vmap(env.reset)(keys)
    run = jax.jit(jax.vmap(lambda s, k: run_playout(
        env, act2, s, k, 30, n_decisions=12)))
    sf, df = run(s0, jax.random.split(jax.random.PRNGKey(5), 3))
    assert np.all(np.asarray(sf.time) <= 30)


@pytest.mark.heavy
def test_make_playout_value_and_discount(env):
    from microrts_tpu.ops.evaluation import simple_sqrt_eval3
    ecfg = env.cfg.engine
    eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    s0 = env.reset(jax.random.PRNGKey(0))
    po = make_playout(env, 24, eval_fn, gamma=0.99, n_eval=2)
    v = jax.jit(lambda s, k: po(s, 0, s.time, k))(
        s0, jax.random.PRNGKey(2))
    assert np.isfinite(float(v)) and -1.0 <= float(v) <= 1.0
    # playout_len=0 evaluates directly (minimax leaf)
    po0 = make_playout(env, 0, eval_fn)
    v0 = jax.jit(lambda s, k: po0(s, 0, s.time, k))(
        s0, jax.random.PRNGKey(2))
    assert float(v0) == pytest.approx(
        float(eval_fn(s0, 0)), abs=1e-6)


def test_decisions_for():
    assert decisions_for(100) == 25
    assert decisions_for(4) == 2
