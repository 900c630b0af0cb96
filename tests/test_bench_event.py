"""Event-driven bench runner: tick accounting + auto-reset sanity.

The `rush-event` bench mode (bench.py `_make_run_event`) plays the
decision-frame bot path (NONE(10), closed-form jump between action
completions — ops/playout.py).  The jump itself is proven bit-exact by
tests/test_playout.py; here we check the RUNNER: counted ticks equal
the real game time advanced, lanes auto-reset at game end, and states
stay invariant-clean.
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.env.vec import VecGridnetEnv, env_health
from microrts_tpu.utils.assets import asset_path


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", asset_path("bench.py")
        if False else "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_event_runner_ticks_and_reset(bench):
    env = GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))
    N = 8
    vec = VecGridnetEnv(env, N, max_steps=3000)
    states, steps = vec.reset(jax.random.PRNGKey(0))
    actor = bench._actor_rush(env, N)
    run = bench._make_run_event(env, vec, N, 48, actor)
    key = jax.random.PRNGKey(1)
    states, steps, key, ticks = run(states, steps, key)
    ticks = int(ticks)
    # each of the 48 decision frames advances >= 1 tick per lane
    assert ticks >= 48 * N
    # decision sparsity: the bot path must average well over 1 tick/frame
    assert ticks > 2 * 48 * N, f"no fast-forward effect: {ticks}"
    # episodes start at time 0, so the per-lane steps counter must equal
    # the lane's game clock at every point (resets rewind both)
    np.testing.assert_array_equal(np.asarray(steps),
                                  np.asarray(states.time))
    # rush-vs-rush on 8x8 ends by ~tick 250 and 48 frames cover ~300+
    # ticks: every lane must have auto-reset at least once
    assert int(np.asarray(states.time).max()) < 3000
    # states remain invariant-clean after a long event-driven run
    bad = np.asarray(env_health(
        states, jnp.zeros((N, 1)), env.cfg.engine))
    assert not bad.any()
