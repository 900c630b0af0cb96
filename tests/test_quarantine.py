"""Per-env failure quarantine (SURVEY §5 failure-detection analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.env.vec import VecGridnetEnv, env_health
from microrts_tpu.utils.assets import asset_path


@pytest.fixture(scope="module")
def env8():
    return GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))


def test_healthy_env_not_flagged(env8):
    s = env8.reset(jax.random.PRNGKey(0))
    ok = env_health(s, jnp.zeros(8), env8.cfg.engine)
    assert not bool(ok)


def test_corruptions_are_detected(env8):
    cfg = env8.cfg.engine
    s = env8.reset(jax.random.PRNGKey(0))
    yx = np.argwhere(np.asarray(s.utype) > 0)[0]
    bad_hp = s.replace(hp=s.hp.at[yx[0], yx[1]].set(-3))
    assert bool(env_health(bad_hp, jnp.zeros(8), cfg))
    bad_type = s.replace(utype=s.utype.at[0, 0].set(cfg.num_types + 5))
    assert bool(env_health(bad_type, jnp.zeros(8), cfg))
    bad_res = s.replace(resources=s.resources.at[0].set(-1))
    assert bool(env_health(bad_res, jnp.zeros(8), cfg))
    nan_rew = env_health(s, jnp.asarray([jnp.nan] * 8), cfg)
    assert bool(nan_rew)


def test_vec_quarantine_resets_failed_lane(env8):
    """A lane whose state corrupts mid-flight must be auto-reset on the
    next step and its rewards sanitized, while healthy lanes continue."""
    vec = VecGridnetEnv(env8, num_envs=4, quarantine=True)
    states, steps = vec.reset(jax.random.PRNGKey(1))
    # corrupt lane 2: negative hp on an occupied cell
    yx = np.argwhere(np.asarray(states.utype[2]) > 0)[0]
    states = states.replace(
        hp=states.hp.at[2, yx[0], yx[1]].set(-7))
    zero = jnp.zeros((4, env8.h, env8.w, 7), jnp.int32)
    states2, steps2, obs, rew, dones, reset_mask = jax.jit(vec.step)(
        states, steps, zero, zero)
    rm = np.asarray(reset_mask)
    assert rm[2], "corrupted lane must quarantine"
    assert not rm[[0, 1, 3]].any(), "healthy lanes keep running"
    assert np.isfinite(np.asarray(rew)).all()
    # the quarantined lane restarted: step counter back to zero
    assert int(steps2[2]) == 0 and int(steps2[0]) == 1
    # and its state is a fresh reset (hp invariant holds again)
    from microrts_tpu.env.vec import env_health
    fresh_bad = env_health(
        jax.tree.map(lambda x: x[2], states2), jnp.zeros(8),
        env8.cfg.engine)
    assert not bool(fresh_bad)
