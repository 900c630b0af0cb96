"""Pallas-fused step kernels: bit-equivalence with the unfused engine.

Runs the fused cycle/issue kernels in Pallas interpreter mode on CPU and
asserts exact state equality against the plain vmapped engine on busy
mid-game states.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu import refimpl
from microrts_tpu.engine.pgs import PhysicalGameState
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.env.vec import VecGridnetEnv
from microrts_tpu.interop.fuzz_gridnet import sample_gridnet_actions
from microrts_tpu.ops.fused import fused_cycle, fused_issue

MAPS = "/root/reference/maps"
FIELDS = ("utype", "owner", "hp", "carried", "uid", "busy", "atype",
          "aparam", "atx", "aty", "aptype", "aticks", "aorder", "atime",
          "time", "resources", "next_id")


def _busy_states(env, B, n_steps=30, seed=0):
    rng = random.Random(seed)
    utt = env.utt
    R = env.cfg.engine.max_range
    gs = refimpl.GameState(
        PhysicalGameState.load(f"{MAPS}/8x8/basesWorkers8x8.xml", utt)
        .clone(), utt)
    vec = VecGridnetEnv(env, B, 5000)
    states, steps = vec.reset(jax.random.PRNGKey(seed))
    step = jax.jit(vec.step)
    for _ in range(n_steps):
        a0 = np.stack([sample_gridnet_actions(gs, utt, 0, rng, R)
                       for _ in range(B)])
        a1 = np.stack([sample_gridnet_actions(gs, utt, 1, rng, R)
                       for _ in range(B)])
        states, steps, *_ = step(states, steps,
                                 jnp.asarray(a0, jnp.int32),
                                 jnp.asarray(a1, jnp.int32))
        gs.cycle()
    return states, gs, rng


def test_fused_cycle_and_issue_bitexact():
    env = GridnetEnv(f"{MAPS}/8x8/basesWorkers8x8.xml")
    B = 8
    states, gs, rng = _busy_states(env, B)

    ref_s, ref_d = jax.vmap(env.engine.cycle)(states)
    fus_s, fus_d = fused_cycle(env.engine, block=4, interpret=True)(states)
    for f in FIELDS:
        assert (np.asarray(getattr(ref_s, f))
                == np.asarray(getattr(fus_s, f))).all(), f
    assert (np.asarray(ref_d) == np.asarray(fus_d)).all()

    R = env.cfg.engine.max_range
    a0 = jnp.asarray(np.stack([
        sample_gridnet_actions(gs, env.utt, 0, rng, R) for _ in range(B)]),
        jnp.int32)
    cands = jax.vmap(lambda s, a: env.decode(
        s, a, 0, env._inflight_claims(s), env._inflight_spent(s, 0))[0])(
            states, a0)
    ref_i = jax.vmap(env.engine.issue)(states, cands)
    fus_i = fused_issue(env.engine, block=4, interpret=True)(states, cands)
    for f in FIELDS:
        assert (np.asarray(getattr(ref_i, f))
                == np.asarray(getattr(fus_i, f))).all(), f
