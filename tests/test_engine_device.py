"""JAX device engine vs the trace-validated oracle.

Two layers of differential testing (test strategy per SURVEY.md §4):
  1. random-playout fuzzing — identical sampled-legal action streams driven
     through both engines, full plane diff every tick (exercises CANCEL_BOTH
     chains, cross-cycle cancels, produce/harvest/return/attack interleaving);
  2. golden-trace replay — the reference's recorded Java games replayed
     through the JAX engine with bit-exact snapshot checks
     (TestTracesIntegrity.java:29-127, strengthened to full-state diffs).
"""

import pathlib

import pytest
import zlib

from microrts_tpu.engine.utt import UnitTypeTable
from microrts_tpu.interop.bridge import replay_trace_device
from microrts_tpu.interop.fuzz import random_playout_diff
from microrts_tpu.interop.trace import load_trace

MAPS = pathlib.Path("/root/reference/maps")

FUZZ_CASES = [
    ("melee4x4light2.xml", 1), ("melee4x4light2.xml", 2),
    ("8x8/basesWorkers8x8.xml", 1), ("8x8/basesWorkers8x8.xml", 2),
    ("8x8/basesWorkersBarracks8x8.xml", 2),
    ("8x8/FourBasesWorkers8x8.xml", 2),
    ("8x8/melee8x8Mixed6.xml", 1),
    ("NoWhereToRun9x8.xml", 2),
    ("16x16/TwoBasesBarracks16x16.xml", 2),
]


@pytest.mark.parametrize("map_name,version", FUZZ_CASES,
                         ids=[f"{m}-v{v}" for m, v in FUZZ_CASES])
def test_fuzz_vs_oracle(map_name, version):
    n = random_playout_diff(str(MAPS / map_name), UnitTypeTable(version),
                            steps=300, seed=zlib.crc32(f'{map_name}:{version}'.encode()) % 1000)
    assert n > 0


def _trace_paths():
    root = pathlib.Path("/root/reference/data/traces")
    return sorted(root.rglob("*.zip")) if root.exists() else []


TRACES = _trace_paths()
FAST_SUBSET = [p for p in TRACES if any(
    k in str(p) for k in ("4x4", "8x8", "NoWhereToRun", "basesWorkers16x16/",
                          "melee14x12"))][:16]


@pytest.mark.parametrize("path", FAST_SUBSET,
                         ids=lambda p: "/".join(p.parts[-3:]))
def test_device_trace_parity_fast(path):
    trace = load_trace(str(path))
    n = replay_trace_device(trace)
    assert n == len(trace.entries)


@pytest.mark.slow
@pytest.mark.parametrize("path", TRACES, ids=lambda p: "/".join(p.parts[-3:]))
def test_device_trace_parity_all(path):
    trace = load_trace(str(path))
    n = replay_trace_device(trace)
    assert n == len(trace.entries)


def test_conflict_policies():
    """All three move-conflict policies (UnitTypeTable.java:46-57,
    GameState.java:270-297): BOTH cancels both; RANDOM cancels one by
    coin; ALTERNATING follows the cancelation counter and increments it."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from microrts_tpu.engine import kernel as K
    from microrts_tpu.engine.pgs import (HostPlayer, HostUnit,
                                         PhysicalGameState)
    from microrts_tpu.engine.types import (INF, Candidates, EngineConfig,
                                           state_from_pgs)

    def run(pol, seed):
        utt = UnitTypeTable(2, pol)
        pgs = PhysicalGameState(5, 5)
        pgs.players = [HostPlayer(0, 5), HostPlayer(1, 5)]
        wid = utt.get_unit_type("Worker").ID
        pgs.add_unit(HostUnit(0, 0, wid, 1, 2, 0, 1))
        pgs.add_unit(HostUnit(1, 1, wid, 3, 2, 0, 1))
        cfg = EngineConfig.from_utt(utt, 5, 5)
        eng = K.make_engine(cfg)
        s = state_from_pgs(pgs, cfg)
        at = np.full((5, 5), -1, np.int32)
        ap = np.zeros((5, 5), np.int32)
        rk = np.full((5, 5), INF, np.int32)
        at[2, 1], ap[2, 1], rk[2, 1] = 1, 1, 0   # left worker moves right
        at[2, 3], ap[2, 3], rk[2, 3] = 1, 3, 1   # right worker moves left
        z = jnp.zeros((5, 5), jnp.int32)
        cand = Candidates(jnp.asarray(at), jnp.asarray(ap), z, z, z,
                          jnp.asarray(rk))
        s2 = eng.issue(s.replace(key=jax.random.PRNGKey(seed)), cand)
        return (int(s2.atype[2, 1]), int(s2.atype[2, 3]),
                int(s2.cancel_ctr))

    assert run(1, 0) == (0, 0, 0)                     # CANCEL_BOTH
    rnd = {run(2, seed) for seed in range(8)}
    assert rnd <= {(0, 1, 0), (1, 0, 0)} and len(rnd) == 2  # RANDOM: both ways
    assert run(3, 0) == (1, 0, 1)                     # ALTERNATING: old wins,
    #                                                   counter incremented


@pytest.mark.heavy
def test_issue_env_fast_path():
    """issue_env (the conflict-machinery-free fast path for decode-vetted
    candidates) must equal the full issue on the env step, tick for tick,
    over a busy random self-play game — validating the no-conflict proof
    in its docstring on real decode outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from microrts_tpu.bots.scripted import random_bot
    from microrts_tpu.env.gridnet import GridnetEnv

    env = GridnetEnv(str(MAPS / "8x8" / "basesWorkersBarracks8x8.xml"))
    bot = random_bot(env, 5.0)
    eng = env.engine

    def step_with(issue_fn, state, a0, a1):
        c0, _, _ = env.decode(state, a0, 0, env._inflight_claims(state),
                              env._inflight_spent(state, 0))
        s1 = issue_fn(state, c0)
        c1, _, _ = env.decode(s1, a1, 1, env._inflight_claims(s1),
                              env._inflight_spent(s1, 1))
        s2 = issue_fn(s1, c1)
        return eng.cycle(s2)[0]

    fast = jax.jit(lambda s, a0, a1: step_with(eng.issue_env, s, a0, a1))
    full = jax.jit(lambda s, a0, a1: step_with(eng.issue, s, a0, a1))

    key = jax.random.PRNGKey(3)
    s_fast = env.reset(jax.random.PRNGKey(4))
    s_full = env.reset(jax.random.PRNGKey(4))
    fields = ("utype", "owner", "hp", "carried", "uid", "busy", "atype",
              "aparam", "atx", "aty", "aptype", "aticks", "aorder",
              "atime", "time", "resources", "next_id", "order_ctr")
    for t in range(200):
        key, k0, k1 = jax.random.split(key, 3)
        a0 = bot(s_fast, 0, k0)
        a1 = bot(s_fast, 1, k1)
        s_fast = fast(s_fast, a0, a1)
        s_full = full(s_full, a0, a1)
        for f in fields:
            assert (np.asarray(getattr(s_fast, f))
                    == np.asarray(getattr(s_full, f))).all(), (t, f)
