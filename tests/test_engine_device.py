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
                            steps=300, seed=hash((map_name, version)) % 1000)
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
