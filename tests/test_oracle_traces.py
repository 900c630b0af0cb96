"""Golden-trace parity for the oracle interpreter.

Replays the reference's recorded Java games (data/traces/**/*.zip) through
``microrts_tpu.refimpl`` and asserts bit-parity of every snapshot.  This
validates our reading of the Java rules before the JAX engine is tested
against the same fixtures (test strategy per TestTracesIntegrity.java:29-127).
"""

import pathlib

import pytest

from microrts_tpu.interop.replay import replay_trace_oracle
from microrts_tpu.interop.trace import load_trace


pytestmark = pytest.mark.smoke


def all_trace_paths():
    root = pathlib.Path("/root/reference/data/traces")
    if not root.exists():
        return []
    return sorted(root.rglob("*.zip"))


TRACES = all_trace_paths()
# a fast representative subset for the default test run; the full 280-trace
# sweep runs under -m slow
FAST_SUBSET = [p for p in TRACES if any(
    k in str(p) for k in ("4x4", "8x8", "NoWhereToRun", "basesWorkers16x16/",
                          "melee14x12"))][:24]


@pytest.mark.parametrize("path", FAST_SUBSET, ids=lambda p: "/".join(p.parts[-3:]))
def test_trace_parity_fast(path):
    trace = load_trace(str(path))
    n = replay_trace_oracle(trace)
    assert n == len(trace.entries)


@pytest.mark.slow
@pytest.mark.parametrize("path", TRACES, ids=lambda p: "/".join(p.parts[-3:]))
def test_trace_parity_all(path):
    trace = load_trace(str(path))
    n = replay_trace_oracle(trace)
    assert n == len(trace.entries)
