"""Full 280-golden-trace parity sweep -> committed artifact TRACE_SWEEP.md.

VERDICT r1 "What's weak" #9: the 280/280 bit-parity claim was gated behind
``pytest -m slow`` with no recorded evidence in-repo.  This script replays
every reference trace zip through the DEVICE engine (same harness as
tests/test_oracle_traces.py::test_trace_parity_all) and writes a one-page
result table: per-map-family counts, total, wall time, device, failures by
name if any.  Run: ``python scripts/trace_sweep.py [--cpu]``.

Reference analog: test/microrts/TestTracesIntegrity.java:29-127 over
``data/traces/**/*.zip``.
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("-o", "--out", default="TRACE_SWEEP.md")
    args = ap.parse_args()
    if args.cpu:
        from microrts_tpu.utils.platform import force_cpu
        force_cpu()

    import pathlib

    import jax

    from microrts_tpu.interop.bridge import replay_trace_device
    from microrts_tpu.interop.trace import load_trace

    def _replay_device(p):
        trace = load_trace(str(p))
        n = replay_trace_device(trace)
        assert n == len(trace.entries), f"{p}: {n}/{len(trace.entries)}"

    paths = sorted(
        pathlib.Path("/root/reference/data/traces").rglob("*.zip"))
    fams = collections.Counter()
    ok_fams = collections.Counter()
    failures = []
    t0 = time.time()
    for i, p in enumerate(paths):
        fam = os.path.basename(os.path.dirname(p)) or "root"
        fams[fam] += 1
        try:
            _replay_device(p)
            ok_fams[fam] += 1
        except Exception:
            failures.append((p, traceback.format_exc(limit=3)))
        if (i + 1) % 20 == 0:
            print(f"{i+1}/{len(paths)} ok={sum(ok_fams.values())} "
                  f"fail={len(failures)} {time.time()-t0:.0f}s", flush=True)

    total_ok = sum(ok_fams.values())
    lines = [
        "# Golden-trace parity sweep (full 280)",
        "",
        f"Replayed every `data/traces/**/*.zip` through the DEVICE engine "
        f"with full-state bit-parity checks per snapshot "
        f"(interop.bridge.replay_trace_device — the "
        f"tests/test_engine_device.py::test_device_trace_parity_all "
        f"harness).",
        "",
        f"- Device: {jax.devices()[0].device_kind}",
        f"- Result: **{total_ok}/{len(paths)} bit-exact**, "
        f"{len(failures)} failures",
        f"- Wall time: {time.time()-t0:.0f}s",
        "",
        "| map family | traces | bit-exact |",
        "|---|---|---|",
    ]
    for fam in sorted(fams):
        lines.append(f"| {fam} | {fams[fam]} | {ok_fams[fam]} |")
    if failures:
        lines.append("\n## Failures\n")
        for p, tb in failures:
            lines.append(f"### {p}\n```\n{tb}\n```")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}: {total_ok}/{len(paths)}")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
