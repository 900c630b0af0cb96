"""Per-fusion on-device profile of the real bench body (bench.py workload).

Runs the bench's scan under jax.profiler and prints the hottest fusions
with their per-call cost; the trace's ``long_name`` args carry HLO
shapes+layouts (CLAUDE.md: read them before theorizing).

Run: ``timeout 900 python scripts/profile_fusions.py [--num-envs N]``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--map", default="maps/16x16/basesWorkers16x16.xml")
    ap.add_argument("--scan-len", type=int, default=32)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if args.cpu:
        from microrts_tpu.utils.platform import force_cpu
        force_cpu()

    import jax

    import bench
    from microrts_tpu.env.gridnet import GridnetEnv
    from microrts_tpu.env.vec import VecGridnetEnv
    from microrts_tpu.utils.assets import asset_path
    from microrts_tpu.utils.profiling import profile_trace

    B = args.num_envs
    env = GridnetEnv(asset_path(args.map))
    vec = VecGridnetEnv(env, B, max_steps=5000)
    states, steps = vec.reset(jax.random.PRNGKey(0))
    actor = bench._actor_random(env, B)
    run = bench._make_run(env, vec, B, args.scan_len, actor)
    key = jax.random.PRNGKey(1)
    states, steps, key, _ = run(states, steps, key)
    jax.block_until_ready(states.time)
    print("warm; profiling", flush=True)

    def blocked():
        out = run(states, steps, key)
        jax.block_until_ready(out[3])

    fusions, log_dir = profile_trace(blocked, iters=2)
    total = sum(t for _, t, _ in fusions)
    # 2 iters x scan_len ticks
    ticks = 2 * args.scan_len
    print(f"device total {total / 1e3:.1f} ms over {ticks} ticks -> "
          f"{total / ticks / 1e3:.3f} ms/tick, "
          f"{B * ticks / total * 1e6:,.0f} env-steps/s")
    print(f"{'fusion':<44}{'us/tick':>9}{'calls':>7}{'%':>6}")
    for name, t, c in fusions[:args.top]:
        print(f"{name[:43]:<44}{t / ticks:>9.1f}{c:>7}"
              f"{100 * t / total:>6.1f}")
    print("trace dir:", log_dir)


if __name__ == "__main__":
    main()
