"""Measure the decision-point fast-forward speedup (VERDICT r3 item 2).

Times B vmapped playouts of L game ticks with the RandomBiased rollout
policy on both sides, dense (actor every tick — the pre-round-4 shape)
vs fast-forward (ops/playout.py), and prints ticks/s plus the ratio.

Run on the real TPU:  timeout 600 python scripts/bench_playout.py
On CPU (sanity):      python scripts/bench_playout.py --cpu
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--map", default="maps/8x8/basesWorkers8x8.xml")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--len", type=int, default=100, dest="length")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    if args.cpu:
        from microrts_tpu.utils.platform import force_cpu
        force_cpu()

    from microrts_tpu.bots.scripted import random_bot
    from microrts_tpu.env.gridnet import GridnetEnv
    from microrts_tpu.ops.playout import (decisions_for, playout_step,
                                          run_playout)
    from microrts_tpu.utils.assets import asset_path

    env = GridnetEnv(asset_path(args.map))
    rollout = random_bot(env, 5.0)
    B, L = args.batch, args.length
    n_dec = decisions_for(L)

    def act2(s, k):
        k0, k1 = jax.random.split(k)
        return rollout(s, 0, k0), rollout(s, 1, k1)

    def dense_r3_one(s, k):
        """The round-3 playout shape: env.step (RL-path NONE(1) pads +
        reward computation) every tick."""
        t_end = s.time + jnp.int32(L)
        done = env.engine.gameover(s)

        def body(carry, kk):
            s, done = carry
            live = (~done) & (s.time < t_end)
            a0, a1 = act2(s, kk)
            s2, _, d2 = env.step(s, a0, a1)
            s = jax.tree.map(lambda a, b: jnp.where(live, b, a), s, s2)
            return (s, jnp.where(live, done | d2, done)), None

        (s, _), _ = jax.lax.scan(body, (s, done), jax.random.split(k, L))
        return s.time

    def dense10_one(s, k):
        """Bot-path tick (NONE(10), no rewards) but still actor every
        tick — isolates the fast-forward's contribution."""
        t_end = s.time + jnp.int32(L)
        done = env.engine.gameover(s)

        def body(carry, kk):
            s, done = carry
            live = (~done) & (s.time < t_end)
            a0, a1 = act2(s, kk)
            s2, d2 = playout_step(env, s, a0, a1)
            s = jax.tree.map(lambda a, b: jnp.where(live, b, a), s, s2)
            return (s, jnp.where(live, done | d2, done)), None

        (s, _), _ = jax.lax.scan(body, (s, done), jax.random.split(k, L))
        return s.time

    def fast_one(s, k):
        s, _ = run_playout(env, act2, s, k, L, n_dec)
        return s.time

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    s0 = jax.vmap(env.reset)(keys)

    results = {}
    for name, fn in [("dense_r3", dense_r3_one), ("dense10", dense10_one),
                     ("fast", fast_one)]:
        run = jax.jit(lambda s, ks: jnp.sum(jax.vmap(fn)(s, ks)))
        ks = jax.random.split(jax.random.PRNGKey(1), B)
        t_c0 = time.time()
        out = run(s0, ks)
        out.block_until_ready()
        compile_s = time.time() - t_c0
        t0 = time.time()
        ticks = 0
        for r in range(args.reps):
            ks = jax.random.split(jax.random.PRNGKey(2 + r), B)
            out = run(s0, ks)
            ticks += int(out.block_until_ready())  # actual game ticks
        dt = time.time() - t0
        results[name] = (ticks / dt, dt, compile_s, ticks)
        print(f"{name:6s}: {ticks/dt/1e3:9.1f}k ticks/s  "
              f"(covered {ticks} game ticks in {dt:.2f}s; "
              f"compile {compile_s:.1f}s; n_dec={n_dec if name=='fast' else L})")

    ratio = results["fast"][0] / results["dense_r3"][0]
    cov = results["fast"][3] / max(results["dense_r3"][3], 1)
    print(f"speedup: {ratio:.2f}x ticks/s at {cov:.2f}x tick coverage "
          f"(map {args.map}, B={B}, L={L})")


if __name__ == "__main__":
    main()
