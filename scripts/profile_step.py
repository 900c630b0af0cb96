"""Section-split profile of the real-action bench step (bench.py workload).

The tunneled TPU has a ~26 ms per-dispatch latency floor, so host-level
timing of single jitted calls is meaningless.  Instead every section is
timed as a ``lax.scan`` of N trips chained after ``cycle`` (cycle advances
the carried state each trip, defeating loop-invariant hoisting); the
section's cost is (scan time - cycle-only scan time) / N.  Outputs are
consumed via sums folded back into the carry so nothing is DCE'd.

Run: ``timeout 900 python scripts/profile_step.py [--cpu] [--num-envs N]``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--map", default="maps/16x16/basesWorkers16x16.xml")
    ap.add_argument("--ticks", type=int, default=64,
                    help="random ticks to reach a mid-game batch")
    ap.add_argument("--trips", type=int, default=50)
    args = ap.parse_args()
    if args.cpu:
        from microrts_tpu.utils.platform import force_cpu
        force_cpu()

    import jax
    import jax.numpy as jnp

    from microrts_tpu.bots.scripted import random_bot
    from microrts_tpu.env.gridnet import GridnetEnv
    from microrts_tpu.env.vec import VecGridnetEnv
    from microrts_tpu.utils.assets import asset_path

    B, N = args.num_envs, args.trips
    env = GridnetEnv(asset_path(args.map))
    vec = VecGridnetEnv(env, B, max_steps=5000)
    bot = random_bot(env, 5.0)
    print("device:", jax.devices()[0].device_kind, "batch:", B,
          "trips:", N, flush=True)

    states0, steps0 = vec.reset(jax.random.PRNGKey(0))

    @jax.jit
    def roll(states, steps):
        def body(c, _):
            st, sp, k = c
            k, k0, k1 = jax.random.split(k, 3)
            a0 = jax.vmap(lambda s, kk: bot(s, 0, kk))(
                st, jax.random.split(k0, B))
            a1 = jax.vmap(lambda s, kk: bot(s, 1, kk))(
                st, jax.random.split(k1, B))
            st, sp, _o, _r, _d, _m = vec.step(st, sp, a0, a1)
            return (st, sp, k), None
        (states, steps, _), _ = jax.lax.scan(
            body, (states, steps, jax.random.PRNGKey(1)), None,
            length=args.ticks)
        return states, steps

    states, steps = roll(states0, steps0)
    jax.block_until_ready(states.time)
    print("rolled to mid-game", flush=True)

    a0_const = jax.jit(jax.vmap(lambda s, k: bot(s, 0, k)))(
        states, jax.random.split(jax.random.PRNGKey(3), B))
    jax.block_until_ready(a0_const)
    cyc = jax.vmap(env.engine.cycle)

    def scan_of(extra):
        """extra(st, key) -> float consumed; body = cycle + extra."""
        def run(states, key):
            def body(c, _):
                st, acc, k = c
                k, k1 = jax.random.split(k)
                bonus = extra(st, k1) if extra is not None else 0.0
                st2, _d = cyc(st)
                return (st2, acc + bonus, k), None
            (st, acc, _), _ = jax.lax.scan(
                body, (states, jnp.float32(0.0), key), None, length=N)
            return st.time.sum() + acc
        return jax.jit(run)

    def timeit(fn, *a, reps=5):
        jax.block_until_ready(fn(*a))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    key = jax.random.PRNGKey(7)
    base = timeit(scan_of(None), states, key)
    print(f"cycle-only baseline: {base / N * 1e3:.3f} ms/trip", flush=True)

    def sec_actor(st, k):
        a = jax.vmap(lambda s, kk: bot(s, 0, kk))(st, jax.random.split(k, B))
        return a.sum().astype(jnp.float32)

    def sec_masks(st, k):
        m = jax.vmap(lambda s: env.masks(s, 0))(st)
        return m.sum().astype(jnp.float32)

    def sec_decode(st, k):
        c = jax.vmap(lambda s, a: env.decode(
            s, a, 0, env._inflight_claims(s),
            env._inflight_spent(s, 0))[0])(st, a0_const)
        return (c.atype.sum() + c.rank.sum()).astype(jnp.float32)

    def sec_issue(st, k):
        c = jax.vmap(lambda s, a: env.decode(
            s, a, 0, env._inflight_claims(s),
            env._inflight_spent(s, 0))[0])(st, a0_const)
        st2 = jax.vmap(env.engine.issue_env)(st, c)
        return st2.aticks.sum().astype(jnp.float32)

    def sec_obs(st, k):
        o = jax.vmap(lambda s: env.observation(s, 0))(st)
        return o.sum().astype(jnp.float32)

    def sec_rew(st, k):
        c = jax.vmap(lambda s, a: env.decode(
            s, a, 0, env._inflight_claims(s),
            env._inflight_spent(s, 0))[0])(st, a0_const)
        r = jax.vmap(lambda pre, cc: env._rewards(pre, cc, 0, pre))(st, c)
        return r.sum()

    def sec_env_step(st, k):
        k0, k1 = jax.random.split(k)
        a0 = jax.vmap(lambda s, kk: bot(s, 0, kk))(
            st, jax.random.split(k0, B))
        a1 = jax.vmap(lambda s, kk: bot(s, 1, kk))(
            st, jax.random.split(k1, B))
        st2, r, d = jax.vmap(env.step)(st, a0, a1)
        return (r.sum() + st2.time.sum().astype(jnp.float32)
                + d.sum().astype(jnp.float32))

    def sec_vec_step(st, k):
        # full bench body (actors + vec.step with auto-reset + obs + rew)
        k0, k1 = jax.random.split(k)
        a0 = jax.vmap(lambda s, kk: bot(s, 0, kk))(
            st, jax.random.split(k0, B))
        a1 = jax.vmap(lambda s, kk: bot(s, 1, kk))(
            st, jax.random.split(k1, B))
        st2, sp2, o, r, d, _m = vec.step(st, steps, a0, a1)
        return (r.sum() + o.sum().astype(jnp.float32)
                + d.sum().astype(jnp.float32)
                + st2.time.sum().astype(jnp.float32))

    sections = {
        "actor(random_bot) x1": sec_actor,
        "masks(JNI layout) x1": sec_masks,
        "decode x1 (incl. inflight scans)": sec_decode,
        "decode+issue_env x1": sec_issue,
        "observation x1": sec_obs,
        "decode+rewards x1": sec_rew,
        "env.step full (2 actors+2 dec+2 issue+cycle+2 rew)": sec_env_step,
        "bench body (2 actors + vec.step)": sec_vec_step,
    }
    print(f"\n{'section':<52}{'ms/trip':>9}{'us/env':>9}")
    for name, fn in sections.items():
        t = timeit(scan_of(fn), states, key)
        d = (t - base) / N
        print(f"{name:<52}{d * 1e3:>9.3f}{d / B * 1e6:>9.3f}", flush=True)
    print(f"\n(cycle itself: {base / N * 1e3:.3f} ms/trip; bench tick = "
          f"bench-body row + cycle baseline is double-counted — the bench "
          f"body already includes its own cycle via env.step)")


if __name__ == "__main__":
    main()
