"""Real-TPU check for the Pallas fused kernels (VERDICT r1 item 5).

Compiles fused_cycle / fused_issue on the actual TPU, asserts bit-equality
with the unfused engine on a mid-game batch, and times both paths.  Exits
nonzero on compile failure or mismatch.  Run under ``timeout`` (the tunnel
hangs): ``timeout 900 python scripts/fused_tpu_check.py``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print("device:", dev.device_kind, flush=True)

    from microrts_tpu.bots.scripted import random_bot
    from microrts_tpu.env.gridnet import GridnetEnv
    from microrts_tpu.ops.fused import fused_cycle, fused_issue
    from microrts_tpu.utils.assets import asset_path

    B, BLOCK = 1024, 256
    env = GridnetEnv(asset_path("maps/16x16/basesWorkers16x16.xml"))
    bot = random_bot(env, 5.0)

    # mid-game batch: play 64 random ticks so planes are busy
    def roll(s, k):
        def body(c, _):
            s, k = c
            k, k0, k1 = jax.random.split(k, 3)
            s, _, _ = env.step(s, bot(s, 0, k0), bot(s, 1, k1))
            return (s, k), None
        (s, _), _ = jax.lax.scan(body, (s, k), None, length=64)
        return s

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(lambda k: roll(env.reset(k), k)))(keys)
    jax.block_until_ready(states.time)
    print("rolled to mid-game", flush=True)

    eng = env.engine
    unfused_cycle = jax.jit(jax.vmap(eng.cycle))
    fc = jax.jit(fused_cycle(eng, block=BLOCK))

    t0 = time.time()
    fs, fd = fc(states)
    jax.block_until_ready(fs.time)
    print(f"fused_cycle compiled+ran in {time.time()-t0:.1f}s", flush=True)
    us, ud = unfused_cycle(states)
    jax.block_until_ready(us.time)

    for f in states._fields:
        a, b = np.asarray(getattr(fs, f)), np.asarray(getattr(us, f))
        assert (a == b).all(), f"cycle mismatch in {f}"
    assert (np.asarray(fd) == np.asarray(ud)).all()
    print("fused_cycle BIT-EXACT on TPU", flush=True)

    def timeit(fn, *a, n=20):
        fn(*a)[0].time.block_until_ready()
        t0 = time.time()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out[0].time)
        return (time.time() - t0) / n * 1e6

    tf = timeit(fc, states)
    tu = timeit(unfused_cycle, states)
    print(f"cycle: fused {tf:.0f}us vs unfused {tu:.0f}us "
          f"({tu/tf:.2f}x) at B={B}", flush=True)

    # issue path
    k0 = jax.random.PRNGKey(7)
    acts = jax.jit(jax.vmap(lambda s, k: bot(s, 0, k)))(
        states, jax.random.split(k0, B))
    cands = jax.jit(jax.vmap(
        lambda s, a: env.decode(s, a, 0, env._inflight_claims(s),
                                env._inflight_spent(s, 0))[0]))(states, acts)
    fi = jax.jit(fused_issue(eng, block=BLOCK))
    unfused_issue = jax.jit(jax.vmap(eng.issue))
    t0 = time.time()
    fs2 = fi(states, cands)
    jax.block_until_ready(fs2.time)
    print(f"fused_issue compiled+ran in {time.time()-t0:.1f}s", flush=True)
    us2 = unfused_issue(states, cands)
    for f in states._fields:
        a, b = np.asarray(getattr(fs2, f)), np.asarray(getattr(us2, f))
        assert (a == b).all(), f"issue mismatch in {f}"
    print("fused_issue BIT-EXACT on TPU", flush=True)
    ti_f = timeit(lambda s: (fi(s, cands), ), states)
    ti_u = timeit(lambda s: (unfused_issue(s, cands), ), states)
    print(f"issue: fused {ti_f:.0f}us vs unfused {ti_u:.0f}us "
          f"({ti_u/ti_f:.2f}x) at B={B}", flush=True)


if __name__ == "__main__":
    main()
