"""Headline benchmark: gridnet env throughput (env-steps/s/chip).

Measures the full RL step — decode + issue + cycle + observation + rewards
+ dones + in-graph auto-reset — on basesWorkers16x16 over a vmapped batch,
scanned on device.  North star (BASELINE.md): >= 1e6 env-steps/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from microrts_tpu.utils.assets import asset_path

MAP = asset_path("maps/16x16/basesWorkers16x16.xml")
BASELINE = 1_000_000.0  # env-steps/s/chip north star


def main(num_envs: int = 4096, scan_len: int = 128, repeats: int = 3):
    from microrts_tpu.env.gridnet import GridnetEnv
    from microrts_tpu.env.vec import VecGridnetEnv

    env = GridnetEnv(MAP)
    vec = VecGridnetEnv(env, num_envs, max_steps=5000)
    states, steps = vec.reset(jax.random.PRNGKey(0))
    h, w = env.h, env.w
    actions = jnp.zeros((num_envs, h, w, 7), jnp.int32)

    @jax.jit
    def run(states, steps):
        def body(carry, _):
            st, sp = carry
            st, sp, _obs, rew, _dn, _rm = vec.step(st, sp, actions, actions)
            return (st, sp), rew[0, 0, 0]
        (states, steps), out = jax.lax.scan(
            body, (states, steps), None, length=scan_len)
        return states, steps, out.sum()

    # warmup/compile
    states, steps, _ = run(states, steps)
    jax.block_until_ready(states.time)

    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        states, steps, s = run(states, steps)
        jax.block_until_ready(states.time)
        dt = time.perf_counter() - t0
        best = max(best, num_envs * scan_len / dt)

    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "steps/s",
        "vs_baseline": round(best / BASELINE, 4),
    }))


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["num_envs"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kw["scan_len"] = int(sys.argv[2])
    main(**kw)
