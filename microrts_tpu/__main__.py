"""CLI game runner: the rts/MicroRTS.java main-entry analog.

    python -m microrts_tpu [--config FILE] [--map PATH] [--ai1 NAME]
        [--ai2 NAME] [--max_cycles N] [--utt_version V]
        [--partially_observable] [--render] [--trace OUT.zip] [--cpu]

Runs a STANDALONE game between two named bots (Game.start loop,
rts/Game.java:115-163), optionally rendering to the terminal and recording
a Java-readable replay zip.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(prog="microrts_tpu")
    p.add_argument("--config", help="GameSettings properties file")
    p.add_argument("--map", dest="map_location")
    p.add_argument("--ai1")
    p.add_argument("--ai2")
    p.add_argument("--max_cycles", type=int)
    p.add_argument("--utt_version", type=int)
    p.add_argument("--conflict_policy", type=int)
    p.add_argument("--partially_observable", action="store_true",
                   default=None)
    p.add_argument("--render", action="store_true")
    p.add_argument("--trace", help="record replay zip to this path")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.cpu:
        from .utils.platform import force_cpu
        force_cpu()

    from .config import GameSettings, make_bot

    gs = (GameSettings.load_properties(args.config) if args.config
          else GameSettings())
    gs.override_from_args(args)

    import jax

    from .engine.utt import UnitTypeTable
    from .env.gridnet import GridnetEnv

    from .utils.assets import asset_path
    map_path = asset_path(gs.map_location)
    utt = UnitTypeTable(gs.utt_version, gs.conflict_policy)
    env = GridnetEnv(map_path, utt, partial_obs=gs.partially_observable)
    from .bots.believestate import StatefulBot, stateless
    bot1 = make_bot(gs.ai1, env)
    bot2 = make_bot(gs.ai2, env)
    sb1 = bot1 if isinstance(bot1, StatefulBot) else stateless(bot1)
    sb2 = bot2 if isinstance(bot2, StatefulBot) else stateless(bot2)

    recorder = None
    if args.trace:
        from .interop.serialize import TraceRecorder
        recorder = TraceRecorder(utt)

    state = env.reset(jax.random.PRNGKey(args.seed))
    mem1 = sb1.init(state, 0)
    mem2 = sb2.init(state, 1)

    @jax.jit
    def step(s, m1, m2, k):
        a1, m1 = sb1.step(s, m1, 0, k)
        a2, m2 = sb2.step(s, m2, 1, jax.random.fold_in(k, 1))
        s, r, d = env.step(s, a1, a2)
        return s, m1, m2, r, d

    @jax.jit
    def decoded_p0(s, m1, k):
        a1, _ = sb1.step(s, m1, 0, k)
        c0, _, _ = env.decode(s, a1, 0,
                              env._inflight_claims(s),
                              env._inflight_spent(s, 0))
        return c0

    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    tick = 0
    done = False
    while tick < gs.max_cycles and not done:
        key, sub = jax.random.split(key)
        if recorder is not None:
            recorder.record_candidates(state, decoded_p0(state, mem1, sub))
        state, mem1, mem2, _r, done = step(state, mem1, mem2, sub)
        done = bool(done)
        tick += 1
        if args.render and (tick % max(1, gs.update_interval) == 0 or done):
            from .render import render_ansi
            sys.stdout.write("\x1b[H\x1b[2J" + render_ansi(state, utt) + "\n")
            sys.stdout.flush()

    winner = int(env.engine.winner(state))
    dt = time.time() - t0
    print(f"game over at t={tick}: "
          + (f"winner = player {winner} ({[gs.ai1, gs.ai2][winner]})"
             if winner >= 0 else "draw")
          + f"  [{tick / dt:.0f} ticks/s]")
    if recorder is not None:
        recorder.save_zip(args.trace)
        print(f"replay written to {args.trace}")
    return winner


if __name__ == "__main__":
    main()
