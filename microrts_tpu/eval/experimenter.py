"""Experiment driver: bot-pool sweeps across maps with inactivity cutoff.

TPU re-design of tests/Experimenter.java:37-200 +
RunConfigurableExperiments.java: every (map, ordered bot pairing,
iteration) plays; games stop on gameover, the max-cycle cap, or the
INACTIVITY cutoff — Java tracks ``lastTimeActionIssued`` (updated
whenever issueSafe issued a real action, Experimenter.java:137-156) and
cuts when ``time - lastTimeActionIssued >= max_inactive_cycles``.

Here every lane of a map's experiment is one vmapped batched game (one
compile + one launch per map, like eval.tournament); the inactivity
tracker rides the scan carry as "last tick any busy cell held a real
action issued that tick" (the engine's atime plane makes this exact).

CLI:
    python -m microrts_tpu.eval.experimenter --maps m1.xml m2.xml \
        --bots WorkerRush LightRush NaiveMCTS --iterations 4 \
        [--max-cycles 3000] [--max-inactive 300] [--po] [-o results.md]
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Dict, List, Sequence

import numpy as np

from ..env.gridnet import GridnetEnv
from .tournament import TournamentResult


def _experiment_fn(env: GridnetEnv, bots, max_cycles: int,
                   max_inactive: int):
    import jax
    import jax.numpy as jnp

    branches0 = [(lambda b: lambda s, k: b(s, 0, k))(b) for b in bots]
    branches1 = [(lambda b: lambda s, k: b(s, 1, k))(b) for b in bots]

    def one_game(i, j, key):
        s = env.reset(key)

        def body(carry, _):
            s, done, winner, last_issue, k = carry
            k, k0, k1 = jax.random.split(k, 3)
            a0 = jax.lax.switch(i, branches0, s, k0)
            a1 = jax.lax.switch(j, branches1, s, k1)
            s2, _, done2 = env.step(s, a0, a1)
            # a real action issued THIS tick: busy cell whose assignment
            # time equals the pre-cycle clock (issueSafe -> atime = time)
            issued = jnp.any((s2.atype > 0) & (s2.atime == s.time))
            last_issue = jnp.where(done, last_issue,
                                   jnp.where(issued, s.time, last_issue))
            inactive = (s2.time - last_issue) >= max_inactive
            stop = done2 | inactive
            s3 = jax.tree.map(lambda a, b: jnp.where(done, a, b), s, s2)
            winner = jnp.where(done, winner,
                               jnp.where(done2, env.engine.winner(s2), -1))
            return (s3, done | stop, winner, last_issue, k), None

        (s, done, winner, _, _), _ = jax.lax.scan(
            body, (s, jnp.asarray(False), jnp.int32(-1), jnp.int32(0),
                   key), None, length=max_cycles)
        return winner, s.time

    return jax.jit(jax.vmap(one_game))


@dataclasses.dataclass
class ExperimentReport:
    per_map: Dict[str, TournamentResult]

    def table(self) -> str:
        lines = []
        for m, res in self.per_map.items():
            lines.append(f"## {m}\n")
            lines.append(res.table())
            lines.append("")
        return "\n".join(lines)


def run_experiments(maps: Sequence[str], bot_names: Sequence[str],
                    iterations: int = 2, max_cycles: int = 3000,
                    max_inactive: int = 300, partially_observable=False,
                    seed: int = 0) -> ExperimentReport:
    """Experimenter.runExperiments analog: per map, every ordered pairing
    plays ``iterations`` games in ONE batched launch."""
    import itertools

    import jax
    import jax.numpy as jnp

    from ..bots.scripted import po_wrap
    from ..config import make_bot
    from ..utils.assets import asset_path

    per_map: Dict[str, TournamentResult] = {}
    for m in maps:
        env = GridnetEnv(asset_path(m))
        bots = {}
        for nm in bot_names:
            b = make_bot(nm, env)
            bots[nm] = po_wrap(env, b) if partially_observable else b
        names = list(bots)
        n = len(names)
        pairs = [(i, j) for i in range(n) for j in range(n) if i != j]
        run = _experiment_fn(env, [bots[nm] for nm in names],
                             max_cycles, max_inactive)
        ii = np.repeat([p[0] for p in pairs], iterations).astype(np.int32)
        jj = np.repeat([p[1] for p in pairs], iterations).astype(np.int32)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.PRNGKey(seed),
            jnp.arange(len(ii), dtype=jnp.uint32))
        w, end_t = run(jnp.asarray(ii), jnp.asarray(jj), keys)
        w, end_t = np.asarray(w), np.asarray(end_t)
        wins = np.zeros((n, n), np.int64)
        ties = np.zeros((n, n), np.int64)
        games = np.zeros((n, n), np.int64)
        for g, (i, j) in enumerate(zip(ii, jj)):
            if w[g] == 0:
                wins[i, j] += 1
            elif w[g] == 1:
                wins[j, i] += 1
            else:
                ties[i, j] += 1
                ties[j, i] += 1
            games[i, j] += 1
            games[j, i] += 1
        res = TournamentResult(names, wins, ties, games)
        res.end_times = end_t            # game lengths (Java prints these)
        per_map[m] = res
    return ExperimentReport(per_map)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="microrts_tpu.eval.experimenter")
    ap.add_argument("--maps", nargs="+", required=True)
    ap.add_argument("--bots", nargs="+", required=True)
    ap.add_argument("--iterations", type=int, default=2)
    ap.add_argument("--max-cycles", type=int, default=3000)
    ap.add_argument("--max-inactive", type=int, default=300)
    ap.add_argument("--po", action="store_true",
                    help="partially observable (CompareAllAIsPO analog)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        from ..utils.platform import force_cpu
        force_cpu()
    rep = run_experiments(args.maps, args.bots, args.iterations,
                          args.max_cycles, args.max_inactive, args.po)
    text = rep.table()
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return rep


if __name__ == "__main__":
    main()
