"""Tournaments: batched bot-vs-bot evaluation on device.

Re-design of ``tournaments/RoundRobinTournament`` / ``Tournament.playSingleGame``
(Tournament.java:60-240) and the ``tests/CompareAllAIs*`` drivers: instead of
one sequential game at a time, every repetition of a pairing runs as a
vmapped batch of lockstep games inside one jit — a tournament is a handful
of XLA launches.  Java's per-move time budgets / crash-timeout bookkeeping
(Tournament.java:69-81, 127-150) have no analog for jitted bots and are
intentionally dropped; max-cycle cutoffs and both-positions pairing are kept.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..env.gridnet import GridnetEnv


def play_matches(env: GridnetEnv, bot0: Callable, bot1: Callable,
                 n_games: int, max_cycles: int = 2000,
                 seed: int = 0) -> np.ndarray:
    """Run n_games lockstep games of bot0 (player 0) vs bot1 (player 1).
    Returns winners int[n_games]: 0, 1, or -1 (draw / cycle cutoff,
    Tournament.java:122-197 loop + winner :240)."""

    def one_game(key):
        s = env.reset(key)

        def body(carry, _):
            s, done, winner, k = carry
            k, k0, k1 = jax.random.split(k, 3)
            a0 = bot0(s, 0, k0)
            a1 = bot1(s, 1, k1)
            s2, _, done2 = env.step(s, a0, a1)
            # freeze finished games (select keeps the terminal state)
            s3 = jax.tree.map(
                lambda old, new: jnp.where(done, old, new), s, s2)
            new_winner = jnp.where(done, winner,
                                   jnp.where(done2, env.engine.winner(s2),
                                             -1))
            return (s3, done | done2, new_winner, k), None

        (s, done, winner, _), _ = jax.lax.scan(
            body, (s, jnp.asarray(False), jnp.int32(-1), key), None,
            length=max_cycles)
        return winner

    keys = jax.random.split(jax.random.PRNGKey(seed), n_games)
    return np.asarray(jax.jit(jax.vmap(one_game))(keys))


@dataclasses.dataclass
class TournamentResult:
    names: List[str]
    wins: np.ndarray    # [n, n] wins[i, j] = games bot i beat bot j
    ties: np.ndarray    # [n, n]
    games: np.ndarray   # [n, n]

    def table(self) -> str:
        n = len(self.names)
        width = max(len(s) for s in self.names) + 2
        lines = ["round-robin results (wins/ties/games per ordered pairing):"]
        header = " " * width + "".join(f"{s:>{width}}" for s in self.names)
        lines.append(header)
        for i in range(n):
            row = f"{self.names[i]:>{width}}"
            for j in range(n):
                if i == j:
                    row += f"{'-':>{width}}"
                else:
                    row += (f"{int(self.wins[i, j])}/"
                            f"{int(self.ties[i, j])}/"
                            f"{int(self.games[i, j])}").rjust(width)
            lines.append(row)
        score = self.wins.sum(1) + 0.5 * self.ties.sum(1)
        order = np.argsort(-score)
        lines.append("ranking: " + ", ".join(
            f"{self.names[i]} ({score[i]:.1f})" for i in order))
        return "\n".join(lines)


def round_robin(env: GridnetEnv, bots: Dict[str, Callable],
                games_per_pair: int = 4, max_cycles: int = 2000,
                seed: int = 0, play_both_positions: bool = True
                ) -> TournamentResult:
    """RoundRobinTournament (:22): every ordered pair plays
    ``games_per_pair`` games; with both positions unless disabled."""
    names = list(bots)
    n = len(names)
    wins = np.zeros((n, n), np.int64)
    ties = np.zeros((n, n), np.int64)
    games = np.zeros((n, n), np.int64)
    pairs = [(i, j) for i in range(n) for j in range(n) if i != j] \
        if play_both_positions else list(itertools.combinations(range(n), 2))
    for idx, (i, j) in enumerate(pairs):
        w = play_matches(env, bots[names[i]], bots[names[j]],
                         games_per_pair, max_cycles, seed + idx * 1013)
        wins[i, j] += (w == 0).sum()
        wins[j, i] += (w == 1).sum()
        t = (w == -1).sum()
        ties[i, j] += t
        ties[j, i] += t
        games[i, j] += len(w)
        games[j, i] += len(w)
    return TournamentResult(names, wins, ties, games)
