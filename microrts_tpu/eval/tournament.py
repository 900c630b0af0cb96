"""Tournaments: batched bot-vs-bot evaluation on device.

Re-design of ``tournaments/RoundRobinTournament`` / ``Tournament.playSingleGame``
(Tournament.java:60-240) and the ``tests/CompareAllAIs*`` drivers: instead of
one sequential game at a time, the WHOLE tournament runs as one jitted,
vmapped batch of lockstep games — every (ordered pairing x repetition) is one
batch lane, and each lane picks its two bots with ``lax.switch`` over the bot
pool.  One XLA compile covers the full pool (vs one compile per ordered
pairing), and every game in the tournament runs concurrently.

Java's per-move time budgets / crash-timeout bookkeeping
(Tournament.java:69-81, 127-150) have no analog for jitted bots and are
intentionally dropped; max-cycle cutoffs and both-positions pairing are kept.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..env.gridnet import GridnetEnv
from ..ops.playout import fast_forward


CHUNK = 256   # default ticks per device dispatch (long single dispatches
#               crash the tunneled TPU worker; pass a smaller ``chunk`` for
#               search bots whose per-tick cost is itself hundreds of
#               engine ticks of playout)


def _games_fn(env: GridnetEnv, bots: Sequence[Callable], max_cycles: int,
              chunk: int = CHUNK, fixed_pair: bool = False):
    """Build the batched-game runner for a bot pool.

    Returns ``run(i, j, keys) -> winners`` where ``i``/``j`` are per-game
    bot-pool indices (player 0 / player 1) and winners are 0, 1, or -1
    (draw / cycle cutoff, Tournament.java:122-197 loop + winner :240).
    The game loop advances DECISION FRAME by decision frame: cycle-only
    fast-forward between frames (getNextChangeTime analog), bots invoked
    only where some unit can act — so a CHUNK-frame dispatch covers a
    multiple of CHUNK game ticks.  Dispatches keep the (state, done,
    winner) carry on device between slices — identical results to one
    long scan, but each device call stays short (the tunneled TPU kills
    multi-minute dispatches) and the host can early-out once every lane
    is done.

    ``fixed_pair=True`` requires ``bots == [bot0, bot1]`` with every lane
    playing bot0 as player 0 and bot1 as player 1, and COMPILES THE BOTS
    DIRECTLY instead of dispatching through ``lax.switch``: the switch
    form inlines every pool bot into BOTH player slots (4 search-bot
    bodies for a head-to-head pair), and XLA's optimization passes over
    such a module are superlinear enough that a NaiveMCTS-vs-MonteCarlo
    pair compiles for HOURS; two fixed-pair programs of half the body
    count compile in minutes.  Same keys => identical trajectories.
    """
    if fixed_pair:
        assert len(bots) == 2

        def act0(i, s, k):
            return bots[0](s, 0, k)

        def act1(j, s, k):
            return bots[1](s, 1, k)
    else:
        branches0 = [
            (lambda b: lambda s, k: b(s, 0, k))(b) for b in bots]
        branches1 = [
            (lambda b: lambda s, k: b(s, 1, k))(b) for b in bots]

        def act0(i, s, k):
            return jax.lax.switch(i, branches0, s, k)

        def act1(j, s, k):
            return jax.lax.switch(j, branches1, s, k)

    def chunk_fn(i, j, carry, length):
        def body(c, _):
            s, done, winner, k = c
            # coast cycle-only ticks to the next DECISION FRAME (or game
            # end / cycle cap): the getNextChangeTime fast-forward
            # (ops/playout.py).  Bots think only at frames where some
            # unit can act — exactly the Java loop, where search bots
            # return empty unless canExecuteAnyAction
            # (NaiveMCTS.getAction:140).  Lanes desynchronize in game
            # time; each is independent.
            s, d_ff = fast_forward(env, s, done,
                                   t_end=jnp.int32(max_cycles))
            winner = jnp.where(done, winner,
                               jnp.where(d_ff, env.engine.winner(s), -1))
            done = done | d_ff | (s.time >= max_cycles)
            k, k0, k1 = jax.random.split(k, 3)
            a0 = act0(i, s, k0)
            a1 = act1(j, s, k1)
            s2, _, done2 = env.step(s, a0, a1)
            # freeze finished games (select keeps the terminal state)
            s3 = jax.tree.map(
                lambda old, new: jnp.where(done, old, new), s, s2)
            new_winner = jnp.where(done, winner,
                                   jnp.where(done2, env.engine.winner(s2),
                                             -1))
            return (s3, done | done2, new_winner, k), None

        return jax.lax.scan(body, carry, None, length=length)[0]

    def init(key):
        return (env.reset(key), jnp.asarray(False), jnp.int32(-1), key)

    init_v = jax.jit(jax.vmap(init))
    chunk_v = jax.jit(jax.vmap(chunk_fn, in_axes=(0, 0, 0, None)),
                      static_argnums=3)

    def run(i, j, keys):
        carry = init_v(keys)
        left = max_cycles
        while left > 0:
            n = min(chunk, left)
            carry = chunk_v(i, j, carry, n)
            left -= n
            if bool(carry[1].all()):   # every lane finished
                break
        return carry[2]

    return run


def play_matches(env: GridnetEnv, bot0: Callable, bot1: Callable,
                 n_games: int, max_cycles: int = 2000,
                 seed: int = 0, chunk: int = CHUNK) -> np.ndarray:
    """Run n_games lockstep games of bot0 (player 0) vs bot1 (player 1).
    Returns winners int[n_games]: 0, 1, or -1 (draw / cycle cutoff)."""
    run = _games_fn(env, [bot0, bot1], max_cycles, chunk, fixed_pair=True)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_games)
    i = jnp.zeros(n_games, jnp.int32)
    j = jnp.ones(n_games, jnp.int32)
    return np.asarray(run(i, j, keys))


def play_matches_both(env: GridnetEnv, bot0: Callable, bot1: Callable,
                      n_games: int, max_cycles: int = 2000,
                      seed: int = 0, chunk: int = CHUNK):
    """Both orderings: ``n_games`` lanes of bot0-vs-bot1 plus ``n_games``
    lanes of bot1-vs-bot0 (the two-position pairing of Tournament.java).
    Returns (w01, w10) winner vectors in the respective lane order.

    Runs as TWO fixed-pair programs rather than one switch-dispatched
    batch: identical trajectories (the key split is preserved), but each
    program holds one body per bot instead of two, which is the
    difference between minutes and hours of XLA compile for tree-search
    pairs (see ``_games_fn``)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), 2 * n_games)
    idx = jnp.zeros(n_games, jnp.int32)
    run01 = _games_fn(env, [bot0, bot1], max_cycles, chunk,
                      fixed_pair=True)
    w01 = np.asarray(run01(idx, idx, keys[:n_games]))
    run10 = _games_fn(env, [bot1, bot0], max_cycles, chunk,
                      fixed_pair=True)
    w10 = np.asarray(run10(idx, idx, keys[n_games:]))
    return w01, w10


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
                seed: int = 0, play_both_positions: bool = True,
                chunk: int = CHUNK) -> TournamentResult:
    """RoundRobinTournament (:22): every ordered pair plays
    ``games_per_pair`` games; with both positions unless disabled.

    The whole tournament is ONE compiled program (per-game bot indices
    dispatch through ``lax.switch``, so an n-bot pool costs one compile
    instead of n*(n-1), each 2-10 s for this engine), launched in
    CHUNK-tick slices with an all-done early-out."""
    names = list(bots)
    n = len(names)
    wins = np.zeros((n, n), np.int64)
    ties = np.zeros((n, n), np.int64)
    games = np.zeros((n, n), np.int64)
    pairs = [(i, j) for i in range(n) for j in range(n) if i != j] \
        if play_both_positions else list(itertools.combinations(range(n), 2))

    run = _games_fn(env, [bots[nm] for nm in names], max_cycles, chunk)
    ii = np.repeat([p[0] for p in pairs], games_per_pair).astype(np.int32)
    jj = np.repeat([p[1] for p in pairs], games_per_pair).astype(np.int32)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(seed),
        jnp.arange(len(ii), dtype=jnp.uint32))
    w = np.asarray(run(jnp.asarray(ii), jnp.asarray(jj), keys))

    for g, (i, j) in enumerate(np.stack([ii, jj], 1)):
        if w[g] == 0:
            wins[i, j] += 1
        elif w[g] == 1:
            wins[j, i] += 1
        else:
            ties[i, j] += 1
            ties[j, i] += 1
        games[i, j] += 1
        games[j, i] += 1
    return TournamentResult(names, wins, ties, games)
