"""Wall-clock computation budgets for compiled search bots.

The reference's ``AIWithComputationBudget`` (ai/core/AIWithComputationBudget
.java:15-70) gives every search bot a TIME_BUDGET (ms per move) and an
ITERATIONS_BUDGET; interruptible bots stop when either runs out.  A jitted
TPU bot cannot poll a clock mid-graph — its per-move cost is fixed at
compile time by its static budget (playouts, nodes, candidates).  The
honest analog is therefore *calibration*: measure the compiled per-move
wall time at a few static budgets and pick the largest one that fits the
ms target.  ``calibrate_budget`` does exactly that (geometric probe then
refinement), so ``TimeBudgetedBot`` delivers the reference's contract —
"spend about N ms per move" — with a deterministic compiled program.

The iterations budget needs no machinery: it IS the static budget.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

import jax


def measure_move_ms(env, bot, *, player: int = 0, seed: int = 0,
                    repeats: int = 3) -> float:
    """Median wall-clock ms of one compiled bot move (compile excluded).

    Timing is closed by FETCHING the action to host (``np.asarray``),
    not ``block_until_ready``: on the tunneled axon TPU the latter
    returns in <1 ms without waiting for device execution (measured r5
    — an 8-iteration NaiveMCTS move "completed" in 0.5 ms by
    block_until_ready but 57 ms by fetch), which silently calibrated
    every budget to the ladder top.  A real AI in the game loop pays
    the fetch anyway — the action must reach the host to be issued."""
    import numpy as np

    s = env.reset(jax.random.PRNGKey(seed))
    jbot = jax.jit(bot, static_argnums=1)
    key = jax.random.PRNGKey(seed + 1)
    np.asarray(jbot(s, player, key))  # compile + warmup
    times = []
    for i in range(repeats):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        np.asarray(jbot(s, player, sub))
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2]


def calibrate_budget(env, bot_factory: Callable[[int], Callable],
                     time_budget_ms: float, *,
                     candidates: Sequence[int] = (1, 2, 4, 8, 16, 32, 64,
                                                  128, 256),
                     player: int = 0, seed: int = 0) -> int:
    """Largest static budget whose compiled move fits ``time_budget_ms``.

    ``bot_factory(n)`` builds a bot whose per-move work scales with ``n``
    (playouts, rounds, candidates...).  Probes the geometric ladder and
    returns the biggest n that fits; always at least ``candidates[0]``.
    Each probe costs one compile, so the ladder is short by default.
    """
    best = candidates[0]
    for n in candidates:
        ms = measure_move_ms(env, bot_factory(n), player=player, seed=seed)
        if ms <= time_budget_ms:
            best = n
        else:
            break
    return best


class TimeBudgetedBot:
    """AIWithComputationBudget analog: a bot constrained to ~ms per move.

    Calibrates lazily on first call (one-time compiles), then plays with
    the fitted static budget.  The fitted bot itself is pure/jittable —
    this wrapper only holds the host-side calibration.
    """

    def __init__(self, env, bot_factory: Callable[[int], Callable],
                 time_budget_ms: float = 100.0,
                 iterations_budget: Optional[int] = None, **calib_kw):
        self.env = env
        self.factory = bot_factory
        self.time_budget_ms = time_budget_ms
        self.iterations_budget = iterations_budget
        self._calib_kw = calib_kw
        self._bot = None
        self.fitted_budget: Optional[int] = None

    def _ensure(self):
        if self._bot is None:
            n = calibrate_budget(self.env, self.factory,
                                 self.time_budget_ms, **self._calib_kw)
            if self.iterations_budget is not None:
                n = min(n, self.iterations_budget)
            self.fitted_budget = n
            self._bot = jax.jit(self.factory(n), static_argnums=1)

    def __call__(self, state, player, key):
        self._ensure()
        return self._bot(state, player, key)
