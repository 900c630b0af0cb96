"""Portfolio search: PortfolioAI and Portfolio Greedy Search (PGS).

TPU re-design of ai/portfolio/PortfolioAI.java and
ai/portfolio/portfoliogreedysearch/PGSAI.java (SURVEY.md §2.4):

* **PortfolioAI** plays out every (own strategy i, enemy strategy j) pair
  from the current state for ``lookahead`` ticks, scores the final state
  with SimpleSqrtEvaluationFunction3, and plays the maximin strategy's
  action (PortfolioAI.java:100-190).  Here the whole K x K playout matrix
  runs as ONE vmapped batch; strategy dispatch inside the playout is a
  ``lax.switch``.  Java replays only non-deterministic pairs until the
  budget ends; the static analog is ``n_eval`` playouts per pair.

* **PGS** greedily improves a per-UNIT script assignment: each unit tries
  every script while the rest stay fixed, a mixed-script playout scores
  the candidate, the argmax sticks (PGSAI.java:205-270, Churchill & Buro
  2013); ``responses`` rounds re-improve against the enemy's improved
  response (PGSAI.java:163-166).  Here the assignment is a dense
  ``[slots]`` vector keyed by unit-ID mod ``slots``, the mixed policy is a
  per-cell select over every script's full action plane, and one improve
  sweep is a ``fori_loop`` over slots with the K trial playouts vmapped.

Documented divergences:

* the script portfolio is whole-policy rush scripts (WorkerRush etc. give
  every unit type a behavior) instead of Java's per-unit-type
  ``UnitScript`` micro-scripts — same search, coarser primitive set;
* units alias when their IDs collide mod ``slots`` (Java tracks exact
  units); ties between scripts break by script index, not incumbency.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..engine.types import State
from ..env.gridnet import GridnetEnv
from ..ops.evaluation import simple_sqrt_eval3
from ..ops.playout import make_playout_two
from .scripted import (heavy_rush, light_rush, random_bot, ranged_rush,
                       worker_rush)


def _playout_two(env: GridnetEnv, lookahead: int, eval_fn,
                 n_decisions=None):
    """Two-policy fast-forward playout (ops/playout.py): actor work only
    at decision points.  ``me``/``opp`` are (state, key) -> [H, W, 7]
    planes already bound to their player id."""
    return make_playout_two(env, lookahead, eval_fn,
                            n_decisions=n_decisions)


def portfolio_ai_bot(env: GridnetEnv,
                     strategies: Optional[Sequence[Callable]] = None,
                     lookahead: int = 100, n_eval: int = 1,
                     eval_fn: Optional[Callable] = None,
                     n_decisions: Optional[int] = None):
    """PortfolioAI (ai/portfolio/PortfolioAI.java).  Default portfolio
    mirrors Java: WorkerRush, LightRush, RangedRush, RandomBiasedAI
    (:44-52); selection is maximin over mean pair scores (:163-181)."""
    ecfg = env.cfg.engine
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    if strategies is None:
        strategies = [worker_rush(env), light_rush(env), ranged_rush(env),
                      random_bot(env, 5.0)]
    K = len(strategies)
    branches = [(lambda b: lambda s, p, k: b(s, p, k))(b)
                for b in strategies]
    playout = _playout_two(env, lookahead, eval_fn, n_decisions)

    def bot(state: State, player, key):
        p = jnp.int32(player)

        def pair_value(i, j, k):
            me = lambda s, kk: jax.lax.switch(i, branches, s, p, kk)
            opp = lambda s, kk: jax.lax.switch(j, branches, s, 1 - p, kk)
            vs = jax.vmap(lambda kk: playout(state, p, me, opp, kk))(
                jax.random.split(k, n_eval))
            return jnp.mean(vs)

        key, km, ka = jax.random.split(key, 3)
        ii, jj = jnp.meshgrid(jnp.arange(K), jnp.arange(K), indexing="ij")
        keys = jax.random.split(km, K * K).reshape(K, K, -1)
        scores = jax.vmap(jax.vmap(pair_value))(ii, jj, keys)
        # maximin with first-tie-break (strict </> keeps first, :163-181)
        row_min = jnp.min(scores, axis=1)
        best = jnp.argmax(row_min)
        return jax.lax.switch(best, branches, state, p, ka)

    return bot


def pgs_bot(env: GridnetEnv,
            scripts: Optional[Sequence[Callable]] = None,
            lookahead: int = 100, responses: int = 1, slots: int = 24,
            eval_fn: Optional[Callable] = None,
            n_decisions: Optional[int] = None):
    """Portfolio Greedy Search (PGSAI.java:136-270)."""
    ecfg = env.cfg.engine
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    if scripts is None:
        scripts = [worker_rush(env), light_rush(env), heavy_rush(env),
                   ranged_rush(env)]
    K = len(scripts)
    M = slots
    playout = _playout_two(env, lookahead, eval_fn, n_decisions)

    def mixed_action(state: State, p, assign, key):
        """Per-cell select over every script's action plane by the cell
        unit's uid-slot assignment."""
        keys = jax.random.split(key, K)
        acts = jnp.stack([scripts[k](state, p, keys[k])
                          for k in range(K)])          # [K, H, W, 7]
        slot_oh = (state.uid % M)[..., None] == jnp.arange(M)  # [H, W, M]
        cell_k = jnp.sum(jnp.where(slot_oh, assign[None, None, :], 0), -1)
        sel = (jnp.arange(K)[:, None, None] == cell_k[None])   # [K, H, W]
        return jnp.sum(jnp.where(sel[..., None], acts, 0), axis=0)

    def improve(state: State, p, assign, opp_assign, key):
        """One greedy sweep: every occupied uid-slot tries every script
        (PGSAI.improve:205-270)."""
        own = (state.utype > 0) & (state.owner == p)

        def per_slot(m, carry):
            assign, key = carry
            key, kp = jax.random.split(key)
            occ = jnp.any(own & (state.uid % M == m))

            def trial(k_idx, kk):
                a2 = assign.at[m].set(k_idx)
                me = lambda s, k2: mixed_action(s, p, a2, k2)
                op = lambda s, k2: mixed_action(s, 1 - p, opp_assign, k2)
                return playout(state, p, me, op, kk)

            vs = jax.vmap(trial)(jnp.arange(K), jax.random.split(kp, K))
            best = jnp.argmax(vs).astype(jnp.int32)
            assign = jnp.where(occ, assign.at[m].set(best), assign)
            return assign, key

        assign, key = jax.lax.fori_loop(0, M, per_slot, (assign, key))
        return assign

    def bot(state: State, player, key):
        p = jnp.int32(player)
        a_me = jnp.zeros(M, jnp.int32)   # defaultScript = scripts[0]
        a_op = jnp.zeros(M, jnp.int32)
        key, k0 = jax.random.split(key)
        a_me = improve(state, p, a_me, a_op, k0)
        for _ in range(responses):
            key, k1, k2 = jax.random.split(key, 3)
            a_op = improve(state, 1 - p, a_op, a_me, k1)
            a_me = improve(state, p, a_me, a_op, k2)
        key, kf = jax.random.split(key)
        return mixed_action(state, p, a_me, kf)

    return bot
