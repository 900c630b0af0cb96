"""Playout search bots: the game-tree-search family, TPU style.

The reference's search zoo (ai/montecarlo/MonteCarlo, ai/mcts/naivemcts —
SURVEY.md §2.4) clones the GameState and rolls sequential playouts on the
host.  Here "clone" is free (pure functional state) and playouts batch:
one decision = K candidate joint actions x one L-tick RandomBiased playout
each, evaluated with an ai/evaluation scoring function, all inside one jit
and vmappable over envs.

``monte_carlo_bot``   — flat MC (MonteCarlo.java): uniform candidates.
``naive_sampling_bot`` — NaiveMCTS-flavored (NaiveMCTS.java:25-145):
    candidates mix per-unit greedy exploitation of the running per-unit
    action statistics with exploration (the CMAB naive-sampling idea,
    epsilon_0/epsilon_l collapsed to one epsilon over sampled rounds).
Budgets: the Java bots take time/iteration budgets
(AIWithComputationBudget); here the budget is the static (K, L) pair.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..engine.types import State
from ..env.gridnet import GridnetEnv
from ..ops.evaluation import simple_sqrt_eval3
from ..ops.playout import make_playout
from .scripted import random_bot


def monte_carlo_bot(env: GridnetEnv, n_candidates: int = 12,
                    playout_len: int = 48,
                    eval_fn: Optional[Callable] = None,
                    candidate_bias: float = 5.0, n_eval: int = 1,
                    n_decisions: Optional[int] = None):
    """Flat Monte Carlo: sample K candidate actions, play each out with
    RandomBiasedAI on both sides for L ticks (MonteCarlo.java semantics:
    playout then evaluate), pick the argmax candidate.

    ``n_eval > 1`` evaluates each candidate as the MEAN of that many
    playouts, all K*n_eval running as one vmapped batch — the Java bot
    buys variance reduction with sequential budget (its ITERATIONS loop
    revisits actions, MonteCarlo.java); here it is batch width at the
    same wall-clock per move."""
    ecfg = env.cfg.engine
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    sampler = random_bot(env, candidate_bias)
    rollout_policy = random_bot(env, 5.0)
    cont = make_playout(env, playout_len, eval_fn, gamma=1.0,
                        rollout_bot=rollout_policy, n_decisions=n_decisions)

    def playout_value(state, cand_action, player, key):
        # first tick: candidate vs rollout policy, then the shared
        # fast-forward playout continues from the post-candidate state
        k0, key = jax.random.split(key)
        opp = rollout_policy(state, 1 - player, k0)
        s, _, _ = env.step(state,
                           jnp.where(jnp.int32(player) == 0, cand_action, opp),
                           jnp.where(jnp.int32(player) == 0, opp, cand_action))
        return cont(s, player, state.time, key)

    def bot(state: State, player, key):
        keys = jax.random.split(key, n_candidates + 1)
        cands = jax.vmap(lambda k: sampler(state, player, k))(
            keys[:n_candidates])

        def value(c, k):
            vs = jax.vmap(lambda kk: playout_value(state, c, player, kk))(
                jax.random.split(k, n_eval))
            return jnp.mean(vs)

        values = jax.vmap(value)(
            cands, jax.random.split(keys[-1], n_candidates))
        best = jnp.argmax(values)
        return cands[best]

    return bot


def naive_sampling_bot(env: GridnetEnv, n_rounds: int = 16,
                       playout_len: int = 48, epsilon: float = 0.33,
                       eval_fn: Optional[Callable] = None,
                       n_decisions: Optional[int] = None):
    """Iterated hill-climbing on JOINT actions: each round proposes a
    candidate that keeps the best joint action so far and epsilon-mutates
    per-cell components, playouts it once, and keeps it iff the (scalar)
    playout value improves.  NOT naive sampling — there are no per-unit
    action statistics (the per-cell best_v is uniform); for the real
    CMAB algorithm with per-unit tables and a tree see
    ``bots.treesearch.naive_mcts_bot``.  Kept as a cheap strong-ish
    baseline and as the strength yardstick NaiveMCTS must beat."""
    ecfg = env.cfg.engine
    H, W = env.h, env.w
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    sampler = random_bot(env, 5.0)
    rollout_policy = random_bot(env, 5.0)
    cont = make_playout(env, playout_len, eval_fn, gamma=1.0,
                        rollout_bot=rollout_policy, n_decisions=n_decisions)

    def playout_value(state, cand_action, player, key):
        k0, key = jax.random.split(key)
        opp = rollout_policy(state, 1 - player, k0)
        s, _, _ = env.step(state,
                           jnp.where(jnp.int32(player) == 0, cand_action, opp),
                           jnp.where(jnp.int32(player) == 0, opp, cand_action))
        return cont(s, player, state.time, key)

    def bot(state: State, player, key):
        def round_body(carry, k):
            best_a, best_v, sum_v, n_v = carry
            k1, k2, k3 = jax.random.split(k, 3)
            fresh = sampler(state, player, k1)
            explore = jax.random.uniform(k2, (H, W, 1)) < epsilon
            has_best = (n_v > 0)[..., None]
            cand = jnp.where(explore | ~has_best, fresh, best_a)
            v = playout_value(state, cand, player, k3)
            # per-cell credit: a cell's tried action gets the global value
            # (the CMAB "naive" decomposition: joint reward credited to
            # each arm, NaiveMCTSNode UnitActionTableEntry pattern)
            improve = jnp.broadcast_to(v > best_v, (H, W))
            best_a = jnp.where(improve[..., None], cand, best_a)
            best_v = jnp.where(improve, v, best_v)
            return (best_a, best_v, sum_v + v, n_v + 1), v

        init = (jnp.zeros((H, W, 7), jnp.int32),
                jnp.full((H, W), -jnp.inf),
                jnp.zeros((H, W)), jnp.zeros((H, W), jnp.int32))
        (best_a, _, _, _), _ = jax.lax.scan(
            round_body, init, jax.random.split(key, n_rounds))
        return best_a

    return bot


def uct_bot(env: GridnetEnv, n_candidates: int = 8, n_rounds: int = 24,
            playout_len: int = 48, c_uct: float = 1.4,
            eval_fn: Optional[Callable] = None,
            n_decisions: Optional[int] = None):
    """DownsamplingUCT (ai/mcts/uct/DownsamplingUCT.java pattern): sample a
    fixed candidate subset of the joint action space, then run UCB1 bandit
    rounds over it — each visit is one playout — and return the most-
    visited candidate.  Values use a [-1, 1] evaluation mapped to [0, 1]."""
    ecfg = env.cfg.engine
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    sampler = random_bot(env, 5.0)
    rollout_policy = random_bot(env, 5.0)
    cont = make_playout(env, playout_len, eval_fn, gamma=1.0,
                        rollout_bot=rollout_policy, n_decisions=n_decisions)

    def playout_value(state, cand_action, player, key):
        k0, key = jax.random.split(key)
        opp = rollout_policy(state, 1 - player, k0)
        s, _, _ = env.step(state,
                           jnp.where(jnp.int32(player) == 0, cand_action, opp),
                           jnp.where(jnp.int32(player) == 0, opp, cand_action))
        return (cont(s, player, state.time, key) + 1.0) * 0.5

    def bot(state, player, key):
        kc, kr = jax.random.split(key)
        cands = jax.vmap(lambda k: sampler(state, player, k))(
            jax.random.split(kc, n_candidates))

        def round_body(carry, k):
            visits, values = carry
            total = jnp.sum(visits)
            ucb = jnp.where(
                visits > 0,
                values / jnp.maximum(visits, 1)
                + c_uct * jnp.sqrt(jnp.log(jnp.maximum(total, 1))
                                   / jnp.maximum(visits, 1)),
                jnp.inf)
            arm = jnp.argmax(ucb)
            v = playout_value(state, cands[arm], player, k)
            visits = visits.at[arm].add(1)
            values = values.at[arm].add(v)
            return (visits, values), None

        (visits, _values), _ = jax.lax.scan(
            round_body, (jnp.zeros(n_candidates), jnp.zeros(n_candidates)),
            jax.random.split(kr, n_rounds))
        return cands[jnp.argmax(visits)]

    return bot
