"""LSI — Linear Side Information search over combinatorial actions.

TPU re-design of ai/montecarlo/lsi/LSI.java + Sampling.java (SURVEY.md
§2.4; Shleyfman, Komenda & Domshlak, "On Combinatorial Actions and CMABs
with Linear Side Information").  The simulation budget splits into two
stages (LSI.java:119-343):

1. **generate** (``split`` of the budget): estimate each unit-action's
   marginal value with "noop-tail" playouts — one unit plays the probed
   action, every other unit idles (stageGenerateNoopTail:345-413) — and
   turn the estimates into per-unit sampling distributions
   (min-shift + ``NORMALIZATION_EPSILON``, :393-404);
2. **evaluate** (the rest): sample candidate JOINT actions from those
   distributions (stageChoosePlayerActionByDist:725-760) and run
   sequential halving — log2(N) rounds, each playing every surviving
   candidate equally often and keeping the better half
   (stageEvaluateHalving:760-790).

TPU shape: per-unit statistics live in a dense ``[H, W, A]`` arm table
(ops/arms.py); the G generation probes are one vmapped batch of playouts,
and each halving round is one vmapped batch over the surviving candidates,
so the whole decision is a single jitted program and whole tournaments of
LSI games batch with ``vmap``.

Documented divergences (budget shape, not algorithm):

* Java enumerates every (unit, action) pair once with
  ``split*budget/pairs`` playouts each; here G probes draw (cell, arm)
  pairs uniformly at random — the same noop-tail estimator, Monte-Carlo
  allocated (pair counts are data-dependent and would break jit);
* candidate count N and probe count G are static parameters; Java derives
  them from the wall-clock budget;
* halving ties break by candidate index (Java: list order).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..engine.types import State
from ..env.gridnet import GridnetEnv
from ..ops.arms import (arm_masks, arm_space, arms_to_action, one_hot_arms,
                        sample_arms)
from ..ops.evaluation import simple_sqrt_eval3
from ..ops.playout import make_playout
from .scripted import random_bot

EPS = 0.01  # NORMALIZATION_EPSILON (LSI.java:43)


def lsi_bot(env: GridnetEnv, n_probes: int = 24, n_candidates: int = 8,
            eval_per_round: int = 2, playout_len: int = 48,
            eval_fn: Optional[Callable] = None,
            n_decisions: Optional[int] = None):
    """LSI bot.  Budget analog of ITERATIONS_BUDGET*split = ``n_probes``
    generation playouts; the evaluation stage plays
    ``eval_per_round * sum_r N/2^r`` playouts over ``log2(n_candidates)``
    halving rounds.  ``n_candidates`` must be a power of two."""
    assert n_candidates & (n_candidates - 1) == 0, "power of two"
    ecfg = env.cfg.engine
    H, W = env.h, env.w
    sp = arm_space(env)
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    rollout = random_bot(env, 5.0)
    rounds = max(1, n_candidates.bit_length() - 1)
    cont = make_playout(env, playout_len, eval_fn, gamma=1.0,
                        rollout_bot=rollout, n_decisions=n_decisions)

    def playout_value(state, cand_action, player, key):
        """First tick: candidate vs RandomBiased; then the shared
        fast-forward playout (Sampling.evaluatePlayerAction semantics)."""
        k0, key = jax.random.split(key)
        opp = rollout(state, 1 - player, k0)
        s, _, _ = env.step(
            state,
            jnp.where(jnp.int32(player) == 0, cand_action, opp),
            jnp.where(jnp.int32(player) == 0, opp, cand_action))
        return cont(s, player, state.time, key)

    def bot(state: State, player, key):
        m = env.engine.legal_masks(state, player)
        la = arm_masks(sp, m)                      # [H, W, A] legal arms
        acting = m["can_act"]                      # [H, W]

        # ---- stage 1: generation (noop-tail probes) --------------------
        def probe(k):
            kc, ka, kp = jax.random.split(k, 3)
            flat = acting.reshape(-1).astype(jnp.float32)
            cell = jax.random.categorical(
                kc, jnp.where(flat > 0, 0.0, -jnp.inf))
            cell_oh = (jnp.arange(H * W) == cell).reshape(H, W)
            arms = sample_arms(sp, ka, la.astype(jnp.float32),
                               cell_oh & acting)
            v = playout_value(state, arms_to_action(sp, arms), player, kp)
            return one_hot_arms(sp, arms), v

        key, kg = jax.random.split(key)
        ohs, vals = jax.vmap(probe)(jax.random.split(kg, n_probes))
        tvis = jnp.sum(ohs, 0)                          # [H, W, A]
        tacc = jnp.sum(jnp.where(ohs, vals[:, None, None, None], 0.0), 0)

        # distributions (stageGenerateNoopTail:393-404): mean, min-shifted
        # + EPS over legal arms; unprobed legal arms keep EPS
        mean = tacc / jnp.maximum(tvis, 1)
        probed = la & (tvis > 0)
        minv = jnp.min(jnp.where(probed, mean, jnp.inf), -1, keepdims=True)
        minv = jnp.where(jnp.isfinite(minv), minv, 0.0)
        w = jnp.where(probed, mean - minv + EPS,
                      jnp.where(la, EPS, 0.0))

        # ---- stage 2: candidates + sequential halving ------------------
        key, ks, kh = jax.random.split(key, 3)
        cands = jax.vmap(lambda k: sample_arms(sp, k, w, acting))(
            jax.random.split(ks, n_candidates))        # [N, H, W]
        acts = jax.vmap(lambda a: arms_to_action(sp, a))(cands)

        alive = jnp.ones(n_candidates, bool)
        acc = jnp.zeros(n_candidates)
        cnt = jnp.zeros(n_candidates, jnp.int32)
        for r in range(rounds):
            kh, kr = jax.random.split(kh)
            keys = jax.random.split(kr, n_candidates * eval_per_round) \
                .reshape(n_candidates, eval_per_round, -1)
            vs = jax.vmap(lambda a, kk: jax.vmap(
                lambda k1: playout_value(state, a, player, k1))(kk))(
                    acts, keys)                         # [N, E]
            acc = acc + jnp.where(alive, vs.sum(-1), 0.0)
            cnt = cnt + jnp.where(alive, eval_per_round, 0)
            mean_c = acc / jnp.maximum(cnt, 1)
            # keep the top half of the living (halvedOriginalSampling)
            score = jnp.where(alive, mean_c, -jnp.inf)
            k_keep = max(1, n_candidates >> (r + 1))
            kth = jnp.sort(score)[n_candidates - k_keep]
            alive = alive & (score >= kth)
            # cap survivors at k_keep on ties: prefer lower index
            idx_rank = jnp.cumsum(alive.astype(jnp.int32))
            alive = alive & (idx_rank <= k_keep)

        best = jnp.argmax(jnp.where(alive, acc / jnp.maximum(cnt, 1),
                                    -jnp.inf))
        # dense select (no gather): N is tiny
        sel = (jnp.arange(n_candidates) == best)[:, None, None, None]
        act = jnp.sum(jnp.where(sel, acts, 0), axis=0)
        can = jnp.any(acting)
        return jnp.where(can, act, jnp.zeros_like(act))

    return bot
