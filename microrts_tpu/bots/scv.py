"""SCV — Strategy Creation via Voting (Silva et al., ToG 2018).

TPU re-design of ai/scv/SCV.java: every strategy in the pool proposes a
full PlayerAction and each UNIT plays the action most strategies voted
for (getBestActionSoFar:215-290 — per-unit majority over the pool, first
max wins).  The Java implementation walks TreeMaps per unit; here the K
strategies' gridnet action planes stack to ``[K, H, W, 7]`` and the vote
is a dense per-cell pairwise-equality count — one fused program, vmaps
over whole tournaments.

The reference also ships per-map-height battle statistics
(models/ltdsFinais*.csv, loadLtd3Battles:115-175) and a weka logistic
model to shrink the pool per map; the TPU analog is ``weights`` — a
per-strategy vote weight the caller derives from recorded tournament
tables (eval/tournament.round_robin produces them batched).  Uniform
weights = the default SCV pool vote.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..engine.types import State
from ..env.gridnet import GridnetEnv
from .scripted import light_rush, random_bot, ranged_rush, worker_rush


def scv_bot(env: GridnetEnv,
            strategies: Optional[Sequence[Callable]] = None,
            weights: Optional[Sequence[float]] = None):
    """Per-unit voting over the strategy pool.  Default pool mirrors
    SCV.java:78-83: WorkerRush, LightRush, RangedRush, RandomBiasedAI."""
    if strategies is None:
        strategies = [worker_rush(env), light_rush(env), ranged_rush(env),
                      random_bot(env, 5.0)]
    K = len(strategies)
    w = jnp.asarray([1.0] * K if weights is None else list(weights))

    def bot(state: State, player, key):
        keys = jax.random.split(key, K)
        acts = jnp.stack([strategies[k](state, player, keys[k])
                          for k in range(K)])          # [K, H, W, 7]
        # per-cell vote count for k's proposal = sum of weights of
        # strategies proposing the identical action vector
        same = jnp.all(acts[:, None] == acts[None, :], axis=-1)  # [K,K,H,W]
        votes = jnp.sum(jnp.where(same, w[None, :, None, None], 0.0), 1)
        # first max wins (Java's iterator keeps the earliest max :264-278)
        order = votes - jnp.arange(K)[:, None, None] * 1e-6
        best = jnp.argmax(order, axis=0)               # [H, W]
        sel = best[None] == jnp.arange(K)[:, None, None]
        return jnp.sum(jnp.where(sel[..., None], acts, 0), axis=0)

    return bot
