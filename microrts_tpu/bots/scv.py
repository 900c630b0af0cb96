"""SCV — Strategy Creation via Voting (Silva et al., ToG 2018).

TPU re-design of ai/scv/SCV.java: every strategy in the pool proposes a
full PlayerAction and each UNIT plays the action most strategies voted
for (getBestActionSoFar:215-290 — per-unit majority over the pool, first
max wins).  The Java implementation walks TreeMaps per unit; here the K
strategies' gridnet action planes stack to ``[K, H, W, 7]`` and the vote
is a dense per-cell pairwise-equality count — one fused program, vmaps
over whole tournaments.

Pool selection (SCV.java:115-175, 356-455, 499-536): the reference ships
per-map-height battle statistics (models/ltdsFinais*.csv — the ltd3
score of each candidate POOL against each of 5 enemy ARCHETYPES
{POLightRush, POWorkerRush, PORangedRush, EconomyRush, POHeavyRush}) and
a weka SimpleLogistic that classifies the enemy from its composition;
the pool with the best distribution-weighted ltd3 wins
(getStrategyByDistribution:499-536) and its named bots vote
(setNewStrategy:538-582, substring matching).  Here that whole decision
is IN-GRAPH: the 381-pool ltd3 matrix and the pool→bot membership matrix
are static arrays baked from the same bundled CSVs
(assets/scv/ltdsFinais*.csv, verbatim reference data), the enemy
composition is counted from the state planes, and the winning pool's
membership row becomes the vote-weight vector — the pool "changes" by
reweighting, not recompiling, so the adaptive SCV stays one jitted
program.

Documented divergences:

* the serialized weka SimpleLogistic (models/SimpleLogisticSCV*.model)
  is a JVM-only binary; the archetype distribution here is a transparent
  softmax over composition scores of the SAME feature vector
  (recordInfo:394-449: enemy bases/barracks/workers/light/heavy/ranged)
  — light/ranged/heavy mass votes for the matching rush, extra bases
  for EconomyRush, worker mass for POWorkerRush;
* Java reclassifies at exact 1000-tick boundaries and keeps the pool in
  between (tryClassify:361); here the pool is recomputed from the
  CURRENT composition at every decision frame (same features, fresher);
  before tick 1000 both use the hardcoded per-height opening pool
  (tryClassify:363-389);
* Java's substring pool parsing silently drops "EMRDeterministico"
  (no `contains` case matches it, setNewStrategy:538-576) — reproduced
  byte-for-byte by using the same substring scan over the same strings.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.types import State
from ..env.gridnet import GridnetEnv
from ..utils.assets import asset_path
from .scripted import light_rush, random_bot, ranged_rush, worker_rush

# archetype order matches the pond formula's distrib indices
# (getStrategyByDistribution:528: [0]*light + [1]*worker + [2]*ranged
#  + [3]*economy + [4]*heavy)
ARCHETYPES = ("POLightRush", "POWorkerRush", "PORangedRush",
              "EconomyRush", "POHeavyRush")

# the substring scan of setNewStrategy:538-576, in Java check order
POOL_BOTS = ("POWorkerRush", "WorkerRushPlusPlus", "POLightRush",
             "EconomyRush", "RandomBiasedAI", "POHeavyRush",
             "PORangedRush", "LightDefense", "RangedDefense",
             "WorkerDefense", "EconomyMilitaryRush", "HeavyDefense")

# hardcoded per-height OPENING pools (tryClassify:363-389)
_OPENING = {
    8: ("WorkerRushPlusPlus", "WorkerDefense"),
    16: ("WorkerRushPlusPlus",),
    24: ("WorkerRushPlusPlus", "WorkerDefense", "LightDefense"),
    32: ("POLightRush", "WorkerDefense", "EconomyMilitaryRush"),
    64: ("POLightRush", "EconomyMilitaryRush", "WorkerDefense"),
}


def _csv_for_height(h: int) -> str:
    """loadLtd3Battles' height switch (SCV.java:123-147)."""
    name = {8: "8", 9: "9", 16: "16", 24: "24", 32: "32",
            64: "64"}.get(h)
    return asset_path(f"scv/ltdsFinais{name}.csv" if name
                      else "scv/ltdsFinaisSCV.csv")


def load_pool_tables(height: int):
    """Static (ltd3 [P, 5], membership [P, K]) from the bundled CSV.

    One row per distinct pool string; ltd3 columns in ARCHETYPES order
    (missing archetype entries stay 0.0, like the uninitialized locals
    of getStrategyByDistribution:505); membership by the Java substring
    scan."""
    pools: dict = {}
    for ln in open(_csv_for_height(height)):
        parts = ln.strip().split(";")
        if len(parts) != 4:
            continue
        ltd3, _tm, enemy, pool = parts
        pools.setdefault(pool, {})[enemy] = float(ltd3)
    names = sorted(pools)
    P, K = len(names), len(POOL_BOTS)
    ltd = np.zeros((P, len(ARCHETYPES)), np.float32)
    mem = np.zeros((P, K), np.float32)
    for i, nm in enumerate(names):
        for j, e in enumerate(ARCHETYPES):
            ltd[i, j] = pools[nm].get(e, 0.0)
        for k, b in enumerate(POOL_BOTS):
            if b in nm:                       # Java String.contains
                mem[i, k] = 1.0
    # a pool that parses to NO bots can never vote; keep it unselectable
    dead = mem.sum(-1) == 0
    ltd[dead] = -np.inf
    return ltd, mem, names


def _archetype_distribution(state: State, me, cfg):
    """Transparent stand-in for the weka logistic: softmax over enemy
    composition scores (same features as recordInfo:394-449).
    ``cfg`` is the GridnetConfig (carries the named type ids)."""
    t = jnp.clip(state.utype - 1, 0, cfg.engine.num_types - 1)
    exists = state.utype > 0
    enemy = exists & (state.owner >= 0) & (state.owner != me)

    def count(name):
        tid = getattr(cfg, f"{name}_id", -1)
        if tid < 0:
            return jnp.float32(0.0)
        return jnp.sum(enemy & (t == tid)).astype(jnp.float32)

    n_base = count("base")
    n_barracks = count("barracks")
    n_worker = count("worker")
    n_light = count("light")
    n_heavy = count("heavy")
    n_ranged = count("ranged")
    scores = jnp.stack([
        n_light,                                   # POLightRush
        0.5 * n_worker + (n_barracks == 0),        # POWorkerRush
        n_ranged,                                  # PORangedRush
        2.0 * jnp.maximum(n_base - 1.0, 0.0),      # EconomyRush
        n_heavy,                                   # POHeavyRush
    ])
    return jax.nn.softmax(scores)


def scv_bot(env: GridnetEnv,
            strategies: Optional[Sequence[Callable]] = None,
            weights: Optional[Sequence[float]] = None,
            adaptive: bool = False):
    """Per-unit voting over the strategy pool.

    Default pool mirrors the default ctor SCV.java:78-83: WorkerRush,
    LightRush, RangedRush, RandomBiasedAI with uniform votes.
    ``adaptive=True`` is the full model: the 12-bot POOL_BOTS stack
    votes with weights chosen in-graph by the battle-statistics pool
    selector (see module docstring)."""
    if adaptive:
        return _scv_adaptive(env)
    if strategies is None:
        strategies = [worker_rush(env), light_rush(env), ranged_rush(env),
                      random_bot(env, 5.0)]
    K = len(strategies)
    w = jnp.asarray([1.0] * K if weights is None else list(weights))
    return _vote_bot(env, strategies, lambda s, p: w)


def _scv_adaptive(env: GridnetEnv):
    from . import scripted as S
    ecfg = env.cfg
    mk = {
        "POWorkerRush": S.po_worker_rush, "WorkerRushPlusPlus":
        S.worker_rush_plus_plus, "POLightRush": S.po_light_rush,
        "EconomyRush": S.economy_rush,
        "RandomBiasedAI": lambda e: S.random_bot(e, 5.0),
        "POHeavyRush": S.po_heavy_rush, "PORangedRush": S.po_ranged_rush,
        "LightDefense": S.light_defense, "RangedDefense": S.ranged_defense,
        "WorkerDefense": S.worker_defense,
        "EconomyMilitaryRush": S.economy_military_rush,
        "HeavyDefense": S.heavy_defense,
    }
    strategies = [mk[b](env) for b in POOL_BOTS]
    ltd_np, mem_np, _ = load_pool_tables(env.h)
    ltd = jnp.asarray(np.where(np.isfinite(ltd_np), ltd_np, -1e30))
    mem = jnp.asarray(mem_np)
    opening = _OPENING.get(env.h, ("EconomyMilitaryRush",))
    w_open = jnp.asarray([1.0 if b in opening else 0.0
                          for b in POOL_BOTS])

    def pick_weights(state: State, player):
        me = jnp.int32(player)
        distrib = _archetype_distribution(state, me, ecfg)
        pond = ltd @ distrib                       # [P]
        row = jax.lax.dynamic_index_in_dim(
            mem, jnp.argmax(pond).astype(jnp.int32), 0, keepdims=False)
        # before the first Java reclassification tick, the opening pool
        return jnp.where(state.time >= 1000, row, w_open)

    return _vote_bot(env, strategies, pick_weights)


def _vote_bot(env: GridnetEnv, strategies: Sequence[Callable],
              weight_fn: Callable):
    K = len(strategies)

    def bot(state: State, player, key):
        w = weight_fn(state, player)
        keys = jax.random.split(key, K)
        acts = jnp.stack([strategies[k](state, player, keys[k])
                          for k in range(K)])          # [K, H, W, 7]
        # per-cell vote count for k's proposal = sum of weights of
        # strategies proposing the identical action vector
        same = jnp.all(acts[:, None] == acts[None, :], axis=-1)  # [K,K,H,W]
        votes = jnp.sum(jnp.where(same, w[None, :, None, None], 0.0), 1)
        # zero-weight strategies may not WIN a vote either (they are not
        # in the pool); first max wins (Java keeps the earliest max
        # :264-278)
        votes = jnp.where(w[:, None, None] > 0, votes, -1.0)
        order = votes - jnp.arange(K)[:, None, None] * 1e-6
        best = jnp.argmax(order, axis=0)               # [H, W]
        sel = best[None] == jnp.arange(K)[:, None, None]
        return jnp.sum(jnp.where(sel[..., None], acts, 0), axis=0)

    return bot
