"""On-device scripted bots.

TPU-native re-designs of the reference's baseline and rush AIs (SURVEY.md
§2.3): every bot is a pure jittable function
``bot(state, player, key) -> int32[H, W, 7]`` producing gridnet action
tensors that are fed through the env's decode (the same path a Java
PlayerAction takes through issueSafe), so bots compose with vmap'd rollouts
and live entirely on device — replacing the host-side Java bot objects of
ai/PassiveAI.java, ai/RandomBiasedAI.java:25-60, and
ai/abstraction/{Worker,Light,Heavy,Ranged}Rush.java.

Rush-bot movement uses multi-source BFS distance fields (ops/fields.py) in
place of per-unit A*; target selection ("attack closest enemy",
WorkerRush.java:98-120) is realized by descending the distance field of the
whole enemy set, which reaches the nearest enemy by construction.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..engine import kernel as K
from ..engine.kernel import make_lookup
from ..engine.types import ATTACK, HARVEST, MOVE, PRODUCE, RETURN, State
from ..env.gridnet import GridnetEnv
from ..ops.fields import descend_direction, distance_field


def passive_bot(env: GridnetEnv):
    """PassiveAI (ai/PassiveAI.java:28-55): never acts."""
    def bot(state: State, player, key):
        return jnp.zeros((env.h, env.w, 7), jnp.int32)
    return bot


def random_bot(env: GridnetEnv, bias: float = 1.0):
    """RandomAI (bias=1) / RandomBiasedAI (bias=5: attack, harvest and
    return weighted 5x, RandomBiasedAI.java:25-60).  Samples one legal
    action per unit from the env masks; cumulative consistency is enforced
    downstream by the decode, like PlayerActionGenerator.getRandom."""
    H, W = env.h, env.w
    T = env.cfg.engine.num_types
    D = 2 * env.cfg.engine.max_range + 1

    def bot(state: State, player, key):
        m = env.engine.legal_masks(state, player)
        k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
        tw = jnp.asarray([1.0, 1.0, bias, bias, 1.0, bias])

        def cat(key, logits_mask, weights=None):
            w = jnp.where(logits_mask, 1.0 if weights is None else weights,
                          0.0)
            w = jnp.where(jnp.any(logits_mask, -1, keepdims=True),
                          w, jnp.ones_like(w))
            return jax.random.categorical(key, jnp.log(w + 1e-9), axis=-1)

        at = cat(k1, m["type"].astype(bool), tw)
        mv = cat(k2, m["move"].astype(bool))
        hv = cat(k3, m["harvest"].astype(bool))
        rt = cat(k4, m["ret"].astype(bool))
        # produce: joint (dir, type) then split
        pp = m["produce_pair"].reshape(H, W, -1).astype(bool)
        pj = cat(k5, pp)
        pd, pt = pj // T, pj % T
        ak = cat(k6, m["attack"].astype(bool))
        out = jnp.stack([at, mv, hv, rt, pd, pt, ak], axis=-1)
        return jnp.where(m["can_act"][..., None], out, 0).astype(jnp.int32)

    return bot


@dataclasses.dataclass(frozen=True)
class RushSpec:
    """Which rush: combat type trained, whether to build barracks first."""
    combat_type: str = "Worker"   # Worker | Light | Heavy | Ranged
    n_harvesters: int = 1


def rush_bot(env: GridnetEnv, spec: RushSpec = RushSpec()):
    """WorkerRush / LightRush / HeavyRush / RangedRush
    (ai/abstraction/WorkerRush.java:63-204 and siblings):
      - base trains Workers while affordable;
      - (non-worker rushes) a worker builds a Barracks once affordable,
        and the Barracks trains the combat type;
      - the first ``n_harvesters`` workers run the harvest loop
        (Harvest.java:72-114: harvest adjacent / return adjacent / walk);
      - every other combat-capable unit attack-moves to the nearest enemy.
    """
    cfg = env.cfg
    ecfg = cfg.engine
    H, W, T = env.h, env.w, ecfg.num_types
    R = ecfg.max_range
    D = 2 * R + 1
    COST = tuple(ecfg.cost)
    lk_atk = make_lookup(ecfg.can_attack, bool)
    lk_harv = make_lookup(ecfg.can_harvest, bool)
    lk_res = make_lookup(ecfg.is_resource, bool)
    lk_stock = make_lookup(ecfg.is_stockpile, bool)
    lk_range = make_lookup(ecfg.attack_range)
    combat_id = getattr(cfg, f"{spec.combat_type.lower()}_id")
    need_barracks = spec.combat_type != "Worker" and cfg.barracks_id >= 0
    iters = H + W

    def bot(state: State, player, key):
        me = jnp.int32(player)
        t = jnp.clip(state.utype - 1, 0, T - 1)
        exists = state.utype > 0
        mine = exists & (state.owner == me)
        idle = mine & ~state.busy
        enemy = exists & (state.owner >= 0) & (state.owner != me)
        resource = exists & lk_res(t)
        my_base = mine & lk_stock(t)
        my_barracks = mine & (t == cfg.barracks_id) if need_barracks \
            else jnp.zeros_like(mine)

        passable = (state.terrain == 0) & ~exists
        free_n = jnp.stack([K.pull(passable, d, fill=False)
                            for d in range(4)], -1)
        d_enemy = distance_field(enemy, passable, iters)
        d_res = distance_field(resource, passable, iters)
        d_base = distance_field(my_base, passable, iters)

        balance = jnp.where(me == 1, state.resources[1],
                            state.resources[0])

        out = jnp.zeros((H, W, 7), jnp.int32)

        # ---- base: train workers (WorkerRush.baseBehavior)
        train_w = (idle & my_base & (cfg.worker_id >= 0)
                   & (balance >= COST[max(cfg.worker_id, 0)])
                   & jnp.any(free_n, -1))
        tdir = jnp.argmax(free_n, -1).astype(jnp.int32)
        out = _set(out, train_w, PRODUCE, pdir=tdir, ptype=cfg.worker_id)

        # ---- barracks: train the combat type
        if need_barracks:
            train_c = (idle & my_barracks
                       & (balance >= COST[max(combat_id, 0)])
                       & jnp.any(free_n, -1))
            out = _set(out, train_c, PRODUCE, pdir=tdir, ptype=combat_id)

        # ---- harvesters: lowest-uid workers run the harvest loop
        worker = mine & lk_harv(t)
        harv_rank = _rank_by_uid(worker, state.uid)
        is_harv = worker & (harv_rank < spec.n_harvesters)
        hu = idle & is_harv
        adj_res = jnp.stack([K.pull(resource, d, fill=False)
                             for d in range(4)], -1)
        adj_base = jnp.stack([K.pull(my_base, d, fill=False)
                              for d in range(4)], -1)
        carrying = state.carried > 0
        # carrying: return if adjacent else walk to base
        do_ret = hu & carrying & jnp.any(adj_base, -1)
        out = _set(out, do_ret, RETURN,
                   rdir=jnp.argmax(adj_base, -1).astype(jnp.int32))
        walk_b = hu & carrying & ~jnp.any(adj_base, -1)
        mdir_b = descend_direction(d_base, free_n)
        out = _set(out, walk_b & (mdir_b >= 0), MOVE, mdir=mdir_b)
        # empty: harvest if adjacent else walk to resource
        do_hv = hu & ~carrying & jnp.any(adj_res, -1)
        out = _set(out, do_hv, HARVEST,
                   hdir=jnp.argmax(adj_res, -1).astype(jnp.int32))
        walk_r = hu & ~carrying & ~jnp.any(adj_res, -1)
        mdir_r = descend_direction(d_res, free_n)
        out = _set(out, walk_r & (mdir_r >= 0), MOVE, mdir=mdir_r)

        # ---- builder: first idle worker (after harvesters) builds barracks
        if need_barracks:
            builder_rank = jnp.int32(spec.n_harvesters)
            no_barracks = ~jnp.any(my_barracks)
            build = (idle & worker & (harv_rank == builder_rank)
                     & no_barracks & (balance >= COST[max(cfg.barracks_id, 0)])
                     & jnp.any(free_n, -1))
            out = _set(out, build, PRODUCE, pdir=tdir, ptype=cfg.barracks_id)
            fighter_min_rank = spec.n_harvesters + 1
        else:
            fighter_min_rank = spec.n_harvesters

        # ---- fighters: attack in range else move toward nearest enemy
        fighter = (idle & mine & lk_atk(t)
                   & (~worker | (harv_rank >= fighter_min_rank)))
        rng = lk_range(t)
        # nearest in-range enemy: scan the (2R+1)^2 disc, closest-first
        best = jnp.full((H, W), 0, jnp.int32)
        found = jnp.zeros((H, W), bool)
        offs = sorted(((dx * dx + dy * dy, dx, dy)
                       for dy in range(-R, R + 1) for dx in range(-R, R + 1)),
                      key=lambda z: z[0])
        for d2, dx, dy in offs:
            if d2 == 0:
                continue
            e_at = K._shift(enemy, -dx, -dy, fill=False) & (d2 <= rng * rng)
            rel = (R + dy) * D + (R + dx)
            best = jnp.where(~found & e_at, rel, best)
            found = found | e_at
        do_atk = fighter & found
        out = _set(out, do_atk, ATTACK, rel=best)
        mdir_e = descend_direction(d_enemy, free_n)
        out = _set(out, fighter & ~found & (mdir_e >= 0), MOVE, mdir=mdir_e)

        return out

    return bot


def _rank_by_uid(mask: jax.Array, uid: jax.Array) -> jax.Array:
    """Rank of each masked cell by ascending unit ID (0 = oldest unit)."""
    key = jnp.where(mask, uid, jnp.int32(2 ** 30)).reshape(-1)
    order = jnp.argsort(key)
    rank = jnp.zeros_like(key).at[order].set(
        jnp.arange(key.size, dtype=jnp.int32))
    return rank.reshape(mask.shape)


def _set(out, mask, atype, mdir=None, hdir=None, rdir=None, pdir=None,
         ptype=None, rel=None):
    def put(col, val):
        return out.at[..., col].set(jnp.where(mask, val, out[..., col]))
    out = put(0, jnp.where(mask, atype, out[..., 0]))
    if mdir is not None:
        out = put(1, jnp.where(mask, mdir, out[..., 1]))
    if hdir is not None:
        out = put(2, jnp.where(mask, hdir, out[..., 2]))
    if rdir is not None:
        out = put(3, jnp.where(mask, rdir, out[..., 3]))
    if pdir is not None:
        out = put(4, jnp.where(mask, pdir, out[..., 4]))
    if ptype is not None:
        out = put(5, jnp.where(mask, ptype, out[..., 5]))
    if rel is not None:
        out = put(6, jnp.where(mask, rel, out[..., 6]))
    return out


def worker_rush(env):  # WorkerRush.java
    return rush_bot(env, RushSpec("Worker"))


def light_rush(env):   # LightRush.java
    return rush_bot(env, RushSpec("Light"))


def heavy_rush(env):   # HeavyRush.java
    return rush_bot(env, RushSpec("Heavy"))


def ranged_rush(env):  # RangedRush.java
    return rush_bot(env, RushSpec("Ranged"))


def po_wrap(env: GridnetEnv, bot):
    """Partial-observability wrapper: the bot sees only its fog-of-war view
    (ai/abstraction/partialobservability/PO*Rush.java pattern — same policy,
    applied to the PartiallyObservableGameState)."""
    from ..engine.fog import po_state

    def wrapped(state: State, player, key):
        return bot(po_state(state, player, env.cfg.engine), player, key)

    return wrapped


def po_worker_rush(env):   # POWorkerRush.java
    return po_wrap(env, worker_rush(env))


def po_light_rush(env):    # POLightRush.java
    return po_wrap(env, light_rush(env))


def po_heavy_rush(env):    # POHeavyRush.java
    return po_wrap(env, heavy_rush(env))


def po_ranged_rush(env):   # PORangedRush.java
    return po_wrap(env, ranged_rush(env))


def distribution_bot(env: GridnetEnv, type_weights):
    """UnitActionProbabilityDistributionAI (ai/stochastic/*): per-unit
    actions sampled with a learned/fixed weight per action TYPE (uniform
    over legal params within the type).  ``type_weights``: positive [6]
    (NONE, MOVE, HARVEST, RETURN, PRODUCE, ATTACK)."""
    inner = random_bot(env, 1.0)

    def bot(state: State, player, key):
        m = env.engine.legal_masks(state, player)
        w = jnp.asarray(type_weights, jnp.float32)
        tw = jnp.where(m["type"].astype(bool), w, 0.0)
        tw = jnp.where(tw.sum(-1, keepdims=True) > 0, tw,
                       jnp.ones_like(tw))
        k1, k2 = jax.random.split(key)
        at = jax.random.categorical(k1, jnp.log(tw + 1e-9), axis=-1)
        base = inner(state, player, k2)
        out = base.at[..., 0].set(jnp.where(m["can_act"], at, 0))
        return out

    return bot
