"""CooperativeAI: per-unit networks choosing (target-tile, unit-type).

TPU re-design of ai/CooperativeAI.java:20-40 + ai/units/PerUnitAI /
NetworkHelpers (the ConnAALL fork's per-unit NEAT hook, driven by
rts/MicroRTSNEAT.java:94-118 coevolution): every friendly idle unit runs
its unit-type's network over the flattened board (NetworkHelpers
.getFlattened) and outputs a TARGET TILE plus a UNIT TYPE (the last type
slot = nullop, CooperativeAI.java:99-103); the (unit, tile, type) choice
is compiled to a concrete action by the same macro rules as the Java
``unitAction`` (:112-173): buildings train, harvesters run the
harvest/return loop toward a resource target, attack enemies on the
target tile, build immovable types, otherwise move toward the tile.

Design mapping (documented divergences):

* the vendored jNEAT topology-evolving networks become PER-UNIT-TYPE
  SSVD genomes (models/ssvd.py — the fork's own chromosome codec) over a
  fixed MLP; evolve them with train/es.py (the MicroRTSNEAT workload),
  one genome row per unit type like CoevolutionManager's per-type
  populations (CoevolutionManager.java:16-58);
* AbstractionLayerAI's A* pathing becomes a greedy step toward the
  target (the reference's own GreedyPathFinding variant) with the A*
  tie order down, left, up, right (AStarPathFinding.java:73-76);
* fresh genomes are PRNG-initialized — like unevolved NEAT nets, the
  bot plays arbitrarily until evolved.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..engine import kernel as K
from ..engine.kernel import make_lookup
from ..engine.types import ATTACK, HARVEST, MOVE, NONE, PRODUCE, RETURN, State
from ..env.gridnet import GridnetEnv
from ..models.ssvd import genome_size, logits_net
from ..ops.fields import distance_field
from .scripted import _set

# A* expansion tie order down, left, up, right as direction indices
# (DIR_X/DIR_Y order: 0=up, 1=right, 2=down, 3=left)
_TIE = (2, 3, 0, 1)


def cooperative_dims(env: GridnetEnv, hidden: int = 32):
    """(layer dims, out split) of the per-unit network: flattened 6-plane
    observation + own (x, y) + own-type one-hot -> [H*W tile logits,
    T+1 type logits] (last type = nullop)."""
    T = env.cfg.engine.num_types
    H, W = env.h, env.w
    return (6 * H * W + 2 + T, hidden, H * W + T + 1)


def cooperative_genome_spec(env: GridnetEnv, hidden: int = 32,
                            rank: int = 4):
    """(per-type genome length, layer dims) for ES over [T, G] genomes."""
    dims = cooperative_dims(env, hidden)
    return genome_size(dims, rank), dims


def cooperative_bot(env: GridnetEnv, genomes: Optional[jax.Array] = None,
                    hidden: int = 32, rank: int = 4, seed: int = 0,
                    apply_fn=None):
    """``bot(state, player, key) -> [H, W, 7]``.  ``genomes``: [T, G]
    per-unit-type SSVD genome matrix (see ``cooperative_genome_spec``).
    ``apply_fn(ti, xs [HW, in]) -> [HW, out]`` overrides the per-type
    network (e.g. a compiled NEAT net, train/neat.py), replacing the
    SSVD genome path."""
    cfg = env.cfg.engine
    T = cfg.num_types
    H, W = env.h, env.w
    R = cfg.max_range
    D = 2 * R + 1
    dims = cooperative_dims(env, hidden)
    if genomes is None:
        genomes = 0.1 * jax.random.normal(jax.random.PRNGKey(seed),
                                          (T, genome_size(dims, rank)))
    lk_move = make_lookup(cfg.can_move, bool)
    lk_harv = make_lookup(cfg.can_harvest, bool)
    lk_atk = make_lookup(cfg.can_attack, bool)
    lk_stock = make_lookup(cfg.is_stockpile, bool)
    lk_res = make_lookup(cfg.is_resource, bool)
    lk_range = make_lookup(cfg.attack_range)
    lk_cost = make_lookup(cfg.cost)
    lk_move_t = make_lookup(cfg.can_move + (False,), bool)  # +nullop slot

    def bot(state: State, player, key):
        me = jnp.int32(player)
        t = jnp.clip(state.utype - 1, 0, T - 1)
        exists = state.utype > 0
        mine = exists & (state.owner == me)
        enemy = exists & (state.owner >= 0) & (state.owner != me)
        idle = mine & ~state.busy
        resource = exists & lk_res(t)
        my_base = mine & lk_stock(t)
        passable = (state.terrain == 0) & ~exists
        free_n = jnp.stack([K.pull(passable, d, fill=False)
                            for d in range(4)], -1)       # [H, W, 4]
        balance = jnp.where(me == 1, state.resources[1], state.resources[0])
        d_base = distance_field(my_base, passable, H + W)

        # ---- per-unit network: (tile, type) choices -------------------
        obs = env.observation(state, player).astype(jnp.float32)
        obs_flat = obs.reshape(-1) / 10.0
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        pos = jnp.stack([xs.reshape(-1) / W, ys.reshape(-1) / H],
                        -1).astype(jnp.float32)            # [HW, 2]
        type_oh = jax.nn.one_hot(t.reshape(-1), T)          # [HW, T]
        cell_in = jnp.concatenate(
            [jnp.broadcast_to(obs_flat, (H * W,) + obs_flat.shape),
             pos, type_oh], -1)                             # [HW, in]

        out = jnp.zeros((H * W, dims[-1]), jnp.float32)
        for ti in range(T):   # per-type nets; select by cell type (no gather)
            if apply_fn is not None:
                o_t = apply_fn(ti, cell_in)
            else:
                o_t = jax.vmap(
                    lambda x: logits_net(genomes[ti], x, dims, rank))(cell_in)
            out = jnp.where((t.reshape(-1) == ti)[:, None], o_t, out)
        tile = jnp.argmax(out[:, :H * W], -1).reshape(H, W)   # target tile
        typ = jnp.argmax(out[:, H * W:], -1).reshape(H, W)    # type / nullop
        tx, ty = tile % W, tile // W
        nullop = typ == T

        # ---- target-tile properties (read densely at each unit's cell:
        # shift the board by every offset is O(HW^2); instead compare the
        # one-hot target against class masks via a flat dot — HW is small)
        tgt_oh = jax.nn.one_hot(tile.reshape(-1), H * W,
                                dtype=jnp.float32)          # [HW, HW]

        def at_target(plane):
            return (tgt_oh @ plane.reshape(-1).astype(jnp.float32)
                    ).reshape(H, W)

        tgt_resource = at_target(resource) > 0
        tgt_enemy = at_target(enemy) > 0

        # ---- movement: greedy step toward (tx, ty), A* tie order ------
        dx = tx - xs
        dy = ty - ys
        man = jnp.abs(dx) + jnp.abs(dy)
        DIRX = (0, 1, 0, -1)
        DIRY = (-1, 0, 1, 0)
        best_dir = jnp.full((H, W), -1, jnp.int32)
        best_gain = jnp.zeros((H, W), jnp.int32)
        for d in _TIE:
            man_d = jnp.abs(dx - DIRX[d]) + jnp.abs(dy - DIRY[d])
            gain = man - man_d
            better = free_n[..., d] & (gain > best_gain)
            best_dir = jnp.where(better, d, best_dir)
            best_gain = jnp.where(better, gain, best_gain)
        can_step = best_dir >= 0

        # adjacency direction of the target tile (for harvest/return)
        adj_dir = jnp.select(
            [(dx == 0) & (dy == -1), (dx == 1) & (dy == 0),
             (dx == 0) & (dy == 1), (dx == -1) & (dy == 0)],
            [0, 1, 2, 3], -1)
        # in attack range of the target tile (squared Euclidean,
        # Unit.java:424-435)
        rng = lk_range(t)
        in_rng = (dx * dx + dy * dy <= rng * rng) & (man > 0)
        rel = jnp.clip((R + dy) * D + (R + dx), 0, D * D - 1)

        carrying = state.carried > 0
        adj_base = jnp.stack([K.pull(my_base, d, fill=False)
                              for d in range(4)], -1)
        mdir_b = jnp.full((H, W), -1, jnp.int32)
        for d in _TIE:   # greedy descent of the base distance field
            closer = free_n[..., d] & (
                K.pull(d_base, d, fill=H + W) < jnp.minimum(
                    jnp.min(jnp.stack([K.pull(d_base, dd, fill=H + W)
                                       for dd in range(4)]), 0),
                    H + W) + 1) & (mdir_b < 0)
            mdir_b = jnp.where(closer, d, mdir_b)

        out_a = jnp.zeros((H, W, 7), jnp.int32)
        act = idle & ~nullop
        immobile = ~lk_move(t)
        harvester = lk_harv(t)
        attacker = lk_atk(t)
        typ_movable = lk_move_t(jnp.clip(typ, 0, T))
        free_any = jnp.any(free_n, -1)
        tdir = jnp.argmax(free_n, -1).astype(jnp.int32)
        afford = balance >= lk_cost(jnp.clip(typ, 0, T - 1))

        # 1. buildings train movable types (CooperativeAI.java:131-133)
        train = act & immobile & typ_movable & free_any & afford
        out_a = _set(out_a, train, PRODUCE, pdir=tdir,
                     ptype=jnp.clip(typ, 0, T - 1))

        # 2. harvesters (:135-160)
        h = act & harvester & ~immobile
        h_res = h & tgt_resource & ~carrying
        out_a = _set(out_a, h_res & (adj_dir >= 0), HARVEST,
                     hdir=jnp.maximum(adj_dir, 0))
        out_a = _set(out_a, h_res & (adj_dir < 0) & can_step, MOVE,
                     mdir=best_dir)
        # carrying: deposit (the Harvest macro's return half)
        h_ret = h & tgt_resource & carrying
        ret_dir = jnp.argmax(adj_base, -1).astype(jnp.int32)
        out_a = _set(out_a, h_ret & jnp.any(adj_base, -1), RETURN,
                     rdir=ret_dir)
        out_a = _set(out_a, h_ret & ~jnp.any(adj_base, -1) & (mdir_b >= 0),
                     MOVE, mdir=mdir_b)
        h_atk = h & ~tgt_resource & tgt_enemy & attacker
        out_a = _set(out_a, h_atk & in_rng, ATTACK, rel=rel)
        out_a = _set(out_a, h_atk & ~in_rng & can_step, MOVE, mdir=best_dir)
        h_build = h & ~tgt_resource & ~tgt_enemy & ~typ_movable \
            & free_any & afford
        out_a = _set(out_a, h_build, PRODUCE, pdir=tdir,
                     ptype=jnp.clip(typ, 0, T - 1))
        h_move = h & ~tgt_resource & ~tgt_enemy & typ_movable & can_step
        out_a = _set(out_a, h_move, MOVE, mdir=best_dir)

        # 3. movers (:161-173)
        m = act & ~harvester & ~immobile
        m_atk = m & tgt_enemy & attacker
        out_a = _set(out_a, m_atk & in_rng, ATTACK, rel=rel)
        out_a = _set(out_a, m_atk & ~in_rng & can_step, MOVE, mdir=best_dir)
        out_a = _set(out_a, m & ~tgt_enemy & can_step, MOVE, mdir=best_dir)
        return out_a

    return bot
