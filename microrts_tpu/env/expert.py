"""Expert/simple action interface: 13 discrete macro actions per step.

TPU-native re-design of ``ai/AALL/JNIExpertAI`` simple mode (:289-502):
  0  no-op
  1  allocate one (random) worker to resource gathering
  2  pull all workers off gathering
  3-6  send all attackers to a random position in map quadrant 1-4
  7-10 train Worker / Light / Heavy / Ranged
  11 expand: build a Base near resources, far from the current base
  12 build a Barracks near a base, away from resources
plus the background behaviors: attackers auto-attack nearby enemies and
walk to their assigned quadrant positions; gathering workers run the
harvest loop.  The 13-slot legality mask mirrors actionMask (:242-288).

Unit roles persist across ticks.  The Java side keys roles by Unit object;
here they live in uid-indexed tables (uid % TABLE capacity) carried in
``ExpertRoles`` next to the engine state.  Movement toward per-unit targets
is greedy axis-descent (the Java A* macro movement is behaviorally, not
bit-, reproduced; JNIExpertAI itself is nondeterministic via
ThreadLocalRandom, so no bit-parity target exists).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..engine import kernel as K
from ..engine.kernel import make_lookup
from ..engine.types import ATTACK, HARVEST, MOVE, PRODUCE, RETURN, State
from ..ops.fields import descend_direction, distance_field
from .gridnet import GridnetEnv

TABLE = 1024  # uid-role table capacity (uids wrap; games stay far below)
NUM_MACROS = 13


class ExpertRoles(struct.PyTreeNode):
    harvester: jax.Array   # bool[TABLE] uid -> allocated to gathering
    has_target: jax.Array  # bool[TABLE] uid -> has a quadrant target
    tgt_x: jax.Array       # int32[TABLE]
    tgt_y: jax.Array       # int32[TABLE]

    @classmethod
    def init(cls) -> "ExpertRoles":
        z = jnp.zeros(TABLE, jnp.int32)
        return cls(harvester=jnp.zeros(TABLE, bool),
                   has_target=jnp.zeros(TABLE, bool), tgt_x=z, tgt_y=z)


class ExpertEnv:
    """Wraps a GridnetEnv: discrete 13-action interface for player control,
    compiling macro decisions into gridnet tensors on device."""

    def __init__(self, env: GridnetEnv):
        self.env = env
        self.h, self.w = env.h, env.w
        cfg = env.cfg
        self.cfg = cfg
        self._lk_res = make_lookup(cfg.engine.is_resource, bool)
        self._lk_stock = make_lookup(cfg.engine.is_stockpile, bool)
        self._lk_harv = make_lookup(cfg.engine.can_harvest, bool)
        self._lk_atk = make_lookup(cfg.engine.can_attack, bool)
        self._lk_range = make_lookup(cfg.engine.attack_range)

    # ------------------------------------------------------------------
    def action_mask(self, state: State, roles: ExpertRoles, player
                    ) -> jax.Array:
        """13-slot mask (JNIExpertAI.actionMask :242-288)."""
        cfg = self.cfg
        T = cfg.engine.num_types
        t = jnp.clip(state.utype - 1, 0, T - 1)
        mine = (state.utype > 0) & (state.owner == jnp.int32(player))
        worker = mine & self._lk_harv(t)
        base = mine & self._lk_stock(t)
        barracks = mine & (t == cfg.barracks_id)
        bal = jnp.where(jnp.int32(player) == 1, state.resources[1],
                        state.resources[0])
        COST = cfg.engine.cost

        def afford(tid):
            return (tid >= 0) & (bal >= COST[max(tid, 0)])

        any_worker = jnp.any(worker)
        any_attacker = jnp.any(mine & self._lk_atk(t))
        any_base = jnp.any(base)
        any_barracks = jnp.any(barracks)
        return jnp.stack([
            jnp.asarray(True),
            # JNIExpertAI.getActionMask gates 1 (allocate) and 2 (pull)
            # on ANY worker existing (JNIExpertAI.java:251-255); macro 1
            # no-ops when all workers are already flagged (:342-353).
            any_worker, any_worker,
            any_attacker, any_attacker, any_attacker, any_attacker,
            afford(cfg.worker_id) & any_base,
            afford(cfg.light_id) & any_barracks,
            afford(cfg.heavy_id) & any_barracks,
            afford(cfg.ranged_id) & any_barracks,
            afford(cfg.base_id),
            afford(cfg.barracks_id),
        ])

    # ------------------------------------------------------------------
    def macro_to_gridnet(self, state: State, roles: ExpertRoles, player,
                         macro, key) -> Tuple[jax.Array, ExpertRoles]:
        """Apply one macro + the background behaviors; returns the gridnet
        action tensor for this tick and updated roles."""
        cfg = self.cfg
        H, W, T = self.h, self.w, cfg.engine.num_types
        me = jnp.int32(player)
        k_alloc, k_quad, k_auto = jax.random.split(key, 3)

        t = jnp.clip(state.utype - 1, 0, T - 1)
        exists = state.utype > 0
        mine = exists & (state.owner == me)
        idle = mine & ~state.busy
        enemy = exists & (state.owner >= 0) & (state.owner != me)
        resource = exists & self._lk_res(t)
        my_base = mine & self._lk_stock(t)
        my_barracks = mine & (t == cfg.barracks_id)
        worker = mine & self._lk_harv(t)
        uid_mod = jnp.where(exists, state.uid % TABLE, 0)
        harv_flag = roles.harvester[uid_mod] & worker
        attacker = mine & self._lk_atk(t) & ~harv_flag

        # ---- role updates from the macro
        # 1: allocate one random unflagged worker
        unflagged = worker & ~harv_flag
        r = jax.random.uniform(k_alloc, (H, W))
        pick_score = jnp.where(unflagged, r, -1.0)
        pick = (pick_score == jnp.max(pick_score)) & unflagged
        new_harv = roles.harvester
        # Guard: with no unflagged worker the pick-sum degenerates to slot 0,
        # which must not be spuriously flagged (mask slot 1 now also gates on
        # unflagged availability, but samplers may ignore masks).
        new_harv = jnp.where(
            (macro == 1) & jnp.any(unflagged),
            new_harv.at[jnp.where(pick, uid_mod, 0).sum()
                        ].set(True),
            new_harv)
        # 2: pull all workers
        new_harv = jnp.where(macro == 2,
                             jnp.zeros_like(new_harv), new_harv)

        # 3-6: assign all attackers a random position in the quadrant
        quad = jnp.clip(macro - 3, 0, 3)  # 0..3
        qx = (quad % 2) * (W // 2)
        qy = (quad // 2) * (H // 2)
        rx = jax.random.randint(k_quad, (), 0, max(W // 2, 1)) + qx
        ry = jax.random.randint(jax.random.fold_in(k_quad, 1), (),
                                0, max(H // 2, 1)) + qy
        is_quad_macro = (macro >= 3) & (macro <= 6)
        att_uids = jnp.where(attacker, uid_mod, 0)
        onehot = jnp.zeros(TABLE, bool).at[att_uids.reshape(-1)].set(
            attacker.reshape(-1))
        new_has_t = jnp.where(is_quad_macro, roles.has_target | onehot,
                              roles.has_target)
        new_tx = jnp.where(is_quad_macro & onehot, rx, roles.tgt_x)
        new_ty = jnp.where(is_quad_macro & onehot, ry, roles.tgt_y)
        roles = roles.replace(harvester=new_harv, has_target=new_has_t,
                              tgt_x=new_tx, tgt_y=new_ty)

        # ---- compile per-unit gridnet actions
        passable = (state.terrain == 0) & ~exists
        free_n = jnp.stack([K.pull(passable, d, fill=False)
                            for d in range(4)], -1)
        out = jnp.zeros((H, W, 7), jnp.int32)

        # training macros 7-10: one base/barracks produces
        tdir = jnp.argmax(free_n, -1).astype(jnp.int32)
        for m, tid, producer in ((7, cfg.worker_id, my_base),
                                 (8, cfg.light_id, my_barracks),
                                 (9, cfg.heavy_id, my_barracks),
                                 (10, cfg.ranged_id, my_barracks)):
            if tid < 0:
                continue
            can = idle & producer & jnp.any(free_n, -1)
            first = can & (jnp.cumsum(can.reshape(-1)).reshape(H, W) == 1)
            sel = (macro == m) & first
            out = _put(out, sel, PRODUCE, pdir=tdir, ptype=tid)

        # build macros 11/12: nearest idle worker produces adjacent toward
        # the computed site class (approximation of findExpansion/Barrack
        # Location + A* walk: the builder produces on its own free side
        # when inside the legal zone, else walks toward the zone)
        d_res = distance_field(resource, passable, H + W)
        d_base = distance_field(my_base, passable, H + W)
        for m, tid, zone in (
                (11, cfg.base_id, (d_res <= 3) & (d_base > 5)),
                (12, cfg.barracks_id, (d_base <= 5) & (d_res > 3))):
            if tid < 0:
                continue
            builder = idle & worker & ~harv_flag
            first_b = builder & (jnp.cumsum(builder.reshape(-1))
                                 .reshape(H, W) == 1)
            in_zone = first_b & zone & jnp.any(free_n, -1)
            sel_build = (macro == m) & in_zone
            out = _put(out, sel_build, PRODUCE, pdir=tdir, ptype=tid)
            d_zone = distance_field(zone & (state.utype == 0), passable,
                                    H + W)
            mdir = descend_direction(d_zone, free_n)
            sel_walk = (macro == m) & first_b & ~in_zone & (mdir >= 0)
            out = _put(out, sel_walk, MOVE, mdir=mdir)

        # ---- background: harvest-workers run the harvest loop
        hu = idle & harv_flag
        adj_res = jnp.stack([K.pull(resource, d, fill=False)
                             for d in range(4)], -1)
        adj_base = jnp.stack([K.pull(my_base, d, fill=False)
                              for d in range(4)], -1)
        carrying = state.carried > 0
        out = _put(out, hu & carrying & adj_base.any(-1), RETURN,
                   rdir=jnp.argmax(adj_base, -1).astype(jnp.int32))
        mdir_b = descend_direction(d_base, free_n)
        out = _put(out, hu & carrying & ~adj_base.any(-1) & (mdir_b >= 0),
                   MOVE, mdir=mdir_b)
        out = _put(out, hu & ~carrying & adj_res.any(-1), HARVEST,
                   hdir=jnp.argmax(adj_res, -1).astype(jnp.int32))
        mdir_r = descend_direction(d_res, free_n)
        out = _put(out, hu & ~carrying & ~adj_res.any(-1) & (mdir_r >= 0),
                   MOVE, mdir=mdir_r)

        # ---- background: attackers auto-attack in range, else walk to
        # their quadrant target (greedy axis descent)
        R = cfg.engine.max_range
        D = 2 * R + 1
        rng = self._lk_range(t)
        best = jnp.zeros((H, W), jnp.int32)
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
        au = idle & attacker & (out[..., 0] == 0)
        out = _put(out, au & found, ATTACK, rel=best)
        # walk: toward per-uid target if any, else toward nearest enemy
        has_t = roles.has_target[uid_mod] & attacker
        txs = roles.tgt_x[uid_mod]
        tys = roles.tgt_y[uid_mod]
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        dx_ = txs - xs
        dy_ = tys - ys
        # greedy: larger |delta| axis first, any free fallback
        prefer_x = jnp.abs(dx_) >= jnp.abs(dy_)
        dir_x = jnp.where(dx_ > 0, 1, 3)   # right / left
        dir_y = jnp.where(dy_ > 0, 2, 0)   # down / up
        want1 = jnp.where(prefer_x & (dx_ != 0), dir_x,
                          jnp.where(dy_ != 0, dir_y, -1))
        want2 = jnp.where(prefer_x & (dy_ != 0), dir_y,
                          jnp.where(dx_ != 0, dir_x, -1))
        free_at = lambda dsel: K.select_dir(free_n, jnp.clip(dsel, 0, 3)) \
            & (dsel >= 0)
        gdir = jnp.where(free_at(want1), want1,
                         jnp.where(free_at(want2), want2, -1))
        d_enemy = distance_field(enemy, passable, H + W)
        edir = descend_direction(d_enemy, free_n)
        wdir = jnp.where(has_t, gdir, edir)
        walk = au & ~found & (wdir >= 0) & (out[..., 0] == 0)
        out = _put(out, walk, MOVE, mdir=wdir)

        return out, roles

    # ------------------------------------------------------------------
    def step(self, state: State, roles0: ExpertRoles, roles1: ExpertRoles,
             macro0, macro1, key):
        """Both players driven by expert macros (self-play)."""
        k0, k1 = jax.random.split(key)
        a0, roles0 = self.macro_to_gridnet(state, roles0, 0, macro0, k0)
        a1, roles1 = self.macro_to_gridnet(state, roles1, 1, macro1, k1)
        state, rewards, done = self.env.step(state, a0, a1)
        return state, roles0, roles1, rewards, done

    def step_vs(self, state: State, roles: ExpertRoles, macro0, bot, key):
        """Expert macros for player 0 vs a scripted gridnet bot."""
        k0, k1 = jax.random.split(key)
        a0, roles = self.macro_to_gridnet(state, roles, 0, macro0, k0)
        a1 = bot(state, 1, k1)
        state, rewards, done = self.env.step(state, a0, a1)
        return state, roles, rewards, done


def _put(out, mask, atype, mdir=None, hdir=None, rdir=None, pdir=None,
         ptype=None, rel=None):
    # only write where no action has been chosen yet (macro priority order)
    mask = mask & (out[..., 0] == 0)
    out = out.at[..., 0].set(jnp.where(mask, atype, out[..., 0]))
    for col, val in ((1, mdir), (2, hdir), (3, rdir), (4, pdir),
                     (5, ptype), (6, rel)):
        if val is not None:
            out = out.at[..., col].set(jnp.where(mask, val, out[..., col]))
    return out


def detailed_to_gridnet(ex: "ExpertEnv", state: State, player,
                        type_logits, tile_logits, key):
    """JNIExpertAI detailed mode (:156-198 + unitAction :664-735): every
    idle unit samples a board tile from the shared tile policy and a unit
    type from the type policy, then dispatches:
      building + movable type -> train; harvester -> move/harvest-loop/
      attack/build by tile content; other movers -> move or attack.
    Per-unit tile draws are independent (the reference's 0.7 probability
    reduction after each pick is a sequential anti-duplication heuristic,
    approximated here by independent sampling)."""
    cfg = ex.cfg
    H, W, T = ex.h, ex.w, cfg.engine.num_types
    me = jnp.int32(player)
    k_tile, k_type, k_auto = jax.random.split(key, 3)

    t = jnp.clip(state.utype - 1, 0, T - 1)
    exists = state.utype > 0
    mine = exists & (state.owner == me)
    idle = mine & ~state.busy
    enemy = exists & (state.owner >= 0) & (state.owner != me)
    resource = exists & ex._lk_res(t)
    my_base = mine & ex._lk_stock(t)
    can_move_u = ex._lk_harv(t) | make_lookup(cfg.engine.can_move, bool)(t)
    passable = (state.terrain == 0) & ~exists
    free_n = jnp.stack([K.pull(passable, d, fill=False)
                        for d in range(4)], -1)

    # per-unit tile sample: argmax over (shared logits + per-cell gumbel)
    g = jax.random.gumbel(k_tile, (H, W, H * W))
    tl = tile_logits.reshape(-1)[None, None, :]
    tidx = jnp.argmax(tl + g, axis=-1).astype(jnp.int32)   # [H, W]
    tx = tidx % W
    ty = tidx // W
    # per-unit type sample
    gt = jax.random.gumbel(k_type, (H, W, T))
    tau = jnp.argmax(type_logits[None, None, :] + gt, -1).astype(jnp.int32)

    # content at the sampled tile, via a dense one-hot contraction
    def at_tile(plane):
        oh = jax.nn.one_hot(tidx, H * W, dtype=jnp.float32)
        return jnp.einsum("hwc,c->hw", oh,
                          plane.reshape(-1).astype(jnp.float32)) \
            .astype(jnp.int32)

    tgt_enemy = at_tile(jnp.where(enemy, 1, 0)) > 0
    tgt_res = at_tile(jnp.where(resource, 1, 0)) > 0
    tgt_own = at_tile(jnp.where(mine, 1, 0)) > 0
    tgt_empty = ~(tgt_enemy | tgt_res | tgt_own)

    lk_canmove_t = make_lookup(cfg.engine.can_move, bool)
    tau_mobile = lk_canmove_t(tau)
    is_building = mine & ~ex._lk_harv(t) & ~lk_canmove_t(t)
    is_harv_unit = mine & ex._lk_harv(t)
    is_other = mine & ~is_building & ~is_harv_unit

    out = jnp.zeros((H, W, 7), jnp.int32)
    tdir = jnp.argmax(free_n, -1).astype(jnp.int32)

    # building trains the sampled (movable) type
    prod_row = jnp.zeros((H, W), bool)
    for i, row in enumerate(cfg.engine.produces):
        for j, v in enumerate(row):
            if v:
                prod_row = prod_row | ((t == i) & (tau == j))
    out = _put(out, idle & is_building & tau_mobile & prod_row
               & free_n.any(-1), PRODUCE, pdir=tdir, ptype=tau)

    # greedy movement toward the sampled tile
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    dx_ = tx - xs
    dy_ = ty - ys
    prefer_x = jnp.abs(dx_) >= jnp.abs(dy_)
    dir_x = jnp.where(dx_ > 0, 1, 3)
    dir_y = jnp.where(dy_ > 0, 2, 0)
    want1 = jnp.where(prefer_x & (dx_ != 0), dir_x,
                      jnp.where(dy_ != 0, dir_y, -1))
    want2 = jnp.where(prefer_x & (dy_ != 0), dir_y,
                      jnp.where(dx_ != 0, dir_x, -1))
    free_at = lambda dsel: K.select_dir(free_n, jnp.clip(dsel, 0, 3)) \
        & (dsel >= 0)
    gdir = jnp.where(free_at(want1), want1,
                     jnp.where(free_at(want2), want2, -1))

    # attack the tile's occupant when in range, else walk toward it
    R = cfg.engine.max_range
    D = 2 * R + 1
    rng = ex._lk_range(t)
    in_range = (dx_ * dx_ + dy_ * dy_ <= rng * rng) & (tidx != ys * W + xs)
    rel = jnp.clip((R + dy_), 0, D - 1) * D + jnp.clip((R + dx_), 0, D - 1)
    can_atk_u = make_lookup(cfg.engine.can_attack, bool)(t)

    # harvester dispatch
    hu = idle & is_harv_unit
    adj_res = jnp.stack([K.pull(resource, d, fill=False)
                         for d in range(4)], -1)
    adj_base = jnp.stack([K.pull(my_base, d, fill=False)
                          for d in range(4)], -1)
    carrying = state.carried > 0
    move_case = hu & (tgt_empty | tgt_own) & (gdir >= 0)
    out = _put(out, move_case, MOVE, mdir=gdir)
    # harvest loop toward the sampled resource
    out = _put(out, hu & tgt_res & carrying & adj_base.any(-1), RETURN,
               rdir=jnp.argmax(adj_base, -1).astype(jnp.int32))
    out = _put(out, hu & tgt_res & ~carrying & adj_res.any(-1), HARVEST,
               hdir=jnp.argmax(adj_res, -1).astype(jnp.int32))
    out = _put(out, hu & tgt_res & (gdir >= 0), MOVE, mdir=gdir)
    out = _put(out, hu & tgt_enemy & can_atk_u & in_range, ATTACK, rel=rel)
    out = _put(out, hu & tgt_enemy & (gdir >= 0), MOVE, mdir=gdir)
    # harvester building the sampled static type at its side
    out = _put(out, hu & ~tau_mobile & prod_row & free_n.any(-1),
               PRODUCE, pdir=tdir, ptype=tau)

    # other movers
    ou = idle & is_other
    out = _put(out, ou & (tgt_empty | tgt_own) & (gdir >= 0), MOVE,
               mdir=gdir)
    out = _put(out, ou & (tgt_enemy | tgt_res) & can_atk_u & in_range,
               ATTACK, rel=rel)
    out = _put(out, ou & tgt_enemy & (gdir >= 0), MOVE, mdir=gdir)
    return out
