"""The TPU rules kernel: legality masks, issue, and cycle as pure plane ops.

This is a ground-up vectorized re-design of the Java hot loop (SURVEY.md §3.2)
— not a translation.  Per-unit object scans (Unit.getUnitActions,
Unit.java:368-522; GameState.issue conflict scan, GameState.java:249-328;
GameState.cycle execution, :553-571) become fixed-shape stencil/shift ops and
dense shift-accumulations (no gathers or scatters — they lower poorly on
TPU), so the whole tick jits, vmaps over envs, and scans over time with no
host round-trips.

Exactness model
---------------
The Java engine executes completions sequentially in LinkedHashMap insertion
order.  We reify that order as the ``aorder`` plane and resolve every
order-sensitive interaction in closed form:

* same-tick issue conflicts are position-only and local: MOVE/PRODUCE claims
  always target a 4-neighbor, so each cell has at most 4 claimants; the Java
  pairwise CANCEL_BOTH chain (GameState.java:263-297) over claimants sorted
  by issue order cancels pairs (0,1), (2,3), ... leaving the last claimant
  alive iff the count is odd.
* completion-time interleaving (attack-vs-move, return-vs-building-death,
  multi-harvest depletion) reduces to per-cell threshold queries against the
  single occupancy transition a cell can have per tick (at most one arrival
  or one departure — reservations are exclusive), computed with order-
  filtered damage sums (dense shifts over the attack-range box) and 4-way
  sort networks.

Documented divergences from raw Java ``issue`` (none reachable through the
reference's own clients, which all pre-check PlayerActions cumulatively —
PlayerAction.fromVectorAction :395-417, AbstractionLayerAI.translateActions
:58-113):
* same-tick pairwise *resource* over-commit conflicts are not cancelled
  (callers must pass per-player cumulatively-consistent candidates, which the
  env decode guarantees like the reference does);
* a produce that would overdraw the stockpile at completion is executed
  (unreachable under cumulative checking: reserved costs never exceed the
  balance);
* newborn unit IDs are assigned in row-major rather than execution order
  (IDs are cosmetic: the reference's own replay test heals them by position,
  TestTracesIntegrity.java:89-97).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .types import (ATTACK, DIR_X, DIR_Y, HARVEST, INF, MOVE, NONE, PRODUCE,
                    RETURN, Candidates, EngineConfig, State)


# ----------------------------------------------------------------------
# shift helpers

def _shift(p: jax.Array, dx: int, dy: int, fill=0) -> jax.Array:
    """out[y, x] = p[y - dy, x - dx]; cells shifted in from outside = fill.
    Implemented as pad+slice (lowers inside Pallas kernels, unlike sliced
    scatter-set); i1 arrays route through int32 (Mosaic cannot pad or
    constant-materialize i1 vectors)."""
    if dx == 0 and dy == 0:
        return p
    if p.dtype == jnp.bool_:
        return _shift(jnp.where(p, 1, 0), dx, dy, 1 if fill else 0) != 0
    h, w = p.shape[-2], p.shape[-1]
    pads = [(0, 0)] * (p.ndim - 2) + [
        (max(0, dy), max(0, -dy)), (max(0, dx), max(0, -dx))]
    pp = jnp.pad(p, pads, constant_values=fill)
    a, b = max(0, -dy), max(0, -dx)
    return pp[..., a:a + h, b:b + w]


def push(p: jax.Array, d: int, fill=0) -> jax.Array:
    """Move source-cell values to their direction-d target cell."""
    return _shift(p, DIR_X[d], DIR_Y[d], fill)


def pull(p: jax.Array, d: int, fill=0) -> jax.Array:
    """Read, at each source cell, the value at its direction-d target cell."""
    return _shift(p, -DIR_X[d], -DIR_Y[d], fill)


def make_lookup(values, dtype=jnp.int32):
    """Static small-table lookup as unrolled selects: `jnp.take` from a tiny
    table lowers to a general gather on TPU (~1 ms per use on a [2048,16,16]
    index at time of writing, vs ~6 us for the select chain)."""
    vals = list(values)

    def lk(idx):
        acc = jnp.full(idx.shape, vals[0], dtype)
        for i in range(1, len(vals)):
            if vals[i] != vals[0]:
                acc = jnp.where(idx == i, dtype(vals[i]), acc)
        return acc

    return lk


def select_dir(stack, param):
    """stack[..., d] picked per-cell by direction plane `param` (unrolled
    4-way select; take_along_axis gathers are slow on TPU)."""
    acc = stack[..., 0]
    for d in range(1, 4):
        acc = jnp.where(param == d, stack[..., d], acc)
    return acc


def stack_b(planes):
    """Stack bool planes as int32 (Mosaic cannot insert a minor dim of i1;
    int8 stacks measured SLOWER on the v5e VPU); read back with
    `select_dir(...) != 0` / `imax(...) > 0`."""
    return jnp.stack([jnp.where(p, 1, 0) for p in planes], axis=-1)


def sum2(x):
    """Sum over the two trailing axes, one at a time (fused double-axis
    reductions crash Mosaic)."""
    return jnp.sum(jnp.sum(x, -1), -1)


def sort4(keys, *payloads):
    """Sort 4 elements along the last axis by ``keys`` with an explicit
    5-comparator network (generic lax.sort lowers poorly on TPU for tiny
    fixed widths).  Returns (keys_sorted, *payloads_sorted)."""
    # column-decomposed (stack, not scatter-set: lowers inside Pallas)
    cols = [[a[..., k] for k in range(4)] for a in (keys,) + payloads]

    for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
        swap = cols[0][i] > cols[0][j]
        for c in cols:
            ci, cj = c[i], c[j]
            c[i] = jnp.where(swap, cj, ci)
            c[j] = jnp.where(swap, ci, cj)
    return tuple(jnp.stack(c, axis=-1) for c in cols)


# ----------------------------------------------------------------------

class Engine(NamedTuple):
    """Jittable pure functions closed over one EngineConfig."""
    cfg: EngineConfig
    validate: callable        # (State, Candidates) -> bool[H,W]
    issue: callable           # (State, Candidates) -> State
    issue_env: callable       # issue fast path for decode-vetted candidates
    cycle: callable           # (State) -> (State, done bool)
    legal_masks: callable     # (State, player) -> dict of mask planes
    winner: callable          # (State) -> int32 (-1 none)
    gameover: callable        # (State) -> bool


@functools.lru_cache(maxsize=64)
def make_engine(cfg: EngineConfig) -> Engine:
    H, W = cfg.height, cfg.width
    T = cfg.num_types
    R = cfg.max_range
    DIAM = 2 * R + 1

    # UTT constants, folded into the program
    COST = tuple(cfg.cost)
    THP = tuple(cfg.hp)
    MIN_D = tuple(cfg.min_damage)
    MAX_D = tuple(cfg.max_damage)
    RANGE = tuple(cfg.attack_range)
    PROD_T = tuple(cfg.produce_time)
    MOVE_T = tuple(cfg.move_time)
    ATK_T = tuple(cfg.attack_time)
    HARV_T = tuple(cfg.harvest_time)
    HARV_A = tuple(cfg.harvest_amount)
    IS_RES = tuple(cfg.is_resource)
    IS_STOCK = tuple(cfg.is_stockpile)
    CAN_HARV = tuple(cfg.can_harvest)
    CAN_MOVE = tuple(cfg.can_move)
    CAN_ATK = tuple(cfg.can_attack)
    PRODUCES = cfg.produces  # [T][T] static bools

    def tprop(vals, t):
        """Unrolled static-table lookup (gathers are slow on TPU).  Bool
        seeds come from traced comparisons: Mosaic cannot materialize i1
        vector constants."""
        if isinstance(vals[0], bool):
            # pure logical updates: a select RETURNING i1 materializes as
            # i8 in Mosaic and dies on the i8->i1 truncation
            acc = (t > -1) if vals[0] else (t < -1)
            for i in range(1, len(vals)):
                if vals[i] != vals[0]:
                    acc = (acc & (t != i)) if vals[0] else (acc | (t == i))
            return acc
        acc = jnp.full(t.shape, vals[0], jnp.int32)
        for i in range(1, len(vals)):
            if vals[i] != vals[0]:
                acc = jnp.where(t == i, jnp.int32(vals[i]), acc)
        return acc

    def _unit_ctx(state: State):
        t = jnp.clip(state.utype - 1, 0, T - 1)
        exists = state.utype > 0
        return t, exists

    # ------------------------------------------------------------------
    # legality (Unit.getUnitActions, Unit.java:368-522 — standing units and
    # terrain only; in-flight reservations are deliberately NOT considered,
    # mirroring Unit.java:476 / :498-516)

    def _free_at(state: State, d: int) -> jax.Array:
        free = (state.terrain == 0) & (state.utype == 0)
        return pull(free, d, fill=False)

    def _dir_stack(fn):
        return jnp.stack([fn(d) for d in range(4)], axis=-1)  # [H,W,4]


    def validate(state: State, cand: Candidates) -> jax.Array:
        """Per-cell: is this specific candidate action legal for this unit?
        (Unit.canExecuteAction, Unit.java:531-534.)"""
        t, exists = _unit_ctx(state)
        me = state.owner
        is_res_n = exists & tprop(IS_RES, t)
        is_stock_n = exists & tprop(IS_STOCK, t)

        free_d = stack_b([_free_at(state, d) for d in range(4)])
        res_d = stack_b([pull(is_res_n, d, fill=False) for d in range(4)])
        own_stock_d = stack_b(
            [pull(is_stock_n, d, fill=False)
             & (pull(state.owner, d, fill=-1) == me) for d in range(4)])

        at = cand.atype
        param = cand.aparam
        pt = jnp.clip(cand.aptype, 0, T - 1)

        legal_none = at == NONE
        legal_move = ((at == MOVE) & tprop(CAN_MOVE, t)
                      & (select_dir(free_d, param) != 0))
        legal_harv = ((at == HARVEST) & tprop(CAN_HARV, t)
                      & (state.carried == 0) & (select_dir(res_d, param) != 0))
        legal_ret = ((at == RETURN) & tprop(CAN_HARV, t)
                     & (state.carried > 0)
                     & (select_dir(own_stock_d, param) != 0))
        afford = tprop(COST, pt) <= jnp.where(
            me == 1, state.resources[1], state.resources[0])
        producible = t < -1  # all-False, traced (no i1 consts)
        for i, row in enumerate(PRODUCES):
            for j, v in enumerate(row):
                if v:
                    producible = producible | ((t == i) & (pt == j))
        legal_prod = ((at == PRODUCE) & producible & afford
                      & (select_dir(free_d, param) != 0))
        # attack: enemy unit at absolute (atx, aty) within squared range
        # (Unit.java:409-436; range-1 4-adjacency == d2 <= 1 for distinct
        # cells).  The target offset is scanned over the static (2R+1)^2
        # box with dense shifts — no gathers, which lower poorly on TPU.
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        dxp = cand.atx - xs
        dyp = cand.aty - ys
        rng2 = tprop(RANGE, t) ** 2
        occ = state.utype > 0
        hit = t < -1
        for oy in range(-R, R + 1):
            for ox in range(-R, R + 1):
                d2 = ox * ox + oy * oy
                if d2 == 0 or d2 > R * R:
                    continue
                occ_t = _shift(occ, -ox, -oy, fill=False)
                own_t = _shift(state.owner, -ox, -oy, fill=-1)
                # enemy-ness is relative to the ATTACKER's owner
                hit = hit | ((dxp == ox) & (dyp == oy) & (d2 <= rng2)
                             & occ_t & (own_t >= 0) & (own_t != me))
        legal_atk = (at == ATTACK) & tprop(CAN_ATK, t) & hit

        return (exists & (legal_none | legal_move | legal_harv | legal_ret
                          | legal_prod | legal_atk))

    def eta_of(state: State, cand: Candidates) -> jax.Array:
        """UnitAction.ETA (UnitAction.java:307-329; RETURN uses moveTime)."""
        t, _ = _unit_ctx(state)
        pt = jnp.clip(cand.aptype, 0, T - 1)
        return jnp.select(
            [cand.atype == NONE, cand.atype == MOVE, cand.atype == HARVEST,
             cand.atype == RETURN, cand.atype == PRODUCE, cand.atype == ATTACK],
            [cand.aparam, tprop(MOVE_T, t), tprop(HARV_T, t),
             tprop(MOVE_T, t), tprop(PROD_T, pt), tprop(ATK_T, t)],
            default=jnp.int32(0))

    # ------------------------------------------------------------------
    # issue (GameState.issueSafe :338-408 + issue :249-328, CANCEL_BOTH)

    def issue(state: State, cand: Candidates) -> State:
        t, exists = _unit_ctx(state)
        ignore = (~exists) | state.busy | (cand.atype < 0) | (state.owner < 0)

        legal = validate(state, cand) & ~ignore
        eta_att = eta_of(state, cand)
        # issueSafe: illegal -> NONE(ETA of the attempted action) :347-354
        a_type = jnp.where(legal, cand.atype, NONE)
        a_param = jnp.where(legal, cand.aparam, eta_att)
        eta1 = eta_att  # NONE(eta_att) has the same ETA

        # cross-cycle conflicts vs assignments issued in EARLIER ticks ->
        # only the new action cancels, as NONE() with parameter -1
        # (GameState.java:298-317).  Assignments issued THIS tick (by an
        # earlier issue() call, Java's sequential issueSafe per player) are
        # same-tick and join the CANCEL_BOTH chains below instead.
        # (a) position: claim target reserved by a prior-tick MOVE/PRODUCE;
        # (b) resource (pairwise, ResourceUsage.consistentWith :31-50): new
        #     produce cost + the largest single prior-tick produce cost of
        #     the same player exceeds the player's stockpile.
        claim = ((a_type == MOVE) | (a_type == PRODUCE)) & ~ignore
        claiming = state.busy & ((state.atype == MOVE)
                                 | (state.atype == PRODUCE))
        prior = state.atime < state.time
        inflight = claiming & prior
        resv = state.utype < -1
        for d in range(4):
            resv = resv | push(inflight & (state.aparam == d), d, fill=False)
        tgt_resv = select_dir(
            stack_b([pull(resv, d, fill=False) for d in range(4)]),
            cand.aparam) != 0
        if_pcost = jnp.where(state.busy & prior & (state.atype == PRODUCE),
                             tprop(COST, jnp.clip(state.aptype, 0, T - 1)), 0)
        max_if = jnp.stack([jnp.max(jnp.max(
            jnp.where(state.owner == p, if_pcost, 0), -1), -1)
            for p in (0, 1)])
        my_bal = jnp.where(state.owner == 1, state.resources[1], state.resources[0])
        my_max_if = jnp.where(state.owner == 1, max_if[1], max_if[0])
        new_cost = tprop(COST, jnp.clip(cand.aptype, 0, T - 1))
        res_xc = ((a_type == PRODUCE) & ~ignore
                  & (new_cost + my_max_if > my_bal))
        xc = (claim & tgt_resv) | res_xc
        a_type = jnp.where(xc, NONE, a_type)
        a_param = jnp.where(xc, -1, a_param)
        eta2 = jnp.where(xc, -1, eta1)
        claim = claim & ~xc

        # same-tick CANCEL_BOTH chains per target cell (<=4 claimants: one
        # per neighbor — either a new candidate or a surviving same-tick
        # claim from an earlier issue() call this tick, keyed by absolute
        # issue order so Java's sequential pairwise scan is reproduced)
        st_exist = claiming & ~prior
        new_key = state.order_ctr + cand.rank
        rk, et = [], []
        for d in range(4):
            n_d = claim & (cand.aparam == d)
            e_d = st_exist & (state.aparam == d)
            c_d = push(n_d | e_d, d, fill=False)
            key_src = jnp.where(n_d, new_key,
                                jnp.where(e_d, state.aorder, INF))
            eta_src = jnp.where(n_d, eta2, jnp.where(e_d, state.aticks, 0))
            rk.append(jnp.where(c_d, push(key_src, d), INF))
            et.append(jnp.where(c_d, push(eta_src, d), 0))
        rk = jnp.stack(rk, -1)
        et = jnp.stack(et, -1)
        srcd = jax.lax.broadcasted_iota(jnp.int32, (H, W, 4), 2)
        rk_s, et_s, d_s = sort4(rk, et, srcd)
        # Sequential chain over the <=4 order-sorted claimants with a live-
        # claimant carry, supporting all three policies (GameState.java
        # :270-297).  CANCEL_BOTH reproduces Java exactly; RANDOM flips a
        # per-conflict coin; ALTERNATING uses the cancelation counter with
        # per-cell conflict ordering (cross-cell encounter order is
        # approximated — it is unobservable except through the shared
        # counter's parity, and the reference's counter is a JVM-global
        # static with no defined per-game value anyway).
        policy = cfg.move_conflict_policy
        falseP = state.utype < -1
        live = jnp.full((H, W), -1, jnp.int32)
        cancelled_k = [falseP, falseP, falseP, falseP]
        ndur_k = [jnp.zeros((H, W), jnp.int32) for _ in range(4)]
        nconf = jnp.zeros((H, W), jnp.int32)
        if policy == 2:
            coins = jax.random.bernoulli(
                jax.random.fold_in(state.key, state.order_ctr), 0.5,
                (H, W, 4))
        for k in range(4):
            valid_k = rk_s[..., k] < INF
            conflict = valid_k & (live >= 0)
            et_live = jnp.zeros((H, W), jnp.int32)
            for j in range(4):
                et_live = jnp.where(live == j, et_s[..., j], et_live)
            dur = jnp.minimum(et_live, et_s[..., k])
            if policy == 2:      # CANCEL_RANDOM
                c_new = conflict & coins[..., k]
                c_old = conflict & ~coins[..., k]
            elif policy == 3:    # CANCEL_ALTERNATING
                parity = (state.cancel_ctr + nconf) % 2
                c_new = conflict & (parity == 0)
                c_old = conflict & (parity == 1)
            else:                # CANCEL_BOTH (default, :275-276)
                c_new = conflict
                c_old = conflict
            for j in range(4):
                hit_old = c_old & (live == j)
                cancelled_k[j] = cancelled_k[j] | hit_old
                ndur_k[j] = jnp.where(hit_old, dur, ndur_k[j])
            cancelled_k[k] = cancelled_k[k] | c_new
            ndur_k[k] = jnp.where(c_new, dur, ndur_k[k])
            # new live claimant: k if it enters (no conflict) or survives
            # a cancel-old-only conflict; cleared when both cancel
            live = jnp.where(valid_k & ~conflict, k,
                             jnp.where(c_old & ~c_new, k,
                                       jnp.where(c_new & ~c_old, live,
                                                 jnp.where(conflict, -1,
                                                           live))))
            nconf = nconf + jnp.where(conflict, 1, 0)
        # map sorted slots back to direction-of-origin planes
        cancel_d = []
        ndur_d = []
        for d in range(4):
            acc = falseP
            nd = jnp.full((H, W), -INF, jnp.int32)
            for k in range(4):
                sel = (d_s[..., k] == d) & cancelled_k[k]
                acc = acc | sel
                nd = jnp.where(sel, ndur_k[k], nd)
            cancel_d.append(acc)
            ndur_d.append(nd)
        cancel_new = (select_dir(
            stack_b([pull(cancel_d[d], d, fill=False) for d in range(4)]),
            cand.aparam) != 0) & claim
        ndur_new = select_dir(
            jnp.stack([pull(ndur_d[d], d, fill=-INF) for d in range(4)], -1),
            cand.aparam)
        a_type = jnp.where(cancel_new, NONE, a_type)
        a_param = jnp.where(cancel_new, ndur_new, a_param)
        eta3 = jnp.where(cancel_new, ndur_new, eta2)
        # cancel-old: a surviving same-tick claim beaten in a chain is
        # rewritten in place to NONE(min) (GameState.java:291-293)
        cancel_old = (select_dir(
            stack_b([pull(cancel_d[d], d, fill=False) for d in range(4)]),
            state.aparam) != 0) & st_exist
        ndur_old = select_dir(
            jnp.stack([pull(ndur_d[d], d, fill=-INF) for d in range(4)], -1),
            state.aparam)

        put = ~ignore
        return state.replace(
            busy=state.busy | put,
            atype=jnp.where(put, a_type,
                            jnp.where(cancel_old, NONE, state.atype)),
            aparam=jnp.where(put, a_param,
                             jnp.where(cancel_old, ndur_old, state.aparam)),
            atx=jnp.where(put, cand.atx, state.atx),
            aty=jnp.where(put, cand.aty, state.aty),
            aptype=jnp.where(put, cand.aptype, state.aptype),
            aticks=jnp.where(put, eta3,
                             jnp.where(cancel_old, ndur_old, state.aticks)),
            aorder=jnp.where(put, new_key, state.aorder),
            atime=jnp.where(put, state.time, state.atime),
            order_ctr=state.order_ctr + 2 * H * W,
            cancel_ctr=state.cancel_ctr
            + (sum2(nconf) if cfg.move_conflict_policy == 3 else 0),
        ).canon()

    def issue_env(state: State, cand: Candidates) -> State:
        """issueSafe fast path for candidates that came through the env
        decode (PlayerAction.fromVectorAction) against FULL-obs claims.

        The conflict machinery in ``issue`` is provably a no-op there:

        * cross-cycle position conflicts — decode's claimed0 ledger is
          ``_inflight_claims`` (every prior-tick MOVE/PRODUCE reservation,
          always in-bounds), so no kept candidate targets a reserved cell;
        * pairwise resource conflicts — decode's budget scan is CUMULATIVE
          (spent0 = sum of in-flight produce costs >= the max single cost
          the pairwise check uses), and a first-produce that passes only
          via the zero-skip is either affordable or voided as illegal by
          ``validate`` before the resource check can see it;
        * same-tick CANCEL chains — decode's claim ledger makes each
          player's kept claims mutually disjoint, and the second player's
          ledger already contains the first player's SURVIVING assignments
          (the sequential per-player flow threads the post-issue state).

        Under partial observability none of this holds (hidden enemy
        reservations are invisible to decode) — the PO path must use the
        full ``issue``.  Equivalence on the full-obs path is asserted by
        tests/test_engine_device.py::test_issue_env_fast_path."""
        t, exists = _unit_ctx(state)
        ignore = (~exists) | state.busy | (cand.atype < 0) | (state.owner < 0)

        legal = validate(state, cand) & ~ignore
        eta_att = eta_of(state, cand)
        a_type = jnp.where(legal, cand.atype, NONE)
        a_param = jnp.where(legal, cand.aparam, eta_att)

        put = ~ignore
        return state.replace(
            busy=state.busy | put,
            atype=jnp.where(put, a_type, state.atype),
            aparam=jnp.where(put, a_param, state.aparam),
            atx=jnp.where(put, cand.atx, state.atx),
            aty=jnp.where(put, cand.aty, state.aty),
            aptype=jnp.where(put, cand.aptype, state.aptype),
            aticks=jnp.where(put, eta_att, state.aticks),
            aorder=jnp.where(put, state.order_ctr + cand.rank, state.aorder),
            atime=jnp.where(put, state.time, state.atime),
            order_ctr=state.order_ctr + 2 * H * W,
        ).canon()

    # ------------------------------------------------------------------
    # cycle (GameState.cycle :553-571 + UnitAction.execute :338-465)

    # statically deterministic damage (UTT v1/v2): no PRNG work at all
    DET_DAMAGE = all(mn == mx for mn, mx in zip(cfg.min_damage,
                                                cfg.max_damage))

    def cycle(state: State) -> Tuple[State, jax.Array]:
        t, exists = _unit_ctx(state)
        if DET_DAMAGE:
            key = state.key
        else:
            key, sub = jax.random.split(state.key)

        ticks = jnp.where(state.busy, state.aticks - 1, state.aticks)
        comp = state.busy & (ticks <= 0)
        cm = comp & (state.atype == MOVE)
        ch = comp & (state.atype == HARVEST)
        cr = comp & (state.atype == RETURN)
        cp = comp & (state.atype == PRODUCE)
        ca = comp & (state.atype == ATTACK)

        # occupancy transitions: at most one departure OR one arrival per cell
        dep_order = jnp.where(cm, state.aorder, INF)
        arr_order = jnp.full((H, W), INF, jnp.int32)
        for d in range(4):
            mvp = (cm | cp) & (state.aparam == d)
            arr_order = jnp.minimum(
                arr_order, jnp.where(push(mvp, d, fill=False),
                                     push(state.aorder, d), INF))

        # ---- attacks: order-filtered damage sums, delivered densely by
        # scanning the static (2R+1)^2 offset box with shifts (scatter-adds
        # serialize on TPU; each (target, offset) pair has at most one
        # attacker, so shift-accumulate is exact)
        dmin = tprop(MIN_D, t)
        if DET_DAMAGE:
            dmg = dmin
        else:
            dmax = tprop(MAX_D, t)
            u01 = jax.random.uniform(sub, (H, W))
            dmg = jnp.where(dmax > dmin,
                            dmin + (u01 * (dmax - dmin + 1))
                            .astype(jnp.int32),
                            dmin)
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        dxp = state.atx - xs
        dyp = state.aty - ys
        # return-order query planes: Q_d[c] = order of a completing RETURN
        # approaching c from direction d (at most one per (c, d))
        q_d = []
        for d in range(4):
            r_d = cr & (state.aparam == d)
            q_d.append(jnp.where(push(r_d, d, fill=False),
                                 push(state.aorder, d), INF))
        z = jnp.zeros((H, W), jnp.int32)
        dmg_total, dmg_pre_dep, dmg_post_arr = z, z, z
        dmg_pre_ret = [z, z, z, z]
        for oy in range(-R, R + 1):
            for ox in range(-R, R + 1):
                if ox == 0 and oy == 0 or ox * ox + oy * oy > R * R:
                    continue
                sel = ca & (dxp == ox) & (dyp == oy)
                sp = _shift(sel, ox, oy, fill=False)
                sd = jnp.where(sp, _shift(jnp.where(sel, dmg, 0), ox, oy), 0)
                so = jnp.where(sp, _shift(state.aorder, ox, oy), INF)
                dmg_total = dmg_total + sd
                dmg_pre_dep = dmg_pre_dep + jnp.where(so < dep_order, sd, 0)
                dmg_post_arr = dmg_post_arr + jnp.where(so > arr_order, sd, 0)
                for d in range(4):
                    dmg_pre_ret[d] = dmg_pre_ret[d] + jnp.where(
                        so < q_d[d], sd, 0)

        # ---- harvest: per-node 4-way ordered depletion
        # (UnitAction.java:378-404; each server takes its own harvestAmount,
        # node removed at <= 0, later servers get nothing)
        is_res_n = exists & tprop(IS_RES, t)
        hv_ok = ch & tprop(CAN_HARV, t) & (state.carried == 0)
        h_val, h_ord, h_amt = [], [], []
        for d in range(4):
            hd = hv_ok & (state.aparam == d)
            h_val.append(push(hd, d, fill=False) & is_res_n)
            h_ord.append(jnp.where(h_val[-1], push(state.aorder, d), INF))
            h_amt.append(jnp.where(h_val[-1], push(tprop(HARV_A, t), d), 0))
        h_ord = jnp.stack(h_ord, -1)
        h_amt = jnp.stack(h_amt, -1)
        h_dir = jax.lax.broadcasted_iota(jnp.int32, (H, W, 4), 2)
        ho_s, ha_s, hd_s = sort4(h_ord, h_amt, h_dir)
        # exclusive 4-wide prefix, unrolled (cumsum doesn't lower in Pallas)
        prev = jnp.stack(
            [jnp.zeros((H, W), jnp.int32), ha_s[..., 0],
             ha_s[..., 0] + ha_s[..., 1],
             ha_s[..., 0] + ha_s[..., 1] + ha_s[..., 2]], -1)
        take_s = (ho_s < INF) & (state.carried[..., None] - prev > 0)
        node_taken = jnp.sum(jnp.where(take_s, ha_s, 0), axis=-1)
        node_res = state.carried - node_taken
        node_removed = is_res_n & (node_taken > 0) & (node_res <= 0)
        # scatter take flags back to harvesters (per approach direction)
        got = t < -1
        amt_got = jnp.zeros((H, W), jnp.int32)
        for d in range(4):
            sel = (hd_s == d) & take_s
            got_d = jnp.max(jnp.where(sel, 1, 0), -1) > 0
            got = got | (hv_ok & (state.aparam == d)
                         & pull(got_d, d, fill=False))
            amt_got = amt_got + jnp.where(
                hv_ok & (state.aparam == d),
                pull(jnp.max(jnp.where(sel, ha_s, 0), -1), d), 0)

        # ---- returns: stockpile standing, not departing, alive at o_ret
        # (UnitAction.java:406-432 — deposits to the RETURNER's player; no
        # owner check at execution, unlike issue-time legality)
        is_stock_n = exists & tprop(IS_STOCK, t)
        ret_valid = t < -1
        for d in range(4):
            rd = cr & (state.aparam == d) & (state.carried > 0)
            alive = (is_stock_n & (state.hp > dmg_pre_ret[d])
                     & (dep_order > q_d[d]))
            ret_valid = ret_valid | (rd & pull(alive, d, fill=False))
        carried32 = state.carried.astype(jnp.int32)   # sums can pass 2^15
        dep0 = sum2(jnp.where(ret_valid & (state.owner == 0),
                              carried32, 0))
        dep1 = sum2(jnp.where(ret_valid & (state.owner == 1),
                              carried32, 0))

        # ---- produce: always funded (see module docstring); pay at
        # completion (UnitAction.java:434-463)
        pcost = tprop(COST, jnp.clip(state.aptype, 0, T - 1))
        spend0 = sum2(jnp.where(cp & (state.owner == 0), pcost, 0))
        spend1 = sum2(jnp.where(cp & (state.owner == 1), pcost, 0))
        # newborn rank = exclusive prefix count over row-major cells,
        # computed as a matvec against a constant strict-triangular mask
        # (MXU-friendly; cumsum doesn't lower in Pallas)
        # exclusive prefix count over row-major cells, unrolled shifts
        # (no reshape/cumsum: neither lowers in Mosaic)
        cpi = jnp.where(cp, 1, 0)
        row_prefix = jnp.zeros((H, W), jnp.int32)   # same row, cols before
        for k in range(1, W):
            row_prefix = row_prefix + _shift(cpi, k, 0)
        row_tot = jnp.sum(cpi, -1, keepdims=True) * jnp.ones(
            (1, W), jnp.int32)
        rows_above = jnp.zeros((H, W), jnp.int32)   # full rows before
        for k in range(1, H):
            rows_above = rows_above + _shift(row_tot, 0, k)
        nb_rank = rows_above + row_prefix
        n_born = sum2(cpi)

        # ---- movers: alive at departure -> arrive; damage both ends
        mv_alive = cm & (state.hp - dmg_pre_dep > 0)
        hp_mid = state.hp - dmg_pre_dep

        # ---- compose next board
        standing = exists & ~cm
        hp_std = state.hp - dmg_total
        dead_std = standing & ~is_res_n & (hp_std <= 0) & (state.owner >= 0)
        # neutral/resource units can also be attacked in principle:
        dead_neutral = standing & (state.owner < 0) & ~is_res_n & (hp_std <= 0)
        keep = standing & ~dead_std & ~dead_neutral & ~node_removed

        utype_n = jnp.where(keep, state.utype, 0)
        owner_n = jnp.where(keep, state.owner, -1)
        hp_n = jnp.where(keep, hp_std, 0)
        uid_n = jnp.where(keep, state.uid, 0)
        carried_keep = jnp.where(got, amt_got,
                                 jnp.where(ret_valid, 0, state.carried))
        carried_keep = jnp.where(is_res_n, node_res, carried_keep)
        carried_n = jnp.where(keep, carried_keep, 0)

        busy_n = state.busy & ~comp & keep
        atype_n = jnp.where(busy_n, state.atype, 0)
        aparam_n = jnp.where(busy_n, state.aparam, 0)
        atx_n = jnp.where(busy_n, state.atx, 0)
        aty_n = jnp.where(busy_n, state.aty, 0)
        aptype_n = jnp.where(busy_n, state.aptype, 0)
        aticks_n = jnp.where(busy_n, ticks, 0)
        aorder_n = jnp.where(busy_n, state.aorder, 0)
        atime_n = jnp.where(busy_n, state.atime, -1)

        # arrivals: movers
        for d in range(4):
            md = mv_alive & (state.aparam == d)
            at_dst = push(md, d, fill=False)
            hp_arr = push(hp_mid, d) - dmg_post_arr
            alive_dst = at_dst & (hp_arr > 0)
            utype_n = jnp.where(alive_dst, push(state.utype, d), utype_n)
            owner_n = jnp.where(alive_dst, push(state.owner, d), owner_n)
            hp_n = jnp.where(alive_dst, hp_arr, hp_n)
            carried_n = jnp.where(alive_dst, push(state.carried, d), carried_n)
            uid_n = jnp.where(alive_dst, push(state.uid, d), uid_n)

        # arrivals: newborns
        for d in range(4):
            pd = cp & (state.aparam == d)
            at_dst = push(pd, d, fill=False)
            hp_born = push(tprop(THP, jnp.clip(state.aptype, 0, T - 1)), d)
            hp_nb = hp_born - dmg_post_arr
            alive_dst = at_dst & (hp_nb > 0)
            utype_n = jnp.where(alive_dst, push(state.aptype, d) + 1, utype_n)
            owner_n = jnp.where(alive_dst, push(state.owner, d), owner_n)
            hp_n = jnp.where(alive_dst, hp_nb, hp_n)
            carried_n = jnp.where(alive_dst, 0, carried_n)
            uid_n = jnp.where(alive_dst, state.next_id + push(nb_rank, d),
                              uid_n)

        resources_n = (state.resources
                       + jnp.stack([dep0 - spend0, dep1 - spend1]))

        new_state = state.replace(
            utype=utype_n, owner=owner_n, hp=hp_n, carried=carried_n,
            uid=uid_n, busy=busy_n, atype=atype_n, aparam=aparam_n,
            atx=atx_n, aty=aty_n, aptype=aptype_n, aticks=aticks_n,
            aorder=aorder_n, atime=atime_n, time=state.time + 1,
            resources=resources_n, next_id=state.next_id + n_born,
            key=key).canon()
        return new_state, gameover(new_state)

    # ------------------------------------------------------------------

    def _counts(state: State):
        alive = state.utype > 0
        n0 = sum2(jnp.where(alive & (state.owner == 0), 1, 0))
        n1 = sum2(jnp.where(alive & (state.owner == 1), 1, 0))
        return n0, n1

    def gameover(state: State) -> jax.Array:
        """PhysicalGameState.gameover :361-387."""
        n0, n1 = _counts(state)
        return ((n0 + n1) == 0) | ((n0 == 0) ^ (n1 == 0))

    def winner(state: State) -> jax.Array:
        """PhysicalGameState.winner :334-353 (-1 = none/draw)."""
        n0, n1 = _counts(state)
        return jnp.where((n0 > 0) & (n1 == 0), 0,
                         jnp.where((n1 > 0) & (n0 == 0), 1, -1))

    # ------------------------------------------------------------------
    # masks (UnitAction.getValidActionArray :711-751 + JNIGridnetClient
    # mask layout :60-99: [can-act, 6 types, 4 move, 4 harvest, 4 return,
    # 4 produce-dir, T produce-type, DIAM^2 relative attack])

    def legal_masks(state: State, player) -> Dict[str, jax.Array]:
        t, exists = _unit_ctx(state)
        me = jnp.int32(player)
        mine = exists & (state.owner == me)
        can_act = mine & ~state.busy
        is_res_n = exists & tprop(IS_RES, t)
        is_stock_n = exists & tprop(IS_STOCK, t)

        move_d = _dir_stack(lambda d: _free_at(state, d)) \
            & (can_act & tprop(CAN_MOVE, t))[..., None]
        harv_d = _dir_stack(lambda d: pull(is_res_n, d, fill=False)) \
            & (can_act & tprop(CAN_HARV, t) & (state.carried == 0))[..., None]
        ret_d = _dir_stack(lambda d: pull(is_stock_n, d, fill=False)
                           & (pull(state.owner, d, fill=-1) == me)) \
            & (can_act & tprop(CAN_HARV, t) & (state.carried > 0))[..., None]
        bal = jnp.where(me == 1, state.resources[1], state.resources[0])
        afford = jnp.stack([bal >= COST[j] for j in range(T)])  # [T]
        prod_row = jnp.stack(
            [functools.reduce(
                jnp.logical_or,
                [t == i for i in range(T) if PRODUCES[i][j]],
                jnp.zeros(t.shape, bool)) for j in range(T)],
            axis=-1)  # [H,W,T]: can this cell's type produce type j?
        prod_pair = (prod_row & afford[None, None, :]
                     & can_act[..., None])[..., None, :] \
            & _dir_stack(lambda d: _free_at(state, d))[..., :, None]  # [H,W,4,T]
        prod_dir = jnp.any(prod_pair, axis=-1)
        prod_type = jnp.any(prod_pair, axis=-2)

        # attack window: per-player pre-masked enemy shifts.  (Shifting
        # player-independent occupancy+owner planes to enable CSE across
        # both players' masks + validate was tried and measured SLOWER —
        # the extra per-offset compares cost more than the sharing saves.)
        enemy = exists & (state.owner >= 0) & (state.owner != me)
        rng2 = tprop(RANGE, t) ** 2
        atk_rel = []
        for dy in range(-R, R + 1):
            for dx in range(-R, R + 1):
                inrange = (dx * dx + dy * dy) <= rng2
                atk_rel.append(can_act & tprop(CAN_ATK, t) & inrange
                               & _shift(enemy, -dx, -dy, fill=False))
        atk_rel = jnp.stack(atk_rel, axis=-1)  # [H,W,DIAM*DIAM]

        type_mask = jnp.stack(
            [can_act,  # NONE legal whenever the unit can act
             jnp.any(move_d, -1), jnp.any(harv_d, -1), jnp.any(ret_d, -1),
             jnp.any(prod_dir, -1), jnp.any(atk_rel, -1)], axis=-1)
        return dict(can_act=can_act, type=type_mask, move=move_d,
                    harvest=harv_d, ret=ret_d, produce_dir=prod_dir,
                    produce_type=prod_type, produce_pair=prod_pair,
                    attack=atk_rel)

    return Engine(cfg=cfg, validate=validate, issue=issue,
                  issue_env=issue_env, cycle=cycle,
                  legal_masks=legal_masks, winner=winner, gameover=gameover)
