"""Lazy odometer enumeration of joint player actions.

TPU re-design of ``rts/PlayerActionGenerator`` (PlayerActionGenerator.java:
44-195): the Java generator keeps a per-unit list of legal UnitActions and a
mixed-radix counter (``currentChoice``); ``getNextAction`` walks the counter
through the cartesian product, skipping whole subtrees whose suffix is
already ResourceUsage-inconsistent (it builds the action from the LAST unit
to the FIRST, breaks at the first conflicting position, and bumps the
counter AT that position — zeroing everything below it).

Here the counter is a dense ``int32 [H*W]`` plane (one digit per cell), the
per-unit action lists are rows of the fixed arm catalog (ops/arms.py), and
one ``next_action`` call is a ``lax.while_loop`` whose body advances the
odometer exactly like ``incrementCurrentChoice`` and evaluates the
consistency of ALL suffixes at once with a reverse cumulative-OR over a
flat claim buffer (the same padded flat-position space as the decode path,
row-wrap quirk included — UnitAction.resourceUsage:246-296).  Everything is
fixed-shape, so searches built on it (``bots/minimax.py``) jit and vmap.

Documented divergences from the Java generator (order only, not the set):

* unit order is row-major cell order (Java: ``PhysicalGameState.getUnits()``
  insertion order); arm order per unit is catalog order with NONE last
  (Java: ``Unit.getUnitActions`` emission order, which also ends in NONE).
  The enumerated SET of consistent joint actions is identical;
  tests/test_enumerate.py proves it by differential set-compare against
  the refimpl spec.
* Java raises when no unit can act; here the empty joint action is emitted
  once (callers gate on ``canExecuteAnyAction`` exactly like the reference).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.types import INF
from .arms import ArmSpace, arm_masks, arm_space

# flat-offset table per direction (up, right, down, left) in the padded
# claim space of length H*W + 2*W (slot = pos + W), as in env.decode


class Odometer(NamedTuple):
    choice: jax.Array  # int32 [H*W] current digit per cell
    more: jax.Array    # bool: counter has not wrapped past the end


class EnumCtx(NamedTuple):
    """Per-(state, player) static context for the odometer."""
    la: jax.Array        # bool  [HW, A] legal arm catalog rows
    size: jax.Array      # int32 [HW] digits' radix (>= 1)
    acting: jax.Array    # bool  [HW]
    slot_arm: jax.Array  # int32 [HW, A] claim slot per arm (L = none)
    cost_arm: jax.Array  # int32 [A] produce cost per arm
    claimed0: jax.Array  # bool  [L] in-flight claim slots (both players)
    spent0: jax.Array    # int32 in-flight produce spend of this player
    balance: jax.Array   # int32 this player's resources


def _arm_tables(sp: ArmSpace, cost) -> tuple:
    """Static per-arm (claim-dir, produce-cost) tables, -1 / 0 = none."""
    T = sp.num_types
    A = sp.n_arms
    d = np.full(A, -1, np.int32)
    c = np.zeros(A, np.int32)
    for k in range(4):
        d[1 + k] = k                      # MOVE dir k claims its target
    for k in range(4):
        for t in range(T):
            d[13 + k * T + t] = k         # PRODUCE dir k claims its target
            c[13 + k * T + t] = cost[t]
    return d, c


def make_enumerator(env):
    """Build ``(init, next_action)`` for ``env``.

    ``init(state, player) -> (Odometer, EnumCtx)``
    ``next_action(od, ctx) -> (od', arms int32 [H, W] (-1 = no unit), valid)``
      valid=False once the product is exhausted (getNextAction -> null).
    """
    sp = arm_space(env)
    H, W = env.h, env.w
    HW, A = H * W, sp.n_arms
    L = HW + 2 * W
    OFF = (-W, 1, W, -1)
    dir_np, cost_np = _arm_tables(sp, env.cfg.engine.cost)
    # slot per (cell, arm): W + cell + OFF[dir]  (L where the arm claims
    # nothing).  Static table -> no gathers at trace time.
    cell = np.arange(HW, dtype=np.int32)[:, None]
    slot_np = np.where(dir_np[None, :] >= 0,
                       W + cell + np.where(dir_np[None, :] >= 0,
                                           np.asarray(OFF, np.int32)[
                                               np.maximum(dir_np, 0)][None, :],
                                           0),
                       L).astype(np.int32)
    # out-of-board claims cannot arise from legal arms (legality already
    # excludes off-board moves), but clip defensively to the scratch slot.
    slot_np = np.where((slot_np < 0) | (slot_np >= L), L, slot_np)

    def init(state, player):
        m = env.engine.legal_masks(state, player)
        la = arm_masks(sp, m).reshape(HW, A)
        acting = m["can_act"].reshape(HW)
        size = jnp.maximum(jnp.sum(la, -1), 1).astype(jnp.int32)
        bal = jnp.where(jnp.int32(player) == 1, state.resources[1],
                        state.resources[0])
        ctx = EnumCtx(
            la=la, size=size, acting=acting,
            slot_arm=jnp.asarray(slot_np), cost_arm=jnp.asarray(cost_np),
            claimed0=env._inflight_claims(state),
            spent0=env._inflight_spent(state, jnp.int32(player)),
            balance=bal)
        return Odometer(choice=jnp.zeros(HW, jnp.int32),
                        more=jnp.bool_(True)), ctx

    def _arms_of(ctx: EnumCtx, choice: jax.Array) -> jax.Array:
        """k-th legal arm per cell (k = digit), -1 for non-acting cells.

        Per-unit arm order = DESCENDING catalog index: attacks, then
        produce, return, harvest, moves, NONE last (NONE is catalog 0).
        This mirrors Unit.getUnitActions' class precedence — attacks
        first, NONE appended last (Unit.java:389-519) — which matters
        beyond the set: a budget-truncated DFS evaluates the enumeration
        PREFIX, and the Java prefix opens with every unit's most
        aggressive action.  (Enumerating moves-first measured exact
        ABCD/RTMinimax at 0% vs RandomBiasedAI — the budget exhausted
        inside passive-opening subtrees.)  Intra-class order is reversed
        vs Java (e.g. move left before up) — order-only divergence; the
        enumerated SET is identical (tests/test_enumerate.py).
        """
        la_rev = ctx.la[:, ::-1]                   # A-1 ... 1, 0=NONE
        kth = (jnp.cumsum(la_rev, axis=-1) - 1 == choice[:, None]) & la_rev
        arm = A - 1 - jnp.argmax(kth, axis=-1).astype(jnp.int32)
        return jnp.where(ctx.acting, arm, -1)

    def _consistency(ctx: EnumCtx, arms: jax.Array):
        """(consistent, fail_pos): Java's last-to-first merge walk, all
        suffixes at once.  fail_pos = the LARGEST cell index whose action
        conflicts with the merged usage of every later cell + base_ru."""
        # one-hot lookup of (claim slot, produce cost) per cell — dense
        # compare+reduce, no gathers (CLAUDE.md perf rule)
        oh = (jax.lax.broadcasted_iota(jnp.int32, (HW, A), 1)
              == arms[:, None])
        slot = jnp.sum(jnp.where(oh, ctx.slot_arm, 0), axis=-1)
        slot = jnp.where(arms >= 0, slot, L)
        cost = jnp.sum(jnp.where(oh, ctx.cost_arm[None, :], 0), axis=-1)
        claims = (jax.lax.broadcasted_iota(jnp.int32, (HW, L + 1), 1)
                  == slot[:, None]) & (slot < L)[:, None]
        # suffix OR excluding self: reversed exclusive cumulative-or
        suf = jnp.cumsum(claims[::-1].astype(jnp.int32), axis=0)[::-1]
        suf_excl = (suf - claims.astype(jnp.int32)) > 0
        base = jnp.concatenate([ctx.claimed0, jnp.zeros(1, bool)])
        pos_fail = jnp.any(claims & (suf_excl | base[None, :]), axis=-1)
        suf_cost = jnp.cumsum(cost[::-1])[::-1] - cost
        acc = suf_cost + ctx.spent0 + cost
        res_fail = (cost > 0) & (acc > 0) & (acc > ctx.balance)
        fail = pos_fail | res_fail
        any_fail = jnp.any(fail)
        fail_pos = HW - 1 - jnp.argmax(fail[::-1])
        return ~any_fail, jnp.where(any_fail, fail_pos, 0)

    def _increment(od: Odometer, ctx: EnumCtx, p: jax.Array) -> Odometer:
        """incrementCurrentChoice(p): zero digits < p, bump the first digit
        >= p that is below its radix cap, carry through maxed digits."""
        idx = jnp.arange(HW, dtype=jnp.int32)
        atmax = od.choice >= ctx.size - 1
        bump_ok = (idx >= p) & ~atmax
        has = jnp.any(bump_ok)
        first = jnp.argmax(bump_ok).astype(jnp.int32)
        nc = jnp.where(idx < jnp.where(has, first, HW), 0,
                       jnp.where(idx == jnp.where(has, first, -1),
                                 od.choice + 1, od.choice))
        return Odometer(choice=nc, more=od.more & has)

    def next_action(od: Odometer, ctx: EnumCtx):
        """getNextAction(-1): advance until a consistent joint action or
        exhaustion.  Returns (od', arms [H, W], valid)."""

        def cond(c):
            od, _, found = c
            return od.more & ~found

        def body(c):
            od, _, _ = c
            arms = _arms_of(ctx, od.choice)
            ok, fail_pos = _consistency(ctx, arms)
            od2 = _increment(od, ctx, jnp.where(ok, 0, fail_pos))
            return od2, arms, ok

        od, arms, found = jax.lax.while_loop(
            cond, body, (od, jnp.full(HW, -1, jnp.int32), jnp.bool_(False)))
        return od, jnp.where(found, arms, -1).reshape(H, W), found

    return init, next_action


def enumerate_joint_actions(env, state, player, max_actions: int):
    """First ``max_actions`` consistent joint actions in odometer order.

    Returns (arms int32 [K, H, W], valid bool [K]).  The exhaustive
    enumeration the minimax family needs on small boards
    (PlayerActionGenerator.getNextAction drained to null)."""
    init, next_action = make_enumerator(env)
    od, ctx = init(state, player)

    def step(od, _):
        od, arms, ok = next_action(od, ctx)
        return od, (arms, ok)

    _, (arms, ok) = jax.lax.scan(step, od, None, length=max_actions)
    return arms, ok
