"""Odometer joint-action enumeration vs a brute-force oracle.

The Java ``PlayerActionGenerator.getNextAction`` walk (last unit to first,
merge-or-break — PlayerActionGenerator.java:151-195) emits exactly the
assignments whose resource usages are pairwise consistent AND consistent
with the in-flight base usage (a full walk succeeds iff no pair of chosen
actions shares a claimed position and the player's total produce cost fits
the budget).  The oracle here enumerates that set directly with
itertools.product over ``refimpl.get_unit_actions`` choice lists; the
device odometer must produce the same SET (order is a documented
divergence: cell-major units / catalog-order arms vs Java insertion
order).
"""

import itertools
import random

import jax
import numpy as np
import pytest

from microrts_tpu import refimpl
from microrts_tpu.engine.pgs import PhysicalGameState
from microrts_tpu.engine.utt import UnitTypeTable
from microrts_tpu.engine.types import state_from_pgs
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.interop.bridge import candidates_from_actions
from microrts_tpu.interop.fuzz import actions_to_pairs
from microrts_tpu.ops.enumerate import enumerate_joint_actions
from microrts_tpu.utils.assets import asset_path

TYPE_NONE = 0
TYPE_MOVE = 1
TYPE_HARVEST = 2
TYPE_RETURN = 3
TYPE_PRODUCE = 4
TYPE_ATTACK = 5


def _ua_to_arm(ua: refimpl.UnitAction, u, env) -> int:
    """Map a refimpl UnitAction to its arm-catalog index (ops/arms.py)."""
    T = env.cfg.engine.num_types
    R = env.cfg.engine.max_range
    D = 2 * R + 1
    if ua.type == TYPE_NONE:
        return 0
    if ua.type == TYPE_MOVE:
        return 1 + ua.parameter
    if ua.type == TYPE_HARVEST:
        return 5 + ua.parameter
    if ua.type == TYPE_RETURN:
        return 9 + ua.parameter
    if ua.type == TYPE_PRODUCE:
        return 13 + ua.parameter * T + ua.unit_type
    # ATTACK_LOCATION: absolute (x, y) -> relative window position
    r = (ua.y - u.y + R) * D + (ua.x - u.x + R)
    return 13 + 4 * T + r


def _oracle_joint_actions(gs: refimpl.GameState, player: int, env,
                          cap: int = 60000):
    """All consistent joint actions as a set of frozensets of
    (flat_pos, arm).  Returns None when the raw product exceeds ``cap``
    (test then skips this tick)."""
    utt = gs.utt
    W = gs.pgs.width
    # base usage: in-flight reservations of both players (gs.getResourceUsage)
    base_pos = set()
    base_spent = 0
    for a in gs.unit_actions.values():
        pos, res = refimpl.resource_usage(a.action, a.unit, gs.pgs, utt)
        base_pos.update(pos)
        base_spent += res[player]
    budget = gs.pgs.players[player].resources

    units = [u for u in gs.pgs.units
             if u.player == player and gs.get_assignment(u) is None]
    if not units:
        return {frozenset()}
    choice_lists = []
    total = 1
    for u in units:
        acts = gs.get_unit_actions(u, 10)
        choice_lists.append([(u, ua) for ua in acts])
        total *= len(acts)
        if total > cap:
            return None

    out = set()
    for combo in itertools.product(*choice_lists):
        used = set(base_pos)
        spent = base_spent
        ok = True
        for u, ua in combo:
            pos, res = refimpl.resource_usage(ua, u, gs.pgs, utt)
            if any(p in used for p in pos):
                ok = False
                break
            if res[player] and spent + res[player] > budget:
                ok = False
                break
            used.update(pos)
            spent += res[player]
        if ok:
            out.add(frozenset(
                (u.x + u.y * W, _ua_to_arm(ua, u, env))
                for u, ua in combo))
    return out


def _device_joint_actions(env, state, player, n: int):
    arms, valid = enumerate_joint_actions(env, state, player, n)
    arms = np.asarray(arms).reshape(n, -1)
    valid = np.asarray(valid)
    out = set()
    for k in range(n):
        if not valid[k]:
            continue
        cells = np.nonzero(arms[k] >= 0)[0]
        out.add(frozenset((int(c), int(arms[k][c])) for c in cells))
    return out, int(valid.sum())


@pytest.mark.parametrize("map_rel,ticks", [
    ("maps/melee4x4light2.xml", 12),
    ("maps/8x8/basesWorkers8x8.xml", 16),
])
@pytest.mark.smoke
def test_enumeration_matches_oracle_set(map_rel, ticks):
    map_path = asset_path(map_rel)
    utt = UnitTypeTable(2)
    env = GridnetEnv(map_path, utt)
    pgs = PhysicalGameState.load(map_path, utt)
    gs = refimpl.GameState(pgs.clone(), utt)
    state = state_from_pgs(pgs.clone(), env.cfg.engine)
    issue_j = jax.jit(env.engine.issue)
    cycle_j = jax.jit(env.engine.cycle)
    rng = random.Random(7)

    compared = 0
    for step in range(ticks):
        for player in (0, 1):
            oracle = _oracle_joint_actions(gs, player, env)
            if oracle is None:
                continue
            dev, n_dev = _device_joint_actions(
                env, state, player, max(len(oracle) + 8, 16))
            assert dev == oracle, (
                f"t={gs.time} p={player}: device {n_dev} vs oracle "
                f"{len(oracle)}; missing={list(oracle - dev)[:3]} "
                f"extra={list(dev - oracle)[:3]}")
            compared += 1

        # advance both in lockstep with random legal actions (fuzz-style)
        actions = []
        for player in (0, 1):
            used_pos = set()
            spent = 0
            for a in gs.unit_actions.values():
                pos, res = refimpl.resource_usage(a.action, a.unit, gs.pgs,
                                                  utt)
                used_pos.update(pos)
                spent += res[player]
            budget = gs.pgs.players[player].resources
            for u in list(gs.pgs.units):
                if u.player != player or gs.get_assignment(u) is not None:
                    continue
                choices = list(gs.get_unit_actions(u, 1))
                rng.shuffle(choices)
                for ua in choices:
                    pos, res = refimpl.resource_usage(ua, u, gs.pgs, utt)
                    if any(p in used_pos for p in pos):
                        continue
                    if spent + res[player] > budget:
                        continue
                    used_pos.update(pos)
                    spent += res[player]
                    actions.append(((u.x, u.y), ua))
                    break
        gs.issue_safe(actions_to_pairs(gs, actions))
        state = issue_j(state, candidates_from_actions(
            actions, env.cfg.engine.height, env.cfg.engine.width))
        gs.cycle()
        state, _ = cycle_j(state)
        if gs.gameover():
            break
    assert compared >= 4  # the comparison must actually have run


@pytest.mark.parametrize("map_rel", [
    "maps/melee4x4light2.xml",
    "maps/8x8/basesWorkers8x8.xml",
])
@pytest.mark.smoke
def test_first_enumeration_is_aggressive_prefix(map_rel):
    """The FIRST enumerated joint action gives every acting unit its
    HIGHEST-catalog legal arm (attacks > produce > return > harvest >
    moves > NONE), mirroring Unit.getUnitActions' class precedence
    (Unit.java:389-519).  A budget-truncated DFS evaluates the
    enumeration prefix, so this ordering is load-bearing for exact
    ABCD/RTMinimax strength (commit ffa2c57: moves-first enumeration
    measured exact ABCD at 0% vs RandomBiasedAI)."""
    from microrts_tpu.ops.enumerate import make_enumerator

    map_path = asset_path(map_rel)
    utt = UnitTypeTable(2)
    env = GridnetEnv(map_path, utt)
    pgs = PhysicalGameState.load(map_path, utt)
    gs = refimpl.GameState(pgs.clone(), utt)
    state = state_from_pgs(pgs.clone(), env.cfg.engine)
    init, next_action = make_enumerator(env)
    for player in (0, 1):
        od, ctx = init(state, player)
        _, arms, ok = jax.jit(next_action)(od, ctx)
        assert bool(ok)
        acting = np.asarray(ctx.acting)
        arms = np.asarray(arms).reshape(-1)
        assert (arms[~acting] == -1).all()
        # oracle: of ALL consistent joint actions, the first emission
        # must be the lexicographically LARGEST by descending catalog
        # arm, most-significant digit = highest flat cell (the odometer's
        # digit order) — i.e. every unit takes its most aggressive arm
        # consistent with the (greedily maximized) higher cells
        oracle = _oracle_joint_actions(gs, player, env)
        assert oracle is not None
        cells = sorted(np.nonzero(acting)[0].tolist(), reverse=True)

        def keyof(fs):
            d = dict(fs)
            return tuple(d[c] for c in cells)

        best = max(oracle, key=keyof)
        got = {(int(c), int(arms[c])) for c in np.nonzero(acting)[0]}
        assert got == set(best), (
            f"p{player}: first joint action {sorted(got)} is not the "
            f"aggressive-first maximum {sorted(best)}")
