"""Differential fuzzing of the gridnet RL path: env.step vs an oracle-side
replica of the Java client flow.

Oracle side replicates, sequentially and literally:
  PlayerAction.fromVectorAction (PlayerAction.java:384-417)
  UnitAction.fromVectorAction   (UnitAction.java:675-709)
  fillWithNones(gs, player, 1)  (JNIAI.java:53)
  gs.issueSafe per player, gs.cycle  (JNIGridnetClientSelfPlay.java:159-190)
"""

from __future__ import annotations

import random
from typing import List, Tuple

import numpy as np

from .. import refimpl
from ..engine.pgs import PhysicalGameState
from ..engine.utt import UnitTypeTable
from ..env.gridnet import GridnetEnv
from .bridge import diff_vs_oracle


def oracle_decode(gs: refimpl.GameState, utt: UnitTypeTable,
                  actions: np.ndarray, player: int, max_range: int):
    """Java PlayerAction.fromVectorAction + fillWithNones(...,1).
    ``actions``: [H, W, 7].  Returns ordered [(unit, UnitAction)]."""
    h, w = gs.pgs.height, gs.pgs.width
    D = 2 * max_range + 1
    # base_ru: every existing assignment's usage (both players)
    used_pos: List[int] = []
    used_res = [0, 0]
    for a in gs.unit_actions.values():
        pos, res = refimpl.resource_usage(a.action, a.unit, gs.pgs, utt)
        used_pos += pos
        used_res[0] += res[0]
        used_res[1] += res[1]
    pa: List[Tuple[object, refimpl.UnitAction]] = []
    for y in range(h):
        for x in range(w):
            u = gs.pgs.get_unit_at(x, y)
            if u is None or u.player != player or gs.get_assignment(u):
                continue
            row = actions[y, x]
            at = int(row[0])
            ua = refimpl.UnitAction(at)
            if at == refimpl.TYPE_MOVE:
                ua.parameter = int(row[1])
            elif at == refimpl.TYPE_HARVEST:
                ua.parameter = int(row[2])
            elif at == refimpl.TYPE_RETURN:
                ua.parameter = int(row[3])
            elif at == refimpl.TYPE_PRODUCE:
                ua.parameter = int(row[4])
                ua.unit_type = int(row[5])
            elif at == refimpl.TYPE_ATTACK_LOCATION:
                rel = int(row[6])
                ua.x = u.x + rel % D - max_range
                ua.y = u.y + rel // D - max_range
            # consistentWith(pa_ru): positions disjoint; per-player budget
            # with the zero-skip (ResourceUsage.java:31-50)
            pos, res = refimpl.resource_usage(ua, u, gs.pgs, utt)
            ok = all(p not in used_pos for p in pos)
            if ok and res[player] > 0 and used_res[player] > 0:
                if used_res[player] + res[player] > \
                        gs.pgs.players[player].resources:
                    ok = False
            if ok:
                used_pos += pos
                used_res[0] += res[0]
                used_res[1] += res[1]
                pa.append((u, ua))
    # fillWithNones(gs, player, 1)
    in_pa = {id(u) for u, _ in pa}
    for u in gs.pgs.units:
        if (u.player == player and gs.get_assignment(u) is None
                and id(u) not in in_pa):
            pa.append((u, refimpl.UnitAction(refimpl.TYPE_NONE, 1)))
    return pa


def sample_gridnet_actions(gs: refimpl.GameState, utt: UnitTypeTable,
                           player: int, rng: random.Random,
                           max_range: int, garbage_rate: float = 0.1):
    """Random per-cell gridnet actions: mostly legal picks, some garbage."""
    h, w = gs.pgs.height, gs.pgs.width
    D = 2 * max_range + 1
    out = np.zeros((h, w, 7), np.int64)
    for u in gs.pgs.units:
        if u.player != player or gs.get_assignment(u):
            continue
        row = out[u.y, u.x]
        if rng.random() < garbage_rate:
            row[0] = rng.randrange(6)
            for i in range(1, 5):
                row[i] = rng.randrange(4)
            row[5] = rng.randrange(utt.num_types)
            row[6] = rng.randrange(D * D)
            continue
        choices = gs.get_unit_actions(u, 1)
        ua = rng.choice(choices)
        row[0] = ua.type
        if ua.type == refimpl.TYPE_MOVE:
            row[1] = ua.parameter
        elif ua.type == refimpl.TYPE_HARVEST:
            row[2] = ua.parameter
        elif ua.type == refimpl.TYPE_RETURN:
            row[3] = ua.parameter
        elif ua.type == refimpl.TYPE_PRODUCE:
            row[4] = ua.parameter
            row[5] = ua.unit_type
        elif ua.type == refimpl.TYPE_ATTACK_LOCATION:
            rel_x = ua.x - u.x + max_range
            rel_y = ua.y - u.y + max_range
            row[6] = rel_y * D + rel_x
    return out


def gridnet_playout_diff(map_path: str, utt: UnitTypeTable, steps: int,
                         seed: int, garbage_rate: float = 0.1) -> int:
    """Drive env.step and the oracle client flow with identical gridnet
    tensors; diff full state every tick."""
    import jax
    import jax.numpy as jnp

    rng = random.Random(seed)
    env = GridnetEnv(map_path, utt)
    R = env.cfg.engine.max_range
    gs = refimpl.GameState(PhysicalGameState.load(map_path, utt).clone(), utt)
    state = env.reset(jax.random.PRNGKey(seed))
    step_j = jax.jit(env.step)

    for step in range(steps):
        a0 = sample_gridnet_actions(gs, utt, 0, rng, R, garbage_rate)
        a1 = sample_gridnet_actions(gs, utt, 1, rng, R, garbage_rate)
        # oracle: sequential decode+issue per player, then cycle
        pa0 = oracle_decode(gs, utt, a0, 0, R)
        gs.issue_safe(pa0)
        pa1 = oracle_decode(gs, utt, a1, 1, R)
        gs.issue_safe(pa1)
        gs.cycle()
        state, rewards, done = step_j(state, jnp.asarray(a0, jnp.int32),
                                      jnp.asarray(a1, jnp.int32))
        errs = diff_vs_oracle(state, gs)
        if errs:
            raise AssertionError(f"t={gs.time} step={step}: " + "; ".join(errs))
        if gs.gameover():
            break
    return step + 1
