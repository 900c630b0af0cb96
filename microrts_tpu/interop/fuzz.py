"""Differential fuzzing: JAX engine vs the trace-validated oracle.

Drives both engines with an identical stream of randomly sampled legal
actions (the oracle's ``get_unit_actions`` is the sampler, so conflicting
cross-player claims occur naturally and exercise the CANCEL_BOTH chains of
GameState.java:263-297), diffing the full plane state every tick.
"""

from __future__ import annotations

import random
from typing import List, Tuple

from .. import refimpl
from ..engine import kernel as K
from ..engine.pgs import PhysicalGameState
from ..engine.types import EngineConfig, state_from_pgs
from ..engine.utt import UnitTypeTable
from .bridge import candidates_from_actions, diff_vs_oracle


def random_playout_diff(map_path: str, utt: UnitTypeTable, steps: int,
                        seed: int, issue_every: int = 1,
                        none_duration: int = 1) -> int:
    """Run both engines `steps` ticks with identical random legal actions.
    Returns ticks verified; raises AssertionError on first divergence."""
    import jax

    rng = random.Random(seed)
    pgs = PhysicalGameState.load(map_path, utt)
    cfg = EngineConfig.from_utt(utt, pgs.height, pgs.width)
    eng = K.make_engine(cfg)
    issue_j = jax.jit(eng.issue)
    cycle_j = jax.jit(eng.cycle)

    gs = refimpl.GameState(pgs.clone(), utt)
    state = state_from_pgs(pgs.clone(), cfg)

    for step in range(steps):
        if step % issue_every == 0:
            actions: List[Tuple[Tuple[int, int], refimpl.UnitAction]] = []
            for player in (0, 1):
                # sample like PlayerActionGenerator.getRandom (:201-222):
                # per-player cumulative consistency against in-flight
                # reservations + this PlayerAction so far.  Cross-player
                # same-tick conflicts still occur (both players sample from
                # the same pre-issue state, as in Game.java:134-137).
                used_pos = set()
                spent = 0
                for a in gs.unit_actions.values():
                    pos, res = refimpl.resource_usage(
                        a.action, a.unit, gs.pgs, utt)
                    used_pos.update(pos)
                    spent += res[player]
                budget = gs.pgs.players[player].resources
                for u in list(gs.pgs.units):
                    if u.player != player or gs.get_assignment(u) is not None:
                        continue
                    choices = list(gs.get_unit_actions(u, none_duration))
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
            # oracle: issue exactly like the Java main loop (p0 then p1,
            # Game.java:136-137) — both "same tick", one combined order
            gs.issue_safe(actions_to_pairs(gs, actions))
            state = issue_j(state, candidates_from_actions(
                actions, cfg.height, cfg.width))
            errs = diff_vs_oracle(state, gs)
            if errs:
                raise AssertionError(
                    f"post-issue t={gs.time} step={step}: " + "; ".join(errs))
        gs.cycle()
        state, _ = cycle_j(state)
        errs = diff_vs_oracle(state, gs)
        if errs:
            raise AssertionError(
                f"post-cycle t={gs.time} step={step}: " + "; ".join(errs))
        if gs.gameover():
            break
    return step + 1


def actions_to_pairs(gs: refimpl.GameState, actions):
    by_pos = {(u.x, u.y): u for u in gs.pgs.units}
    return [(by_pos[xy], ua) for xy, ua in actions]
