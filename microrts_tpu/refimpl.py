"""Oracle interpreter: an exact, unvectorized model of the microRTS rules.

This module is the *test reference* for the TPU engine.  It reproduces, step
for step, the semantics of the Java engine's hot loop:

  - ``GameState.issue``      (GameState.java:249-328): sequential conflict
    resolution in LinkedHashMap insertion order, same-tick policy cancels,
    cross-tick cancel-new-only.
  - ``GameState.issueSafe``  (GameState.java:338-408): legality re-validation,
    unit re-binding, occupied-target recheck.
  - ``GameState.cycle``      (GameState.java:553-571): snapshot completion
    collection, execution in insertion order (dead units still act).
  - ``UnitAction.execute``   (UnitAction.java:338-465): move / attack /
    harvest / return / produce effects, pay-at-completion produce cost.
  - ``Unit.getUnitActions``  (Unit.java:368-522): legality generation.

It is NOT the production engine (that is ``microrts_tpu.engine``, pure JAX);
it exists so the JAX engine can be differentially tested against golden Java
replay traces and random playouts.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

from .engine.pgs import HostUnit, PhysicalGameState, TERRAIN_NONE
from .engine.utt import (
    MOVE_CONFLICT_RESOLUTION_CANCEL_ALTERNATING,
    MOVE_CONFLICT_RESOLUTION_CANCEL_RANDOM,
    UnitTypeTable,
)

# Action types (UnitAction.java:29-59)
TYPE_NONE = 0
TYPE_MOVE = 1
TYPE_HARVEST = 2
TYPE_RETURN = 3
TYPE_PRODUCE = 4
TYPE_ATTACK_LOCATION = 5
NUM_ACTION_TYPES = 6

# Directions (UnitAction.java:68-100)
DIRECTION_NONE = -1
DIRECTION_UP = 0
DIRECTION_RIGHT = 1
DIRECTION_DOWN = 2
DIRECTION_LEFT = 3
DIR_OFFSET_X = (0, 1, 0, -1)
DIR_OFFSET_Y = (-1, 0, 1, 0)


@dataclasses.dataclass
class UnitAction:
    """One durative action.  ``parameter`` is a direction, or the duration for
    TYPE_NONE; ``x, y`` target an attack; ``unit_type`` is the produced type id."""
    type: int = TYPE_NONE
    parameter: int = DIRECTION_NONE
    x: int = 0
    y: int = 0
    unit_type: Optional[int] = None

    def __eq__(self, other):
        # UnitAction.equals (UnitAction.java:191-208)
        if not isinstance(other, UnitAction):
            return NotImplemented
        if self.type != other.type:
            return False
        if self.type in (TYPE_NONE, TYPE_MOVE, TYPE_HARVEST, TYPE_RETURN):
            return self.parameter == other.parameter
        if self.type == TYPE_ATTACK_LOCATION:
            return self.x == other.x and self.y == other.y
        return self.parameter == other.parameter and self.unit_type == other.unit_type


@dataclasses.dataclass
class Assignment:
    unit: HostUnit
    action: UnitAction
    time: int


def resource_usage(ua: UnitAction, u: HostUnit, pgs: PhysicalGameState,
                   utt: UnitTypeTable) -> Tuple[List[int], List[int]]:
    """(positions_used, resources_used[2]) — UnitAction.resourceUsage :246-296."""
    positions: List[int] = []
    res = [0, 0]
    if ua.type == TYPE_MOVE:
        pos = (u.x + DIR_OFFSET_X[ua.parameter]) + (u.y + DIR_OFFSET_Y[ua.parameter]) * pgs.width
        positions.append(pos)
    elif ua.type == TYPE_PRODUCE:
        res[u.player] += int(utt.cost[ua.unit_type])
        pos = (u.x + DIR_OFFSET_X[ua.parameter]) + (u.y + DIR_OFFSET_Y[ua.parameter]) * pgs.width
        positions.append(pos)
    return positions, res


def usages_consistent(a: Tuple[List[int], List[int]],
                      b: Tuple[List[int], List[int]],
                      players) -> bool:
    """ResourceUsage.consistentWith(b) called on a (ResourceUsage.java:31-50).
    Note the asymmetric zero-skip on b's resources."""
    a_pos, a_res = a
    b_pos, b_res = b
    for pos in b_pos:
        if pos in a_pos:
            return False
    for i in range(2):
        if b_res[i] == 0:
            continue
        s = a_res[i] + b_res[i]
        if s > 0 and s > players[i].resources:
            return False
    return True


def eta(ua: UnitAction, u: HostUnit, utt: UnitTypeTable) -> int:
    """UnitAction.ETA (UnitAction.java:307-329)."""
    t = u.type_id
    if ua.type == TYPE_NONE:
        return ua.parameter
    if ua.type == TYPE_MOVE:
        return int(utt.move_time[t])
    if ua.type == TYPE_ATTACK_LOCATION:
        return int(utt.attack_time[t])
    if ua.type == TYPE_HARVEST:
        return int(utt.harvest_time[t])
    if ua.type == TYPE_RETURN:
        return int(utt.move_time[t])  # RETURN uses moveTime (UnitAction.java:321-322)
    if ua.type == TYPE_PRODUCE:
        return int(utt.produce_time[ua.unit_type])
    return 0


class GameState:
    """Oracle game state.  ``unit_actions`` preserves insertion order exactly
    like Java's LinkedHashMap keyed by unit identity (GameState.java:42)."""

    def __init__(self, pgs: PhysicalGameState, utt: UnitTypeTable,
                 next_id: Optional[int] = None):
        self.pgs = pgs
        self.utt = utt
        self.time = 0
        self.unit_actions: Dict[int, Assignment] = {}  # id(unit) -> Assignment, ordered
        self.cancel_counter = 0  # GameState.unitCancelationCounter :38
        # Unit.next_ID static (Unit.java:34): bumped past every explicit ID
        self.next_id = next_id if next_id is not None else (
            max((u.ID for u in pgs.units), default=-1) + 1)

    # ------------------------------------------------------------------
    def get_assignment(self, u: HostUnit) -> Optional[Assignment]:
        return self.unit_actions.get(id(u))

    def remove_unit(self, u: HostUnit) -> None:
        self.pgs.remove_unit(u)
        self.unit_actions.pop(id(u), None)

    def free_cell(self, x: int, y: int) -> bool:
        """GameState.free (GameState.java:191-207): empty terrain, no standing
        unit, and no in-flight move/produce targeting the cell."""
        if self.pgs.get_terrain(x, y) != TERRAIN_NONE:
            return False
        if self.pgs.get_unit_at(x, y) is not None:
            return False
        for a in self.unit_actions.values():
            if a.action.type in (TYPE_MOVE, TYPE_PRODUCE):
                d = a.action.parameter
                if (a.unit.x + DIR_OFFSET_X[d] == x
                        and a.unit.y + DIR_OFFSET_Y[d] == y):
                    return False
        return True

    # ------------------------------------------------------------------
    def get_unit_actions(self, u: HostUnit, none_duration: int = 10) -> List[UnitAction]:
        """Unit.getUnitActions (Unit.java:382-522), exact ordering included:
        attacks, harvests, returns, produces (per produced type), moves, NONE."""
        utt, pgs = self.utt, self.pgs
        t = u.type_id
        l: List[UnitAction] = []

        uup = pgs.get_unit_at(u.x, u.y - 1) if u.y > 0 else None
        uright = pgs.get_unit_at(u.x + 1, u.y) if u.x < pgs.width - 1 else None
        udown = pgs.get_unit_at(u.x, u.y + 1) if u.y < pgs.height - 1 else None
        uleft = pgs.get_unit_at(u.x - 1, u.y) if u.x > 0 else None
        around = [(uup, DIRECTION_UP), (uright, DIRECTION_RIGHT),
                  (udown, DIRECTION_DOWN), (uleft, DIRECTION_LEFT)]

        if utt.can_attack[t]:
            if utt.attack_range[t] == 1:
                for other, _d in around:
                    if other is not None and other.player != u.player and other.player >= 0:
                        l.append(UnitAction(TYPE_ATTACK_LOCATION, x=other.x, y=other.y))
            else:
                sq = int(utt.attack_range[t]) ** 2
                for other in pgs.units:
                    if other.player < 0 or other.player == u.player:
                        continue
                    if (other.x - u.x) ** 2 + (other.y - u.y) ** 2 <= sq:
                        l.append(UnitAction(TYPE_ATTACK_LOCATION, x=other.x, y=other.y))

        if utt.can_harvest[t]:
            if u.resources == 0:
                for other, d in around:
                    if other is not None and utt.is_resource[other.type_id]:
                        l.append(UnitAction(TYPE_HARVEST, d))
            if u.resources > 0:
                for other, d in around:
                    if (other is not None and utt.is_stockpile[other.type_id]
                            and other.player == u.player):
                        l.append(UnitAction(TYPE_RETURN, d))

        # produce (Unit.java:473-495): NOTE ignores in-flight reservations
        player = self.pgs.players[u.player] if u.player >= 0 else None
        for pt in range(utt.num_types):
            if not utt.produces_mask[t, pt]:
                continue
            if player is not None and player.resources >= int(utt.cost[pt]):
                for other, d in around:
                    nx, ny = u.x + DIR_OFFSET_X[d], u.y + DIR_OFFSET_Y[d]
                    if not (0 <= nx < pgs.width and 0 <= ny < pgs.height):
                        continue
                    if pgs.get_terrain(nx, ny) == TERRAIN_NONE and other is None:
                        l.append(UnitAction(TYPE_PRODUCE, d, unit_type=pt))

        if utt.can_move[t]:
            for other, d in around:
                nx, ny = u.x + DIR_OFFSET_X[d], u.y + DIR_OFFSET_Y[d]
                if not (0 <= nx < pgs.width and 0 <= ny < pgs.height):
                    continue
                if pgs.get_terrain(nx, ny) == TERRAIN_NONE and other is None:
                    l.append(UnitAction(TYPE_MOVE, d))

        l.append(UnitAction(TYPE_NONE, none_duration))
        return l

    def can_execute_action(self, u: HostUnit, ua: UnitAction) -> bool:
        """Unit.canExecuteAction (Unit.java:531-534)."""
        return ua in self.get_unit_actions(u, eta(ua, u, self.utt))

    # ------------------------------------------------------------------
    def issue(self, pa: List[Tuple[HostUnit, UnitAction]],
              rng=None) -> bool:
        """GameState.issue (GameState.java:249-328): per new action, scan all
        existing assignments in insertion order for conflicts; same-tick
        conflicts resolved by policy, cross-tick conflicts cancel the new
        action (with parameter=-1, ergo immediate completion)."""
        issued_real = False
        for unit, ua in pa:
            ru_new = resource_usage(ua, unit, self.pgs, self.utt)
            for a in list(self.unit_actions.values()):
                ru_old = resource_usage(a.action, a.unit, self.pgs, self.utt)
                if usages_consistent(ru_old, ru_new, self.pgs.players):
                    continue
                if a.time == self.time:
                    cancel_old = cancel_new = False
                    crs = self.utt.move_conflict_resolution_strategy
                    if crs == MOVE_CONFLICT_RESOLUTION_CANCEL_RANDOM:
                        if rng is not None and rng.randrange(2) == 0:
                            cancel_new = True
                        else:
                            cancel_old = True
                    elif crs == MOVE_CONFLICT_RESOLUTION_CANCEL_ALTERNATING:
                        if self.cancel_counter % 2 == 0:
                            cancel_new = True
                        else:
                            cancel_old = True
                        self.cancel_counter += 1
                    else:  # CANCEL_BOTH (default for unknown too)
                        cancel_old = cancel_new = True
                    d1 = eta(a.action, a.unit, self.utt)
                    d2 = eta(ua, unit, self.utt)
                    if cancel_old:
                        a.action = UnitAction(TYPE_NONE, min(d1, d2))
                    if cancel_new:
                        ua = UnitAction(TYPE_NONE, min(d1, d2))
                        ru_new = resource_usage(ua, unit, self.pgs, self.utt)
                else:
                    # cross-cycle inconsistency: only the new action cancels,
                    # becoming NONE with parameter -1 (GameState.java:298-317)
                    ua = UnitAction(TYPE_NONE)
                    ru_new = resource_usage(ua, unit, self.pgs, self.utt)
            # LinkedHashMap.put: a plain dict assignment matches — an existing
            # key keeps its insertion position, a new key appends (Python
            # dicts preserve insertion order the same way).
            self.unit_actions[id(unit)] = Assignment(unit, ua, self.time)
            if ua.type != TYPE_NONE:
                issued_real = True
        return issued_real

    def issue_safe(self, pa: List[Tuple[HostUnit, UnitAction]], rng=None) -> bool:
        """GameState.issueSafe (GameState.java:338-408)."""
        checked: List[Tuple[HostUnit, UnitAction]] = []
        for unit, ua in pa:
            if not self.can_execute_action(unit, ua):
                ua = UnitAction(TYPE_NONE, eta(ua, unit, self.utt))
            # unit re-binding (:356-382): match by identity, else substitute by
            # position (first unit scanned at same x,y)
            found = any(u is unit for u in self.pgs.units)
            if not found:
                sub = None
                for u in self.pgs.units:
                    if sub is None and u.x == unit.x and u.y == unit.y:
                        sub = u
                if sub is not None:
                    unit = sub
            # occupied-target recheck (:384-400): standing units/terrain only
            positions, _res = resource_usage(ua, unit, self.pgs, self.utt)
            for pos in positions:
                x, y = pos % self.pgs.width, pos // self.pgs.width
                if (self.pgs.get_terrain(x, y) != TERRAIN_NONE
                        or self.pgs.get_unit_at(x, y) is not None):
                    ua = UnitAction(TYPE_NONE, eta(ua, unit, self.utt))
            checked.append((unit, ua))
        return self.issue(checked, rng=rng)

    # ------------------------------------------------------------------
    def cycle(self, rng=None) -> bool:
        """GameState.cycle (GameState.java:553-571)."""
        self.time += 1
        ready = [a for a in self.unit_actions.values()
                 if eta(a.action, a.unit, self.utt) + a.time <= self.time]
        for a in ready:
            self.unit_actions.pop(id(a.unit), None)
            self.execute(a.action, a.unit, rng=rng)
        return self.pgs.gameover()

    def execute(self, ua: UnitAction, u: HostUnit, rng=None) -> None:
        """UnitAction.execute (UnitAction.java:338-465)."""
        utt, pgs = self.utt, self.pgs
        if ua.type == TYPE_MOVE:
            u.x += DIR_OFFSET_X[ua.parameter]
            u.y += DIR_OFFSET_Y[ua.parameter]
        elif ua.type == TYPE_ATTACK_LOCATION:
            other = pgs.get_unit_at(ua.x, ua.y)
            if other is not None:
                mn, mx = int(utt.min_damage[u.type_id]), int(utt.max_damage[u.type_id])
                damage = mn if mn == mx else mn + rng.randrange(1 + mx - mn)
                other.hitpoints -= damage
                if other.hitpoints <= 0:
                    self.remove_unit(other)
        elif ua.type == TYPE_HARVEST:
            nx, ny = u.x + DIR_OFFSET_X[ua.parameter], u.y + DIR_OFFSET_Y[ua.parameter]
            node = pgs.get_unit_at(nx, ny)
            if (node is not None and utt.is_resource[node.type_id]
                    and utt.can_harvest[u.type_id] and u.resources == 0):
                amt = int(utt.harvest_amount[u.type_id])
                node.resources -= amt
                if node.resources <= 0:
                    self.remove_unit(node)
                u.resources = amt
        elif ua.type == TYPE_RETURN:
            nx, ny = u.x + DIR_OFFSET_X[ua.parameter], u.y + DIR_OFFSET_Y[ua.parameter]
            base = pgs.get_unit_at(nx, ny)
            if (base is not None and utt.is_stockpile[base.type_id]
                    and u.resources > 0):
                pgs.players[u.player].resources += u.resources
                u.resources = 0
        elif ua.type == TYPE_PRODUCE:
            tx, ty = u.x + DIR_OFFSET_X[ua.parameter], u.y + DIR_OFFSET_Y[ua.parameter]
            cost = int(utt.cost[ua.unit_type])
            player = pgs.players[u.player]
            new_unit = HostUnit(ID=self.next_id, player=u.player,
                                type_id=ua.unit_type, x=tx, y=ty, resources=0,
                                hitpoints=int(utt.hp[ua.unit_type]))
            self.next_id += 1
            if player.resources - cost >= 0:
                pgs.add_unit(new_unit)
                player.resources -= cost
            # else: illegal, unit not created, cost not paid
            # (UnitAction.java:452-461; note next_ID was still consumed by the
            # Unit constructor before the check)

    # ------------------------------------------------------------------
    def gameover(self) -> bool:
        return self.pgs.gameover()

    def winner(self) -> int:
        return self.pgs.winner()
