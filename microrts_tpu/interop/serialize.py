"""Checkpoint / resume & Java interop serialization.

Wire-compatible with the reference formats so states and replays cross the
Java boundary both ways:
  * full GameState XML incl. in-flight action assignments
    (GameState.toxml :763-801 / fromXML :845-889)
  * Trace XML zips readable by the Java TraceVisualizer
    (Trace.toxml :95-176, TraceEntry.toxml :106-117,
     UnitAction.toxml :544-561)
  * UnitTypeTable XML (UnitTypeTable.java:355-433)
Training state checkpoints use plain npz pytrees (utils side).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zipfile
from typing import List, Optional, Tuple

import numpy as np

from ..engine.pgs import HostPlayer, HostUnit, PhysicalGameState
from ..engine.types import EngineConfig, State, state_from_pgs
from ..engine.utt import UnitTypeTable
from .. import refimpl

# ----------------------------------------------------------------------
# host projections of a device state


def state_to_pgs(state: State, utt: UnitTypeTable) -> PhysicalGameState:
    """Device planes -> host PhysicalGameState (row-major unit order)."""
    utype = np.asarray(state.utype)
    owner = np.asarray(state.owner)
    hp = np.asarray(state.hp)
    carried = np.asarray(state.carried)
    uid = np.asarray(state.uid)
    h, w = utype.shape
    pgs = PhysicalGameState(w, h, np.asarray(state.terrain).reshape(-1)
                            .astype(np.int8))
    res = np.asarray(state.resources)
    pgs.players = [HostPlayer(0, int(res[0])), HostPlayer(1, int(res[1]))]
    for y in range(h):
        for x in range(w):
            if utype[y, x] > 0:
                pgs.units.append(HostUnit(
                    ID=int(uid[y, x]), player=int(owner[y, x]),
                    type_id=int(utype[y, x]) - 1, x=x, y=y,
                    resources=int(carried[y, x]),
                    hitpoints=int(hp[y, x])))
    return pgs


def state_assignments(state: State) -> List[Tuple[int, int, int, dict]]:
    """[(uid, issue_time, order, action_dict)] sorted by aorder (the
    LinkedHashMap iteration order)."""
    busy = np.asarray(state.busy)
    uid = np.asarray(state.uid)
    atime = np.asarray(state.atime)
    aorder = np.asarray(state.aorder)
    atype = np.asarray(state.atype)
    aparam = np.asarray(state.aparam)
    atx = np.asarray(state.atx)
    aty = np.asarray(state.aty)
    aptype = np.asarray(state.aptype)
    out = []
    h, w = busy.shape
    for y in range(h):
        for x in range(w):
            if busy[y, x]:
                out.append((
                    int(uid[y, x]), int(atime[y, x]), int(aorder[y, x]),
                    dict(type=int(atype[y, x]), parameter=int(aparam[y, x]),
                         x=int(atx[y, x]), y=int(aty[y, x]),
                         unit_type=int(aptype[y, x]))))
    out.sort(key=lambda r: r[2])
    return out


# ----------------------------------------------------------------------
# XML writers (wire format of the reference)


def _action_xml(a: dict, utt: UnitTypeTable, indent: str = "") -> str:
    t = a["type"]
    attrs = f'type="{t}" '
    if t == refimpl.TYPE_ATTACK_LOCATION:
        attrs += f'x="{a["x"]}" y="{a["y"]}"'
    else:
        if a["parameter"] != refimpl.DIRECTION_NONE:
            attrs += f'parameter="{a["parameter"]}"'
            if t == refimpl.TYPE_PRODUCE:
                attrs += " "
        if t == refimpl.TYPE_PRODUCE:
            attrs += f'unitType="{utt.unit_types[a["unit_type"]].name}"'
    return f"{indent}<UnitAction {attrs.rstrip()}>\n{indent}</UnitAction>"


def utt_to_xml(utt: UnitTypeTable) -> str:
    parts = [f'<rts.units.UnitTypeTable moveConflictResolutionStrategy='
             f'"{utt.move_conflict_resolution_strategy}">']
    for ut in utt.unit_types:
        def b(v):
            return "true" if v else "false"
        parts.append(
            f'  <rts.units.UnitType ID="{ut.ID}" name="{ut.name}" '
            f'cost="{ut.cost}" hp="{ut.hp}" minDamage="{ut.min_damage}" '
            f'maxDamage="{ut.max_damage}" attackRange="{ut.attack_range}" '
            f'produceTime="{ut.produce_time}" moveTime="{ut.move_time}" '
            f'attackTime="{ut.attack_time}" harvestTime="{ut.harvest_time}" '
            f'returnTime="{ut.return_time}" '
            f'harvestAmount="{ut.harvest_amount}" '
            f'sightRadius="{ut.sight_radius}" isResource="{b(ut.is_resource)}" '
            f'isStockpile="{b(ut.is_stockpile)}" '
            f'canHarvest="{b(ut.can_harvest)}" canMove="{b(ut.can_move)}" '
            f'canAttack="{b(ut.can_attack)}">')
        for name in ut.produces:
            parts.append(f'    <produces type="{name}"/>')
        for name in ut.produced_by:
            parts.append(f'    <producedBy type="{name}"/>')
        parts.append('  </rts.units.UnitType>')
    parts.append('</rts.units.UnitTypeTable>')
    return "\n".join(parts)


def state_to_xml(state: State, utt: UnitTypeTable) -> str:
    """GameState.toxml (:763-783)."""
    pgs = state_to_pgs(state, utt)
    parts = [f'<rts.GameState time="{int(state.time)}">',
             pgs.to_xml(utt)]
    parts.append("<actions>")
    for uid, atime, _order, a in state_assignments(state):
        parts.append(f'  <unitAction ID="{uid}" time="{atime}">')
        parts.append(_action_xml(a, utt, "    "))
        parts.append("  </unitAction>")
    parts.append("</actions>")
    parts.append("</rts.GameState>")
    return "\n".join(parts)


def state_from_xml(text: str, utt: UnitTypeTable,
                   cfg: Optional[EngineConfig] = None) -> State:
    """GameState.fromXML (:845-889) -> device State (incl. in-flight
    assignments, aorder = document order)."""
    import jax.numpy as jnp

    root = ET.fromstring(text)
    time = int(root.get("time", 0))
    pgs = PhysicalGameState.from_xml(root.find("rts.PhysicalGameState"), utt)
    if cfg is None:
        cfg = EngineConfig.from_utt(utt, pgs.height, pgs.width)
    state = state_from_pgs(pgs, cfg, time=time)
    busy = np.zeros((pgs.height, pgs.width), bool)
    planes = {k: np.zeros((pgs.height, pgs.width), np.int32)
              for k in ("atype", "aparam", "atx", "aty", "aptype",
                        "aticks", "aorder")}
    atime = np.zeros((pgs.height, pgs.width), np.int32) - 1
    actions_e = root.find("actions")
    order = 0
    if actions_e is not None:
        for ua_e in actions_e:
            uid = int(ua_e.get("ID"))
            issue_time = int(ua_e.get("time", time))
            u = pgs.get_unit(uid)
            if u is None:
                continue
            from .trace import _action_from_xml
            a = _action_from_xml(ua_e.find("UnitAction"), utt)
            host_u = u
            eta = refimpl.eta(a, host_u, utt)
            busy[u.y, u.x] = True
            planes["atype"][u.y, u.x] = a.type
            planes["aparam"][u.y, u.x] = a.parameter
            planes["atx"][u.y, u.x] = a.x
            planes["aty"][u.y, u.x] = a.y
            planes["aptype"][u.y, u.x] = a.unit_type or 0
            planes["aticks"][u.y, u.x] = issue_time + eta - time
            planes["aorder"][u.y, u.x] = order
            atime[u.y, u.x] = issue_time
            order += 1
    return state.replace(
        busy=jnp.asarray(busy), atime=jnp.asarray(atime),
        order_ctr=jnp.int32(order),
        **{k: jnp.asarray(v) for k, v in planes.items()}).canon()


# ----------------------------------------------------------------------
# trace recording (device rollout -> Java-readable replay zip)


class TraceRecorder:
    """Accumulates per-tick snapshots + issued actions; writes the
    reference's zipped-XML replay format (viewable in gui/TraceVisualizer,
    loadable by our own interop.trace)."""

    def __init__(self, utt: UnitTypeTable):
        self.utt = utt
        self.entries: List[Tuple[int, PhysicalGameState,
                                 List[Tuple[int, dict]]]] = []

    def record(self, state: State, actions: List[Tuple[int, dict]]):
        """actions: [(unitID, action_dict)] issued at state.time."""
        self.entries.append((int(state.time), state_to_pgs(state, self.utt),
                             list(actions)))

    def record_candidates(self, state: State, cand) -> None:
        """Record the real (non-pad) decoded candidates of this tick."""
        at = np.asarray(cand.atype)
        uid = np.asarray(state.uid)
        rank = np.asarray(cand.rank)
        aparam = np.asarray(cand.aparam)
        atx = np.asarray(cand.atx)
        aty = np.asarray(cand.aty)
        aptype = np.asarray(cand.aptype)
        acts = []
        cells = [(int(rank[y, x]), y, x)
                 for y, x in zip(*np.nonzero(at >= 0))]
        for _rk, y, x in sorted(cells):
            acts.append((int(uid[y, x]), dict(
                type=int(at[y, x]), parameter=int(aparam[y, x]),
                x=int(atx[y, x]), y=int(aty[y, x]),
                unit_type=int(aptype[y, x]))))
        self.record(state, acts)

    def to_xml(self) -> str:
        parts = ["<rts.Trace>", utt_to_xml(self.utt), "<entries>"]
        for time, pgs, actions in self.entries:
            parts.append(f'<rts.TraceEntry time = "{time}">')
            parts.append(pgs.to_xml(self.utt))
            parts.append("<actions>")
            for uid, a in actions:
                parts.append(f'  <action unitID="{uid}">')
                parts.append(_action_xml(a, self.utt, "    "))
                parts.append("  </action>")
            parts.append("</actions>")
            parts.append("</rts.TraceEntry>")
        parts.append("</entries>")
        parts.append("</rts.Trace>")
        return "\n".join(parts)

    def save_zip(self, path: str) -> None:
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("game.xml", self.to_xml())
