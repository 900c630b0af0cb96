"""Replay traces: load/save the reference's zipped-XML trace format.

Format per ``rts/Trace.java`` (:30-176) / ``rts/TraceEntry.java``: a
``<rts.Trace>`` root holding the UnitTypeTable and a list of
``<rts.TraceEntry time="t">`` elements, each with a full PhysicalGameState
snapshot and the list of ``<action unitID=..><UnitAction ../></action>``
issued at that time.  280 golden zips ship under the reference's
``data/traces/`` — they are the bit-parity fixtures for the TPU engine.
"""

from __future__ import annotations

import dataclasses
import io
import xml.etree.ElementTree as ET
import zipfile
from typing import List, Tuple

from ..engine.pgs import PhysicalGameState
from ..engine.utt import UnitTypeTable
from ..refimpl import DIRECTION_NONE, TYPE_NONE, UnitAction


@dataclasses.dataclass
class TraceEntry:
    time: int
    pgs: PhysicalGameState
    actions: List[Tuple[int, UnitAction]]  # (unitID, action), recorded order


@dataclasses.dataclass
class Trace:
    utt: UnitTypeTable
    entries: List[TraceEntry]


def _action_from_xml(e: ET.Element, utt: UnitTypeTable) -> UnitAction:
    ua = UnitAction(int(e.get("type", TYPE_NONE)))
    p = e.get("parameter")
    ua.parameter = int(p) if p is not None else DIRECTION_NONE
    x, y = e.get("x"), e.get("y")
    if x is not None:
        ua.x = int(x)
    if y is not None:
        ua.y = int(y)
    ut = e.get("unitType")
    if ut is not None:
        ua.unit_type = utt.get_unit_type(ut).ID
    return ua


def trace_from_xml(root: ET.Element) -> Trace:
    utt_e = root.find("rts.units.UnitTypeTable")
    utt = UnitTypeTable.from_xml(utt_e)
    entries: List[TraceEntry] = []
    for te in root.find("entries"):
        t = int(te.get("time"))
        pgs = PhysicalGameState.from_xml(te.find("rts.PhysicalGameState"), utt)
        actions: List[Tuple[int, UnitAction]] = []
        acts_e = te.find("actions")
        if acts_e is not None:
            for a_e in acts_e:
                uid = int(a_e.get("unitID"))
                actions.append((uid, _action_from_xml(a_e.find("UnitAction"), utt)))
        entries.append(TraceEntry(t, pgs, actions))
    return Trace(utt, entries)


def load_trace(path: str) -> Trace:
    """Load a trace from a .zip (the reference zips one XML inside) or .xml."""
    if path.endswith(".zip"):
        data = open(path, "rb").read()
        try:
            with zipfile.ZipFile(io.BytesIO(data)) as z:
                name = z.namelist()[0]
                text = z.read(name).decode("utf-8", errors="replace")
        except zipfile.BadZipFile:
            # several reference "zips" are actually plain XML files
            text = data.decode("utf-8", errors="replace")
    else:
        text = open(path, "r", encoding="utf-8", errors="replace").read()
    return trace_from_xml(ET.fromstring(text))
