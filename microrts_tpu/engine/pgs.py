"""Physical game state: the map (terrain + players + units), host side.

Mirrors ``rts/PhysicalGameState.java`` (load :65-76, fromXML :614-700, RLE
terrain compression :546-607, winner :334-353, gameover :361-387).  This is
the *host* representation used for map loading, trace IO and the oracle
interpreter; the device representation lives in ``state.py``.
"""

from __future__ import annotations

import dataclasses
import xml.etree.ElementTree as ET
from typing import List, Optional

import numpy as np

from .utt import UnitTypeTable

TERRAIN_NONE = 0
TERRAIN_WALL = 1


@dataclasses.dataclass
class HostUnit:
    """One unit instance (rts/units/Unit.java fields :23-58)."""
    ID: int
    player: int          # -1 = neutral (resources)
    type_id: int
    x: int
    y: int
    resources: int = 0
    hitpoints: int = 0


@dataclasses.dataclass
class HostPlayer:
    ID: int
    resources: int


class PhysicalGameState:
    """Host-side map container; ``units`` preserves Java's LinkedList order
    (append on creation), which defines iteration order everywhere."""

    def __init__(self, width: int, height: int, terrain: Optional[np.ndarray] = None):
        self.width = width
        self.height = height
        self.terrain = (terrain if terrain is not None
                        else np.zeros(width * height, dtype=np.int8))
        self.players: List[HostPlayer] = []
        self.units: List[HostUnit] = []

    # ------------------------------------------------------------------
    def get_terrain(self, x: int, y: int) -> int:
        return int(self.terrain[x + y * self.width])

    def get_unit_at(self, x: int, y: int) -> Optional[HostUnit]:
        for u in self.units:
            if u.x == x and u.y == y:
                return u
        return None

    def add_unit(self, u: HostUnit) -> None:
        if self.get_unit_at(u.x, u.y) is not None:
            raise ValueError(f"PhysicalGameState.add_unit: occupied cell ({u.x},{u.y})")
        self.units.append(u)

    def remove_unit(self, u: HostUnit) -> None:
        self.units.remove(u)

    def winner(self) -> int:
        """-1 unless exactly one player has units (PhysicalGameState.java:334-353)."""
        counts = [0] * len(self.players)
        for u in self.units:
            if u.player >= 0:
                counts[u.player] += 1
        winner = -1
        for i, c in enumerate(counts):
            if c > 0:
                if winner == -1:
                    winner = i
                else:
                    return -1
        return winner

    def gameover(self) -> bool:
        """True when total owned units is 0 (draw) or one side owns all
        (PhysicalGameState.java:361-387)."""
        counts = [0] * len(self.players)
        total = 0
        for u in self.units:
            if u.player >= 0:
                counts[u.player] += 1
                total += 1
        if total == 0:
            return True
        return sum(1 for c in counts if c > 0) == 1

    def clone(self) -> "PhysicalGameState":
        pgs = PhysicalGameState(self.width, self.height, self.terrain)
        pgs.players = [dataclasses.replace(p) for p in self.players]
        pgs.units = [dataclasses.replace(u) for u in self.units]
        return pgs

    # ------------------------------------------------------------------
    # XML IO (PhysicalGameState.java:614-756; maps/*.xml format)

    @classmethod
    def from_xml(cls, elem: ET.Element, utt: UnitTypeTable) -> "PhysicalGameState":
        width = int(elem.get("width"))
        height = int(elem.get("height"))
        terrain_text = (elem.find("terrain").text or "").strip()
        terrain = terrain_from_string(terrain_text, width * height)
        pgs = cls(width, height, terrain)
        for p_e in elem.find("players"):
            pgs.players.append(HostPlayer(ID=int(p_e.get("ID")),
                                          resources=int(p_e.get("resources", 0))))
        for u_e in elem.find("units"):
            ut = utt.get_unit_type(u_e.get("type"))
            if ut is None:
                raise ValueError(f"unknown unit type {u_e.get('type')!r} in map")
            u = HostUnit(
                ID=int(u_e.get("ID")), player=int(u_e.get("player")),
                type_id=ut.ID, x=int(u_e.get("x")), y=int(u_e.get("y")),
                resources=int(u_e.get("resources", 0)),
                hitpoints=int(u_e.get("hitpoints", ut.hp)))
            if pgs.get_unit(u.ID) is not None:
                raise ValueError(f"repeated unit ID {u.ID} in map")
            pgs.add_unit(u)
        return pgs

    def get_unit(self, ID: int) -> Optional[HostUnit]:
        for u in self.units:
            if u.ID == ID:
                return u
        return None

    @classmethod
    def load(cls, path: str, utt: UnitTypeTable) -> "PhysicalGameState":
        return cls.from_xml(ET.parse(path).getroot(), utt)

    def to_xml(self, utt: Optional[UnitTypeTable] = None,
               compress_terrain: bool = False) -> str:
        """Wire format of PhysicalGameState.toxml (:700-726); unit types are
        written by NAME (as in maps/*.xml) when a utt is provided."""
        if compress_terrain:
            terrain_s = compress_terrain_rle(self.terrain)
        else:
            terrain_s = "".join(str(int(t)) for t in self.terrain)
        parts = [f'<rts.PhysicalGameState width="{self.width}" height="{self.height}">',
                 f"  <terrain>{terrain_s}</terrain>", "  <players>"]
        for p in self.players:
            parts.append(f'    <rts.Player ID="{p.ID}" resources="{p.resources}">')
            parts.append("    </rts.Player>")
        parts.append("  </players>")
        parts.append("  <units>")
        for u in self.units:
            tname = (utt.unit_types[u.type_id].name if utt is not None
                     else str(u.type_id))
            parts.append(
                f'    <rts.units.Unit type="{tname}" ID="{u.ID}" '
                f'player="{u.player}" x="{u.x}" y="{u.y}" '
                f'resources="{u.resources}" hitpoints="{u.hitpoints}" >')
            parts.append("    </rts.units.Unit>")
        parts.append("  </units>")
        parts.append("</rts.PhysicalGameState>")
        return "\n".join(parts)


def terrain_from_string(text: str, n: int) -> np.ndarray:
    """Decode either the plain 0/1 digit string or the RLE 'A'/'B' compressed
    form (PhysicalGameState.getTerrainFromUnknownString + uncompressTerrain
    :546-607)."""
    if any(c in "AB" for c in text):
        return uncompress_terrain_rle(text)
    arr = np.frombuffer(text.encode(), dtype=np.uint8) - ord("0")
    if arr.size != n:
        raise ValueError(f"terrain length {arr.size} != {n}")
    return arr.astype(np.int8)


def compress_terrain_rle(terrain: np.ndarray) -> str:
    """'A' = run of free, 'B' = run of wall, count suffix when >1
    (PhysicalGameState.compressTerrain :546-571)."""
    out = []
    occurrences = 1
    t = [int(v) for v in terrain]
    for i in range(1, len(t)):
        if t[i] == t[i - 1]:
            occurrences += 1
        else:
            out.append("A" if t[i - 1] == 0 else "B")
            if occurrences > 1:
                out.append(str(occurrences))
            occurrences = 1
    if occurrences > 1:
        out.append("A" if t[-1] == 0 else "B")
        out.append(str(occurrences))
    return "".join(out)


def uncompress_terrain_rle(text: str) -> np.ndarray:
    out: List[int] = []
    counter = ""
    for ch in text:
        if ch in "AB":
            if counter:
                out.extend([out[-1]] * (int(counter) - 1))
                counter = ""
            out.append(0 if ch == "A" else 1)
        else:
            counter += ch
    if counter:
        out.extend([out[-1]] * (int(counter) - 1))
    return np.array(out, dtype=np.int8)
