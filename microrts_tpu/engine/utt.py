"""Unit type table: the ruleset of microRTS.

TPU-native re-design of the reference's ``rts/units/UnitType.java`` and
``rts/units/UnitTypeTable.java`` (UnitTypeTable.java:104-289 hardcodes the three
builtin versions; fromJSON/fromXML at :391-433).  Instead of a list of objects,
the table is a frozen struct-of-arrays so the jitted step function can close
over plain ``numpy`` arrays (static operands folded into the XLA program).
"""

from __future__ import annotations

import dataclasses
import json
import xml.etree.ElementTree as ET
from typing import List, Optional

import numpy as np

# Version constants (UnitTypeTable.java:26-41)
EMPTY_TYPE_TABLE = -1
VERSION_ORIGINAL = 1
VERSION_ORIGINAL_FINETUNED = 2
VERSION_NON_DETERMINISTIC = 3

# Move-conflict resolution policies (UnitTypeTable.java:46-57)
MOVE_CONFLICT_RESOLUTION_CANCEL_BOTH = 1
MOVE_CONFLICT_RESOLUTION_CANCEL_RANDOM = 2
MOVE_CONFLICT_RESOLUTION_CANCEL_ALTERNATING = 3


@dataclasses.dataclass
class UnitType:
    """Stats of one unit type (UnitType.java:18-110 field-for-field)."""

    name: str = ""
    ID: int = 0
    cost: int = 1
    hp: int = 1
    min_damage: int = 1
    max_damage: int = 1
    attack_range: int = 1
    produce_time: int = 10
    move_time: int = 10
    attack_time: int = 10
    harvest_time: int = 10
    return_time: int = 10
    harvest_amount: int = 1
    sight_radius: int = 0
    is_resource: bool = False
    is_stockpile: bool = False
    can_harvest: bool = False
    can_move: bool = False
    can_attack: bool = False
    produces: List[str] = dataclasses.field(default_factory=list)
    produced_by: List[str] = dataclasses.field(default_factory=list)


class UnitTypeTable:
    """The ruleset.  Holds UnitType records plus derived dense arrays.

    Array attributes (all ``np.int32`` of shape [T] unless noted) are consumed
    by the JAX engine as static constants:
      cost, hp, min_damage, max_damage, attack_range, produce_time, move_time,
      attack_time, harvest_time, return_time, harvest_amount, sight_radius,
      is_resource, is_stockpile, can_harvest, can_move, can_attack  (bool[T]),
      produces_mask (bool[T, T]: producer type -> producible type).
    """

    def __init__(self, version: int = VERSION_ORIGINAL,
                 move_conflict_resolution_strategy: int = MOVE_CONFLICT_RESOLUTION_CANCEL_BOTH):
        self.unit_types: List[UnitType] = []
        self.move_conflict_resolution_strategy = move_conflict_resolution_strategy
        if version != EMPTY_TYPE_TABLE:
            self._build_version(version)
            self._finalize()

    # ------------------------------------------------------------------
    def _build_version(self, version: int) -> None:
        """Builtin rulesets, mirroring UnitTypeTable.setUnitTypeTable
        (UnitTypeTable.java:104-289)."""
        v = version
        add = self.add_unit_type

        add(UnitType(name="Resource", is_resource=True, sight_radius=0))

        add(UnitType(
            name="Base", cost=10, hp=10,
            produce_time=250 if v == VERSION_ORIGINAL else 200,
            is_stockpile=True, sight_radius=5))

        add(UnitType(
            name="Barracks", cost=5, hp=4,
            produce_time=200 if v == VERSION_ORIGINAL else 100,
            sight_radius=3))

        wk_min, wk_max = (1, 1) if v != VERSION_NON_DETERMINISTIC else (0, 2)
        add(UnitType(
            name="Worker", cost=1, hp=1, min_damage=wk_min, max_damage=wk_max,
            attack_range=1, produce_time=50, move_time=10, attack_time=5,
            harvest_time=20, return_time=10, can_harvest=True, can_move=True,
            can_attack=True, sight_radius=3))

        li_min, li_max = (2, 2) if v != VERSION_NON_DETERMINISTIC else (1, 3)
        add(UnitType(
            name="Light", cost=2, hp=4, min_damage=li_min, max_damage=li_max,
            attack_range=1, produce_time=80, move_time=8, attack_time=5,
            can_move=True, can_attack=True, sight_radius=2))

        he_min, he_max = (4, 4) if v != VERSION_NON_DETERMINISTIC else (0, 6)
        if v == VERSION_ORIGINAL:
            he_move, he_hp, he_cost = 12, 4, 2
        else:
            he_move, he_hp, he_cost = 10, 8, 3
        add(UnitType(
            name="Heavy", cost=he_cost, hp=he_hp, min_damage=he_min,
            max_damage=he_max, attack_range=1, produce_time=120,
            move_time=he_move, attack_time=5, can_move=True, can_attack=True,
            sight_radius=2))

        ra_min, ra_max = (1, 1) if v != VERSION_NON_DETERMINISTIC else (1, 2)
        add(UnitType(
            name="Ranged", cost=2, hp=1, min_damage=ra_min, max_damage=ra_max,
            attack_range=3, produce_time=100, move_time=10, attack_time=5,
            can_move=True, can_attack=True, sight_radius=3))

        # Production graph (UnitTypeTable.java:283-288)
        self._link("Base", "Worker")
        self._link("Barracks", "Light")
        self._link("Barracks", "Heavy")
        self._link("Barracks", "Ranged")
        self._link("Worker", "Base")
        self._link("Worker", "Barracks")

    def _link(self, producer: str, produced: str) -> None:
        self.get_unit_type(producer).produces.append(produced)
        self.get_unit_type(produced).produced_by.append(producer)

    # ------------------------------------------------------------------
    def add_unit_type(self, ut: UnitType) -> None:
        ut.ID = len(self.unit_types)
        self.unit_types.append(ut)

    def get_unit_type(self, key) -> Optional[UnitType]:
        if isinstance(key, int):
            return self.unit_types[key]
        for ut in self.unit_types:
            if ut.name == key:
                return ut
        return None

    @property
    def num_types(self) -> int:
        return len(self.unit_types)

    def get_max_attack_range(self) -> int:
        return max((ut.attack_range for ut in self.unit_types), default=0)

    # ------------------------------------------------------------------
    def _finalize(self) -> None:
        """Compute the dense struct-of-arrays view."""
        T = len(self.unit_types)
        for field in ("cost", "hp", "min_damage", "max_damage", "attack_range",
                      "produce_time", "move_time", "attack_time",
                      "harvest_time", "return_time", "harvest_amount",
                      "sight_radius"):
            setattr(self, field,
                    np.array([getattr(ut, field) for ut in self.unit_types],
                             dtype=np.int32))
        for field in ("is_resource", "is_stockpile", "can_harvest",
                      "can_move", "can_attack"):
            setattr(self, field,
                    np.array([getattr(ut, field) for ut in self.unit_types],
                             dtype=np.bool_))
        pm = np.zeros((T, T), dtype=np.bool_)
        for ut in self.unit_types:
            for name in ut.produces:
                pm[ut.ID, self.get_unit_type(name).ID] = True
        self.produces_mask = pm

    # ------------------------------------------------------------------
    # Serialization, wire-compatible with the reference
    # (UnitTypeTable.java:355-433; sample at /root/reference/utts/*.json).

    def to_json(self) -> str:
        def ut_json(ut: UnitType):
            return {
                "ID": ut.ID, "name": ut.name, "cost": ut.cost, "hp": ut.hp,
                "minDamage": ut.min_damage, "maxDamage": ut.max_damage,
                "attackRange": ut.attack_range, "produceTime": ut.produce_time,
                "moveTime": ut.move_time, "attackTime": ut.attack_time,
                "harvestTime": ut.harvest_time, "returnTime": ut.return_time,
                "harvestAmount": ut.harvest_amount,
                "sightRadius": ut.sight_radius, "isResource": ut.is_resource,
                "isStockpile": ut.is_stockpile, "canHarvest": ut.can_harvest,
                "canMove": ut.can_move, "canAttack": ut.can_attack,
                "produces": list(ut.produces), "producedBy": list(ut.produced_by),
            }
        return json.dumps({
            "moveConflictResolutionStrategy": self.move_conflict_resolution_strategy,
            "unitTypes": [ut_json(ut) for ut in self.unit_types],
        })

    @classmethod
    def from_json(cls, text: str) -> "UnitTypeTable":
        o = json.loads(text)
        utt = cls(EMPTY_TYPE_TABLE)
        utt.move_conflict_resolution_strategy = o.get(
            "moveConflictResolutionStrategy", MOVE_CONFLICT_RESOLUTION_CANCEL_BOTH)
        for uto in o["unitTypes"]:
            utt.unit_types.append(cls._type_from_dict(uto))
        # Re-number IDs by position like addUnitType would not: the reference
        # keeps the JSON-declared IDs implicit by list position; stubs retain
        # their declared ID field but lookup is by name (UnitTypeTable.java:422-431).
        utt._finalize()
        return utt

    @staticmethod
    def _type_from_dict(o: dict) -> UnitType:
        def names(key):
            out = []
            for v in o.get(key, []) or []:
                out.append(v if isinstance(v, str) else v.get("name"))
            return out
        return UnitType(
            name=o.get("name", ""), ID=o.get("ID", 0), cost=o.get("cost", 1),
            hp=o.get("hp", 1), min_damage=o.get("minDamage", 1),
            max_damage=o.get("maxDamage", 1),
            attack_range=o.get("attackRange", 1),
            produce_time=o.get("produceTime", 10),
            move_time=o.get("moveTime", 10),
            attack_time=o.get("attackTime", 10),
            harvest_time=o.get("harvestTime", 10),
            return_time=o.get("returnTime", 10),
            harvest_amount=o.get("harvestAmount", 1),
            sight_radius=o.get("sightRadius", 0),
            is_resource=o.get("isResource", False),
            is_stockpile=o.get("isStockpile", False),
            can_harvest=o.get("canHarvest", False),
            can_move=o.get("canMove", False),
            can_attack=o.get("canAttack", False),
            produces=names("produces"), produced_by=names("producedBy"))

    @classmethod
    def from_xml(cls, elem: ET.Element) -> "UnitTypeTable":
        """Parse the ``<rts.units.UnitTypeTable>`` element found in traces
        (UnitTypeTable.java:391-406)."""
        utt = cls(EMPTY_TYPE_TABLE)
        utt.move_conflict_resolution_strategy = int(
            elem.get("moveConflictResolutionStrategy",
                     MOVE_CONFLICT_RESOLUTION_CANCEL_BOTH))
        def b(v):
            return str(v).lower() == "true"
        for ut_e in elem:
            produces = [c.get("type") for c in ut_e if c.tag == "produces"]
            produced_by = [c.get("type") for c in ut_e if c.tag == "producedBy"]
            utt.unit_types.append(UnitType(
                name=ut_e.get("name"), ID=int(ut_e.get("ID", 0)),
                cost=int(ut_e.get("cost", 1)), hp=int(ut_e.get("hp", 1)),
                min_damage=int(ut_e.get("minDamage", 1)),
                max_damage=int(ut_e.get("maxDamage", 1)),
                attack_range=int(ut_e.get("attackRange", 1)),
                produce_time=int(ut_e.get("produceTime", 10)),
                move_time=int(ut_e.get("moveTime", 10)),
                attack_time=int(ut_e.get("attackTime", 10)),
                harvest_time=int(ut_e.get("harvestTime", 10)),
                return_time=int(ut_e.get("returnTime", 10)),
                harvest_amount=int(ut_e.get("harvestAmount", 1)),
                sight_radius=int(ut_e.get("sightRadius", 0)),
                is_resource=b(ut_e.get("isResource", "false")),
                is_stockpile=b(ut_e.get("isStockpile", "false")),
                can_harvest=b(ut_e.get("canHarvest", "false")),
                can_move=b(ut_e.get("canMove", "false")),
                can_attack=b(ut_e.get("canAttack", "false")),
                produces=produces, produced_by=produced_by))
        utt._finalize()
        return utt

    def __repr__(self):
        return (f"UnitTypeTable({[ut.name for ut in self.unit_types]}, "
                f"crs={self.move_conflict_resolution_strategy})")
