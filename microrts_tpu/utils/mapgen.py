"""Procedural map generation (tests/MapGenerator.java analog).

Generates symmetric microRTS maps — mirrored bases/workers/resources and
optional wall noise — as host PhysicalGameStates (saveable as standard map
XML via pgs.to_xml, loadable by both this framework and the Java one).
"""

from __future__ import annotations

import random
from typing import Optional

from ..engine.pgs import HostPlayer, HostUnit, PhysicalGameState
from ..engine.utt import UnitTypeTable


def generate_symmetric_map(
        width: int, height: int, utt: Optional[UnitTypeTable] = None,
        n_resources: int = 2, resource_amount: int = 25,
        n_workers: int = 1, wall_density: float = 0.0,
        start_resources: int = 5, seed: int = 0) -> PhysicalGameState:
    """Point-symmetric map: player 0 in the top-left region, player 1
    mirrored through the center; resource clusters next to each base."""
    utt = utt if utt is not None else UnitTypeTable(2)
    rng = random.Random(seed)
    pgs = PhysicalGameState(width, height)
    pgs.players = [HostPlayer(0, start_resources),
                   HostPlayer(1, start_resources)]

    def mirror(x, y):
        return width - 1 - x, height - 1 - y

    occupied = set()

    def place(type_name, player, x, y, resources=0):
        ut = utt.get_unit_type(type_name)
        u = HostUnit(ID=len(pgs.units), player=player, type_id=ut.ID,
                     x=x, y=y, resources=resources, hitpoints=ut.hp)
        pgs.add_unit(u)
        occupied.add((x, y))

    # walls, point-symmetric, away from the base corners
    terrain = pgs.terrain.reshape(height, width)
    if wall_density > 0:
        for y in range(height):
            for x in range(width):
                mx, my = mirror(x, y)
                if (x, y) <= (mx, my) and rng.random() < wall_density:
                    if max(abs(x - 1), abs(y - 1)) > 3 and \
                            max(abs(mx - 1), abs(my - 1)) > 3:
                        terrain[y, x] = 1
                        terrain[my, mx] = 1

    bx, by = 2, 2
    place("Base", 0, bx, by)
    mbx, mby = mirror(bx, by)
    place("Base", 1, mbx, mby)
    for i in range(n_workers):
        wx, wy = bx + 1 + i, by + 1
        place("Worker", 0, wx, wy)
        place("Worker", 1, *mirror(wx, wy))
    placed = 0
    tries = 0
    while placed < n_resources and tries < 200:
        tries += 1
        x = rng.randrange(0, max(width // 3, 1))
        y = rng.randrange(0, max(height // 3, 1))
        mx, my = mirror(x, y)
        if (x, y) in occupied or (mx, my) in occupied or \
                terrain[y, x] or terrain[my, mx] or (x, y) == (mx, my):
            continue
        place("Resource", -1, x, y, resources=resource_amount)
        place("Resource", -1, mx, my, resources=resource_amount)
        placed += 1
    return pgs


def save_map_xml(pgs: PhysicalGameState, utt: UnitTypeTable,
                 path: str) -> None:
    with open(path, "w") as f:
        f.write(pgs.to_xml(utt))
