"""Offline renderers: state -> RGB array / ANSI terminal.

Replaces the Swing GUI (gui/PhysicalGameStatePanel.java:31-257) with
headless renderers: an RGB rasterizer (the `render(returnPixels)` analog of
JNIGridnetClient.java:143-160, for videos/notebooks) and an ANSI board for
the CLI.  Color scheme follows the reference panel: player 0 blue, player 1
red, resources green, walls dark gray.
"""

from __future__ import annotations

import numpy as np

from .engine.types import State
from .engine.utt import UnitTypeTable

# per-type fill colors (Java panel: resource green, base light gray,
# barracks dark gray, worker gray; combat units colored shapes)
TYPE_COLORS = {
    "Resource": (0, 160, 0),
    "Base": (210, 210, 210),
    "Barracks": (120, 120, 120),
    "Worker": (170, 170, 170),
    "Light": (230, 200, 40),
    "Heavy": (200, 130, 30),
    "Ranged": (60, 170, 230),
}
OWNER_COLORS = {0: (40, 80, 255), 1: (255, 60, 60)}
WALL = (60, 60, 60)
FLOOR = (20, 20, 20)


def render_rgb(state: State, utt: UnitTypeTable, scale: int = 16) -> np.ndarray:
    """uint8 [H*scale, W*scale, 3]: floor/walls, units filled with their
    type color inside a 2px owner-colored border."""
    utype = np.asarray(state.utype)
    owner = np.asarray(state.owner)
    terrain = np.asarray(state.terrain)
    h, w = utype.shape
    img = np.zeros((h * scale, w * scale, 3), np.uint8)
    img[:, :] = FLOOR
    for y in range(h):
        for x in range(w):
            y0, x0 = y * scale, x * scale
            if terrain[y, x] != 0:
                img[y0:y0 + scale, x0:x0 + scale] = WALL
                continue
            if utype[y, x] > 0:
                name = utt.unit_types[utype[y, x] - 1].name
                fill = TYPE_COLORS.get(name, (255, 255, 255))
                border = OWNER_COLORS.get(int(owner[y, x]), (0, 120, 0))
                img[y0 + 1:y0 + scale - 1, x0 + 1:x0 + scale - 1] = border
                img[y0 + 3:y0 + scale - 3, x0 + 3:x0 + scale - 3] = fill
    return img


_GLYPH = {"Resource": "R", "Base": "B", "Barracks": "K", "Worker": "w",
          "Light": "l", "Heavy": "h", "Ranged": "r"}


def render_ansi(state: State, utt: UnitTypeTable) -> str:
    """Terminal board: blue = player 0, red = player 1, green = neutral."""
    utype = np.asarray(state.utype)
    owner = np.asarray(state.owner)
    terrain = np.asarray(state.terrain)
    carried = np.asarray(state.carried)
    res = np.asarray(state.resources)
    h, w = utype.shape
    rows = [f"t={int(state.time)}  p0:{int(res[0])}  p1:{int(res[1])}"]
    for y in range(h):
        row = []
        for x in range(w):
            if terrain[y, x] != 0:
                row.append("##")
            elif utype[y, x] > 0:
                name = utt.unit_types[utype[y, x] - 1].name
                g = _GLYPH.get(name, "?")
                o = int(owner[y, x])
                color = {0: "\x1b[94m", 1: "\x1b[91m"}.get(o, "\x1b[92m")
                extra = str(min(carried[y, x], 9)) if name == "Resource" \
                    else g
                row.append(f"{color}{g}{extra}\x1b[0m" if o >= 0 or
                           name == "Resource" else g * 2)
            else:
                row.append("..")
        rows.append("".join(row))
    return "\n".join(rows)
