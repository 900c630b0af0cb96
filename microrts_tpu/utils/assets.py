"""Asset root resolution: maps, UTT JSONs, golden traces.

The reference keeps game data as files (``maps/``, ``utts/``,
``data/traces/`` — SURVEY.md §2 "Data / config" row).  This framework
resolves such relative asset paths against, in order:

1. ``$MICRORTS_ASSETS`` (colon-separated list of roots),
2. the bundled fixture set shipped in-package (``microrts_tpu/assets/`` —
   a handful of maps + the test UTT, enough for the CLI/train/bench to run
   standalone),
3. the reference checkout mount (``/root/reference``) when present.

Absolute paths pass through untouched.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List

BUNDLED = Path(__file__).resolve().parent.parent / "assets"
REFERENCE = Path("/root/reference")


def asset_roots() -> List[Path]:
    roots: List[Path] = []
    env = os.environ.get("MICRORTS_ASSETS")
    if env:
        roots.extend(Path(p) for p in env.split(":") if p)
    roots.append(BUNDLED)
    if REFERENCE.is_dir():
        roots.append(REFERENCE)
    return roots


def asset_path(rel: str) -> str:
    """Resolve a relative asset path (e.g. "maps/8x8/basesWorkers8x8.xml")
    to an absolute file path; absolute/existing paths pass through."""
    p = Path(rel)
    if p.is_absolute() or p.exists():
        return str(p)
    for root in asset_roots():
        cand = root / rel
        if cand.exists():
            return str(cand)
    raise FileNotFoundError(
        f"asset {rel!r} not found under any root "
        f"({[str(r) for r in asset_roots()]}); set $MICRORTS_ASSETS")


def has_asset(rel: str) -> bool:
    try:
        asset_path(rel)
        return True
    except FileNotFoundError:
        return False
