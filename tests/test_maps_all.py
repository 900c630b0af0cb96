"""All-maps loading sweep (TestLoadingMaps.java:22-51 analog).

The reference CI loads every one of the 140 ``maps/**/*.xml`` against the
default UTT.  The full map tree is bundled under ``microrts_tpu/assets/
maps`` so this runs self-contained: every map must parse, convert to a
device State, and satisfy the engine's structural invariants — all
host-side (no jit compiles), so the sweep is fast.
"""

import glob
import os

import numpy as np
import pytest

from microrts_tpu.engine.pgs import PhysicalGameState
from microrts_tpu.engine.types import EngineConfig, state_from_pgs
from microrts_tpu.engine.utt import UnitTypeTable
from microrts_tpu.utils.assets import BUNDLED

MAPS = sorted(glob.glob(os.path.join(str(BUNDLED), "maps", "**", "*.xml"),
                        recursive=True))


pytestmark = pytest.mark.smoke


def test_map_tree_is_bundled():
    # the reference ships 140 maps (SURVEY.md §2 data row); all bundled
    assert len(MAPS) >= 140, f"only {len(MAPS)} maps bundled"


@pytest.mark.parametrize("path", MAPS, ids=lambda p: os.path.relpath(
    p, os.path.join(str(BUNDLED), "maps")))
def test_load_map(path):
    utt = UnitTypeTable()
    pgs = PhysicalGameState.load(path, utt)
    assert pgs.width > 0 and pgs.height > 0
    assert len(pgs.terrain) == pgs.width * pgs.height
    assert set(np.unique(pgs.terrain)) <= {0, 1}

    # PhysicalGameState.addUnit throws on occupied cells (:189-201):
    # no two units share a cell, no unit stands on a wall
    seen = set()
    for u in pgs.units:
        assert 0 <= u.x < pgs.width and 0 <= u.y < pgs.height, (u.x, u.y)
        assert (u.x, u.y) not in seen, f"overlap at {(u.x, u.y)}"
        seen.add((u.x, u.y))
        assert pgs.terrain[u.x + u.y * pgs.width] == 0, "unit on wall"
        assert 0 <= u.type_id < utt.num_types
        assert u.player in (-1, 0, 1)

    # device-state conversion round-trips the unit set
    cfg = EngineConfig.from_utt(utt, pgs.height, pgs.width)
    s = state_from_pgs(pgs, cfg)
    assert int(np.sum(np.asarray(s.utype) > 0)) == len(pgs.units)
    # XML round-trip re-parses to the same units (checkpoint path)
    import xml.etree.ElementTree as ET
    pgs2 = PhysicalGameState.from_xml(ET.fromstring(pgs.to_xml(utt)), utt)
    assert pgs2.width == pgs.width and pgs2.height == pgs.height
    assert sorted((u.x, u.y, u.type_id, u.player, u.hitpoints)
                  for u in pgs2.units) == \
        sorted((u.x, u.y, u.type_id, u.player, u.hitpoints)
               for u in pgs.units)
