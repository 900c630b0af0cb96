"""Partial observability: visibility discs, unit hiding, 8-plane obs.

Mirrors rts/PartiallyObservableGameState.java semantics: squared-Euclidean
sight discs (:61-71), non-own units (incl. resources) outside view removed
(:35-54), 8 observation planes (:82-154).
"""

import jax
import numpy as np
import pytest

from microrts_tpu.engine.fog import observation_po, po_state, visibility
from microrts_tpu.env.gridnet import GridnetEnv

MAPS = "/root/reference/maps"


pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def env():
    return GridnetEnv(f"{MAPS}/8x8/basesWorkers8x8.xml", partial_obs=True)


def test_visibility_matches_reference_disc(env):
    s = env.reset(jax.random.PRNGKey(0))
    cfg = env.cfg.engine
    vis = np.asarray(visibility(s, 0, cfg))
    # numpy reference: for every own unit, mark d2 <= sight^2
    utype = np.asarray(s.utype)
    owner = np.asarray(s.owner)
    sight = np.asarray(cfg.sight_radius)
    ref = np.zeros_like(vis)
    H, W = vis.shape
    for y in range(H):
        for x in range(W):
            if utype[y, x] > 0 and owner[y, x] == 0:
                r = sight[utype[y, x] - 1]
                for yy in range(H):
                    for xx in range(W):
                        if (xx - x) ** 2 + (yy - y) ** 2 <= r * r:
                            ref[yy, xx] = True
    assert (vis == ref).all()


def test_po_hides_unobserved_units(env):
    s = env.reset(jax.random.PRNGKey(0))
    cfg = env.cfg.engine
    view0 = po_state(s, 0, cfg)
    vis = np.asarray(visibility(s, 0, cfg))
    ut_full = np.asarray(s.utype)
    ut_view = np.asarray(view0.utype)
    own = np.asarray(s.owner) == 0
    # own units always present; non-own present iff visible
    assert (ut_view[own] == ut_full[own]).all()
    nonown = (ut_full > 0) & ~own
    assert (ut_view[nonown & ~vis] == 0).all()
    assert (ut_view[nonown & vis] == ut_full[nonown & vis]).all()
    # basesWorkers8x8: opposite corners, enemy hidden at start
    assert (ut_view[nonown] == 0).sum() > 0


def test_po_observation_planes(env):
    s = env.reset(jax.random.PRNGKey(0))
    obs = np.asarray(observation_po(s, 1, env.cfg.engine))
    assert obs.shape == (8, 8, 8)
    vis = np.asarray(visibility(s, 1, env.cfg.engine))
    assert (obs[6].astype(bool) == vis).all()
    # all rendered units lie inside... own units may be outside own sight?
    # own units are always shown; hidden enemies never are
    assert obs[7].sum() == 0  # enemy not visible at start -> no known sight
