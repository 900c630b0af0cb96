"""Host <-> device bridge: run the JAX engine against oracle/host structures.

Used by the differential tests (JAX engine vs the trace-validated oracle
interpreter) and by the trace-replay parity harness, mirroring the reference
CI's golden-replay strategy (TestTracesIntegrity.java:29-127).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .. import refimpl
from ..engine import kernel as K
from ..engine.pgs import PhysicalGameState
from ..engine.types import INF, Candidates, EngineConfig, State, state_from_pgs
from .trace import Trace


def candidates_from_actions(
        actions: List[Tuple[Tuple[int, int], refimpl.UnitAction]],
        h: int, w: int) -> Candidates:
    """Build a Candidates struct from an ordered [(unit_xy, action)] list.

    List position becomes the within-tick issue rank (= Java LinkedHashMap
    insertion order, GameState.java:249-328)."""
    import jax.numpy as jnp
    atype = np.full((h, w), -1, np.int32)
    aparam = np.zeros((h, w), np.int32)
    atx = np.zeros((h, w), np.int32)
    aty = np.zeros((h, w), np.int32)
    aptype = np.zeros((h, w), np.int32)
    rank = np.full((h, w), INF, np.int32)
    for i, ((x, y), ua) in enumerate(actions):
        atype[y, x] = ua.type
        aparam[y, x] = ua.parameter
        atx[y, x] = ua.x
        aty[y, x] = ua.y
        aptype[y, x] = ua.unit_type if ua.unit_type is not None else 0
        rank[y, x] = i
    return Candidates(atype=jnp.asarray(atype), aparam=jnp.asarray(aparam),
                      atx=jnp.asarray(atx), aty=jnp.asarray(aty),
                      aptype=jnp.asarray(aptype), rank=jnp.asarray(rank))


def oracle_planes(gs: refimpl.GameState):
    """Project an oracle GameState onto the device plane layout for diffing."""
    pgs = gs.pgs
    h, w = pgs.height, pgs.width
    p = {name: np.zeros((h, w), np.int64) for name in
         ("utype", "owner", "hp", "carried", "busy", "atype", "aparam",
          "aticks")}
    p["owner"] -= 1
    for u in pgs.units:
        p["utype"][u.y, u.x] = u.type_id + 1
        p["owner"][u.y, u.x] = u.player
        p["hp"][u.y, u.x] = u.hitpoints
        p["carried"][u.y, u.x] = u.resources
    for a in gs.unit_actions.values():
        u = a.unit
        p["busy"][u.y, u.x] = 1
        p["atype"][u.y, u.x] = a.action.type
        p["aparam"][u.y, u.x] = a.action.parameter
        p["aticks"][u.y, u.x] = (a.time
                                 + refimpl.eta(a.action, u, gs.utt) - gs.time)
    return p


def diff_vs_oracle(state: State, gs: refimpl.GameState,
                   check_assignments: bool = True) -> List[str]:
    """Field-by-field diff of device state vs oracle state."""
    errs = []
    op = oracle_planes(gs)
    fields = ["utype", "owner", "hp", "carried"]
    if check_assignments:
        fields += ["busy", "atype", "aticks"]
    for name in fields:
        dev = np.asarray(getattr(state, name)).astype(np.int64)
        ora = op[name]
        if name in ("hp", "carried", "atype", "aticks"):
            # only meaningful where a unit exists / is busy
            gate = op["utype"] > 0 if name in ("hp", "carried") else op["busy"] > 0
            dev = np.where(gate, dev, 0)
            ora = np.where(gate, ora, 0)
        if not np.array_equal(dev, ora):
            bad = np.argwhere(dev != ora)[:4]
            errs.append(f"{name} differs at {bad.tolist()}: "
                        f"dev={[int(dev[tuple(i)]) for i in bad]} "
                        f"ora={[int(ora[tuple(i)]) for i in bad]}")
    res_dev = [int(v) for v in np.asarray(state.resources)]
    res_ora = [pl.resources for pl in gs.pgs.players] + [0, 0]
    if res_dev != res_ora[:2]:
        errs.append(f"resources dev={res_dev} ora={res_ora[:2]}")
    if int(state.time) != gs.time:
        errs.append(f"time dev={int(state.time)} ora={gs.time}")
    return errs


def replay_trace_device(trace: Trace, max_entries: int = 10 ** 9,
                        check_assignments: bool = False) -> int:
    """Replay a golden Java trace through the JAX engine; verify every
    recorded snapshot bit-exactly (strengthened TestTracesIntegrity.java:72-127).
    Returns number of entries verified."""
    import jax

    pgs0 = trace.entries[0].pgs
    h, w = pgs0.height, pgs0.width
    cfg = EngineConfig.from_utt(trace.utt, h, w)
    eng = K.make_engine(cfg)
    issue_j = jax.jit(eng.issue)
    cycle_j = jax.jit(eng.cycle)

    state = state_from_pgs(pgs0.clone(), cfg, time=trace.entries[0].time)
    checked = 0
    for entry in trace.entries[:max_entries]:
        while int(state.time) < entry.time:
            state, _ = cycle_j(state)
        errs = _diff_vs_pgs(state, entry.pgs)
        if errs:
            raise AssertionError(f"t={entry.time}: " + "; ".join(errs))
        if entry.actions:
            by_id = {u.ID: u for u in entry.pgs.units}
            acts = [[], []]
            for uid, ua in entry.actions:
                u = by_id[uid]
                acts[0 if u.player == 0 else 1].append(((u.x, u.y), ua))
            cand = candidates_from_actions(acts[0] + acts[1], h, w)
            state = issue_j(state, cand)
        checked += 1
    return checked


def _diff_vs_pgs(state: State, pgs: PhysicalGameState) -> List[str]:
    errs = []
    utype = np.asarray(state.utype)
    owner = np.asarray(state.owner)
    hp = np.asarray(state.hp)
    carried = np.asarray(state.carried)
    dev_units = sorted(
        (int(owner[y, x]), int(utype[y, x]) - 1, int(x), int(y),
         int(carried[y, x]), int(hp[y, x]))
        for y in range(pgs.height) for x in range(pgs.width)
        if utype[y, x] > 0)
    rec_units = sorted((u.player, u.type_id, u.x, u.y, u.resources,
                        u.hitpoints) for u in pgs.units)
    if dev_units != rec_units:
        missing = [u for u in rec_units if u not in dev_units]
        extra = [u for u in dev_units if u not in rec_units]
        errs.append(f"units differ: missing={missing} extra={extra}")
    res_dev = [int(v) for v in np.asarray(state.resources)]
    res_rec = [p.resources for p in pgs.players]
    if res_dev[:len(res_rec)] != res_rec:
        errs.append(f"resources dev={res_dev} rec={res_rec}")
    return errs
