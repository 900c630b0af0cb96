"""Full AHTN planner over the reference's real domain files (host-side).

Covers: all 5 shipped SHOP-style domains parse; the adversarial planner
produces executable plans on basesWorkers8x8; a game segment plays out
legally on the oracle engine; predicates/unification behave per
PredefinedPredicates.java.
"""

import random

import pytest

from microrts_tpu import refimpl as R
from microrts_tpu.bots.ahtn_planner import (AHTNPlanBot, MD, Planner, Var,
                                            bundled_domains, clause_from_sexp,
                                            clone_gs, host_random_biased,
                                            host_sqrt_eval3, load_domain,
                                            match_clause)
from microrts_tpu.engine.pgs import PhysicalGameState
from microrts_tpu.engine.utt import UnitTypeTable
from microrts_tpu.utils.assets import asset_path


def _gs8():
    utt = UnitTypeTable(2)
    pgs = PhysicalGameState.load(
        asset_path("maps/8x8/basesWorkers8x8.xml"), utt)
    return R.GameState(pgs, utt)


def test_all_five_domains_parse():
    for path in bundled_domains():
        d = load_domain(path)
        assert "destroy-player" in d.methods, path
        assert len(d.operators) >= 10
        assert sum(len(v) for v in d.methods.values()) >= 9


def test_predicates_and_unification():
    from microrts_tpu.bots.ahtn import parse_sexp
    gs = _gs8()
    # (unit ?id Worker 0 ?r ?p): player-0 worker exists with 0 resources
    c = clause_from_sexp(parse_sexp("(unit ?id Worker 0 ?r ?p)"))
    ms = list(match_clause(c, gs, {}))
    assert len(ms) == 1 and ms[0][Var("?r")] == 0
    # negation-as-failure: no player-0 Barracks at start
    c = clause_from_sexp(parse_sexp("(not (unit ?_ Barracks 0 ?_ ?_))"))
    assert len(list(match_clause(c, gs, {}))) == 1
    # closest-unit-to binds exactly one (Manhattan argmin)
    base0 = next(u for u in gs.pgs.units
                 if u.player == 0 and gs.utt.unit_types[u.type_id].name
                 == "Base")
    c = clause_from_sexp(parse_sexp(
        f"(closest-unit-to {base0.ID} ?rid Resource ?_ ?_ ?_)"))
    ms = list(match_clause(c, gs, {}))
    assert len(ms) == 1
    rid = ms[0][Var("?rid")]
    ru = gs.pgs.get_unit(rid)
    assert gs.utt.unit_types[ru.type_id].name == "Resource"
    # conjunction with shared variables + has-resources-to-produce
    c = clause_from_sexp(parse_sexp(
        "(and (unit ?bid Base 0 ?_ ?_) (has-resources-to-produce 0 Worker)"
        " (free-producing-direction ?bid ?d))"))
    ms = list(match_clause(c, gs, {}))
    assert ms and Var("?d") in ms[0]


def test_planner_produces_executable_plan():
    gs = _gs8()
    bot = AHTNPlanBot(max_depth=2, playout_lookahead=50, max_playouts=40)
    pa = bot.get_action(gs, 0)
    assert pa, "expected first-frame actions from the plan"
    # every issued action passes the oracle's issueSafe legality
    assert gs.issue_safe(pa)
    assert all(a.action.type != R.TYPE_NONE or a.action.parameter >= 0
               for a in gs.unit_actions.values())


def test_ahtn_game_segment_legal_and_active():
    """120 cycles vs RandomBiased on the oracle: must stay legal, issue
    real work (training / moving), and keep its base alive early."""
    gs = _gs8()
    bot = AHTNPlanBot(max_depth=2, playout_lookahead=40, max_playouts=30)
    rng = random.Random(3)
    issued_real = 0
    over = False
    while not over and gs.time < 120:
        pa = bot.get_action(gs, 0)
        if pa:
            gs.issue_safe(pa)
            issued_real += sum(1 for _, ua in pa
                               if ua.type != R.TYPE_NONE)
        host_random_biased(gs, 1, rng)
        over = gs.cycle()
    assert issued_real >= 3
    p0_units = sum(1 for u in gs.pgs.units if u.player == 0)
    assert p0_units >= 2           # base plus at least one unit


def test_eval_and_clone():
    gs = _gs8()
    v = host_sqrt_eval3(gs, 0)
    assert v == pytest.approx(0.0, abs=1e-9)   # symmetric start
    g2 = clone_gs(gs)
    g2.pgs.units[0].hitpoints = 0
    assert gs.pgs.units[0].hitpoints != 0      # deep copy
