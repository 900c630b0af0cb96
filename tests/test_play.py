"""Live-play module (MouseGame analog): order compiler + HTTP surface.

Drives the standing-order compiler the way the browser would (select a
worker, right-click a resource / an empty cell / an enemy) and checks the
macro actions actually change the game through the real env step — the same
behavioral contract as the reference's MouseController macros
(gui/PGSMouseListener.java:130-187)."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from microrts_tpu.play import HumanGame, OrderCompiler, make_handler

MAP = "/root/reference/maps/8x8/basesWorkers8x8.xml"


@pytest.fixture(scope="module")
def game():
    return HumanGame(MAP, ai2="PassiveAI", tick_ms=1)


def _uid_of(game, type_name, player):
    s = game.state
    utype = np.asarray(s.utype)
    owner = np.asarray(s.owner)
    tid = next(i for i, ut in enumerate(game.env.utt.unit_types)
               if ut.name == type_name)
    ys, xs = np.nonzero((utype == tid + 1) & (owner == player))
    assert len(ys), (type_name, player)
    return int(np.asarray(s.uid)[ys[0], xs[0]]), (ys[0], xs[0])


def test_harvest_order_gathers_resources(game):
    game.compiler.clear()
    uid, _ = _uid_of(game, "Worker", 0)
    s = game.state
    utype = np.asarray(s.utype)
    ry, rx = next(zip(*np.nonzero(
        (utype > 0) & (np.asarray(s.owner) < 0))))
    game.compiler.set_order(uid, {"kind": "harvest",
                                  "ty": int(ry), "tx": int(rx)})
    r0 = int(game.state.resources[0])
    for _ in range(60):
        game.tick()
    assert int(game.state.resources[0]) > r0
    assert uid in game.compiler.orders      # harvest cycles forever


def test_move_order_completes_and_clears(game):
    game.compiler.clear()
    uid, (y, x) = _uid_of(game, "Worker", 0)
    free = (np.asarray(game.state.terrain) == 0) \
        & (np.asarray(game.state.utype) == 0)
    ty, tx = next(zip(*np.nonzero(free)))
    game.compiler.set_order(uid, {"kind": "move",
                                  "ty": int(ty), "tx": int(tx)})
    for _ in range(40):
        game.tick()
        if uid not in game.compiler.orders:
            break
    assert uid not in game.compiler.orders  # arrived -> order dropped
    yy, xx = np.nonzero(np.asarray(game.state.uid) == uid)
    assert (int(yy[0]), int(xx[0])) == (int(ty), int(tx))


def test_train_order_produces_worker(game):
    game.compiler.clear()
    uid, _ = _uid_of(game, "Base", 0)
    wid = next(i for i, ut in enumerate(game.env.utt.unit_types)
               if ut.name == "Worker")
    n0 = int(((np.asarray(game.state.utype) == wid + 1)
              & (np.asarray(game.state.owner) == 0)).sum())
    game.compiler.set_order(uid, {"kind": "train", "ptype": wid})
    for _ in range(80):                  # worker produce time is 50 ticks
        game.tick()
    n1 = int(((np.asarray(game.state.utype) == wid + 1)
              & (np.asarray(game.state.owner) == 0)).sum())
    assert n1 == n0 + 1


def test_http_surface(game):
    srv_cls = make_handler(game)
    from http.server import ThreadingHTTPServer
    srv = ThreadingHTTPServer(("127.0.0.1", 0), srv_cls)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/").read().decode()
        assert "canvas" in page
        meta = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/meta"))
        assert meta["w"] == 8 and "Worker" in meta["types"]
        state = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/state"))
        assert state["t"] >= 0 and state["units"]
        uid = state["units"][0][7]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/order",
            data=json.dumps({"uid": uid, "order": {
                "kind": "move", "ty": 0, "tx": 0}}).encode(),
            method="POST")
        assert json.load(urllib.request.urlopen(req))["ok"]
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/order",
            data=json.dumps({"uid": uid,
                             "order": {"kind": "nope"}}).encode(),
            method="POST")
        assert not json.load(urllib.request.urlopen(bad))["ok"]
    finally:
        srv.shutdown()


def test_editor_place_wall_erase_and_save(game, tmp_path):
    """FEStatePane analog: place/erase units, toggle walls, export a map
    XML the standard loader reads back."""
    import numpy as np

    from microrts_tpu.engine.pgs import PhysicalGameState

    game.compiler.clear()
    free = (np.asarray(game.state.terrain) == 0) \
        & (np.asarray(game.state.utype) == 0)
    (y1, x1), (y2, x2) = list(zip(*np.nonzero(free)))[:2]
    heavy = next(i for i, ut in enumerate(game.env.utt.unit_types)
                 if ut.name == "Heavy")
    ok, err = game.edit("place", int(x1), int(y1), heavy, player=1)
    assert ok, err
    assert int(np.asarray(game.state.utype)[y1, x1]) == heavy + 1
    assert int(np.asarray(game.state.owner)[y1, x1]) == 1
    assert int(np.asarray(game.state.hp)[y1, x1]) \
        == game.env.cfg.engine.hp[heavy]

    ok, _ = game.edit("wall", int(x2), int(y2))
    assert ok
    assert int(np.asarray(game.state.terrain)[y2, x2]) == 1
    ok, err = game.edit("place", int(x2), int(y2), heavy)
    assert not ok                      # can't place on a wall

    xml = game.map_xml()
    p = tmp_path / "edited.xml"
    p.write_text(xml)
    pgs = PhysicalGameState.load(str(p), game.env.utt)
    u = pgs.get_unit_at(int(x1), int(y1))
    assert u is not None and u.type_id == heavy and u.player == 1
    assert pgs.get_terrain(int(x2), int(y2)) == 1

    ok, _ = game.edit("erase", int(x1), int(y1))
    assert ok and int(np.asarray(game.state.utype)[y1, x1]) == 0
    ok, _ = game.edit("floor", int(x2), int(y2))
    assert ok and int(np.asarray(game.state.terrain)[y2, x2]) == 0
