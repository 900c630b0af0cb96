"""SocketAI protocol: serve our bots/policies to Java microRTS over TCP.

Implements the AI-server side of the reference's remote-agent protocol
(ai/socket/SocketAI.java:114-176): a Java `SocketAI` bot connects, sends
``budget t i`` / ``utt`` / per-move ``getAction <player>`` + a GameState
(JSON or XML), and expects one line with a PlayerAction.  This is the
cross-play bridge: the Java engine hosts the game; the TPU side answers
moves — and doubles as the JSON/XML GameState parser for any client of the
wire format.
"""

from __future__ import annotations

import json
import socketserver
import threading
from typing import Callable, Optional, Tuple

import numpy as np

from .. import refimpl
from ..engine.pgs import HostPlayer, HostUnit, PhysicalGameState
from ..engine.types import EngineConfig, State
from ..engine.utt import UnitTypeTable
from .serialize import state_from_xml


def pgs_from_json(o: dict, utt: UnitTypeTable,
                  fallback_dims: Optional[Tuple[int, int]] = None
                  ) -> PhysicalGameState:
    """PhysicalGameState.toJSON wire format (:654-695)."""
    from ..engine.pgs import terrain_from_string

    w = o.get("width")
    h = o.get("height")
    if w is None:
        w, h = fallback_dims
    terrain = (terrain_from_string(o["terrain"], w * h)
               if "terrain" in o else np.zeros(w * h, np.int8))
    pgs = PhysicalGameState(w, h, terrain)
    for p in o.get("players", []):
        pgs.players.append(HostPlayer(ID=p["ID"], resources=p["resources"]))
    for u in o.get("units", []):
        ut = utt.get_unit_type(u["type"])
        pgs.units.append(HostUnit(
            ID=u["ID"], player=u["player"], type_id=ut.ID, x=u["x"],
            y=u["y"], resources=u.get("resources", 0),
            hitpoints=u.get("hitpoints", ut.hp)))
    return pgs


def state_from_json(text: str, utt: UnitTypeTable,
                    cfg: Optional[EngineConfig] = None,
                    fallback_dims=None) -> State:
    """GameState.toJSON wire format (:809-842) -> device State."""
    import jax.numpy as jnp
    from ..engine.types import state_from_pgs

    o = json.loads(text)
    pgs = pgs_from_json(o["pgs"], utt, fallback_dims)
    if cfg is None:
        cfg = EngineConfig.from_utt(utt, pgs.height, pgs.width)
    state = state_from_pgs(pgs, cfg, time=o.get("time", 0))
    busy = np.zeros((pgs.height, pgs.width), bool)
    planes = {k: np.zeros((pgs.height, pgs.width), np.int32)
              for k in ("atype", "aparam", "atx", "aty", "aptype", "aticks",
                        "aorder")}
    atime = np.zeros((pgs.height, pgs.width), np.int32) - 1
    for i, a in enumerate(o.get("actions", [])):
        u = pgs.get_unit(a["ID"])
        if u is None:
            continue
        ua_o = a.get("action", a.get("unitAction", {}))
        ua = refimpl.UnitAction(ua_o.get("type", 0))
        ua.parameter = ua_o.get("parameter", -1)
        ua.x = ua_o.get("x", 0)
        ua.y = ua_o.get("y", 0)
        if "unitType" in ua_o:
            ua.unit_type = utt.get_unit_type(ua_o["unitType"]).ID
        issue_time = a.get("time", o.get("time", 0))
        busy[u.y, u.x] = True
        planes["atype"][u.y, u.x] = ua.type
        planes["aparam"][u.y, u.x] = ua.parameter
        planes["atx"][u.y, u.x] = ua.x
        planes["aty"][u.y, u.x] = ua.y
        planes["aptype"][u.y, u.x] = ua.unit_type or 0
        planes["aticks"][u.y, u.x] = (issue_time
                                      + refimpl.eta(ua, u, utt)
                                      - o.get("time", 0))
        planes["aorder"][u.y, u.x] = i
        atime[u.y, u.x] = issue_time
    return state.replace(
        busy=jnp.asarray(busy), atime=jnp.asarray(atime),
        **{k: jnp.asarray(v) for k, v in planes.items()}).canon()


def action_to_json(uid: int, a: dict, utt: UnitTypeTable) -> dict:
    t = a["type"]
    ua = {"type": t}
    if t == refimpl.TYPE_ATTACK_LOCATION:
        ua["x"] = a["x"]
        ua["y"] = a["y"]
    else:
        if a["parameter"] != refimpl.DIRECTION_NONE:
            ua["parameter"] = a["parameter"]
        if t == refimpl.TYPE_PRODUCE:
            ua["unitType"] = utt.unit_types[a["unit_type"]].name
    return {"unitID": uid, "unitAction": ua}


class AIServer:
    """Serves ``bot_factory(env)``-style agents over the SocketAI line
    protocol (JSON serialization, the reference default for RL use)."""

    def __init__(self, make_bot: Callable, host: str = "127.0.0.1",
                 port: int = 9898):
        self.make_bot = make_bot
        self.host = host
        self.port = port
        self._server = None

    def serve_forever(self):
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                try:
                    self._handle()
                except Exception:
                    import traceback
                    traceback.print_exc()
                    raise

            def _handle(self):
                import jax

                self.wfile.write(b"microrts_tpu AI server ready\n")
                self.wfile.flush()
                utt = None
                bot = None
                env = None
                key = jax.random.PRNGKey(0)
                while True:
                    line = self.rfile.readline()
                    if not line:
                        return
                    line = line.decode().strip()
                    if line.startswith("budget"):
                        self.wfile.write(b"ack\n")
                    elif line == "utt":
                        utt_line = self.rfile.readline().decode().strip()
                        if utt_line.startswith("<"):
                            import xml.etree.ElementTree as ET
                            utt = UnitTypeTable.from_xml(
                                ET.fromstring(utt_line))
                        else:
                            utt = UnitTypeTable.from_json(utt_line)
                        self.wfile.write(b"ack\n")
                    elif line.startswith("getAction"):
                        player = int(line.split()[1])
                        gs_line = self.rfile.readline().decode().strip()
                        is_xml = gs_line.startswith("<")
                        if is_xml:
                            state = state_from_xml(gs_line, utt)
                        else:
                            state = state_from_json(gs_line, utt)
                        if bot is None:
                            h, w = state.utype.shape
                            env, bot = outer.make_bot(utt, h, w)
                        key, sub = jax.random.split(key)
                        a = bot(state, player, sub)
                        cand, _, _ = env.decode(
                            state, a, player, env._inflight_claims(state),
                            env._inflight_spent(state, player))
                        from .serialize import TraceRecorder
                        rec = TraceRecorder(utt)
                        rec.record_candidates(state, cand)
                        _, _, acts = rec.entries[0]
                        real = [(uid, ad) for uid, ad in acts
                                if ad["type"] != 0]
                        if is_xml:
                            from .serialize import _action_xml
                            body = "".join(
                                f'<action unitID="{uid}">'
                                + _action_xml(ad, utt).replace("\n", "")
                                + "</action>" for uid, ad in real)
                            reply = f"<actions>{body}</actions>".encode()
                        else:
                            reply = json.dumps(
                                [action_to_json(uid, ad, utt)
                                 for uid, ad in real]).encode()
                        self.wfile.write(reply + b"\n")
                    elif line in ("gameOver", "exit", "close"):
                        self.wfile.write(b"ack\n")
                        return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((self.host, self.port), Handler)
        self._server.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        import time
        for _ in range(100):
            if self._server is not None:
                break
            time.sleep(0.05)
        return t

    def shutdown(self):
        if self._server is not None:
            self._server.shutdown()


class RemoteBot:
    """Client side: a bot whose moves come from a remote AI server speaking
    the SocketAI line protocol (the reference's SERVER/CLIENT launch modes,
    rts/MicroRTS.java:62-81 / RemoteGame.java:23-43).  Wraps the remote
    agent as a host-side bot usable in the CLI game loop — each getAction
    ships the GameState as JSON (``communication_language=1``, the RL
    default) or XML (``wire="xml"``, SocketAI.LANGUAGE_XML:29-56) and
    parses the returned PlayerAction in the matching format."""

    def __init__(self, env, host: str = "127.0.0.1", port: int = 9898,
                 time_budget: int = 100, iter_budget: int = 0,
                 wire: str = "json"):
        import socket as _socket

        assert wire in ("json", "xml")
        self.env = env
        self.wire = wire
        self._sock = _socket.create_connection((host, port), timeout=60)
        self._f = self._sock.makefile("rwb")
        # consume welcome line(s), send budget + utt (SocketAI.reset :130-166)
        self._f.readline()
        self._send(f"budget {time_budget} {iter_budget}\n")
        self._f.readline()
        if wire == "xml":
            from .serialize import utt_to_xml
            self._send("utt\n"
                       + utt_to_xml(env.utt).replace("\n", "") + "\n")
        else:
            self._send("utt\n" + env.utt.to_json() + "\n")
        self._f.readline()

    def _send(self, text: str):
        self._f.write(text.encode())
        self._f.flush()

    def __call__(self, state, player, key=None):
        """Returns a gridnet [H, W, 7] tensor decoded from the remote
        PlayerAction reply."""
        import jax.numpy as jnp
        import numpy as np

        from .serialize import state_to_pgs, state_assignments

        utt = self.env.utt
        pgs = state_to_pgs(state, utt)
        units = {u.ID: u for u in pgs.units}
        if self.wire == "xml":
            from .serialize import state_to_xml
            self._send(f"getAction {int(player)}\n"
                       + state_to_xml(state, utt).replace("\n", "") + "\n")
            reply = _actions_from_xml(self._f.readline().decode(), utt)
        else:
            o = {"time": int(state.time),
                 "pgs": {
                     "width": pgs.width, "height": pgs.height,
                     "terrain": "".join(str(int(t)) for t in pgs.terrain),
                     "players": [{"ID": p.ID, "resources": p.resources}
                                 for p in pgs.players],
                     "units": [{"type": utt.unit_types[u.type_id].name,
                                "ID": u.ID, "player": u.player, "x": u.x,
                                "y": u.y, "resources": u.resources,
                                "hitpoints": u.hitpoints}
                               for u in pgs.units]},
                 "actions": [{"ID": uid, "time": at,
                              "action": _ad_json(a, utt)}
                             for uid, at, _o, a in state_assignments(state)]}
            self._send(f"getAction {int(player)}\n" + json.dumps(o) + "\n")
            reply = json.loads(self._f.readline().decode())
        H, W = self.env.h, self.env.w
        out = np.zeros((H, W, 7), np.int32)
        D = 2 * self.env.cfg.engine.max_range + 1
        R = self.env.cfg.engine.max_range
        for entry in reply:
            u = units.get(entry.get("unitID"))
            if u is None:
                continue
            ua = entry.get("unitAction", {})
            t = ua.get("type", 0)
            row = out[u.y, u.x]
            row[0] = t
            p = ua.get("parameter", -1)
            if t == refimpl.TYPE_MOVE:
                row[1] = p
            elif t == refimpl.TYPE_HARVEST:
                row[2] = p
            elif t == refimpl.TYPE_RETURN:
                row[3] = p
            elif t == refimpl.TYPE_PRODUCE:
                row[4] = p
                ut = utt.get_unit_type(ua.get("unitType", ""))
                row[5] = ut.ID if ut else 0
            elif t == refimpl.TYPE_ATTACK_LOCATION:
                rel_x = ua.get("x", u.x) - u.x + R
                rel_y = ua.get("y", u.y) - u.y + R
                row[6] = rel_y * D + rel_x
        return jnp.asarray(out)

    def close(self):
        self._sock.close()


def _actions_from_xml(text: str, utt: UnitTypeTable):
    """Parse an ``<actions><action unitID=..><UnitAction ../>..`` reply
    into the same dict rows the JSON path yields (XMLSocketWrapperAI /
    SocketAI LANGUAGE_XML :29-56)."""
    import xml.etree.ElementTree as ET

    out = []
    if not text.strip():
        return out
    root = ET.fromstring(text)
    for a_e in root:
        ua_e = a_e.find("UnitAction")
        if ua_e is None:
            continue
        ua = {"type": int(ua_e.get("type", 0))}
        if ua_e.get("parameter") is not None:
            ua["parameter"] = int(ua_e.get("parameter"))
        if ua_e.get("x") is not None:
            ua["x"] = int(ua_e.get("x"))
            ua["y"] = int(ua_e.get("y"))
        if ua_e.get("unitType") is not None:
            ua["unitType"] = ua_e.get("unitType")
        out.append({"unitID": int(a_e.get("unitID", -1)),
                    "unitAction": ua})
    return out


def _ad_json(a: dict, utt: UnitTypeTable) -> dict:
    t = a["type"]
    out = {"type": t}
    if t == refimpl.TYPE_ATTACK_LOCATION:
        out["x"], out["y"] = a["x"], a["y"]
    else:
        if a["parameter"] != refimpl.DIRECTION_NONE:
            out["parameter"] = a["parameter"]
        if t == refimpl.TYPE_PRODUCE:
            out["unitType"] = utt.unit_types[a["unit_type"]].name
    return out
