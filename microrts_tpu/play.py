"""Live human play in the browser: the MouseGame / MouseController analog.

The reference's MouseGame (rts/MouseGame.java:7-23) opens a Swing frame and
installs a MouseController — an AbstractionLayerAI whose mouse listener
turns clicks into macro actions (gui/MouseController.java:22-36,
gui/PGSMouseListener.java:81-187):

- left-click selects one of your units,
- left-click a unit-type button selects what to train/build,
- right-click sends orders: empty cell -> move (or build the selected type
  there with a worker), enemy -> attack, resource -> harvest cycle.

This module delivers the same capability headless-native: a tiny stdlib
HTTP server serves a canvas page (same visual language as viewer.py); the
browser posts orders; the host keeps per-unit STANDING ORDERS and compiles
them to one gridnet action per tick (the AbstractionLayerAI.translateActions
pattern: each macro emits at most one UnitAction per unit per tick), then
steps the jitted env against an on-device scripted opponent via
``env.step_vs`` (JNIGridnetClient.gameStep semantics).

    python -m microrts_tpu.play --map maps/8x8/basesWorkers8x8.xml \
        --ai2 WorkerRush [--port 8765] [--tick-ms 100]

Orders persist across ticks and follow the unit as it moves (tracked by
uid); a completed or impossible order is dropped, exactly like the
reference clears finished AbstractAction objects.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .engine.types import ATTACK, HARVEST, MOVE, PRODUCE, RETURN

# direction encoding shared with the engine: 0=up 1=right 2=down 3=left
DXY = ((0, -1), (1, 0), (0, 1), (-1, 0))


def _bfs(dist_src, passable):
    """Plain host BFS (4-neighbor) from the True cells of ``dist_src``
    over ``passable``; returns int distances (INF = unreachable).  Human
    play is 10 ticks/s on small boards — numpy BFS is microseconds and
    keeps the order compiler trivially hackable."""
    H, W = passable.shape
    INF = 1 << 20
    d = np.full((H, W), INF, np.int32)
    q = deque()
    ys, xs = np.nonzero(dist_src)
    for y, x in zip(ys, xs):
        d[y, x] = 0
        q.append((y, x))
    while q:
        y, x = q.popleft()
        for dx, dy in DXY:
            ny, nx = y + dy, x + dx
            if 0 <= ny < H and 0 <= nx < W and passable[ny, nx] \
                    and d[ny, nx] > d[y, x] + 1:
                d[ny, nx] = d[y, x] + 1
                q.append((ny, nx))
    return d


def _step_toward(board, y, x, ty, tx):
    """One MOVE direction descending the BFS field toward (tx, ty);
    None if unreachable/adjacent-blocked.  Target cell itself counts as
    passable so fields reach units/resources we walk up to."""
    passable = board["free"].copy()
    src = np.zeros_like(passable)
    src[ty, tx] = True
    d = _bfs(src, passable | src)
    best, bd = None, d[y, x]
    for k, (dx, dy) in enumerate(DXY):
        ny, nx = y + dy, x + dx
        if 0 <= ny < board["h"] and 0 <= nx < board["w"] \
                and board["free"][ny, nx] and d[ny, nx] < bd:
            best, bd = k, d[ny, nx]
    return best


class OrderCompiler:
    """Per-tick standing-order -> gridnet action compilation (the
    AbstractionLayerAI analog: Move/Train/Build/Harvest/Attack macros,
    ai/abstraction/AbstractionLayerAI.java one-action-per-unit-per-tick)."""

    def __init__(self, env):
        self.env = env
        self.cfg = env.cfg.engine
        self.orders = {}        # uid -> dict(kind=..., ...)

    def set_order(self, uid, order):
        self.orders[int(uid)] = order

    def clear(self):
        self.orders.clear()

    def _board(self, state):
        utype = np.asarray(state.utype)
        return {
            "h": self.env.h, "w": self.env.w,
            "utype": utype,
            "owner": np.asarray(state.owner),
            "busy": np.asarray(state.busy),
            "carried": np.asarray(state.carried),
            "uid": np.asarray(state.uid),
            "free": (np.asarray(state.terrain) == 0) & (utype == 0),
        }

    def compile(self, state, player=0):
        """Returns (actions int32 [H, W, 7], per-uid order status)."""
        cfg = self.cfg
        b = self._board(state)
        H, W = b["h"], b["w"]
        R = cfg.max_range
        D = 2 * R + 1
        acts = np.zeros((H, W, 7), np.int32)
        pos = {int(b["uid"][y, x]): (y, x)
               for y, x in zip(*np.nonzero(b["utype"] > 0))}
        done = []
        for uid, od in self.orders.items():
            if uid not in pos:
                done.append(uid)      # unit died
                continue
            y, x = pos[uid]
            if b["owner"][y, x] != player or b["busy"][y, x]:
                continue              # not ours / action in flight
            t = int(b["utype"][y, x]) - 1
            a = self._one(od, b, y, x, t, pos, D, R)
            if a is None:
                done.append(uid)
            elif a is not False:
                acts[y, x] = a
                if od["kind"] == "train":
                    done.append(uid)    # one train per click, like the GUI
        for uid in done:
            self.orders.pop(uid, None)
        return acts, done

    # one gridnet row [type, mdir, hdir, rdir, pdir, ptype, arel]; None =
    # order complete/impossible (drop), False = nothing to do this tick
    def _one(self, od, b, y, x, t, pos, D, R):
        cfg = self.cfg
        kind = od["kind"]
        if kind == "move":
            ty, tx = od["ty"], od["tx"]
            if (y, x) == (ty, tx):
                return None
            k = _step_toward(b, y, x, ty, tx)
            return None if k is None else [MOVE, k, 0, 0, 0, 0, 0]
        if kind == "attack":
            tuid = od["uid"]
            if tuid not in pos:
                return None           # target dead: done
            ty, tx = pos[tuid]
            rng = cfg.attack_range[t]
            if (tx - x) ** 2 + (ty - y) ** 2 <= rng * rng and \
                    cfg.can_attack[t]:
                rel = (ty - y + R) * D + (tx - x + R)
                return [ATTACK, 0, 0, 0, 0, 0, rel]
            k = _step_toward(b, y, x, ty, tx)
            return False if k is None else [MOVE, k, 0, 0, 0, 0, 0]
        if kind == "harvest":
            if not cfg.can_harvest[t]:
                return None
            if b["carried"][y, x] > 0:
                # return leg: nearest own stockpile
                stock = np.zeros((b["h"], b["w"]), bool)
                for (yy, xx) in zip(*np.nonzero(
                        (b["owner"] == 0) & (b["utype"] > 0))):
                    if cfg.is_stockpile[b["utype"][yy, xx] - 1]:
                        stock[yy, xx] = True
                for k, (dx, dy) in enumerate(DXY):
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < b["h"] and 0 <= nx < b["w"] \
                            and stock[ny, nx]:
                        return [RETURN, 0, 0, k, 0, 0, 0]
                d = _bfs(stock, b["free"] | stock)
                k = self._descend(b, y, x, d)
                return False if k is None else [MOVE, k, 0, 0, 0, 0, 0]
            ty, tx = od["ty"], od["tx"]
            if b["utype"][ty, tx] == 0:
                return None           # node depleted: done
            for k, (dx, dy) in enumerate(DXY):
                if (y + dy, x + dx) == (ty, tx):
                    return [HARVEST, 0, k, 0, 0, 0, 0]
            k = _step_toward(b, y, x, ty, tx)
            return False if k is None else [MOVE, k, 0, 0, 0, 0, 0]
        if kind == "build":
            ty, tx, pt = od["ty"], od["tx"], od["ptype"]
            if not cfg.produces[t][pt]:
                return None
            if b["utype"][ty, tx] != 0:
                return None           # spot taken (incl. our finished build)
            for k, (dx, dy) in enumerate(DXY):
                if (y + dy, x + dx) == (ty, tx):
                    return [PRODUCE, 0, 0, 0, k, pt, 0]
            k = _step_toward(b, y, x, ty, tx)
            return False if k is None else [MOVE, k, 0, 0, 0, 0, 0]
        if kind == "train":
            pt = od["ptype"]
            if not cfg.produces[t][pt]:
                return None
            for k, (dx, dy) in enumerate(DXY):
                ny, nx = y + dy, x + dx
                if 0 <= ny < b["h"] and 0 <= nx < b["w"] \
                        and b["free"][ny, nx]:
                    return [PRODUCE, 0, 0, 0, k, pt, 0]  # one-shot
            return False
        return None

    def _descend(self, b, y, x, d):
        best, bd = None, d[y, x]
        for k, (dx, dy) in enumerate(DXY):
            ny, nx = y + dy, x + dx
            if 0 <= ny < b["h"] and 0 <= nx < b["w"] \
                    and b["free"][ny, nx] and d[ny, nx] < bd:
                best, bd = k, d[ny, nx]
        return best


class HumanGame:
    """Host game loop: human standing orders vs a scripted opponent."""

    def __init__(self, map_path, ai2="WorkerRush", tick_ms=100,
                 max_ticks=5000, utt_version=2):
        import jax

        from .config import make_bot
        from .engine.utt import UnitTypeTable
        from .env.gridnet import GridnetEnv

        self.env = GridnetEnv(map_path, UnitTypeTable(utt_version))
        self.bot = make_bot(ai2, self.env)
        self.compiler = OrderCompiler(self.env)
        self.tick_ms = tick_ms
        self.max_ticks = max_ticks
        self._jax = jax
        self._step = jax.jit(
            lambda s, a, k: self.env.step_vs(
                s, a, lambda st, p: self.bot(st, p, k)))
        self.key = jax.random.PRNGKey(0)
        self.state = self.env.reset(jax.random.PRNGKey(1))
        self.paused = True
        self.over = False
        self.lock = threading.Lock()

    def tick(self):
        import jax

        with self.lock:
            if self.over:
                return
            acts, _ = self.compiler.compile(self.state)
            self.key, k = jax.random.split(self.key)
            self.state, _r, done = self._step(
                self.state, self._jax.numpy.asarray(acts), k)
            if bool(done) or int(self.state.time) >= self.max_ticks:
                self.over = True

    def snapshot(self):
        s = self.state
        utype = np.asarray(s.utype)
        units = []
        for y, x in zip(*np.nonzero(utype > 0)):
            units.append([int(x), int(y), int(utype[y, x] - 1),
                          int(np.asarray(s.owner)[y, x]),
                          int(np.asarray(s.hp)[y, x]),
                          int(np.asarray(s.carried)[y, x]),
                          int(np.asarray(s.atype)[y, x])
                          if np.asarray(s.busy)[y, x] else -1,
                          int(np.asarray(s.uid)[y, x])])
        eng = self.env.engine
        return {
            "t": int(s.time), "over": self.over, "paused": self.paused,
            "winner": int(eng.winner(s)) if self.over else -1,
            "res": [int(s.resources[0]), int(s.resources[1])],
            "units": units,
            "orders": {str(u): o["kind"]
                       for u, o in self.compiler.orders.items()},
        }

    # -- state editor (the FrontEnd FEStatePane analog: place/erase units
    # and walls, set stockpiles, export the result as a reference-format
    # map XML; gui/frontend/FEStatePane.java) ------------------------------
    def edit(self, op, x=0, y=0, ptype=0, player=0, amount=None):
        from .engine.pgs import HostUnit
        from .engine.types import state_from_pgs
        from .interop.serialize import state_to_pgs

        cfg = self.env.cfg.engine
        with self.lock:
            pgs = state_to_pgs(self.state, self.env.utt)
            if not (op == "resources" or (0 <= x < pgs.width
                                          and 0 <= y < pgs.height)):
                return False, "out of bounds"
            u = pgs.get_unit_at(x, y)
            if op == "place":
                if pgs.get_terrain(x, y):
                    return False, "wall"
                if u is not None:
                    pgs.remove_unit(u)
                ut = self.env.utt.unit_types[ptype]
                pl = -1 if ut.is_resource else player
                nid = max((q.ID for q in pgs.units), default=-1) + 1
                pgs.add_unit(HostUnit(
                    ID=nid, player=pl, type_id=ptype, x=x, y=y,
                    resources=(amount if amount is not None else 10)
                    if ut.is_resource else 0,
                    hitpoints=cfg.hp[ptype]))
            elif op == "erase":
                if u is not None:
                    pgs.remove_unit(u)
            elif op in ("wall", "floor"):
                if u is not None:
                    pgs.remove_unit(u)
                pgs.terrain[x + y * pgs.width] = 1 if op == "wall" else 0
            elif op == "resources":
                pgs.players[player].resources = int(amount or 0)
            else:
                return False, "bad op"
            self.state = state_from_pgs(
                pgs, cfg, time=int(self.state.time)).replace(
                    key=self.state.key)
            self.over = False
            return True, ""

    def map_xml(self):
        from .interop.serialize import state_to_pgs
        with self.lock:
            return state_to_pgs(self.state, self.env.utt).to_xml(
                self.env.utt)

    def meta(self):
        cfg = self.env.cfg.engine
        return {
            "w": self.env.w, "h": self.env.h,
            "terrain": np.asarray(self.state.terrain).tolist(),
            "types": [ut.name for ut in self.env.utt.unit_types],
            "produces": [list(map(bool, r)) for r in cfg.produces],
            "cost": list(cfg.cost),
            "tick_ms": self.tick_ms,
        }


PAGE = """<!doctype html><meta charset=utf-8><title>microrts_tpu play</title>
<style>body{font:14px sans-serif;background:#111;color:#ddd;margin:16px}
#bar{margin:8px 0}button{margin-right:6px}
canvas{background:#1b1b1b;image-rendering:pixelated;cursor:crosshair}
.tb{background:#333;color:#ddd;border:1px solid #555;padding:4px 8px}
.tb.sel{background:#7a5;color:#000}
#msg{color:#9c9}</style>
<h3>microrts_tpu — you are <span style=color:#6af>blue (player 0)</span></h3>
<div id=bar>
<button class=tb id=go>&#9654; start</button>
<button class=tb id=edit>&#9998; edit</button>
<span id=edtools style=display:none>
<button class=tb data-tool=place>place</button>
<button class=tb data-tool=wall>wall</button>
<button class=tb data-tool=floor>floor</button>
<button class=tb data-tool=erase>erase</button>
<select id=edplayer class=tb><option value=0>P0 (blue)</option>
<option value=1>P1 (red)</option></select>
<a class=tb href=/map.xml download=edited.xml
   style=text-decoration:none>save map</a></span>
<span id=stat></span> <span id=msg></span></div>
<canvas id=cv oncontextmenu="return false"></canvas>
<div id=pal></div>
<p>left-click: select your unit &middot; left-click a type button then
right-click an empty cell: build/train &middot; right-click: move /
attack enemy / harvest resource (MouseController semantics)</p>
<script>
let META=null,S=null,sel=null,selType=null;
const cv=document.getElementById('cv'),cx=cv.getContext('2d');
const P0='#5588ff',P1='#ff5555',NEU='#44aa44';
async function jget(u){return (await fetch(u)).json()}
async function jpost(u,b){return (await fetch(u,{method:'POST',
  body:JSON.stringify(b)})).json()}
function cell(){return Math.max(14,Math.min(40,Math.floor(720/META.w)))}
function draw(){
  if(!META||!S)return;const C=cell();
  cv.width=META.w*C;cv.height=META.h*C;
  cx.fillStyle='#1b1b1b';cx.fillRect(0,0,cv.width,cv.height);
  cx.strokeStyle='#2a2a2a';
  for(let y=0;y<=META.h;y++){cx.beginPath();cx.moveTo(0,y*C);
    cx.lineTo(cv.width,y*C);cx.stroke()}
  for(let x=0;x<=META.w;x++){cx.beginPath();cx.moveTo(x*C,0);
    cx.lineTo(x*C,cv.height);cx.stroke()}
  for(let y=0;y<META.h;y++)for(let x=0;x<META.w;x++)
    if(META.terrain[y][x]){cx.fillStyle='#355e35';
      cx.fillRect(x*C,y*C,C,C)}
  for(const u of S.units){
    const[x,y,t,pl,hp,res,act,uid]=u,px=x*C,py=y*C;
    const col=pl<0?NEU:(pl==0?P0:P1);
    const name=META.types[t];
    cx.fillStyle=col;cx.strokeStyle=sel===uid?'#fff':col;cx.lineWidth=2;
    if(name=='Base'||name=='Barracks'||name=='Resource'){
      cx.fillRect(px+2,py+2,C-4,C-4);cx.strokeRect(px+2,py+2,C-4,C-4)}
    else{cx.beginPath();cx.arc(px+C/2,py+C/2,C*0.36,0,7);cx.fill();
      if(sel===uid){cx.stroke()}}
    cx.fillStyle='#000';cx.font=`${Math.floor(C/2)}px sans-serif`;
    cx.textAlign='center';
    cx.fillText(name[0],px+C/2,py+C/2+C/6);
    if(res>0){cx.fillStyle='#fd5';cx.fillText(res,px+C/2,py+C-2)}
  }
}
function at(e){const r=cv.getBoundingClientRect(),C=cell();
  return[Math.floor((e.clientX-r.left)/C),Math.floor((e.clientY-r.top)/C)]}
function unitAt(x,y){for(const u of S.units)
  if(u[0]==x&&u[1]==y)return u;return null}
let editing=false,tool='place';
document.getElementById('edit').onclick=()=>{editing=!editing;
  document.getElementById('edtools').style.display=editing?'':'none';
  msg(editing?'editing (game paused; in-flight actions reset on edit)':'')};
document.querySelectorAll('#edtools [data-tool]').forEach(b=>
  b.onclick=()=>{tool=b.dataset.tool;msg('tool: '+tool)});
cv.addEventListener('mousedown',async e=>{
  const[x,y]=at(e);const u=unitAt(x,y);
  if(editing){
    const pl=+document.getElementById('edplayer').value;
    const body=tool=='place'
      ?{op:'place',x,y,ptype:selType===null?0:selType,player:pl}
      :{op:tool,x,y};
    const r=await jpost('/edit',body);
    msg(r.ok?'':'edit rejected: '+r.err);
    META=await jget('/meta');poll();return}
  if(e.button==0){sel=(u&&u[3]==0)?u[7]:null;selTypeClear();draw();return}
  if(e.button!=2||sel===null)return;
  let od=null;
  if(u&&u[3]==1)od={kind:'attack',uid:u[7]};
  else if(u&&u[3]<0)od={kind:'harvest',ty:y,tx:x};
  else if(!u&&selType!==null)od={kind:'build',ty:y,tx:x,ptype:selType};
  else if(!u)od={kind:'move',ty:y,tx:x};
  if(od){const r=await jpost('/order',{uid:sel,order:od});
    msg(r.ok?od.kind+' order set':'rejected: '+r.err)}
});
function msg(s){document.getElementById('msg').textContent=s}
function selTypeClear(){selType=null;
  document.querySelectorAll('#pal .tb').forEach(b=>b.classList.remove('sel'))}
function palette(){const pal=document.getElementById('pal');
  META.types.forEach((n,i)=>{
    const b=document.createElement('button');b.className='tb';
    b.textContent=`${n} (${META.cost[i]})`;
    b.onclick=()=>{selTypeClear();selType=i;b.classList.add('sel');
      // train immediately if a building is selected
      if(sel!==null)jpost('/order',{uid:sel,order:{kind:'train',ptype:i}})
        .then(r=>{if(r.ok)msg('training '+n)})};
    pal.appendChild(b)})}
document.getElementById('go').onclick=async()=>{
  const r=await jpost('/pause',{paused:false});msg('running')};
async function poll(){S=await jget('/state');
  document.getElementById('stat').textContent=
    `t=${S.t} res ${S.res[0]} : ${S.res[1]}`+
    (S.over?` — GAME OVER, winner: ${S.winner<0?'draw':
      (S.winner==0?'YOU':'AI')}`:'');
  draw()}
(async()=>{META=await jget('/meta');palette();
  setInterval(poll,Math.max(80,META.tick_ms));poll()})();
</script>"""


def make_handler(game: HumanGame):
    class H(BaseHTTPRequestHandler):
        def _send(self, obj, ctype="application/json"):
            body = (obj if isinstance(obj, bytes)
                    else json.dumps(obj).encode())
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/" or self.path.startswith("/index"):
                self._send(PAGE.encode(), "text/html; charset=utf-8")
            elif self.path == "/state":
                self._send(game.snapshot())
            elif self.path == "/meta":
                self._send(game.meta())
            elif self.path == "/map.xml":
                self._send(game.map_xml().encode(), "application/xml")
            else:
                self.send_error(404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            if self.path == "/order":
                od = req.get("order", {})
                if od.get("kind") not in ("move", "attack", "harvest",
                                          "build", "train"):
                    self._send({"ok": False, "err": "bad kind"})
                    return
                game.compiler.set_order(req["uid"], od)
                self._send({"ok": True})
            elif self.path == "/pause":
                game.paused = bool(req.get("paused", False))
                self._send({"ok": True, "paused": game.paused})
            elif self.path == "/edit":
                game.paused = True
                ok, err = game.edit(
                    req.get("op", ""), int(req.get("x", 0)),
                    int(req.get("y", 0)), int(req.get("ptype", 0)),
                    int(req.get("player", 0)), req.get("amount"))
                self._send({"ok": ok, "err": err})
            else:
                self.send_error(404)

        def log_message(self, *a):    # quiet
            pass

    return H


def serve(game: HumanGame, port=8765, open_browser=False):
    srv = ThreadingHTTPServer(("127.0.0.1", port), make_handler(game))

    def loop():
        while True:
            t0 = time.time()
            if not game.paused and not game.over:
                game.tick()
            time.sleep(max(0.0, game.tick_ms / 1000 - (time.time() - t0)))

    threading.Thread(target=loop, daemon=True).start()
    print(f"playing at http://127.0.0.1:{port}/ — ctrl-c to quit")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


def main(argv=None):
    ap = argparse.ArgumentParser(prog="microrts_tpu.play")
    ap.add_argument("--map", default="maps/8x8/basesWorkers8x8.xml")
    ap.add_argument("--ai2", default="WorkerRush")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--tick-ms", type=int, default=100)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (recommended: play is "
                    "latency-, not throughput-bound)")
    args = ap.parse_args(argv)
    if args.cpu:
        from .utils.platform import force_cpu
        force_cpu()
    from .utils.assets import asset_path
    game = HumanGame(asset_path(args.map), args.ai2, args.tick_ms)
    serve(game, args.port)


if __name__ == "__main__":
    main()
