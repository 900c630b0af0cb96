"""Trace viewer: one command turns a replay zip into a watchable page.

The analog of the reference's TraceVisualizer / FrontEnd trace pane
(gui/TraceVisualizer.java:22-103, gui/frontend/FETracePane.java): load a
zipped-XML trace (ours or Java's — same format, interop/trace.py), replay
it tick by tick through the host oracle (refimpl = the executable spec),
and emit a SELF-CONTAINED HTML page: a canvas board drawn in the Java
GUI's visual language (circles per mobile type, squares for buildings,
player-colored outlines, hp ticks — gui/PhysicalGameStatePanel.java:160-
260), a tick scrubber, play/pause with speed control, and hover
inspection of any unit.  No server, no dependencies — open the file.

    python -m microrts_tpu.viewer trace.zip [-o game.html]
"""

from __future__ import annotations

import argparse
import json
from typing import List

from .interop.trace import Trace, load_trace
from .refimpl import GameState


def frames_from_trace(trace: Trace, max_ticks: int = 100_000) -> dict:
    """Replay through the oracle; one frame per tick (TraceVisualizer
    steps the same way: issue recorded actions, cycle, repaint)."""
    pgs0 = trace.entries[0].pgs.clone()
    gs = GameState(pgs0, trace.utt)
    gs.time = trace.entries[0].time
    by_time = {e.time: e for e in trace.entries}
    t_end = trace.entries[-1].time

    type_names = [ut.name for ut in trace.utt.unit_types]
    frames: List[dict] = []

    def snap():
        units = []
        for u in gs.pgs.units:
            a = gs.get_assignment(u)
            units.append([u.x, u.y, u.type_id, u.player, u.hitpoints,
                          u.resources, a.action.type if a else -1])
        frames.append({
            "t": gs.time,
            "res": [p.resources for p in gs.pgs.players],
            "units": units,
        })

    while gs.time <= t_end and len(frames) < max_ticks:
        entry = by_time.get(gs.time)
        if entry is not None and entry.actions:
            by_id = {u.ID: u for u in gs.pgs.units}
            pa = [(by_id[uid], ua) for uid, ua in entry.actions
                  if uid in by_id]
            gs.issue_safe(pa)
        snap()
        gs.cycle()

    h, w = pgs0.height, pgs0.width
    terrain = [[int(pgs0.terrain[x + y * w]) for x in range(w)]
               for y in range(h)]
    return {
        "w": w, "h": h, "terrain": terrain,
        "types": type_names,
        "frames": frames,
    }


_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title>
<style>
 body{background:#1c1c22;color:#ddd;font:14px system-ui,sans-serif;
      display:flex;flex-direction:column;align-items:center;margin:0;padding:16px}
 canvas{image-rendering:pixelated;border:1px solid #555;background:#eee}
 #bar{display:flex;gap:10px;align-items:center;margin:12px 0;flex-wrap:wrap}
 input[type=range]{width:420px}
 button{background:#333;color:#ddd;border:1px solid #666;border-radius:4px;
        padding:4px 12px;cursor:pointer}
 #info{min-height:1.4em;color:#9ad}
 .p0{color:#6fa8ff}.p1{color:#ff7a6f}
</style></head><body>
<h3>__TITLE__</h3>
<div id="hud"></div>
<canvas id="cv"></canvas>
<div id="bar">
 <button id="play">&#9654;</button>
 <input type="range" id="tick" min="0" value="0">
 <span id="tlabel"></span>
 <label>speed <select id="speed">
   <option>1</option><option selected>4</option><option>16</option>
   <option>64</option></select>x</label>
</div>
<div id="info">hover a unit</div>
<script>
const D = __DATA__;
const CELL = Math.max(8, Math.min(28, Math.floor(760 / Math.max(D.w, D.h))));
const cv = document.getElementById('cv');
cv.width = D.w * CELL; cv.height = D.h * CELL;
const cx = cv.getContext('2d');
const slider = document.getElementById('tick');
slider.max = D.frames.length - 1;
const PCOL = ['#1f77ff', '#ff3b30'];      // player outline (Java: blue/red)
const ACT = ['none','move','harvest','return','produce','attack'];
function typeStyle(name){                 // PhysicalGameStatePanel palette
  switch(name){
    case 'Resource': return {fill:'#00c04d', shape:'square'};
    case 'Base':     return {fill:'#ffffff', shape:'square'};
    case 'Barracks': return {fill:'#bfbfbf', shape:'square'};
    case 'Worker':   return {fill:'#8c8c8c', shape:'circle', r:0.28};
    case 'Light':    return {fill:'#ffb300', shape:'circle', r:0.36};
    case 'Heavy':    return {fill:'#ffe900', shape:'circle', r:0.44};
    case 'Ranged':   return {fill:'#00b7ff', shape:'circle', r:0.40};
    default:         return {fill:'#d970ff', shape:'circle', r:0.40};
  }
}
function maxHp(name){for(const u of D.frames[0].units){
  if(D.types[u[2]]===name) return u[4];} return 4;}
let fi = 0, playing = false;
function draw(){
  const f = D.frames[fi];
  cx.fillStyle = '#efefef'; cx.fillRect(0,0,cv.width,cv.height);
  cx.strokeStyle = '#ddd';
  for(let y=0;y<=D.h;y++){cx.beginPath();cx.moveTo(0,y*CELL);
    cx.lineTo(cv.width,y*CELL);cx.stroke();}
  for(let x=0;x<=D.w;x++){cx.beginPath();cx.moveTo(x*CELL,0);
    cx.lineTo(x*CELL,cv.height);cx.stroke();}
  for(let y=0;y<D.h;y++)for(let x=0;x<D.w;x++)
    if(D.terrain[y][x]){cx.fillStyle='#2f4f2f';
      cx.fillRect(x*CELL,y*CELL,CELL,CELL);}
  for(const u of f.units){
    const [x,y,tid,pl,hp,res,act] = u;
    const st = typeStyle(D.types[tid]);
    const px = x*CELL, py = y*CELL;
    cx.fillStyle = st.fill;
    cx.strokeStyle = pl>=0 ? PCOL[pl] : '#0a5';
    cx.lineWidth = 2;
    if(st.shape==='square'){
      cx.fillRect(px+2,py+2,CELL-4,CELL-4);
      cx.strokeRect(px+2,py+2,CELL-4,CELL-4);
    }else{
      cx.beginPath();
      cx.arc(px+CELL/2,py+CELL/2,CELL*st.r,0,7);
      cx.fill(); cx.stroke();
    }
    if(res>0 && CELL>=12){cx.fillStyle='#053';cx.font=`${CELL-6}px sans-serif`;
      cx.textAlign='center';
      cx.fillText(res, px+CELL/2, py+CELL-4);}
    if(pl>=0 && hp>0){const m=maxHp(D.types[tid]);
      if(hp<m){cx.fillStyle='#d00';
        cx.fillRect(px+2,py,Math.max(2,(CELL-4)*hp/m),2);}}
  }
  document.getElementById('tlabel').textContent =
    `t=${f.t} (${fi+1}/${D.frames.length})`;
  document.getElementById('hud').innerHTML =
    `<span class="p0">P0 resources: ${f.res[0]??0}</span> &nbsp; `+
    `<span class="p1">P1 resources: ${f.res[1]??0}</span>`;
  slider.value = fi;
}
slider.oninput = () => {fi = +slider.value; draw();};
document.getElementById('play').onclick = function(){
  playing = !playing; this.innerHTML = playing? '&#10073;&#10073;':'&#9654;';
};
setInterval(()=>{ if(playing){
  fi = Math.min(fi + +document.getElementById('speed').value,
                D.frames.length-1);
  if(fi===D.frames.length-1) playing=false;
  draw();}}, 50);
cv.onmousemove = (e)=>{
  const r = cv.getBoundingClientRect();
  const x = Math.floor((e.clientX-r.left)/CELL),
        y = Math.floor((e.clientY-r.top)/CELL);
  const f = D.frames[fi];
  for(const u of f.units) if(u[0]===x&&u[1]===y){
    document.getElementById('info').textContent =
      `${D.types[u[2]]} @ (${x},${y}) ` +
      (u[3]>=0?`player ${u[3]} `:'neutral ') +
      `hp=${u[4]} carry=${u[5]} ` +
      (u[6]>=0?`doing ${ACT[u[6]]??u[6]}`:'idle');
    return;
  }
  document.getElementById('info').textContent = `(${x},${y})`;
};
draw();
</script></body></html>
"""


def viewer_html(trace: Trace, title: str = "microrts_tpu replay",
                max_ticks: int = 100_000) -> str:
    data = frames_from_trace(trace, max_ticks)
    return (_HTML.replace("__TITLE__", title)
            .replace("__DATA__", json.dumps(data, separators=(",", ":"))))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="microrts_tpu.viewer")
    ap.add_argument("trace", help="replay zip/xml (ours or Java's)")
    ap.add_argument("-o", "--out", default=None,
                    help="output html (default: <trace>.html)")
    ap.add_argument("--max-ticks", type=int, default=100_000)
    args = ap.parse_args(argv)
    out = args.out or (args.trace.rsplit(".", 1)[0] + ".html")
    html = viewer_html(load_trace(args.trace), title=args.trace,
                       max_ticks=args.max_ticks)
    with open(out, "w") as f:
        f.write(html)
    print(f"viewer written to {out} ({len(html) // 1024} KiB) — "
          "open it in any browser")
    return out


if __name__ == "__main__":
    main()
