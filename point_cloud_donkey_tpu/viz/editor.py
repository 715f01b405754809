"""Interactive scene EDITOR (model_gui analog, the editing half).

The reference's model_gui composes scenes interactively: pick a model,
move/rotate/scale it with VTK orthographic interactors, save the scene
(src/model_gui/).  The headless analog: `write_scene_editor` emits one
self-contained HTML file embedding the composer spec and each object's
(subsampled) points; in any browser the user selects objects, transforms
them with keyboard/drag, watches the composite live, and exports the
edited spec JSON — which `cli/scene_composer.py` then composes into the
scene PCD + ground-truth annotations.  Round-trip:

    python -m point_cloud_donkey_tpu.cli.scene_composer spec.json --edit editor.html
    # ... edit in the browser, export spec_edited.json ...
    python -m point_cloud_donkey_tpu.cli.scene_composer spec_edited.json

Controls (also shown in the HUD):
  click object name / Tab  — select object
  drag                      — orbit camera; shift-drag pans; wheel zooms
  g then drag               — move the selected object in the view plane
  arrows / PgUp / PgDn      — move selected object along x/y/z by the step
  r / R                     — rotate selected about z by +/- step degrees
  e / E, w / W              — rotate about y, x
  + / -                     — scale selected
  Export button             — download + show the edited spec JSON
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from .html_viewer import PALETTE, _subsample

_EDITOR = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title>
<style>
 body { margin:0; background:#14161a; color:#d8dce2; font:13px system-ui,sans-serif; overflow:hidden; }
 #hud { position:fixed; top:10px; left:12px; background:rgba(20,22,26,.9);
        border:1px solid #333; border-radius:6px; padding:8px 12px; max-width:360px; }
 #hud h1 { font-size:14px; margin:0 0 6px; }
 .obj { cursor:pointer; margin:2px 0; padding:1px 4px; border-radius:3px; }
 .obj.sel { background:#28456a; }
 .sw { display:inline-block; width:10px; height:10px; border-radius:2px; margin-right:6px; }
 button { background:#263238; color:#d8dce2; border:1px solid #4fc3f7;
          padding:4px 10px; margin:4px 4px 0 0; cursor:pointer; }
 #help { color:#9aa3ad; margin-top:6px; font-size:11px; white-space:pre-line; }
 #out { width:340px; height:90px; background:#0e1013; color:#9fe08c;
        border:1px solid #333; display:none; margin-top:6px; }
 label { color:#9aa3ad; } input[type=range]{ width:110px; vertical-align:middle; }
 canvas { display:block; }
</style></head><body>
<div id="hud"><h1>__TITLE__</h1><div id="objs"></div>
 <label>step <input id="step" type="range" min="1" max="100" value="10"></label>
 <span id="stepv">0.10</span>
 <div>
  <button onclick="exportSpec()">export spec</button>
  <button onclick="resetSel()">reset object</button>
 </div>
 <div id="help">click name / Tab: select · g+drag: move in view plane
arrows / PgUp / PgDn: move x/y/z · r/R: rot z · e/E: rot y · w/W: rot x
+/-: scale · drag: orbit · shift-drag: pan · wheel: zoom</div>
 <textarea id="out" readonly></textarea></div>
<canvas id="c"></canvas>
<script>
const SPEC = __SPEC__;        // the composer spec (edited in place)
const POINTS = __POINTS__;    // per-object centered base points (flat xyz)
const cv = document.getElementById('c'), ctx = cv.getContext('2d');
let W, H; function resize(){ W=cv.width=innerWidth; H=cv.height=innerHeight; }
resize(); addEventListener('resize', ()=>{resize(); draw();});
let yaw=0.6, pitch=0.4, zoom=1.0, panX=0, panY=0, sel=0, grab=false;
const stepEl=document.getElementById('step');
function step(){ return stepEl.value/100; }
stepEl.oninput=()=>{ document.getElementById('stepv').textContent=step().toFixed(2); };

function euler(o){           // Rz*Ry*Rx, matching scene_composer.euler_to_matrix
  const [rx,ry,rz]=(o.euler_deg||[0,0,0]).map(d=>d*Math.PI/180);
  const cx=Math.cos(rx),sx=Math.sin(rx),cy=Math.cos(ry),sy=Math.sin(ry),
        cz=Math.cos(rz),sz=Math.sin(rz);
  return [
    [cz*cy, cz*sy*sx-sz*cx, cz*sy*cx+sz*sx],
    [sz*cy, sz*sy*sx+cz*cx, sz*sy*cx-cz*sx],
    [-sy,   cy*sx,          cy*cx]];
}
function world(i){           // object i's transformed points
  const o=SPEC.objects[i], R=euler(o), s=o.scale||1.0,
        t=o.position||[0,0,0], p=POINTS[i], out=new Float32Array(p.length);
  for(let k=0;k<p.length;k+=3){
    const x=p[k]*s, y=p[k+1]*s, z=p[k+2]*s;
    out[k]  =R[0][0]*x+R[0][1]*y+R[0][2]*z+t[0];
    out[k+1]=R[1][0]*x+R[1][1]*y+R[1][2]*z+t[1];
    out[k+2]=R[2][0]*x+R[2][1]*y+R[2][2]*z+t[2];
  }
  return out;
}
function bounds(){
  let mn=[1e30,1e30,1e30], mx=[-1e30,-1e30,-1e30];
  for(let i=0;i<SPEC.objects.length;i++){
    const p=world(i);
    for(let k=0;k<p.length;k+=3) for(let d=0;d<3;d++){
      if(p[k+d]<mn[d])mn[d]=p[k+d]; if(p[k+d]>mx[d])mx[d]=p[k+d]; }
  }
  return [mn,mx];
}
let C=[0,0,0], S=1;
function refit(){ const [mn,mx]=bounds();
  C=[(mn[0]+mx[0])/2,(mn[1]+mx[1])/2,(mn[2]+mx[2])/2];
  S=Math.max(mx[0]-mn[0],mx[1]-mn[1],mx[2]-mn[2],1e-9); }
refit();
function proj(x,y,z){
  x-=C[0]; y-=C[1]; z-=C[2];
  const cy=Math.cos(yaw), sy=Math.sin(yaw), cp=Math.cos(pitch), sp=Math.sin(pitch);
  let x1=cy*x+sy*y, y1=-sy*x+cy*y;
  let y2=cp*y1-sp*z, z2=sp*y1+cp*z;
  const s=zoom*Math.min(W,H)/(1.35*S);
  return [W/2+panX+x1*s, H/2+panY-z2*s, y2];
}
// view-plane unit vectors in world coords (for g+drag moves)
function viewAxes(){
  const cy=Math.cos(yaw), sy=Math.sin(yaw), cp=Math.cos(pitch), sp=Math.sin(pitch);
  const right=[cy,-sy,0];                       // +screen-x
  const up=[sy*sp, cy*sp, cp];                  // -screen-y ~ world up-ish
  const s=zoom*Math.min(W,H)/(1.35*S);
  return [right, up, s];
}
function draw(){
  ctx.fillStyle='#14161a'; ctx.fillRect(0,0,W,H);
  for(let i=0;i<SPEC.objects.length;i++){
    const p=world(i); ctx.fillStyle=COLORS[i%COLORS.length];
    const ps=(i===sel)?3:2;
    for(let k=0;k<p.length;k+=3){
      const [sx,sy]=proj(p[k],p[k+1],p[k+2]);
      ctx.fillRect(sx-ps/2, sy-ps/2, ps, ps);
    }
    if(i===sel){                                 // selection marker at origin
      const o=SPEC.objects[i], t=o.position||[0,0,0];
      const [sx,sy]=proj(t[0],t[1],t[2]);
      ctx.strokeStyle='#ffffff'; ctx.lineWidth=1;
      ctx.strokeRect(sx-7, sy-7, 14, 14);
    }
  }
  renderList();
}
const COLORS = __COLORS__;
function renderList(){
  const el=document.getElementById('objs'); let h='';
  SPEC.objects.forEach((o,i)=>{
    const p=(o.position||[0,0,0]).map(v=>v.toFixed(2)).join(',');
    h+=`<div class="obj${i===sel?' sel':''}" onclick="selObj(${i})">`+
       `<span class="sw" style="background:${COLORS[i%COLORS.length]}"></span>`+
       `${o.instance||o.class||('obj '+i)} @ [${p}] s=${(o.scale||1).toFixed(2)}</div>`;
  });
  el.innerHTML=h;
}
function selObj(i){ sel=i; draw(); }
function resetSel(){ const o=SPEC.objects[sel];
  o.position=[0,0,0]; o.euler_deg=[0,0,0]; o.scale=1.0; draw(); }
function nudge(d){ const o=SPEC.objects[sel];
  o.position=(o.position||[0,0,0]).map((v,i)=>v+d[i]); draw(); }
function rot(axis,deg){ const o=SPEC.objects[sel];
  o.euler_deg=(o.euler_deg||[0,0,0]).slice(); o.euler_deg[axis]+=deg; draw(); }
function rescale(f){ const o=SPEC.objects[sel];
  o.scale=Math.max(0.01,(o.scale||1)*f); draw(); }
function exportSpec(){
  const txt=JSON.stringify(SPEC,null,1);
  const out=document.getElementById('out');
  out.style.display='block'; out.value=txt;
  const a=document.createElement('a');
  a.href=URL.createObjectURL(new Blob([txt],{type:'application/json'}));
  a.download='spec_edited.json'; a.click();
}
addEventListener('keydown',e=>{
  const st=step();
  if(e.key==='Tab'){ e.preventDefault(); sel=(sel+1)%SPEC.objects.length; draw(); }
  else if(e.key==='g') grab=true;
  else if(e.key==='ArrowLeft') nudge([-st,0,0]);
  else if(e.key==='ArrowRight') nudge([st,0,0]);
  else if(e.key==='ArrowUp') nudge([0,st,0]);
  else if(e.key==='ArrowDown') nudge([0,-st,0]);
  else if(e.key==='PageUp') nudge([0,0,st]);
  else if(e.key==='PageDown') nudge([0,0,-st]);
  else if(e.key==='r') rot(2, 10*st*10);
  else if(e.key==='R') rot(2,-10*st*10);
  else if(e.key==='e') rot(1, 10*st*10);
  else if(e.key==='E') rot(1,-10*st*10);
  else if(e.key==='w') rot(0, 10*st*10);
  else if(e.key==='W') rot(0,-10*st*10);
  else if(e.key==='+'||e.key==='=') rescale(1.05);
  else if(e.key==='-') rescale(1/1.05);
});
addEventListener('keyup',e=>{ if(e.key==='g') grab=false; });
let drag=null;
cv.onmousedown=e=>{ drag=[e.clientX,e.clientY,e.shiftKey]; };
addEventListener('mouseup',()=>{ drag=null; });
addEventListener('mousemove',e=>{
  if(!drag) return;
  const dx=e.clientX-drag[0], dy=e.clientY-drag[1];
  if(grab){
    const [right,up,s]=viewAxes();
    nudge([right[0]*dx/s - up[0]*dy/s,
           right[1]*dx/s - up[1]*dy/s,
           right[2]*dx/s - up[2]*dy/s]);
  } else if (drag[2]){ panX+=dx; panY+=dy; }
  else { yaw+=dx*0.008; pitch+=dy*0.008; }
  drag=[e.clientX,e.clientY,drag[2]]; draw();
});
cv.onwheel=e=>{ e.preventDefault(); zoom*=Math.exp(-e.deltaY*0.001); draw(); };
document.getElementById('stepv').textContent=step().toFixed(2);
draw();
</script></body></html>
"""


def write_scene_editor(path: str, spec: dict, base_dir: str = ".",
                       max_points_per_object: int = 8000,
                       title: Optional[str] = None) -> None:
    """Emit the self-contained editor HTML for a composer spec.

    Each object's cloud is loaded (relative to `base_dir`), centered (the
    composer also centers before transforming, so the editor's preview and
    the composed output agree) and subsampled into the page."""
    from ..utils.io import load_cloud

    pts = []
    for i, obj in enumerate(spec["objects"]):
        fp = obj["file"]
        if not os.path.isabs(fp):
            fp = os.path.join(base_dir, fp)
        xyz = load_cloud(fp).remove_nan().xyz.astype(np.float64)
        xyz = xyz - xyz.mean(axis=0)
        xyz = _subsample(xyz, max_points_per_object, seed=i)
        pts.append(np.round(xyz, 4).reshape(-1).tolist())

    html = (_EDITOR
            .replace("__TITLE__", title or "scene editor")
            .replace("__SPEC__", json.dumps(spec, separators=(",", ":")))
            .replace("__POINTS__", json.dumps(pts, separators=(",", ":")))
            .replace("__COLORS__", json.dumps(PALETTE)))
    with open(path, "w") as f:
        f.write(html)
