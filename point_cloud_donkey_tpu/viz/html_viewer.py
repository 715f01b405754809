"""Self-contained interactive HTML point-cloud viewer.

The reference ships Qt5+VTK GUIs (training_gui / model_gui /
ground_truth_gui, SURVEY.md L4') for inspecting scenes, voting spaces and
detections.  A TPU pod has no display server, so the interactive analog here
is a single HTML file with an embedded vanilla-JS canvas renderer -- no
external assets, no network, opens in any browser: drag to rotate, wheel to
zoom, shift-drag to pan, class-colored points, oriented-bounding-box
wireframes, a legend and a point-size slider.

Writers for the three GUI roles:
  - write_scene_viewer: clouds (+ optional class colors) and annotation
    boxes (ground_truth_gui / model_gui analog);
  - write_voting_viewer: cast votes colored by class, detected maxima
    (training_gui's voting-space pane), straight from the
    EnableVotingAnalysis npz dumps (utils/debug_utils.write_voting_space).
"""

from __future__ import annotations

import json
from typing import List, Optional, Sequence

import numpy as np

# 12-class categorical palette (dark-background friendly)
PALETTE = ["#4fc3f7", "#ffb74d", "#81c784", "#e57373", "#ba68c8", "#fff176",
           "#4db6ac", "#f06292", "#a1887f", "#90a4ae", "#aed581", "#7986cb"]

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title>
<style>
 body { margin:0; background:#14161a; color:#d8dce2; font:13px system-ui,sans-serif; overflow:hidden; }
 #hud { position:fixed; top:10px; left:12px; background:rgba(20,22,26,.85);
        border:1px solid #333; border-radius:6px; padding:8px 12px; max-width:320px; }
 #hud h1 { font-size:14px; margin:0 0 6px; }
 .sw { display:inline-block; width:10px; height:10px; border-radius:2px; margin-right:6px; }
 #legend div { margin:2px 0; }
 label { display:block; margin-top:6px; color:#9aa3ad; }
 input[type=range] { width:140px; vertical-align:middle; }
 #help { color:#9aa3ad; margin-top:6px; font-size:11px; }
 canvas { display:block; }
</style></head><body>
<div id="hud"><h1>__TITLE__</h1><div id="legend"></div>
 <label>point size <input id="psize" type="range" min="1" max="6" value="2"></label>
 <div id="help">drag: rotate &middot; wheel: zoom &middot; shift-drag: pan</div></div>
<canvas id="c"></canvas>
<script>
const DATA = __DATA__;
const cv = document.getElementById('c'), ctx = cv.getContext('2d');
let W, H; function resize(){ W=cv.width=innerWidth; H=cv.height=innerHeight; }
resize(); addEventListener('resize', ()=>{resize(); draw();});
let yaw=0.6, pitch=0.4, zoom=1.0, panX=0, panY=0, psize=2;
document.getElementById('psize').oninput = e=>{ psize=+e.target.value; draw(); };

// center + scale from data bounds
let mn=[1e30,1e30,1e30], mx=[-1e30,-1e30,-1e30];
for (const g of DATA.groups) for (let i=0;i<g.p.length;i+=3)
  for (let k=0;k<3;k++){ const v=g.p[i+k]; if(v<mn[k])mn[k]=v; if(v>mx[k])mx[k]=v; }
const C=[(mn[0]+mx[0])/2,(mn[1]+mx[1])/2,(mn[2]+mx[2])/2];
const S=Math.max(mx[0]-mn[0],mx[1]-mn[1],mx[2]-mn[2],1e-9);

function proj(x,y,z){
  x-=C[0]; y-=C[1]; z-=C[2];
  const cy=Math.cos(yaw), sy=Math.sin(yaw), cp=Math.cos(pitch), sp=Math.sin(pitch);
  let x1=cy*x+sy*y, y1=-sy*x+cy*y;            // rotate about z
  let y2=cp*y1-sp*z, z2=sp*y1+cp*z;           // rotate about x
  const s=zoom*Math.min(W,H)/(1.35*S);
  return [W/2+panX+x1*s, H/2+panY-z2*s, y2];
}
function quatRot(q,v){  // q=[w,x,y,z] rotate v
  const [w,x,y,z]=q, [vx,vy,vz]=v;
  const tx=2*(y*vz-z*vy), ty=2*(z*vx-x*vz), tz=2*(x*vy-y*vx);
  return [vx+w*tx+y*tz-z*ty, vy+w*ty+z*tx-x*tz, vz+w*tz+x*ty-y*tx];
}
function draw(){
  ctx.fillStyle='#14161a'; ctx.fillRect(0,0,W,H);
  for (const g of DATA.groups){
    ctx.fillStyle=g.color;
    const s=psize*(g.size||1);
    for (let i=0;i<g.p.length;i+=3){
      const [sx,sy]=proj(g.p[i],g.p[i+1],g.p[i+2]);
      ctx.fillRect(sx-s/2, sy-s/2, s, s);
    }
  }
  for (const b of (DATA.boxes||[])){
    ctx.strokeStyle=b.color; ctx.lineWidth=1.5;
    const h=[b.size[0]/2,b.size[1]/2,b.size[2]/2];
    const corners=[];
    for (const dx of [-1,1]) for (const dy of [-1,1]) for (const dz of [-1,1]){
      const local=[dx*h[0],dy*h[1],dz*h[2]];
      // conj(q) * v * q: box frame -> world (reference rotateBack convention)
      const qc=[b.quat[0],-b.quat[1],-b.quat[2],-b.quat[3]];
      const w=quatRot(qc,local);
      corners.push(proj(w[0]+b.pos[0], w[1]+b.pos[1], w[2]+b.pos[2]));
    }
    const E=[[0,1],[0,2],[1,3],[2,3],[4,5],[4,6],[5,7],[6,7],[0,4],[1,5],[2,6],[3,7]];
    ctx.beginPath();
    for (const [a,c] of E){ ctx.moveTo(corners[a][0],corners[a][1]);
                            ctx.lineTo(corners[c][0],corners[c][1]); }
    ctx.stroke();
    if (b.label){ ctx.fillStyle=b.color;
      ctx.fillText(b.label, corners[0][0]+4, corners[0][1]-4); }
  }
}
let drag=null;
cv.onmousedown=e=>{ drag=[e.clientX,e.clientY,e.shiftKey]; };
addEventListener('mouseup',()=>{ drag=null; });
addEventListener('mousemove',e=>{
  if(!drag) return;
  const dx=e.clientX-drag[0], dy=e.clientY-drag[1];
  if (drag[2]){ panX+=dx; panY+=dy; } else { yaw+=dx*0.008; pitch+=dy*0.008; }
  drag=[e.clientX,e.clientY,drag[2]]; draw();
});
cv.onwheel=e=>{ e.preventDefault(); zoom*=Math.exp(-e.deltaY*0.001); draw(); };
const lg=document.getElementById('legend');
for (const g of DATA.groups)
  lg.innerHTML += `<div><span class="sw" style="background:${g.color}"></span>${g.name} (${g.p.length/3})</div>`;
draw();
</script></body></html>
"""


def _subsample(xyz: np.ndarray, cap: int, seed: int = 0) -> np.ndarray:
    if len(xyz) <= cap:
        return xyz
    sel = np.random.default_rng(seed).choice(len(xyz), cap, replace=False)
    return xyz[sel]


def _emit(path: str, title: str, groups: List[dict],
          boxes: Optional[List[dict]] = None) -> None:
    data = json.dumps({"groups": groups, "boxes": boxes or []},
                      separators=(",", ":"))
    html = _TEMPLATE.replace("__TITLE__", title).replace("__DATA__", data)
    with open(path, "w") as f:
        f.write(html)


def write_scene_viewer(
    path: str,
    xyz: np.ndarray,                       # [N, 3] scene points
    class_ids: Optional[np.ndarray] = None,  # [N] per-point class (optional)
    boxes: Optional[Sequence] = None,      # BoundingBox-likes (+labels below)
    box_labels: Optional[Sequence[str]] = None,
    title: str = "scene",
    max_points: int = 80000,
) -> None:
    """Interactive scene + annotation-box viewer
    (ground_truth_gui / model_gui analog)."""
    xyz = np.asarray(xyz, np.float32)
    groups = []
    if class_ids is None:
        p = _subsample(xyz, max_points)
        groups.append({"name": "cloud", "color": "#c0c6cf",
                       "p": np.round(p, 4).reshape(-1).tolist()})
    else:
        class_ids = np.asarray(class_ids)
        uniq = np.unique(class_ids)
        per = max(1000, max_points // max(len(uniq), 1))
        for i, c in enumerate(uniq.tolist()):
            p = _subsample(xyz[class_ids == c], per, seed=i)
            groups.append({"name": f"class {c}",
                           "color": PALETTE[i % len(PALETTE)],
                           "p": np.round(p, 4).reshape(-1).tolist()})
    bx = []
    for i, b in enumerate(boxes or []):
        bx.append({"pos": np.asarray(b.position, float).tolist(),
                   "size": np.asarray(b.size, float).tolist(),
                   "quat": np.asarray(b.quat, float).tolist(),
                   "color": PALETTE[i % len(PALETTE)],
                   "label": (box_labels[i] if box_labels else "")})
    _emit(path, title, groups, bx)


def write_voting_viewer(
    path: str,
    scene_xyz: np.ndarray,             # [N, 3]
    votes_xyz: np.ndarray,             # [V, 3]
    vote_weights: np.ndarray,          # [V]
    vote_classes: np.ndarray,          # [V]
    maxima=None,                       # list of VotingMaximum (optional)
    title: str = "voting space",
    max_points: int = 60000,
) -> None:
    """Interactive voting-space viewer (training_gui analog): scene context
    in grey, votes colored per class, detected maxima as boxes."""
    groups = [{"name": "scene", "color": "#3a3f46",
               "p": np.round(_subsample(np.asarray(scene_xyz, np.float32),
                                        max_points), 4).reshape(-1).tolist(),
               "size": 0.7}]
    vote_classes = np.asarray(vote_classes)
    votes_xyz = np.asarray(votes_xyz, np.float32)
    for i, c in enumerate(np.unique(vote_classes).tolist()):
        sel = vote_classes == c
        p = _subsample(votes_xyz[sel], max(2000, max_points // 8), seed=i)
        groups.append({"name": f"votes class {c}",
                       "color": PALETTE[i % len(PALETTE)],
                       "p": np.round(p, 4).reshape(-1).tolist(),
                       "size": 1.4})
    bx = []
    for i, m in enumerate(maxima or []):
        bx.append({"pos": np.asarray(m.position, float).tolist(),
                   "size": np.asarray(m.bb_size, float).tolist(),
                   "quat": np.asarray(m.bb_quat, float).tolist(),
                   "color": PALETTE[int(m.class_id) % len(PALETTE)],
                   "label": f"class {m.class_id} w={m.weight:.2f}"})
    _emit(path, title, groups, bx)


def viewer_from_voting_dump(path: str, dump_npz: str, scene_xyz: np.ndarray,
                            title: str = "voting space") -> None:
    """Build the voting viewer straight from an EnableVotingAnalysis dump
    (utils/debug_utils.write_voting_space npz)."""
    z = np.load(dump_npz)
    write_voting_viewer(path, scene_xyz, z["votes"], z["weights"],
                        z["classes"], title=title)
