"""Embedding-space visualization: PCA -> t-SNE projection, silhouette score,
PNG + interactive HTML scatter, and wandb uploads.

Reference parity surface (audio_mel/train.py:282-342 ``visualize_model``,
audio_mel/embeddings.py:83-122): PCA(random_state=0) -> first 50 components
-> TSNE(n_components=2|3), silhouette score on the raw embeddings, a colored
scatter written as BOTH a .png and an interactive .html, and, under wandb,
``wandb.Image`` / ``wandb.Html`` uploads of the two files
(audio_mel/train.py:333-339).

The reference renders with plotly (px.scatter / px.scatter_3d).  plotly is
not a baked-in dependency on this image, so ``write_scatter_html`` emits a
self-contained interactive page — canvas scatter with wheel-zoom, drag-pan
(2D) or drag-rotation (3D), and hover labels — with the point data embedded
as JSON.  Same artifact contract (a standalone .html a browser opens with no
server), zero dependencies.  When plotly IS importable it is preferred.
"""

from __future__ import annotations

import json
import os

import numpy as np

# matplotlib tab10 — the categorical palette both backends share
_PALETTE = [
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf",
]


def project_embeddings(embeddings: np.ndarray, kind: str = "2D") -> np.ndarray:
    """PCA(random_state=0) -> [:, :50] -> t-SNE (init="pca", fixed seed),
    following the reference's projection pipeline (audio_mel/train.py:306-309).
    Deliberate deviations: perplexity is clamped for small datasets (the
    reference's fixed default crashes below 31 samples), and the t-SNE seed
    is pinned so artifact diffs reproduce across runs."""
    from sklearn.decomposition import PCA
    from sklearn.manifold import TSNE

    if kind not in ("2D", "3D"):
        raise ValueError("Visualization type not supported")
    x = np.asarray(embeddings, dtype=np.float32)
    x = PCA(random_state=0).fit_transform(x)[:, :50]
    n_comp = 3 if kind == "3D" else 2
    return TSNE(
        n_components=n_comp, perplexity=min(30.0, max(5.0, len(x) / 10)),
        init="pca", random_state=0,
    ).fit_transform(x)


def silhouette(embeddings: np.ndarray, labels: np.ndarray) -> float:
    """Silhouette on the raw (un-projected) embeddings
    (audio_mel/train.py:303-304)."""
    from sklearn.metrics import silhouette_score

    labels = np.asarray(labels).reshape(-1)
    if len(np.unique(labels)) < 2:
        return 0.0
    return float(silhouette_score(embeddings, labels))


def write_scatter_png(z: np.ndarray, labels: np.ndarray, path: str, title: str = "") -> str | None:
    """Static scatter (the reference's fig.write_image analog). Returns the
    path, or None when matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    labels = np.asarray(labels).reshape(-1)
    colors = [_PALETTE[int(l) % len(_PALETTE)] for l in labels]
    fig = plt.figure(figsize=(8, 8))
    if z.shape[1] == 3:
        ax = fig.add_subplot(projection="3d")
        ax.scatter(z[:, 0], z[:, 1], z[:, 2], c=colors, s=8, alpha=0.7)
    else:
        plt.scatter(z[:, 0], z[:, 1], c=colors, s=8, alpha=0.7)
    plt.title(title)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    plt.savefig(path, dpi=120)
    plt.close(fig)
    return path


def write_scatter_html(
    z: np.ndarray, labels: np.ndarray, path: str, title: str = "",
    label_names: dict[str, int] | None = None,
) -> str:
    """Interactive scatter HTML (the reference's fig.write_html analog).

    Uses plotly when available; otherwise writes a dependency-free page with
    the same interactions the reference's plotly artifact offers: hover shows
    the class name, wheel zooms, drag pans (2D) or rotates (3D), a legend
    maps colors to classes.
    """
    z = np.asarray(z, dtype=np.float32)
    labels = np.asarray(labels).reshape(-1)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    names = {v: k for k, v in (label_names or {}).items()}
    point_names = [names.get(int(l), str(int(l))) for l in labels]

    try:
        import plotly.express as px

        kw = dict(color=point_names, opacity=0.7, width=800, height=800, title=title)
        if z.shape[1] == 3:
            fig = px.scatter_3d(x=z[:, 0], y=z[:, 1], z=z[:, 2], **kw)
        else:
            fig = px.scatter(x=z[:, 0], y=z[:, 1], **kw)
        fig.write_html(path)
        return path
    except ImportError:
        pass

    payload = {
        "dims": int(z.shape[1]),
        "pts": np.round(z, 3).tolist(),
        "labels": labels.astype(int).tolist(),
        "names": point_names,
        "palette": _PALETTE,
        "title": title,
    }
    html = _STANDALONE_TEMPLATE.replace("__DATA__", json.dumps(payload))
    with open(path, "w") as f:
        f.write(html)
    return path


def visualize_embeddings(
    embeddings: np.ndarray,
    labels: np.ndarray,
    out_dir: str,
    *,
    epoch: int = 0,
    kind: str = "2D",
    logger=None,
    label_names: dict[str, int] | None = None,
) -> dict:
    """Full reference ``visualize_model`` output pass
    (audio_mel/train.py:303-339): silhouette, t-SNE projection,
    visualization/png/visualization_{epoch}.png +
    visualization/html/visualization_{epoch}.html, and wandb Image/Html
    uploads through ``logger`` (a RunLogger) when one is recording."""
    sil = silhouette(embeddings, labels)
    z = project_embeddings(embeddings, kind)
    title = f"t-SNE ({kind}) — silhouette={sil:.4f}"
    png = write_scatter_png(
        z, labels, os.path.join(out_dir, "png", f"visualization_{epoch}.png"), title
    )
    html = write_scatter_html(
        z, labels, os.path.join(out_dir, "html", f"visualization_{epoch}.html"),
        title, label_names=label_names,
    )
    if logger is not None:
        if png:
            logger.log_image("Visualization_png", png)
        logger.log_html("Visualization_html", html)
    return {"silhouette": sil, "tsne": z, "png": png, "html": html}


_STANDALONE_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>embedding visualization</title>
<style>
 body{margin:0;font:13px sans-serif;background:#fff;color:#222}
 #wrap{display:flex}
 canvas{border:1px solid #ddd;margin:12px;cursor:grab}
 #legend{margin:20px 8px}
 .sw{display:inline-block;width:10px;height:10px;margin-right:6px;border-radius:2px}
 #hover{position:fixed;pointer-events:none;background:#222;color:#fff;padding:2px 6px;
        border-radius:3px;display:none;font-size:12px}
 h3{margin:12px 0 0 14px;font-weight:normal}
</style></head><body>
<h3 id="title"></h3>
<div id="wrap"><canvas id="c" width="800" height="800"></canvas><div id="legend"></div></div>
<div id="hover"></div>
<script>
const D = __DATA__;
document.getElementById('title').textContent = D.title;
const cv = document.getElementById('c'), ctx = cv.getContext('2d');
const hover = document.getElementById('hover');
const n = D.pts.length, is3d = D.dims === 3;
// normalize to [-1,1]
let mins=[1e9,1e9,1e9], maxs=[-1e9,-1e9,-1e9];
for (const p of D.pts) for (let k=0;k<D.dims;k++){mins[k]=Math.min(mins[k],p[k]);maxs[k]=Math.max(maxs[k],p[k]);}
const span = Math.max(...maxs.map((m,k)=>m-mins[k])) || 1;
const P = D.pts.map(p => p.map((v,k)=>((v-(mins[k]+maxs[k])/2)/span)*2));
let scale=330, ox=0, oy=0, rx=-0.5, ry=0.6;   // zoom, pan, rotation
let screen = new Array(n);
function proj(p){
  let x=p[0], y=p[1], z=is3d?p[2]:0;
  if (is3d){
    let c=Math.cos(ry), s=Math.sin(ry); [x,z]=[c*x+s*z, -s*x+c*z];
    c=Math.cos(rx); s=Math.sin(rx);    [y,z]=[c*y-s*z,  s*y+c*z];
  }
  const pers = is3d ? 2.2/(2.2 - z*0.55) : 1;
  return [400+(x*scale*pers)+ox, 400-(y*scale*pers)+oy, z];
}
function draw(){
  ctx.clearRect(0,0,800,800);
  const order=[...P.keys()];
  if (is3d) order.sort((a,b)=>proj(P[a])[2]-proj(P[b])[2]);
  for (const i of order){
    const s=proj(P[i]); screen[i]=s;
    ctx.fillStyle = D.palette[D.labels[i] % D.palette.length] + 'b3';
    ctx.beginPath(); ctx.arc(s[0],s[1],3.2,0,6.283); ctx.fill();
  }
}
let drag=null;
cv.onmousedown=e=>{drag=[e.clientX,e.clientY];cv.style.cursor='grabbing';};
window.onmouseup=()=>{drag=null;cv.style.cursor='grab';};
window.onmousemove=e=>{
  if (drag){
    const dx=e.clientX-drag[0], dy=e.clientY-drag[1]; drag=[e.clientX,e.clientY];
    if (is3d){ ry+=dx*0.008; rx+=dy*0.008; } else { ox+=dx; oy+=dy; }
    draw(); return;
  }
  const r=cv.getBoundingClientRect(), mx=e.clientX-r.left, my=e.clientY-r.top;
  let best=-1, bd=64;
  for (let i=0;i<n;i++){const s=screen[i]; if(!s)continue;
    const d=(s[0]-mx)**2+(s[1]-my)**2; if (d<bd){bd=d;best=i;}}
  if (best>=0){
    hover.style.display='block'; hover.style.left=(e.clientX+12)+'px';
    hover.style.top=(e.clientY+12)+'px'; hover.textContent=D.names[best];
  } else hover.style.display='none';
};
cv.onwheel=e=>{e.preventDefault(); scale*=e.deltaY<0?1.12:0.89; draw();};
// legend
const seen=new Map();
D.labels.forEach((l,i)=>{if(!seen.has(l))seen.set(l,D.names[i]);});
const lg=document.getElementById('legend');
[...seen.entries()].sort((a,b)=>a[0]-b[0]).forEach(([l,nm])=>{
  const d=document.createElement('div');
  d.innerHTML=`<span class="sw" style="background:${D.palette[l%D.palette.length]}"></span>${nm}`;
  lg.appendChild(d);
});
draw();
</script></body></html>
"""
