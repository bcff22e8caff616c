"""Self-contained interactive HTML viewer.

The reference ships an ndv/PyQt GUI (`viewer.py:1250-1275`) and a napari
fused-view script (`examples/.../05_view_fused.py`); neither toolkit
exists in this environment, so the interactive GUI here is a browser
app: :func:`export_html` serializes the same data layer
(`viz/viewer.py`) into ONE dependency-free HTML file — per-tile channel
stacks (z planes as base64 uint8 under robust percentile windows),
decoded spots, cell-outline polygons, and the fused global view — whose
embedded canvas renderer provides:

- z navigation (slider + ``↑``/``↓``), channel focus (``←``/``→``),
  view paging (``t``) and spot toggle (``o``) — the same keyboard map as
  `viz/interactive.py:244-256` — plus outline toggle (``c``),
- additive multi-channel compositing with per-channel visibility and
  window (lo/hi) controls using imaging pseudo-color LUTs,
- wheel zoom to cursor / drag pan / double-click reset,
- gene-colored decoded-spot overlays with a count table that doubles as
  the legend (top genes carry fixed categorical colors; the rest fold
  into "Other" — colors follow the gene, never the filter state),
- cell-outline polygon overlays,
- a status bar with cursor position in full-resolution pixels AND
  microns (tile origin + spacing from `load_global_coord_xforms_um`).

Large tiles are block-strided down to ``max_edge`` for embedding; spot
and outline coordinates stay full-resolution (the client scales them),
so readouts remain exact. :func:`serve` hosts the exported file on
localhost for browsers that restrict ``file://`` canvases.
"""

from __future__ import annotations

import base64
import html
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional

import numpy as np

from . import viewer as data_layer

# Imaging pseudo-color LUT cycle for additive channel compositing
# (fluorescence convention — gray first so a single channel reads
# unbiased, then the standard CMY/G/R/B set).
CHANNEL_LUTS = [
    ("gray", (255, 255, 255)),
    ("cyan", (0, 255, 255)),
    ("magenta", (255, 0, 255)),
    ("yellow", (255, 255, 0)),
    ("green", (0, 255, 0)),
    ("red", (255, 80, 60)),
    ("blue", (90, 140, 255)),
    ("orange", (255, 160, 0)),
]

# Categorical gene colors: the validated dark-mode palette (dataviz
# reference instance — worst adjacent CVD dE 8.4 on the dark surface).
# Assigned to the top genes by decoded-spot count in FIXED order; genes
# beyond the 8 slots fold into "Other" (muted), and the sidebar count
# table doubles as the always-visible legend.
GENE_COLORS = [
    "#3987e5", "#d95926", "#199e70", "#c98500",
    "#d55181", "#008300", "#9085e9", "#e66767",
]
OTHER_GENE_COLOR = "#8f8e85"


def _voxel_size(ds) -> np.ndarray:
    vs = getattr(ds, "voxel_size_zyx_um", None)
    if vs is None or np.size(vs) < 3:
        return np.ones(3)
    return np.asarray(vs, dtype=float).ravel()[:3]


def _u8_window(volume: np.ndarray) -> tuple[np.ndarray, float, float]:
    """Robust display window (p1, p99.8) → uint8, keeping the raw bounds."""
    vol = np.asarray(volume, np.float32)
    lo = float(np.percentile(vol, 1.0))
    hi = float(np.percentile(vol, 99.8))
    if hi <= lo:
        hi = lo + 1.0
    u8 = np.clip((vol - lo) * (255.0 / (hi - lo)), 0.0, 255.0).astype(np.uint8)
    return u8, lo, hi


def _channel_entries(datastore, view: str, max_channels: int):
    """Eager per-tile channel list mirroring the lazy descriptors of
    `viz/interactive.py:85-125` (registered-then-corrected fallback)."""
    entries: list[tuple[str, np.ndarray]] = []

    def _add(label, *loaders):
        if len(entries) >= max_channels:
            return
        for loader in loaders:
            try:
                img = loader()
            except Exception:
                img = None
            if img is not None:
                entries.append((label, data_layer._as_zyx(np.asarray(img))))
                return

    ds = datastore
    round_ids = list(ds.round_ids or [])
    if round_ids:
        rid = round_ids[0]
        _add(
            f"{rid}:fiducial",
            lambda: ds.load_local_registered_image(tile=view, round=rid),
            lambda: ds.load_local_corrected_image(tile=view, round=rid),
        )
    for bit_id in list(ds.bit_ids or []):
        _add(
            f"{bit_id}:decon",
            lambda b=bit_id: ds.load_local_registered_image(tile=view, bit=b),
            lambda b=bit_id: ds.load_local_corrected_image(tile=view, bit=b),
        )
        _add(
            f"{bit_id}:probability",
            lambda b=bit_id: ds.load_local_feature_predictor_image(tile=view, bit=b),
        )
    return entries


def _tile_spot_frame(datastore, tile: str):
    """Filtered global spots restricted to the tile (preferred) or the
    per-tile decoded table — same precedence as
    `viewer.decoded_overlay_for_tile:365-394`."""
    tile_ids = list(datastore.tile_ids or [])
    tile_idx = tile_ids.index(tile) if tile in tile_ids else None
    try:
        spots = datastore.load_global_filtered_decoded_spots()
    except Exception:
        spots = None
    if spots is not None and len(spots):
        if tile_idx is not None and "tile_idx" in spots.columns:
            spots = spots.loc[spots["tile_idx"] == tile_idx]
        if {"tile_z", "tile_y", "tile_x", "gene_id"}.issubset(spots.columns):
            return spots
    try:
        spots = datastore.load_local_decoded_spots(tile=tile)
    except Exception:
        spots = None
    if spots is not None and {"tile_z", "tile_y", "tile_x", "gene_id"}.issubset(
        getattr(spots, "columns", ())
    ):
        return spots
    return None


def _spot_records(frame, cols=("tile_z", "tile_y", "tile_x")) -> list:
    if frame is None or not len(frame):
        return []
    arr = frame[list(cols)].to_numpy(dtype=float)
    genes = frame["gene_id"].astype(str).to_list()
    return [
        [round(float(z), 2), round(float(y), 2), round(float(x), 2), g]
        for (z, y, x), g in zip(arr, genes)
    ]


def _load_outlines(datastore) -> dict:
    outlines = data_layer._load_global_cellpose_roi_zip(datastore)
    if not outlines:
        try:
            outlines = datastore.load_global_cellpose_outlines()
        except Exception:
            outlines = None
    return data_layer._normalize_outlines(outlines)


def _outline_polys_tile(datastore, tile: str, outlines: dict) -> list:
    """Global-µm cell polygons mapped into tile pixel yx
    (`viewer.rasterize_cell_outlines:469-498` geometry, kept as vectors)."""
    if not outlines:
        return []
    xf = datastore.load_global_coord_xforms_um(tile=tile)
    if xf is None:
        return []
    affine, origin, spacing = xf
    polys = []
    for cell_id, xy in outlines.items():
        xy = np.asarray(xy, dtype=float)
        if xy.ndim != 2 or xy.shape[0] < 2 or xy.shape[1] != 2:
            continue
        local_yx = data_layer._global_xy_to_tile_yx(xy, affine, origin, spacing)
        polys.append(
            {"cell": str(cell_id), "yx": np.round(local_yx, 2).tolist()}
        )
    return polys


def _outline_polys_global(origin, spacing, outlines: dict) -> list:
    if not outlines:
        return []
    origin = np.asarray(origin, dtype=float)
    spacing = np.asarray(spacing, dtype=float)
    polys = []
    for cell_id, xy in outlines.items():
        xy = np.asarray(xy, dtype=float)
        if xy.ndim != 2 or xy.shape[0] < 2 or xy.shape[1] != 2:
            continue
        local_yx = (xy[:, ::-1] - origin[1:]) / spacing[1:]
        polys.append(
            {"cell": str(cell_id), "yx": np.round(local_yx, 2).tolist()}
        )
    return polys


def _view_dict(name, entries, max_edge, origin, spacing, spots, outlines):
    if not entries:
        return None
    shape = entries[0][1].shape
    entries = [(lbl, vol) for lbl, vol in entries if vol.shape == shape]
    ds_f = max(1, -(-max(shape[1], shape[2]) // max_edge))
    channels = []
    for i, (label, vol) in enumerate(entries):
        small = np.ascontiguousarray(vol[:, ::ds_f, ::ds_f])
        u8, lo, hi = _u8_window(small)
        channels.append(
            {
                "label": label,
                "lut": CHANNEL_LUTS[i % len(CHANNEL_LUTS)][0],
                "rgb": CHANNEL_LUTS[i % len(CHANNEL_LUTS)][1],
                "lo": round(lo, 4),
                "hi": round(hi, 4),
                "shape": list(small.shape),
                "b64": base64.b64encode(u8.tobytes()).decode("ascii"),
            }
        )
    return {
        "name": name,
        "shape_zyx": [int(v) for v in shape],
        "downsample": int(ds_f),
        "origin_zyx_um": [round(float(v), 4) for v in np.asarray(origin).ravel()[:3]],
        "spacing_zyx_um": [round(float(v), 6) for v in np.asarray(spacing).ravel()[:3]],
        "spots": spots,
        "outlines": outlines,
    } | {"channels": channels}


def build_payload(
    datastore,
    tiles: Optional[list[str]] = None,
    max_edge: int = 1024,
    max_channels: int = 18,
) -> dict:
    """Serialize the viewer data layer for the embedded web client."""
    ds = datastore
    views = []
    all_genes: dict[str, int] = {}
    outlines = _load_outlines(ds)  # global outline file, parsed once
    tile_ids = list(ds.tile_ids or [])
    if tiles:
        tile_ids = [t for t in tile_ids if t in set(tiles)]
    for tile in tile_ids:
        entries = _channel_entries(ds, tile, max_channels)
        if not entries:
            continue
        frame = _tile_spot_frame(ds, tile)
        spots = _spot_records(frame)
        for *_zyx, gene in spots:
            all_genes[gene] = all_genes.get(gene, 0) + 1
        xf = None
        try:
            xf = ds.load_global_coord_xforms_um(tile=tile)
        except Exception:
            pass
        origin = xf[1] if xf is not None else np.zeros(3)
        spacing = xf[2] if xf is not None else _voxel_size(ds)
        view = _view_dict(
            tile, entries, max_edge, origin, spacing, spots,
            _outline_polys_tile(ds, tile, outlines),
        )
        if view is not None:
            views.append(view)

    if data_layer.global_fused_available(ds):
        try:
            gstack = data_layer.load_global_image_channels(ds)
        except Exception:
            gstack = None
        if gstack is not None:
            origin = gstack.origin_zyx_um
            spacing = gstack.spacing_zyx_um
            gspots = []
            try:
                frame = ds.load_global_filtered_decoded_spots()
            except Exception:
                frame = None
            if frame is not None and {"global_y", "global_x", "gene_id"}.issubset(
                frame.columns
            ):
                yx = frame[["global_y", "global_x"]].to_numpy(dtype=float)
                px = (yx - np.asarray(origin[1:])) / np.asarray(spacing[1:])
                genes = frame["gene_id"].astype(str).to_list()
                gspots = [
                    [0.0, round(float(y), 2), round(float(x), 2), g]
                    for (y, x), g in zip(px, genes)
                ]
                # global-only genes (per-tile tables absent, or tiles
                # filtered out) must still get legend rows + colors; genes
                # already counted per-tile keep their tile counts (the
                # per-tile frames are subsets of this same global table)
                global_counts: dict[str, int] = {}
                for g in genes:
                    global_counts[g] = global_counts.get(g, 0) + 1
                for g, n in global_counts.items():
                    if g not in all_genes:
                        all_genes[g] = n
            entries = list(
                zip(gstack.stack.labels, [c for c in gstack.stack.data])
            )
            view = _view_dict(
                "global", entries, max_edge, origin, spacing, gspots,
                _outline_polys_global(origin, spacing, outlines),
            )
            if view is not None:
                views.append(view)

    ranked = sorted(all_genes.items(), key=lambda kv: (-kv[1], kv[0]))
    gene_colors = {g: GENE_COLORS[i] for i, (g, _n) in enumerate(ranked[:8])}
    return {
        "title": "merfish3d_tpu viewer",
        "voxel_size_zyx_um": [float(v) for v in _voxel_size(ds)],
        "views": views,
        "gene_counts": dict(ranked),
        "gene_colors": gene_colors,
        "other_gene_color": OTHER_GENE_COLOR,
    }


def export_html(
    datastore,
    output_html,
    tiles: Optional[list[str]] = None,
    max_edge: int = 1024,
    max_channels: int = 18,
) -> Path:
    """Write the single-file interactive viewer; returns the path."""
    payload = build_payload(
        datastore, tiles=tiles, max_edge=max_edge, max_channels=max_channels
    )
    if not payload["views"]:
        raise ValueError("datastore has no displayable channels to export")
    doc = _HTML_TEMPLATE.replace(
        "__TITLE__", html.escape(payload["title"])
    ).replace(
        "__PAYLOAD__",
        json.dumps(payload, separators=(",", ":")).replace("</", "<\\/"),
    )
    output_html = Path(output_html)
    output_html.parent.mkdir(parents=True, exist_ok=True)
    output_html.write_text(doc)
    return output_html


def serve(html_path, port: int = 8765, block: bool = True):
    """Host an exported viewer file on localhost."""
    html_path = Path(html_path)
    doc = html_path.read_bytes()

    class _Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(doc)))
            self.end_headers()
            self.wfile.write(doc)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), _Handler)
    if block:
        print(f"serving {html_path} at http://127.0.0.1:{port}/ (ctrl-c stops)")
        try:
            server.serve_forever()
        finally:
            server.server_close()
        return None
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


_HTML_TEMPLATE = r"""<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>__TITLE__</title>
<style>
:root {
  color-scheme: dark;
  --surface-1: #1a1a19;
  --surface-2: #232322;
  --border: #383835;
  --text-primary: #ffffff;
  --text-secondary: #c3c2b7;
  --accent: #3987e5;
}
* { box-sizing: border-box; }
body {
  margin: 0; background: var(--surface-1); color: var(--text-primary);
  font: 13px/1.45 system-ui, sans-serif; display: flex; height: 100vh;
  overflow: hidden;
}
#sidebar {
  width: 300px; min-width: 300px; background: var(--surface-2);
  border-right: 1px solid var(--border); padding: 12px;
  overflow-y: auto; display: flex; flex-direction: column; gap: 12px;
}
#sidebar h1 { font-size: 14px; margin: 0; font-weight: 600; }
#sidebar h2 {
  font-size: 11px; margin: 0 0 4px; font-weight: 600;
  color: var(--text-secondary); text-transform: uppercase;
  letter-spacing: 0.05em;
}
select, input[type=range] { width: 100%; accent-color: var(--accent); }
select {
  background: var(--surface-1); color: var(--text-primary);
  border: 1px solid var(--border); border-radius: 4px; padding: 4px;
}
.chan { padding: 4px 0; border-bottom: 1px solid var(--border); }
.chan label { display: flex; gap: 6px; align-items: center; cursor: pointer; }
.chan .sw { width: 10px; height: 10px; border-radius: 2px; flex: none; }
.chan .lbl {
  overflow: hidden; text-overflow: ellipsis; white-space: nowrap;
  color: var(--text-secondary);
}
.chan.focused .lbl { color: var(--text-primary); }
.chan .win { display: flex; gap: 6px; margin: 2px 0 0 16px; }
table { border-collapse: collapse; width: 100%; }
td {
  padding: 1px 4px; color: var(--text-secondary); font-variant-numeric: tabular-nums;
}
td:last-child { text-align: right; }
td .sw {
  display: inline-block; width: 9px; height: 9px; border-radius: 2px;
  margin-right: 6px; vertical-align: baseline;
}
#main { flex: 1; display: flex; flex-direction: column; min-width: 0; }
#canvaswrap { flex: 1; position: relative; overflow: hidden; }
canvas { position: absolute; inset: 0; width: 100%; height: 100%; }
#zrow {
  display: flex; gap: 10px; align-items: center; padding: 8px 14px;
  border-top: 1px solid var(--border); background: var(--surface-2);
}
#zrow input { flex: 1; }
#status {
  padding: 6px 14px; border-top: 1px solid var(--border);
  color: var(--text-secondary); font-variant-numeric: tabular-nums;
  white-space: nowrap; overflow: hidden; text-overflow: ellipsis;
}
.toggle { display: flex; gap: 6px; align-items: center; cursor: pointer;
  color: var(--text-secondary); }
#help { font-size: 11px; color: var(--text-secondary); }
kbd {
  background: var(--surface-1); border: 1px solid var(--border);
  border-radius: 3px; padding: 0 4px; font-size: 10px;
}
</style>
</head>
<body>
<script id="m3d-payload" type="application/json">__PAYLOAD__</script>
<div id="sidebar">
  <h1>__TITLE__</h1>
  <div>
    <h2>View</h2>
    <select id="viewsel"></select>
  </div>
  <div>
    <h2>Channels</h2>
    <div id="chanlist"></div>
  </div>
  <div>
    <h2>Overlays</h2>
    <label class="toggle"><input type="checkbox" id="spotchk" checked> decoded spots</label>
    <label class="toggle"><input type="checkbox" id="outlinechk" checked> cell outlines</label>
  </div>
  <div>
    <h2>Genes</h2>
    <select id="genesel" multiple size="6"></select>
    <table id="genetable"></table>
  </div>
  <div id="help">
    <kbd>&uarr;</kbd><kbd>&darr;</kbd> z &nbsp; <kbd>&larr;</kbd><kbd>&rarr;</kbd> channel
    &nbsp; <kbd>t</kbd> view &nbsp; <kbd>o</kbd> spots &nbsp; <kbd>c</kbd> outlines
    &nbsp; wheel zoom / drag pan / dblclick reset
  </div>
</div>
<div id="main">
  <div id="canvaswrap"><canvas id="cv"></canvas></div>
  <div id="zrow">
    <span>z</span><input type="range" id="zslider" min="0" max="0" value="0">
    <span id="zlabel">0</span>
  </div>
  <div id="status">&nbsp;</div>
</div>
<script>
"use strict";
const P = JSON.parse(document.getElementById("m3d-payload").textContent);
const cv = document.getElementById("cv"), ctx = cv.getContext("2d");
const S = {           // viewer state
  view: 0, z: 0, focus: 0,
  showSpots: true, showOutlines: true,
  geneFilter: null,   // null = all
  scale: 1, tx: 0, ty: 0,
  chanState: [],      // per current view: {on, lo, hi} in u8 domain
};
const u8cache = new Map();  // "view/chan" -> Uint8Array

function curView() { return P.views[S.view]; }
function chanData(vi, ci) {
  const key = vi + "/" + ci;
  if (!u8cache.has(key)) {
    const b = atob(P.views[vi].channels[ci].b64);
    const a = new Uint8Array(b.length);
    for (let i = 0; i < b.length; i++) a[i] = b.charCodeAt(i);
    u8cache.set(key, a);
  }
  return u8cache.get(key);
}
function geneColor(g) { return P.gene_colors[g] || P.other_gene_color; }
function esc(s) {
  return String(s).replace(/[&<>"']/g, (c) => "&#" + c.charCodeAt(0) + ";");
}

// ---------------------------------------------------------------- layout
function resetTransform() {
  const v = curView(), sh = v.channels[0].shape;
  const fit = Math.min(cv.width / sh[2], cv.height / sh[1]);
  S.scale = fit; S.tx = (cv.width - sh[2] * fit) / 2;
  S.ty = (cv.height - sh[1] * fit) / 2;
}
function resize() {
  const r = cv.parentElement.getBoundingClientRect();
  cv.width = Math.max(64, r.width * devicePixelRatio);
  cv.height = Math.max(64, r.height * devicePixelRatio);
  resetTransform(); render();
}
addEventListener("resize", resize);

// ---------------------------------------------------------------- render
let oc = null, octx = null;   // offscreen composited frame
function composite() {
  const v = curView(), sh = v.channels[0].shape;
  const [nz, ny, nx] = sh, plane = ny * nx;
  const z = Math.min(S.z, nz - 1);
  const img = new ImageData(nx, ny), d = img.data;
  for (let ci = 0; ci < v.channels.length; ci++) {
    const st = S.chanState[ci];
    if (!st.on) continue;
    const u8 = chanData(S.view, ci), rgb = v.channels[ci].rgb;
    const lo = st.lo, inv = 255 / Math.max(st.hi - st.lo, 1);
    const base = z * plane;
    for (let p = 0; p < plane; p++) {
      const t = Math.min(Math.max((u8[base + p] - lo) * inv, 0), 255) / 255;
      const o = p * 4;
      d[o] = Math.min(d[o] + rgb[0] * t, 255);
      d[o + 1] = Math.min(d[o + 1] + rgb[1] * t, 255);
      d[o + 2] = Math.min(d[o + 2] + rgb[2] * t, 255);
      d[o + 3] = 255;
    }
  }
  if (!oc || oc.width !== nx || oc.height !== ny) {
    oc = document.createElement("canvas");
    oc.width = nx; oc.height = ny;
    octx = oc.getContext("2d");
  }
  octx.putImageData(img, 0, 0);
}
function render() {
  composite();
  ctx.setTransform(1, 0, 0, 1, 0, 0);
  ctx.fillStyle = "#111110";
  ctx.fillRect(0, 0, cv.width, cv.height);
  ctx.setTransform(S.scale, 0, 0, S.scale, S.tx, S.ty);
  ctx.imageSmoothingEnabled = S.scale < 1;
  ctx.drawImage(oc, 0, 0);
  const v = curView(), ds = v.downsample;
  if (S.showOutlines && v.outlines.length) {
    ctx.lineWidth = 1.5 / S.scale;
    ctx.strokeStyle = "#c3c2b7";
    for (const poly of v.outlines) {
      ctx.beginPath();
      for (let i = 0; i < poly.yx.length; i++) {
        const [y, x] = poly.yx[i];
        if (i === 0) ctx.moveTo(x / ds, y / ds); else ctx.lineTo(x / ds, y / ds);
      }
      ctx.closePath(); ctx.stroke();
    }
  }
  if (S.showSpots && v.spots.length) {
    const r = Math.max(3 / S.scale, 1.2 / ds);
    for (const [z, y, x, g] of v.spots) {
      if (Math.abs(z - S.z * 1) > 1.5 && v.shape_zyx[0] > 1) continue;
      if (S.geneFilter && !S.geneFilter.has(g)) continue;
      ctx.beginPath();
      ctx.arc(x / ds, y / ds, r, 0, 2 * Math.PI);
      ctx.strokeStyle = geneColor(g);
      ctx.lineWidth = 1.5 / S.scale;
      ctx.stroke();
    }
  }
  document.getElementById("zlabel").textContent =
    S.z + " / " + (v.channels[0].shape[0] - 1);
}

// ---------------------------------------------------------------- sidebar
function buildSidebar() {
  const v = curView();
  const vs = document.getElementById("viewsel");
  vs.innerHTML = "";
  P.views.forEach((vv, i) => {
    const o = document.createElement("option");
    o.value = i; o.textContent = vv.name; if (i === S.view) o.selected = true;
    vs.appendChild(o);
  });
  S.chanState = v.channels.map((c, i) => S.chanState[i] || {
    on: v.channels.length <= 3 || i === 0, lo: 0, hi: 255,
  });
  const cl = document.getElementById("chanlist");
  cl.innerHTML = "";
  v.channels.forEach((c, i) => {
    const div = document.createElement("div");
    div.className = "chan" + (i === S.focus ? " focused" : "");
    div.dataset.ci = i;
    const rgb = "rgb(" + c.rgb.join(",") + ")";
    div.innerHTML =
      '<label><input type="checkbox" data-ci="' + i + '"' +
      (S.chanState[i].on ? " checked" : "") + '>' +
      '<span class="sw" style="background:' + rgb + '"></span>' +
      '<span class="lbl" title="' + esc(c.label) + '">' + esc(c.label) + "</span></label>" +
      '<div class="win">' +
      '<input type="range" min="0" max="255" value="' + S.chanState[i].lo +
      '" data-ci="' + i + '" data-k="lo">' +
      '<input type="range" min="0" max="255" value="' + S.chanState[i].hi +
      '" data-ci="' + i + '" data-k="hi"></div>';
    cl.appendChild(div);
  });
  const zs = document.getElementById("zslider");
  zs.max = v.channels[0].shape[0] - 1;
  zs.value = S.z = Math.min(S.z, +zs.max);
  const gs = document.getElementById("genesel"), gt = document.getElementById("genetable");
  gs.innerHTML = ""; gt.innerHTML = "";
  Object.keys(P.gene_counts).forEach((g) => {
    const o = document.createElement("option");
    o.value = g; o.textContent = g;  // textContent: no escaping needed
    if (S.geneFilter && S.geneFilter.has(g)) o.selected = true;
    gs.appendChild(o);
    const tr = document.createElement("tr");
    tr.innerHTML =
      '<td><span class="sw" style="background:' + geneColor(g) + '"></span>' +
      esc(g) + "</td><td>" + P.gene_counts[g] + "</td>";
    gt.appendChild(tr);
  });
}

// ---------------------------------------------------------------- events
document.getElementById("viewsel").addEventListener("change", (e) => {
  S.view = +e.target.value; S.focus = 0; S.chanState = [];
  buildSidebar(); resetTransform(); render();
});
document.getElementById("chanlist").addEventListener("input", (e) => {
  const ci = +e.target.dataset.ci;
  if (e.target.type === "checkbox") S.chanState[ci].on = e.target.checked;
  else S.chanState[ci][e.target.dataset.k] = +e.target.value;
  render();
});
document.getElementById("zslider").addEventListener("input", (e) => {
  S.z = +e.target.value; render();
});
document.getElementById("spotchk").addEventListener("change", (e) => {
  S.showSpots = e.target.checked; render();
});
document.getElementById("outlinechk").addEventListener("change", (e) => {
  S.showOutlines = e.target.checked; render();
});
document.getElementById("genesel").addEventListener("change", (e) => {
  const sel = [...e.target.selectedOptions].map((o) => o.value);
  S.geneFilter = sel.length ? new Set(sel) : null;
  render();
});
cv.addEventListener("wheel", (e) => {
  e.preventDefault();
  const f = Math.exp(-e.deltaY * 0.0015);
  const mx = e.offsetX * devicePixelRatio, my = e.offsetY * devicePixelRatio;
  S.tx = mx - (mx - S.tx) * f; S.ty = my - (my - S.ty) * f; S.scale *= f;
  render();
}, { passive: false });
let drag = null;
cv.addEventListener("pointerdown", (e) => {
  drag = { x: e.clientX, y: e.clientY, tx: S.tx, ty: S.ty };
  cv.setPointerCapture(e.pointerId);
});
cv.addEventListener("pointermove", (e) => {
  if (drag) {
    S.tx = drag.tx + (e.clientX - drag.x) * devicePixelRatio;
    S.ty = drag.ty + (e.clientY - drag.y) * devicePixelRatio;
    render();
  }
  status_(e);
});
cv.addEventListener("pointerup", () => { drag = null; });
cv.addEventListener("dblclick", () => { resetTransform(); render(); });
addEventListener("keydown", (e) => {
  if (["INPUT", "SELECT"].includes(document.activeElement.tagName)) return;
  const v = curView();
  let rebuild = false;
  if (e.key === "ArrowUp") S.z = Math.min(S.z + 1, v.channels[0].shape[0] - 1);
  else if (e.key === "ArrowDown") S.z = Math.max(S.z - 1, 0);
  else if (e.key === "ArrowRight") {
    S.focus = (S.focus + 1) % v.channels.length; rebuild = true;
  } else if (e.key === "ArrowLeft") {
    S.focus = (S.focus + v.channels.length - 1) % v.channels.length;
    rebuild = true;
  } else if (e.key === "t") {
    S.view = (S.view + 1) % P.views.length; S.focus = 0; S.chanState = [];
    rebuild = true; resetTransform();
  } else if (e.key === "o") {
    S.showSpots = !S.showSpots;
    document.getElementById("spotchk").checked = S.showSpots;
  } else if (e.key === "c") {
    S.showOutlines = !S.showOutlines;
    document.getElementById("outlinechk").checked = S.showOutlines;
  } else return;
  e.preventDefault();
  if (rebuild) buildSidebar();
  document.getElementById("zslider").value = S.z;
  render();
});
function status_(e) {
  const v = curView(), ds = v.downsample;
  const ix = ((e.offsetX * devicePixelRatio - S.tx) / S.scale) * ds;
  const iy = ((e.offsetY * devicePixelRatio - S.ty) / S.scale) * ds;
  const sp = v.spacing_zyx_um, og = v.origin_zyx_um;
  const um = [og[1] + iy * sp[1], og[2] + ix * sp[2]];
  const c = v.channels[S.focus];
  let val = "";
  const sx = Math.floor(ix / ds), sy = Math.floor(iy / ds);
  if (sx >= 0 && sy >= 0 && sx < c.shape[2] && sy < c.shape[1]) {
    const u8 = chanData(S.view, S.focus);
    const raw = u8[(Math.min(S.z, c.shape[0] - 1) * c.shape[1] + sy) * c.shape[2] + sx];
    val = " · " + c.label + " ≈ " +
      (c.lo + (raw / 255) * (c.hi - c.lo)).toFixed(1);
  }
  document.getElementById("status").textContent =
    v.name + " · z " + S.z + " · px (" + iy.toFixed(1) + ", " + ix.toFixed(1) +
    ") · µm (" + um[0].toFixed(2) + ", " + um[1].toFixed(2) + ")" + val;
}
buildSidebar(); resize();
</script>
</body>
</html>
"""
