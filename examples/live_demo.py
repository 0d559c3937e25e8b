#!/usr/bin/env python3
"""Interactive browser demo — the served analog of the reference's WASM/webcam
frontend (/root/reference/examples/wasm/index.html + grayskull.js).

The reference runs grayskull compiled to wasm32 in the browser with a
drag-free pipeline-builder UI (grayskull.js:205-255), a per-frame pipeline
executor (grayskull.js:257-347) and overlay renderers that read detection
structs straight out of WASM linear memory (grayskull.js:349-563).  Here the
same interaction runs against the TPU framework over HTTP:

* ``GET /``       — single-file HTML/JS page: canvas, pipeline builder,
                    analyzer toggles, play/pause, fps counter;
* ``GET /frame``  — query params ``i`` (frame index), ``pipeline`` (the same
                    ``blur:2,threshold:otsu,...`` specs as stream_demo) and
                    ``analyzers``; returns JSON with the processed grayscale
                    frame (base64) plus blob / keypoint / face / contour /
                    match tables for the browser-side overlay renderers.

Frames are synthesized webcam-style or read from ``--src`` (directory of
PGMs).  The ORB analyzer tracks frame 0 as the template, like the WASM demo's
template capture (examples/wasm/grayskull.c:233-272).

Usage::

    python examples/live_demo.py [--port 8400] [--size 240x320] [--src dir]

then open http://localhost:8400/.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import grayskull_tpu as gs  # noqa: E402
from stream_demo import build_pipeline, synth_frames  # noqa: E402

_LOCK = threading.Lock()  # one device at a time; the tunnel is single-stream


class Demo:
    def __init__(self, frames: np.ndarray):
        self.frames = frames
        self.h, self.w = frames.shape[1:]
        self._dense_cache = {}
        self._template_kps = None

    def dense(self, spec: str):
        if spec not in self._dense_cache:
            fn, analyzers = build_pipeline(spec or "blur:1")
            self._dense_cache[spec] = (jax.jit(fn), analyzers)
        return self._dense_cache[spec]

    def frame(self, i: int, spec: str, analyzers: list[str]) -> dict:
        raw = self.frames[i % len(self.frames)]
        fn, spec_analyzers = self.dense(spec)
        with _LOCK:
            out = np.asarray(fn(jnp.asarray(raw)))
            resp = {
                "w": self.w, "h": self.h,
                "pixels": base64.b64encode(out.tobytes()).decode(),
            }
            for name in analyzers + [a for a, _ in spec_analyzers]:
                if name == "blobs":
                    table, _, _ = gs.ops.blobs(jnp.asarray(out), 100)
                    n = int(table.n)
                    resp["blobs"] = np.stack(
                        [np.asarray(v)[:n] for v in
                         (table.box.x, table.box.y, table.box.w, table.box.h)],
                        axis=1).tolist()
                elif name == "keypoints":
                    kps, _ = gs.ops.fast(jnp.asarray(raw), 200, 20)
                    n = int(kps.n)
                    resp["keypoints"] = np.stack(
                        [np.asarray(kps.x)[:n], np.asarray(kps.y)[:n]], axis=1).tolist()
                elif name == "faces":
                    rects = gs.pipelines.detect_faces(jnp.asarray(raw), step=2)
                    n = int(rects.n)
                    resp["faces"] = np.stack(
                        [np.asarray(v)[:n] for v in (rects.x, rects.y, rects.w, rects.h)],
                        axis=1).tolist()
                elif name == "contours":
                    cs = gs.ops.find_contours(jnp.asarray(out), max_contours=16)
                    n = int(cs.n)
                    resp["contours"] = np.stack(
                        [np.asarray(v)[:n] for v in
                         (cs.box.x, cs.box.y, cs.box.w, cs.box.h)], axis=1).tolist()
                elif name == "orb":
                    # template = frame 0, like the WASM demo's capture button
                    if self._template_kps is None:
                        self._template_kps = gs.ops.orb_extract(
                            jnp.asarray(self.frames[0]), 200, 20)
                    kps = gs.ops.orb_extract(jnp.asarray(raw), 200, 20)
                    m = gs.ops.match_orb(self._template_kps, kps, 100, 64)
                    n = int(m.n)
                    i1 = np.asarray(m.idx1)[:n]
                    i2 = np.asarray(m.idx2)[:n]
                    resp["matches"] = np.stack(
                        [np.asarray(self._template_kps.x)[i1],
                         np.asarray(self._template_kps.y)[i1],
                         np.asarray(kps.x)[i2], np.asarray(kps.y)[i2]], axis=1).tolist()
        return resp


_PAGE = """<!doctype html>
<meta charset="utf-8"><title>grayskull-tpu live demo</title>
<style>
 body{font:14px system-ui;margin:20px;background:#111;color:#ddd}
 canvas{border:1px solid #444;image-rendering:pixelated}
 select,button{margin:2px;padding:4px 8px;background:#222;color:#ddd;border:1px solid #555}
 #chain span{display:inline-block;background:#234;border:1px solid #468;margin:2px;padding:2px 6px;cursor:pointer}
 label{margin-right:10px}
</style>
<h3>grayskull-tpu live demo</h3>
<div>
 <select id="op">
  <option>blur:2</option><option>threshold:otsu</option><option>threshold:128</option>
  <option>adaptive:5:5</option><option>erode</option><option>dilate</option>
  <option>sobel</option><option>sharpen</option><option>emboss</option>
 </select>
 <button onclick="addOp()">add step</button>
 <span id="chain"></span>
</div>
<div>
 <label><input type="checkbox" id="blobs">blobs</label>
 <label><input type="checkbox" id="keypoints">keypoints</label>
 <label><input type="checkbox" id="faces">faces</label>
 <label><input type="checkbox" id="contours">contours</label>
 <label><input type="checkbox" id="orb">orb track</label>
 <button onclick="running=!running;loop()">play/pause</button>
 <span id="fps"></span>
</div>
<canvas id="cv"></canvas>
<script>
let chain = ["blur:2", "threshold:otsu"], i = 0, running = true, busy = false;
let t0 = performance.now(), shown = 0;
function drawChain(){
  document.getElementById("chain").innerHTML = chain.map(
    (c, k) => `<span onclick="chain.splice(${k},1);drawChain()">${c} ×</span>`).join("→");
}
function addOp(){ chain.push(document.getElementById("op").value); drawChain(); }
drawChain();
async function loop(){
  if (!running || busy) return;
  busy = true;
  const an = ["blobs","keypoints","faces","contours","orb"].filter(
      a => document.getElementById(a).checked);
  const r = await fetch(`/frame?i=${i++}&pipeline=${chain.join(",")}&analyzers=${an}`);
  const d = await r.json();
  const cv = document.getElementById("cv");
  cv.width = d.w; cv.height = d.h;
  const ctx = cv.getContext("2d");
  const bytes = Uint8Array.from(atob(d.pixels), c => c.charCodeAt(0));
  const img = ctx.createImageData(d.w, d.h);
  for (let p = 0; p < bytes.length; p++){
    img.data[4*p] = img.data[4*p+1] = img.data[4*p+2] = bytes[p]; img.data[4*p+3] = 255;
  }
  ctx.putImageData(img, 0, 0);
  ctx.lineWidth = 1;
  // overlay renderers — same shapes as grayskull.js:349-563
  ctx.strokeStyle = "#4f4";
  for (const [x,y,w,h] of (d.blobs||[])) ctx.strokeRect(x+.5, y+.5, w, h);
  ctx.strokeStyle = "#ff0";
  for (const [x,y,w,h] of (d.contours||[])) ctx.strokeRect(x+.5, y+.5, w, h);
  ctx.strokeStyle = "#f6f";
  for (const [x,y,w,h] of (d.faces||[])) ctx.strokeRect(x+.5, y+.5, w, h);
  ctx.strokeStyle = "#f44";
  for (const [x,y] of (d.keypoints||[])) {
    ctx.beginPath(); ctx.moveTo(x-3,y); ctx.lineTo(x+3,y);
    ctx.moveTo(x,y-3); ctx.lineTo(x,y+3); ctx.stroke();
  }
  ctx.strokeStyle = "#08f";
  for (const [x1,y1,x2,y2] of (d.matches||[])) {
    ctx.beginPath(); ctx.moveTo(x1,y1); ctx.lineTo(x2,y2); ctx.stroke();
  }
  shown++;
  if (shown % 10 == 0){
    const now = performance.now();
    document.getElementById("fps").textContent = (10000/(now-t0)).toFixed(1) + " fps";
    t0 = now;
  }
  busy = false;
  if (running) setTimeout(loop, 0);
}
loop();
</script>
"""


def make_handler(demo: Demo):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif u.path == "/frame":
                q = parse_qs(u.query)
                i = int(q.get("i", ["0"])[0])
                spec = q.get("pipeline", [""])[0]
                analyzers = [a for a in q.get("analyzers", [""])[0].split(",") if a]
                try:
                    resp = demo.frame(i, spec, analyzers)
                    body = json.dumps(resp).encode()
                    code = 200
                except (Exception, SystemExit) as e:
                    # surface pipeline errors in the UI (build_pipeline raises
                    # SystemExit for unknown ops — keep the server alive)
                    body = json.dumps({"error": str(e)}).encode()
                    code = 400
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

    return Handler


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", type=int, default=8400)
    ap.add_argument("--size", default="240x320")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--src", help="directory of PGM frames (else synthetic)")
    args = ap.parse_args()

    h, w = (int(v) for v in args.size.split("x"))
    if args.src:
        paths = sorted(
            os.path.join(args.src, f) for f in os.listdir(args.src) if f.endswith(".pgm")
        )[: args.frames]
        frames = gs.io.read_pgm_batch(paths, pad_to=(h, w))
    else:
        frames = synth_frames(args.frames, h, w)

    demo = Demo(frames)
    srv = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(demo))
    print(f"live demo on http://127.0.0.1:{args.port}/  ({len(frames)} frames, {h}x{w})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
