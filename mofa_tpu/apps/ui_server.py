"""Browser UI for the trajectory workload — gradio-free Blocks parity.

The reference ships gradio Blocks apps (MOFA-Video-Traj/run_gradio.py:634-838)
for interactive use: upload an image, click trajectory points, paint a
motion brush, preview the CMP flow, run. gradio is not in this image, so
this module serves the same interactions from the Python stdlib
(`http.server`) with a single-page canvas front end — no dependencies.

Endpoints (JSON unless noted):
  GET  /            the page
  POST /preprocess  {image: dataURL, target_size} -> resized image dataURL
                    (run_gradio.py:663-689 preprocess_image semantics)
  POST /preview     {image, tracks, num_frames} -> {flow: dataURL,
                    hint: dataURL} — per-click CMP flow preview, the
                    run_gradio.py:372-485 get_cmp_flow_from_tracking_points
  POST /run         {image, tracks, brush?, params...} -> {video: /video}
  POST /run_landmarks  {image, landmarks (b64 .npy), mode: hybrid|keypoint,
                    tracks?, brush? (face mask)} — the audio/video-driven
                    workloads (run_gradio_audio_driven.py Drag.run /
                    mofa_keypoint.py), routed through the CLI runners
  GET  /video       last rendered mp4

State lives in the browser (tracks array, brush canvas); the server is
stateless except for model params, loaded once and reused.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>MOFA-TPU</title><style>
body{font-family:sans-serif;margin:20px;background:#15181d;color:#e6e6e6}
canvas{border:1px solid #555;cursor:crosshair}
button{margin:4px;padding:6px 12px;background:#2b6cb0;color:#fff;border:0;
border-radius:4px;cursor:pointer} button.alt{background:#4a5568}
#row{display:flex;gap:16px} .col{display:flex;flex-direction:column}
img{border:1px solid #555}</style></head><body>
<h2>MOFA-Video on TPU — trajectory animation</h2>
<input type="file" id="file" accept="image/*">
<div id="row"><div class="col">
<canvas id="cv" width="512" height="512"></canvas>
<div>
<button id="newtrack">New trajectory</button>
<button id="brush" class="alt">Brush: off</button>
<button id="clear" class="alt">Clear</button>
<button id="preview">Preview flow</button>
<button id="run">Run</button>
</div>
<div>
<select id="lmmode"><option value="hybrid">hybrid (dual adapter)</option>
<option value="keypoint">keypoint (long video)</option></select>
<input type="file" id="lmfile" accept=".npy">
<button id="runlm">Run landmarks</button>
</div></div>
<div class="col"><img id="flow" width="256"><img id="hint" width="256">
<video id="out" width="256" controls></video></div></div>
<pre id="log"></pre><script>
let img=null, tracks=[[]], brushMode=false, drawing=false;
const cv=document.getElementById('cv'), ctx=cv.getContext('2d');
const bc=document.createElement('canvas'), bctx=bc.getContext('2d');
const log=m=>document.getElementById('log').textContent=m;
function redraw(){ if(!img)return; ctx.drawImage(img,0,0);
 ctx.globalAlpha=0.35; ctx.drawImage(bc,0,0); ctx.globalAlpha=1;
 for(const tr of tracks){ ctx.strokeStyle='#f33'; ctx.beginPath();
  tr.forEach((p,i)=>i?ctx.lineTo(p[0],p[1]):ctx.moveTo(p[0],p[1]));
  ctx.stroke(); for(const p of tr){ctx.fillStyle='#ff0';
  ctx.fillRect(p[0]-3,p[1]-3,6,6);} } }
document.getElementById('file').onchange=async e=>{
 const r=new FileReader(); r.onload=async()=>{
  const resp=await post('/preprocess',{image:r.result,target_size:512});
  img=new Image(); img.onload=()=>{cv.width=img.width;cv.height=img.height;
   bc.width=img.width;bc.height=img.height;tracks=[[]];redraw();};
  img.src=resp.image; };
 r.readAsDataURL(e.target.files[0]); };
cv.onmousedown=e=>{ if(brushMode){drawing=true;paint(e);} };
cv.onmousemove=e=>{ if(brushMode&&drawing)paint(e); };
cv.onmouseup=e=>{ if(brushMode){drawing=false;return;}
 const r=cv.getBoundingClientRect();
 tracks[tracks.length-1].push([e.clientX-r.left,e.clientY-r.top]);
 redraw(); };
function paint(e){ const r=cv.getBoundingClientRect();
 bctx.fillStyle='#fff'; bctx.beginPath();
 bctx.arc(e.clientX-r.left,e.clientY-r.top,14,0,7); bctx.fill(); redraw(); }
document.getElementById('newtrack').onclick=()=>tracks.push([]);
document.getElementById('brush').onclick=e=>{brushMode=!brushMode;
 e.target.textContent='Brush: '+(brushMode?'on':'off');};
document.getElementById('clear').onclick=()=>{tracks=[[]];
 bctx.clearRect(0,0,bc.width,bc.height); redraw();};
async function post(u,b){ const r=await fetch(u,{method:'POST',
 headers:{'Content-Type':'application/json'},body:JSON.stringify(b)});
 if(!r.ok) throw new Error(await r.text()); return r.json(); }
document.getElementById('preview').onclick=async()=>{ log('CMP preview…');
 try{ const r=await post('/preview',{image:img.src,
  tracks:tracks.filter(t=>t.length>1)});
  document.getElementById('flow').src=r.flow;
  document.getElementById('hint').src=r.hint; log(''); }
 catch(e){log(e.message)} };
document.getElementById('run').onclick=async()=>{ log('rendering…');
 try{ const r=await post('/run',{image:img.src,
  tracks:tracks.filter(t=>t.length>1),
  brush:bc.toDataURL()});
  document.getElementById('out').src=r.video+'?t='+Date.now(); log(''); }
 catch(e){log(e.message)} };
document.getElementById('runlm').onclick=async()=>{
 const f=document.getElementById('lmfile').files[0];
 if(!f){log('choose a landmarks .npy');return;}
 log('rendering (landmarks)…');
 const buf=await f.arrayBuffer();
 const b64=btoa(String.fromCharCode(...new Uint8Array(buf)));
 try{ const r=await post('/run_landmarks',{image:img.src,landmarks:b64,
  mode:document.getElementById('lmmode').value,
  tracks:tracks.filter(t=>t.length>1), brush:bc.toDataURL()});
  document.getElementById('out').src=r.video+'?t='+Date.now(); log(''); }
 catch(e){log(e.message)} };
</script></body></html>"""


def _data_url_to_array(url: str) -> np.ndarray:
    from PIL import Image
    head, payload = url.split(",", 1)
    img = Image.open(io.BytesIO(base64.b64decode(payload)))
    return np.asarray(img.convert("RGB"))


def _array_to_data_url(arr: np.ndarray) -> str:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr.astype(np.uint8)).save(buf, "PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


class TrajUIBackend:
    """Model state + request logic (kept separate from HTTP plumbing so
    tests drive it directly)."""

    def __init__(self, args):
        self.args = args
        self._lock = threading.Lock()
        self._engine = None
        self._pipe = None
        self._bundle = None
        self.last_video: bytes | None = None

    # --- lazy model loading -------------------------------------------------
    def engine(self):
        if self._engine is None:
            from mofa_tpu.apps.loaders import load_cmp_params
            from mofa_tpu.preprocess.traj import DragFlowEngine
            self._engine = DragFlowEngine(load_cmp_params(self.args.cmp_ckpt))
        return self._engine

    def pipeline(self):
        if self._pipe is None:
            import jax.numpy as jnp
            from mofa_tpu.apps.loaders import load_bundle
            cfg_kw = {}
            if self.args.tiny:
                from mofa_tpu.models.svd_unet import MICRO_UNET_CONFIG
                from mofa_tpu.models.vae import TINY_VAE_CONFIG
                from mofa_tpu.models.clip_vision import TINY_CLIP_CONFIG
                cfg_kw = dict(unet_cfg=MICRO_UNET_CONFIG,
                              vae_cfg=TINY_VAE_CONFIG,
                              clip_cfg=TINY_CLIP_CONFIG)
            from mofa_tpu.pipelines.traj import TrajPipeline
            self._bundle = load_bundle(
                self.args.svd_dir, self.args.controlnet_dir, **cfg_kw,
                dtype=jnp.bfloat16 if self.args.bf16 else jnp.float32,
                image_size=self.size, num_frames=self.args.num_frames)
            self._pipe = TrajPipeline(self._bundle)
        return self._pipe

    # --- endpoints ----------------------------------------------------------
    def preprocess(self, req):
        from PIL import Image
        from mofa_tpu.preprocess.traj import preprocess_image
        arr = _data_url_to_array(req["image"])
        image01, (h, w) = preprocess_image(
            Image.fromarray(arr),
            int(req.get("target_size", self.args.target_size)))
        self.size = (h, w)
        return {"image": _array_to_data_url(image01 * 255.0),
                "height": h, "width": w}

    def _drag_flow(self, image01, tracks, brush=None):
        import jax.numpy as jnp
        from mofa_tpu.ops.resize import resize_nhwc
        from mofa_tpu.ops.trajectory import interpolate_trajectory
        from mofa_tpu.preprocess.traj import (
            divide_points_afterinterpolate, prepare_trajectory_flow)
        h, w = image01.shape[:2]
        n = self.args.num_frames
        image_384 = resize_nhwc(jnp.asarray(image01)[None], (384, 384))
        eng = self.engine()
        if brush is not None and brush.max() > 0:
            from PIL import Image
            pts = [np.asarray(interpolate_trajectory(tr, n)) for tr in tracks]
            inside, outside = divide_points_afterinterpolate(
                np.stack(pts), brush)
            f_in, m_in = prepare_trajectory_flow(
                [list(map(tuple, p)) for p in inside] if len(inside) else [],
                n, h, w)
            f_out, m_out = prepare_trajectory_flow(
                [list(map(tuple, p)) for p in outside] if len(outside) else [],
                n, h, w)
            brush384 = np.asarray(
                Image.fromarray(brush.astype(np.uint8)).resize(
                    (384, 384), Image.NEAREST), np.float32) / 255.0
            return eng.get_drag_flow_with_brush(
                image_384, jnp.asarray(f_in)[None],
                jnp.asarray(np.repeat(m_in[..., None], 2, -1))[None],
                jnp.asarray(f_out)[None],
                jnp.asarray(np.repeat(m_out[..., None], 2, -1))[None],
                jnp.asarray(brush384), h, w)
        s_flow, mask = prepare_trajectory_flow(tracks, n, h, w)
        return eng.get_flow(
            image_384, jnp.asarray(s_flow)[None],
            jnp.asarray(np.repeat(mask[..., None], 2, -1))[None], h, w)

    def preview(self, req):
        """Flow preview on click — run_gradio.py:372-485."""
        from mofa_tpu.ops.flow_viz import flow_to_image
        from mofa_tpu.preprocess.traj import visualize_drag
        image = _data_url_to_array(req["image"]).astype(np.float32) / 255.0
        tracks = [[tuple(p) for p in tr] for tr in req["tracks"]]
        if not tracks:
            raise ValueError("add at least one trajectory with 2+ points")
        with self._lock:
            flow = np.asarray(self._drag_flow(image, tracks))[0]
        viz = flow_to_image(flow[-1])
        hint = visualize_drag(image, tracks)
        return {"flow": _array_to_data_url(viz),
                "hint": _array_to_data_url(hint * 255.0)}

    def run(self, req):
        import jax
        from mofa_tpu.apps.loaders import write_video
        image = _data_url_to_array(req["image"]).astype(np.float32) / 255.0
        self.size = image.shape[:2]
        tracks = [[tuple(p) for p in tr] for tr in req["tracks"]]
        if not tracks:
            raise ValueError("add at least one trajectory with 2+ points")
        brush = None
        if req.get("brush"):
            b = _data_url_to_array(req["brush"])
            brush = b.max(axis=-1).astype(np.float32)
        with self._lock:
            import jax.numpy as jnp
            flow = self._drag_flow(image, tracks, brush)
            pipe = self.pipeline()
            frames, _ = pipe(
                jnp.asarray(image)[None], flow,
                num_inference_steps=self.args.num_inference_steps,
                controlnet_cond_scale=self.args.ctrl_scale,
                decode_chunk_size=self.args.decode_chunk_size,
                key=jax.random.PRNGKey(self.args.seed))
        import tempfile, os
        fd, path = tempfile.mkstemp(suffix=".mp4")
        os.close(fd)
        write_video(np.asarray(frames)[0], path, fps=self.args.fps)
        self.last_video = open(path, "rb").read()
        os.unlink(path)
        return {"video": "/video"}

    def run_landmarks(self, req):
        """Landmark-driven workloads through the CLI runners (hybrid dual
        adapter or keypoint windowed long video)."""
        import tempfile, os
        mode = req.get("mode", "hybrid")
        if mode not in ("hybrid", "keypoint"):
            raise ValueError("mode must be 'hybrid' or 'keypoint'")
        if not req.get("landmarks"):
            raise ValueError("upload a landmarks .npy file")

        with tempfile.TemporaryDirectory() as td:
            img_path = os.path.join(td, "image.png")
            from PIL import Image
            Image.fromarray(_data_url_to_array(req["image"])).save(img_path)
            lm_path = os.path.join(td, "landmarks.npy")
            open(lm_path, "wb").write(base64.b64decode(req["landmarks"]))
            out_path = os.path.join(td, "out.mp4")

            argv = ["--image", img_path, "--landmarks", lm_path,
                    "--output", out_path,
                    "--target_size", str(self.args.target_size),
                    "--num_inference_steps",
                    str(self.args.num_inference_steps),
                    "--seed", str(self.args.seed)]
            if self.args.tiny:
                argv.append("--tiny")
            if self.args.bf16:
                argv.append("--bf16")
            if req.get("tracks"):
                tr_path = os.path.join(td, "tracks.json")
                json.dump({"tracks": req["tracks"]}, open(tr_path, "w"))
                argv += ["--tracks", tr_path]
            if mode == "hybrid" and req.get("brush"):
                b = _data_url_to_array(req["brush"]).max(axis=-1)
                if b.max() > 0:
                    mask_path = os.path.join(td, "mask.png")
                    Image.fromarray(b.astype(np.uint8)).save(mask_path)
                    argv += ["--face_mask", mask_path]

            with self._lock:
                if mode == "hybrid":
                    from mofa_tpu.apps import hybrid_app as app
                else:
                    from mofa_tpu.apps import keypoint_app as app
                app.run(app.build_parser().parse_args(argv))
            self.last_video = open(out_path, "rb").read()
        return {"video": "/video"}


def make_handler(backend: TrajUIBackend):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/":
                self._send(200, _PAGE.encode(), "text/html")
            elif self.path.startswith("/video") and backend.last_video:
                self._send(200, backend.last_video, "video/mp4")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n))
                route = {"/preprocess": backend.preprocess,
                         "/preview": backend.preview,
                         "/run": backend.run,
                         "/run_landmarks": backend.run_landmarks}.get(
                    self.path)
                if route is None:
                    self._send(404, b"not found", "text/plain")
                    return
                self._send(200, json.dumps(route(req)).encode())
            except Exception as e:  # surfaced in the page's log pane
                self._send(500, str(e).encode(), "text/plain")
    return Handler


def build_parser():
    p = argparse.ArgumentParser(description="MOFA-TPU browser UI")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--svd_dir", default=None)
    p.add_argument("--controlnet_dir", default=None)
    p.add_argument("--cmp_ckpt", default=None)
    p.add_argument("--num_frames", type=int, default=25)
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--target_size", type=int, default=512)
    p.add_argument("--ctrl_scale", type=float, default=0.6)
    p.add_argument("--decode_chunk_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fps", type=int, default=7)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--tiny", action="store_true")
    return p


def serve(args):
    backend = TrajUIBackend(args)
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(backend))
    print(f"MOFA-TPU UI at http://{args.host}:{args.port}")
    httpd.serve_forever()


def main(argv=None):
    serve(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
