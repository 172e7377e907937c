"""Interactive visualizer — browser-based equivalent of the reference's
imgui/OpenGL viz layer.

Behavioral parity target: viz/renderer.py:125-448 + the widget panels
(viz/*.py: latent, style-mixing, truncation+noise, pose, FOV /
conditioning pose, render type, depth-sample multiplier, layer viewer,
backbone cache, performance readout). The reference ships GL widgets with
no launcher (SURVEY.md section 2.11); on a headless TPU host the native
equivalent is an HTTP UI: sliders drive a jitted renderer, frames stream
as PNG. Zero GL/glfw/imgui dependencies.

Run:  python -m tgi.apps.visualizer --network G.pkl --port 8000
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

import jax
import jax.numpy as jnp

PAGE = """<!doctype html>
<html><head><title>tgi visualizer</title><style>
body{font-family:monospace;background:#111;color:#ddd;display:flex;gap:24px;padding:24px}
label{display:block;margin:6px 0 2px}input[type=range]{width:240px}
img{image-rendering:pixelated;border:1px solid #333}
select,input[type=number]{background:#222;color:#ddd;border:1px solid #444}
fieldset{border:1px solid #333;margin-bottom:8px}
</style></head><body>
<div>
<h3>tgi visualizer</h3>
<fieldset><legend>latent</legend>
<label>seed <input id="seed" type="number" value="0"></label>
<label>truncation <input id="trunc" type="range" min="0" max="1" step="0.05" value="0.7"></label>
<label>trunc cutoff <input id="cutoff" type="number" value="14" min="0" max="14"></label>
</fieldset>
<fieldset><legend>style mixing (viz/stylemix_widget)</legend>
<label>mix seed <input id="mixseed" type="number" value="-1"></label>
<label>mix from layer <input id="mixlayer" type="range" min="0" max="14" step="1" value="7"></label>
</fieldset>
<fieldset><legend>pose (viz/pose_widget)</legend>
<label>yaw <input id="yaw" type="range" min="-0.8" max="0.8" step="0.02" value="0"></label>
<label>pitch <input id="pitch" type="range" min="-0.5" max="0.5" step="0.02" value="0"></label>
<label>fov <input id="fov" type="range" min="12" max="45" step="0.5" value="18.837"></label>
<label>cond yaw <input id="cyaw" type="range" min="-0.8" max="0.8" step="0.02" value="0"></label>
<label>cond pitch <input id="cpitch" type="range" min="-0.5" max="0.5" step="0.02" value="0"></label>
</fieldset>
<fieldset><legend>render (viz/render_type_widget)</legend>
<label>type <select id="rtype"><option>image</option><option>image_raw</option>
<option>image_depth</option><option>planes</option></select></label>
<label>plane / channel <input id="layerch" type="number" value="0" min="0" max="95"></label>
<label>depth mult <select id="mult"><option>1</option><option selected>2</option></select></label>
<label>noise <select id="noise"><option>const</option><option>random</option></select></label>
</fieldset>
<fieldset><legend>capture (viz/capture_widget)</legend>
<button id="capture">save png</button> <span id="saved"></span>
</fieldset>
<fieldset><legend>performance (viz/performance_widget)</legend>
<div id="stat"></div><div id="srvstat"></div>
</fieldset>
</div>
<img id="view" width="512" height="512">
<script>
const ids = ["seed","yaw","pitch","trunc","cutoff","rtype","mult","fov",
             "cyaw","cpitch","mixseed","mixlayer","noise","layerch"];
const els = ids.map(id=>document.getElementById(id));
let busy=false, dirty=false;
function params(){
  const q = new URLSearchParams();
  els.forEach(e=>q.set(e.id,e.value));
  return q;
}
async function refresh(){
  if(busy){dirty=true;return} busy=true;
  const q = params(); const t0=performance.now();
  const r = await fetch("/render?"+q); const b = await r.blob();
  document.getElementById("view").src = URL.createObjectURL(b);
  document.getElementById("stat").textContent =
      "round trip "+(performance.now()-t0).toFixed(0)+" ms";
  const s = await (await fetch("/stats")).json();
  document.getElementById("srvstat").textContent =
      "server render last "+s.last_ms.toFixed(1)+" ms / avg "
      +s.avg_ms.toFixed(1)+" ms ("+s.fps.toFixed(1)+" fps, "
      +s.frames+" frames)";
  busy=false; if(dirty){dirty=false;refresh()}
}
document.getElementById("capture").onclick = async ()=>{
  const r = await (await fetch("/capture?"+params())).json();
  document.getElementById("saved").textContent = r.path;
};
els.forEach(e=>e.addEventListener("input",refresh)); refresh();
</script></body></html>"""


class VisualizerState:
    """Render core with plane caching (viz/renderer.py backbone-cache
    widget) and per-config jit reuse."""

    def __init__(self, G, params, capture_dir="_screenshots"):
        import collections
        self.G = G
        self.params = params
        self.capture_dir = capture_dir
        self._plane_cache = {}
        self._render_jit = {}
        # Performance readout (viz/performance_widget.py): rolling
        # server-side render wall-clock over the last 20 frames.
        self._times = collections.deque(maxlen=20)
        self._frames = 0

    def stats(self):
        times = list(self._times)
        avg = (sum(times) / len(times)) if times else 0.0
        return {"last_ms": times[-1] * 1e3 if times else 0.0,
                "avg_ms": avg * 1e3,
                "fps": (1.0 / avg) if avg > 0 else 0.0,
                "frames": self._frames}

    def capture(self, **kwargs):
        """Save the current render as PNG (viz/capture_widget.py)."""
        import os
        import time

        from PIL import Image

        from tgi.utils.image import to_uint8
        img = self.render(**kwargs)
        os.makedirs(self.capture_dir, exist_ok=True)
        path = os.path.join(self.capture_dir,
                            f"capture_{time.strftime('%Y%m%d_%H%M%S')}_"
                            f"{self._frames:05d}.png")
        Image.fromarray(to_uint8(img), "RGB").save(path)
        return path

    def _ws(self, G, seed, trunc, cutoff, cond):
        z = jax.random.normal(jax.random.PRNGKey(seed), (1, G.cfg.z_dim))
        # cutoff=0 means "truncate no layers" (x[:, :0] is a no-op slice),
        # NOT the all-layers None path — pass the integer through.
        return G.mapping(self.params, z, cond, truncation_psi=trunc,
                         truncation_cutoff=int(cutoff))

    def render(self, seed=0, yaw=0.0, pitch=0.0, trunc=0.7, cutoff=14,
               rtype="image", mult=2, fov=18.837, cyaw=0.0, cpitch=0.0,
               mixseed=-1, mixlayer=7, noise="const", layerch=0):
        import time
        t0 = time.perf_counter()
        out = self._render(seed, yaw, pitch, trunc, cutoff, rtype, mult,
                           fov, cyaw, cpitch, mixseed, mixlayer, noise,
                           layerch)
        self._times.append(time.perf_counter() - t0)
        self._frames += 1
        return out

    def _render(self, seed, yaw, pitch, trunc, cutoff, rtype, mult, fov,
                cyaw, cpitch, mixseed, mixlayer, noise, layerch):
        from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                        pack_camera)
        G = self.G
        rk = G.cfg.rendering_kwargs
        if mult != 1:
            G = type(G)(G.cfg.with_rendering(
                depth_resolution=int(rk["depth_resolution"] * mult),
                depth_resolution_importance=int(
                    rk["depth_resolution_importance"] * mult)))

        cam = look_at_pose(np.pi / 2 + yaw, np.pi / 2 + pitch,
                           jnp.asarray([0., 0., 0.2]), radius=2.7)
        c = pack_camera(cam[None], fov_to_intrinsics(fov))

        # Conditioning pose (viz/pose_widget's cond-pose control).
        cond = pack_camera(
            look_at_pose(np.pi / 2 + cyaw, np.pi / 2 + cpitch,
                         jnp.asarray([0., 0., 0.2]), radius=2.7)[None],
            fov_to_intrinsics(18.837))

        ckey = (seed, round(trunc, 3), int(cutoff), round(cyaw, 3),
                round(cpitch, 3), int(mixseed), int(mixlayer))
        if ckey not in self._plane_cache:
            ws = self._ws(G, seed, trunc, cutoff, cond)
            if mixseed >= 0:
                # Style mixing (viz/stylemix_widget): layers >= mixlayer
                # take the mixing seed's w.
                ws_b = self._ws(G, int(mixseed), trunc, cutoff, cond)
                n = ws.shape[1]
                sel = (jnp.arange(n)[None, :, None] >= int(mixlayer))
                ws = jnp.where(sel, ws_b, ws)
            planes = G.backbone_planes(self.params, ws)
            self._plane_cache = {ckey: (ws, planes)}   # keep last only
        ws, planes = self._plane_cache[ckey]

        if rtype == "planes":
            # Layer viewer (viz/layer_widget): show one tri-plane channel.
            p = np.asarray(planes.astype(jnp.float32))[0]  # [3, 32, H, W]
            idx = int(layerch)
            img = p[(idx // 32) % 3, idx % 32]
            lo, hi = np.percentile(img, [1, 99])
            img = np.clip((img - lo) / max(hi - lo, 1e-8), 0, 1)
            return np.repeat(img[None], 3, axis=0) * 2 - 1

        jkey = (mult, noise)
        if jkey not in self._render_jit:
            Gm = G

            @jax.jit
            def render(params, ws, c, planes, key):
                return Gm.synthesis(params, ws, c, det=True, planes=planes,
                                    noise_mode=noise, key=key)

            self._render_jit[jkey] = render
        out = self._render_jit[jkey](self.params, ws, c, planes,
                                     jax.random.PRNGKey(seed))

        img = np.asarray(out[rtype])[0]
        if rtype == "image_depth":
            d = (img - img.min()) / (np.ptp(img) + 1e-8)
            img = np.repeat(d, 3, axis=0) * 2 - 1
        return img


def make_handler(state: VisualizerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(PAGE.encode())
                return
            if url.path == "/stats":
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps(state.stats()).encode())
                return
            if url.path not in ("/render", "/capture"):
                self.send_response(404)
                self.end_headers()
                return
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            kwargs = dict(
                seed=int(q.get("seed", 0)), yaw=float(q.get("yaw", 0)),
                pitch=float(q.get("pitch", 0)),
                trunc=float(q.get("trunc", 0.7)),
                cutoff=int(q.get("cutoff", 14)),
                rtype=q.get("rtype", "image"), mult=int(q.get("mult", 2)),
                fov=float(q.get("fov", 18.837)),
                cyaw=float(q.get("cyaw", 0)),
                cpitch=float(q.get("cpitch", 0)),
                mixseed=int(q.get("mixseed", -1)),
                mixlayer=int(q.get("mixlayer", 7)),
                noise=q.get("noise", "const"),
                layerch=int(q.get("layerch", 0)))
            if url.path == "/capture":
                path = state.capture(**kwargs)
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"path": path}).encode())
                return
            img = state.render(**kwargs)
            from tgi.utils.image import to_uint8
            from PIL import Image
            buf = io.BytesIO()
            Image.fromarray(to_uint8(img), "RGB").save(buf, format="PNG")
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(buf.getvalue())

    return Handler


def serve(G, params, port=8000):
    state = VisualizerState(G, params)
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(state))
    print(f"tgi visualizer on http://127.0.0.1:{port}")
    server.serve_forever()


def main():
    import click

    @click.command()
    @click.option("--network", required=True)
    @click.option("--port", default=8000)
    def cli(network, port):
        from tgi.apps.run_pti import load_any_generator
        G, params = load_any_generator(network)
        serve(G, params, port)

    cli()


if __name__ == "__main__":
    main()
