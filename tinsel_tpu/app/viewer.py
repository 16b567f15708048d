"""Interactive progressive viewer: a tiny built-in HTTP page around the
chunked accumulate loop.

The reference's GLUT loop (main.cpp:223-329, 359-529) shows the
accumulation buffer as it refines, with keys for render mode
(1=normals 2=complexity 3=pathtrace), exposure +/- and an NLM toggle. A
remote/headless TPU has no GL surface, so the TPU-native equivalent is a
local web page: the render loop keeps accumulating passes and re-encodes
the resolved PNG; the page polls it and posts control changes
(exposure, mode, denoise, pause, restart). Mode changes reset the
accumulation buffer, exactly like the reference's g_sampleCount reset
(main.cpp:390).

Usage: `tinsel-tpu scene.tin -view [-port 8000]`, then open
http://localhost:8000/.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>tinsel-tpu viewer</title><style>
body {{ background:#15171a; color:#dfe3e8; font:14px system-ui; margin:24px }}
img {{ image-rendering: pixelated; width:{disp_w}px; border:1px solid #333 }}
button {{ margin:2px; padding:4px 10px }}
#bar {{ margin:8px 0 }}
</style></head><body>
<h3>tinsel-tpu — progressive viewer</h3>
<div id="bar">
<button onclick="ctl('mode=pathtrace')">pathtrace</button>
<button onclick="ctl('mode=normals')">normals</button>
<button onclick="ctl('mode=complexity')">complexity</button>
<button onclick="ctl('exposure=down')">exposure −</button>
<button onclick="ctl('exposure=up')">exposure +</button>
<button onclick="ctl('denoise=toggle')">denoise</button>
<button onclick="ctl('pause=toggle')">pause</button>
<button onclick="ctl('restart=1')">restart</button>
<span id="status"></span>
</div>
<img id="view" src="/frame.png">
<script>
function ctl(q) {{ fetch('/ctl?' + q); }}
setInterval(() => {{
  document.getElementById('view').src = '/frame.png?' + Date.now();
  fetch('/status').then(r => r.json()).then(s => {{
    document.getElementById('status').textContent =
      ` ${{s.spp}} spp  ${{s.ms_per_spp.toFixed(1)}} ms/spp  ` +
      `exposure ${{s.exposure.toFixed(2)}}  mode ${{s.mode}}` +
      (s.denoise ? '  [NLM]' : '') + (s.paused ? '  [paused]' : '');
  }});
}}, 500);
</script></body></html>"""


class ViewerState:
    def __init__(self, exposure: float):
        self.lock = threading.Lock()
        self.exposure = exposure
        self.mode = "pathtrace"
        self.denoise = False
        self.paused = False
        self.restart = False
        self.png = b""
        self.spp = 0
        self.ms_per_spp = 0.0


def _make_handler(state: ViewerState, disp_w: int):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Cache-Control", "no-store")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self._send(
                    200, "text/html",
                    _PAGE.format(disp_w=disp_w).encode(),
                )
            elif url.path == "/frame.png":
                with state.lock:
                    png = state.png
                self._send(200, "image/png", png or b"")
            elif url.path == "/status":
                with state.lock:
                    body = json.dumps(
                        dict(
                            spp=state.spp,
                            ms_per_spp=state.ms_per_spp,
                            exposure=state.exposure,
                            mode=state.mode,
                            denoise=state.denoise,
                            paused=state.paused,
                        )
                    ).encode()
                self._send(200, "application/json", body)
            elif url.path == "/ctl":
                q = parse_qs(url.query)
                with state.lock:
                    if "exposure" in q:
                        f = 1.25 if q["exposure"][0] == "up" else 0.8
                        state.exposure *= f
                    if "denoise" in q:
                        state.denoise = not state.denoise
                    if "pause" in q:
                        state.paused = not state.paused
                    if "mode" in q and q["mode"][0] in (
                        "pathtrace", "normals", "complexity"
                    ):
                        if q["mode"][0] != state.mode:
                            state.mode = q["mode"][0]
                            state.restart = True
                    if "restart" in q:
                        state.restart = True
                self._send(200, "text/plain", b"ok")
            else:
                self._send(404, "text/plain", b"not found")

    return Handler


def run_viewer(scene, options, seed: int = 0, port: int = 8000,
               nlm_falloff: float = 200.0, nlm_radius: int = 1,
               max_spp: int | None = None, stop_event=None):
    """Serve the viewer and run the progressive accumulate loop forever
    (or until max_spp / stop_event). Blocks; ctrl-C to stop."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..core.color import resolve
    from ..io.png import encode_png
    from ..ops.pallas.nlm import nlm_denoise
    from ..render.camera import CameraParams
    from ..render.renderer import make_accumulate_fn

    state = ViewerState(exposure=options.exposure)
    disp_w = max(options.width * max(1, 512 // max(options.width, 1)), options.width)
    server = ThreadingHTTPServer(
        ("127.0.0.1", port), _make_handler(state, disp_w)
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"viewer: http://localhost:{port}/  (ctrl-C to stop)")

    flat = scene.flatten()
    cam = CameraParams.from_host(scene.camera)
    key = jax.random.key(seed)

    chunk = max(1, min(16, (1 << 20) // max(options.width * options.height, 1)))
    steps = {}

    def get_step(mode):
        if mode not in steps:
            o = dataclasses.replace(options, mode=mode)
            steps[mode] = make_accumulate_fn(
                o, chunk if mode == "pathtrace" else 1
            )
        return steps[mode]

    accum = jnp.zeros((options.height, options.width, 4), jnp.float32)
    spp = 0
    c = 0
    t0 = time.perf_counter()
    try:
        while stop_event is None or not stop_event.is_set():
            with state.lock:
                mode = state.mode
                if state.restart:
                    accum = jnp.zeros_like(accum)
                    spp = 0
                    c = 0
                    t0 = time.perf_counter()
                    state.restart = False
                paused = state.paused
                exposure = state.exposure
                denoise = state.denoise
            if paused or (max_spp is not None and spp >= max_spp):
                time.sleep(0.1)
                continue

            accum = get_step(mode)(accum, flat, cam, key, c)
            this = chunk if mode == "pathtrace" else 1
            spp += this
            c += 1

            if mode == "pathtrace":
                img = resolve(accum, exposure=exposure, limit=options.limit)
                if denoise:
                    img = nlm_denoise(img, nlm_falloff, nlm_radius)
                img_np = np.asarray(img)
            else:
                img_np = np.clip(np.asarray(accum[..., :3]) / max(c, 1), 0, 1)
            png = encode_png(img_np)
            dt = time.perf_counter() - t0
            with state.lock:
                state.png = png
                state.spp = spp
                state.ms_per_spp = dt / max(spp, 1) * 1e3
    except KeyboardInterrupt:
        print("\nviewer stopped")
    finally:
        server.shutdown()
    return accum
