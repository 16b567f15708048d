"""Interactive viewer smoke test: serve, refine, and control over HTTP."""

import json
import threading
import time
import urllib.request

import numpy as np


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def test_viewer_serves_and_refines():
    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.app.viewer import run_viewer

    scene = cornell_scene(width=24, height=24, max_depth=2)
    port = 18731
    stop = threading.Event()
    t = threading.Thread(
        target=run_viewer,
        args=(scene, scene.options),
        kwargs=dict(port=port, max_spp=100000, stop_event=stop),
        daemon=True,
    )
    t.start()

    # wait for the first frame
    deadline = time.time() + 120
    png = b""
    while time.time() < deadline:
        try:
            png = _get(f"http://127.0.0.1:{port}/frame.png")
            if png.startswith(b"\x89PNG"):
                break
        except OSError:
            pass
        time.sleep(0.5)
    assert png.startswith(b"\x89PNG"), "no frame served"

    page = _get(f"http://127.0.0.1:{port}/")
    assert b"tinsel-tpu" in page

    status = json.loads(_get(f"http://127.0.0.1:{port}/status"))
    assert status["spp"] >= 1

    # controls: exposure + denoise toggle + pause round-trips
    _get(f"http://127.0.0.1:{port}/ctl?exposure=up")
    _get(f"http://127.0.0.1:{port}/ctl?denoise=toggle")
    s2 = json.loads(_get(f"http://127.0.0.1:{port}/status"))
    assert s2["exposure"] > status["exposure"]
    assert s2["denoise"] is True

    # progressive refinement: spp grows
    spp0 = s2["spp"]
    deadline = time.time() + 120
    while time.time() < deadline:
        s3 = json.loads(_get(f"http://127.0.0.1:{port}/status"))
        if s3["spp"] > spp0:
            break
        time.sleep(0.5)
    assert s3["spp"] > spp0, "no progressive refinement"
    stop.set()
    t.join(timeout=60)
    assert not t.is_alive()
