"""Interactive viewer smoke test: serve, refine, and control over HTTP."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end tier


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
    assert s2["denoise"] == "nlm"  # toggle cycles off->nlm->guided
    _get(f"http://127.0.0.1:{port}/ctl?denoise=toggle")
    s3 = json.loads(_get(f"http://127.0.0.1:{port}/status"))
    assert s3["denoise"] == "guided"

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


def test_flycam_quat_roundtrip():
    """yaw/pitch extracted from a composed quat reproduce the forward dir."""
    import jax.numpy as jnp

    from tinsel_tpu.app.viewer import FlyCamera
    from tinsel_tpu.core.math import quat_rotate

    for yaw, pitch in [(0.3, 0.2), (-1.2, -0.7), (2.9, 1.1), (0.0, 0.0)]:
        f = FlyCamera(np.zeros(3), np.array([0, 0, 0, 1], np.float32), 1.0)
        f.yaw, f.pitch = yaw, pitch
        q = f.quat()
        # re-derive from the quaternion: FlyCamera's own extraction
        g = FlyCamera(np.zeros(3), q, 1.0)
        assert abs(np.sin(g.yaw) - np.sin(yaw)) < 1e-5
        assert abs(np.cos(g.yaw) - np.cos(yaw)) < 1e-5
        assert abs(g.pitch - pitch) < 1e-5
        # and the composed quat actually looks along the fly-cam forward
        fwd = np.asarray(
            quat_rotate(jnp.asarray(q), jnp.asarray([0.0, 0.0, -1.0]))
        )
        expect = np.array(
            [-np.sin(yaw) * np.cos(pitch), np.sin(pitch),
             -np.cos(yaw) * np.cos(pitch)]
        )
        np.testing.assert_allclose(fwd, expect, atol=1e-5)


def test_flycam_moves():
    from tinsel_tpu.app.viewer import FlyCamera

    f = FlyCamera(np.zeros(3), np.array([0, 0, 0, 1], np.float32), 2.0)
    f.move("f")  # default camera looks down -z
    np.testing.assert_allclose(f.position, [0, 0, -2], atol=1e-6)
    f.move("r")
    np.testing.assert_allclose(f.position, [2, 0, -2], atol=1e-6)
    f.move("u")
    np.testing.assert_allclose(f.position, [2, 2, -2], atol=1e-6)
    f.rotate("l", np.pi / 2)  # now facing -x
    f.move("f")
    np.testing.assert_allclose(f.position, [0, 2, -2], atol=1e-5)


def test_viewer_flycam_over_http():
    from tinsel_tpu.scene.presets import cornell_scene
    from tinsel_tpu.app.viewer import run_viewer

    scene = cornell_scene(width=16, height=16, max_depth=2)
    port = 18732
    stop = threading.Event()
    t = threading.Thread(
        target=run_viewer,
        args=(scene, scene.options),
        kwargs=dict(port=port, max_spp=100000, stop_event=stop),
        daemon=True,
    )
    t.start()
    try:
        deadline = time.time() + 120
        s = None
        while time.time() < deadline:
            try:
                s = json.loads(_get(f"http://127.0.0.1:{port}/status"))
                if s["spp"] >= 1:
                    break
            except OSError:
                pass
            time.sleep(0.5)
        assert s is not None and s["spp"] >= 1
        pos0 = np.array(s["cam_pos"])

        _get(f"http://127.0.0.1:{port}/ctl?move=f")
        _get(f"http://127.0.0.1:{port}/ctl?rot=l")
        _get(f"http://127.0.0.1:{port}/ctl?speed=up")
        deadline = time.time() + 60
        while time.time() < deadline:
            s2 = json.loads(_get(f"http://127.0.0.1:{port}/status"))
            if not np.allclose(np.array(s2["cam_pos"]), pos0):
                break
            time.sleep(0.2)
        assert not np.allclose(np.array(s2["cam_pos"]), pos0), "camera moved"
        assert s2["fly_speed"] > s["fly_speed"]
        # accumulation restarted on camera change, then refines again
        deadline = time.time() + 60
        ok = False
        while time.time() < deadline:
            s3 = json.loads(_get(f"http://127.0.0.1:{port}/status"))
            if s3["spp"] >= 1 and np.allclose(
                np.array(s3["cam_pos"]), np.array(s2["cam_pos"])
            ):
                ok = True
                break
            time.sleep(0.2)
        assert ok, "no refinement after camera move"
    finally:
        stop.set()
        t.join(timeout=60)
    assert not t.is_alive()
