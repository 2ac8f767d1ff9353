"""Live viewer (runtime/viewer.py): page, frame stream, runtime keys,
export, quick-pass abort — the reference's interactive window surface
(main.rs:297-532) over HTTP."""

import json
import os
import threading
import time
import urllib.request

import pytest

from mrt.runtime.config import RenderConfig
from mrt.runtime.viewer import serve


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        return r.read()


@pytest.fixture(scope="module")
def viewer(tmp_path_factory):
    out = tmp_path_factory.mktemp("viewer") / "live.png"
    config = RenderConfig(scene="rtiow", width=32, height=24, spp=8,
                          samples_per_pass=1, max_depth=4, seed=2,
                          serve=True, port=7893, output=str(out))
    stop = threading.Event()
    t = threading.Thread(target=serve, args=(config,),
                         kwargs=dict(log=lambda *a: None, stop=stop),
                         daemon=True)
    t.start()
    # Wait for the first frame to be published.
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            if _get(7893, "/status"):
                break
        except Exception:
            time.sleep(0.3)
    yield config
    # Wind the render thread down cleanly: a daemon thread killed at
    # interpreter exit mid-XLA-call aborts the whole process (SIGABRT,
    # "FATAL: exception not rethrown").
    stop.set()
    t.join(timeout=60)


def test_page_and_status(viewer):
    page = _get(viewer.port, "/").decode()
    assert "mrt" in page and "keydown" in page
    st = json.loads(_get(viewer.port, "/status"))
    assert st["mode"] == "default"


def test_frame_png_streams(viewer):
    deadline = time.time() + 120
    png = b""
    while time.time() < deadline:
        try:
            png = _get(viewer.port, "/frame.png")
            break
        except urllib.error.HTTPError:
            time.sleep(0.3)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_runtime_display_mode_keys(viewer):
    _get(viewer.port, "/key?k=3")    # depth mode (main.rs:429-433)
    deadline = time.time() + 30
    while time.time() < deadline:
        st = json.loads(_get(viewer.port, "/status"))
        if st["mode"] == "depth":
            break
        time.sleep(0.2)
    assert st["mode"] == "depth"
    _get(viewer.port, "/key?k=1")


def test_export_key_writes_png(viewer):
    _get(viewer.port, "/key?k=e")    # export (main.rs:418-428)
    deadline = time.time() + 60
    while time.time() < deadline:
        if os.path.exists(viewer.output):
            break
        time.sleep(0.3)
    assert os.path.exists(viewer.output)


def test_quick_pass_toggle(viewer):
    _get(viewer.port, "/key?k=%60")  # backtick (main.rs:434-441)
    deadline = time.time() + 120
    ok = False
    while time.time() < deadline:
        st = json.loads(_get(viewer.port, "/status"))
        if st["quick_pass"]:
            ok = True
            break
        time.sleep(0.3)
    assert ok
    _get(viewer.port, "/key?k=%60")  # toggle back; render restarts
    deadline = time.time() + 120
    while time.time() < deadline:
        st = json.loads(_get(viewer.port, "/status"))
        if not st["quick_pass"]:
            break
        time.sleep(0.3)
    assert not st["quick_pass"]


def test_play_mode_records_and_replays_bit_identically(tmp_path):
    """VERDICT r2 #6: a served --play session responds to live keys and
    its recording replays bit-identically (main.rs:333-360,500-532;
    scenes/mario.rs:318-343)."""
    from mrt.runtime.viewer import png_bytes
    from mrt.runtime.input import InputReplay
    from mrt.runtime.driver import render_frame
    from mrt.runtime.film import DisplayMode
    from mrt import scenes
    import dataclasses

    rec = tmp_path / "played.bin"
    config = RenderConfig(scene="playground", width=48, height=27,
                          samples_per_frame=2, max_depth=3, seed=3,
                          serve=True, play=True, port=7894,
                          write_input=str(rec),
                          output=str(tmp_path / "play.png"))
    stop = threading.Event()
    t = threading.Thread(target=serve, args=(config,),
                         kwargs=dict(log=lambda *a: None, stop=stop),
                         daemon=True)
    t.start()

    def status():
        return json.loads(_get(7894, "/status"))

    def wait_frame(n, deadline_s=240):
        deadline = time.time() + deadline_s
        while time.time() < deadline:
            try:
                st = status()
                if st.get("frame", -1) >= n:
                    return st
            except Exception:
                pass
            time.sleep(0.2)
        raise AssertionError(f"frame {n} never reached")

    wait_frame(1)
    _get(7894, "/input?held=w")          # run forward
    wait_frame(4)
    _get(7894, "/input?held=w,%20")      # + jump (space)
    wait_frame(7)
    _get(7894, "/input?held=")           # release
    st = wait_frame(9)
    # Snapshot the live frame counter, then stop cleanly.
    stop.set()
    t.join(timeout=120)
    assert not t.is_alive()

    assert rec.exists()
    replay = InputReplay(str(rec))
    frames = len(replay.frames)
    assert frames >= 10
    assert any(f.stick_y > 0 for f in replay.frames), "w never recorded"
    assert any(f.button_a for f in replay.frames), "jump never recorded"

    # Replay the recording through a fresh scene: the final frame's
    # render must equal the final live frame (exported on shutdown)
    # pixel for pixel.
    import numpy as np
    from mrt.runtime.io import load_png

    live = load_png(config.output)[..., :3]
    sc = scenes.get("playground")(aspect_ratio=config.aspect_ratio)
    fcfg = dataclasses.replace(config, spp=config.samples_per_frame)
    total = max(config.total_frames, 1)
    for frame in range(frames):
        scene, camera = sc.generate(frame / total, frame,
                                    replay.frame(frame))
    film = render_frame(scene, camera, fcfg)
    rgb = np.asarray(film.to_rgb_bytes(DisplayMode.DEFAULT))[::-1]
    np.testing.assert_array_equal(
        rgb, (live * 255.0).round().astype(np.uint8),
        err_msg="replayed final frame differs from the live one")
