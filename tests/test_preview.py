"""Live MJPEG preview (io/preview.py): the headless-native counterpart
of the reference's imshow window (ParallelVideoPyr.cpp:890-891) — an
HTTP multipart stream of the annotated frames, latest-frame-wins, never
stalling the pipeline."""

import threading
import urllib.request

import numpy as np
import pytest

from optical_flow_tpu.io.preview import MjpegPreview, _BOUNDARY


def _frame(seed=0, h=48, w=64):
    return (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)


def test_frame_endpoint_serves_latest_jpeg():
    with MjpegPreview(host="127.0.0.1", port=0) as prev:
        prev.push(_frame(1))
        url = f"http://127.0.0.1:{prev.address[1]}/frame.jpg"
        data = urllib.request.urlopen(url, timeout=10).read()
    assert data[:2] == b"\xff\xd8"  # JPEG SOI
    cv2 = pytest.importorskip("cv2")
    img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    assert img.shape == (48, 64, 3)


def test_stream_delivers_successive_frames():
    with MjpegPreview(host="127.0.0.1", port=0) as prev:
        url = f"http://127.0.0.1:{prev.address[1]}/stream"
        got = []
        done = threading.Event()

        def reader():
            resp = urllib.request.urlopen(url, timeout=10)
            assert _BOUNDARY in resp.headers["Content-Type"]
            buf = b""
            while len(got) < 3:
                chunk = resp.read(4096)
                if not chunk:
                    break
                buf += chunk
                while True:
                    soi = buf.find(b"\xff\xd8")
                    eoi = buf.find(b"\xff\xd9", soi + 2)
                    if soi < 0 or eoi < 0:
                        break
                    got.append(buf[soi:eoi + 2])
                    buf = buf[eoi + 2:]
            done.set()

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        for s in range(10):  # more pushes than needed: reader may skip
            prev.push(_frame(s))
            if done.wait(0.05):
                break
        assert done.wait(10), "stream reader never saw 3 frames"
    assert len(got) >= 3
    assert all(j[:2] == b"\xff\xd8" for j in got[:3])


def test_push_never_blocks_without_viewers():
    import time

    with MjpegPreview(host="127.0.0.1", port=0) as prev:
        t0 = time.perf_counter()
        for s in range(20):
            prev.push(_frame(s, h=32, w=32))
        took = time.perf_counter() - t0
    assert took < 2.0, took  # encode-only cost, no client backpressure


def test_gray_frames_supported():
    with MjpegPreview(host="127.0.0.1", port=0) as prev:
        prev.push((np.ones((32, 40), np.float32) * 128).astype(np.uint8))
        url = f"http://127.0.0.1:{prev.address[1]}/frame.jpg"
        data = urllib.request.urlopen(url, timeout=10).read()
    assert data[:2] == b"\xff\xd8"


def test_cli_video_preview_end_to_end(capsys):
    """`video --preview 0` on pacman: the stream URL is announced and the
    /frame.jpg endpoint serves the annotated frame while the loop runs."""
    import re
    import sys

    from optical_flow_tpu.utils.goldens import reference_dir

    ref = reference_dir()
    if ref is None or not (ref / "pacman.mp4").exists():
        pytest.skip("pacman.mp4 not available")
    import optical_flow_tpu.__main__ as cli

    # grab the ephemeral port from stderr, then fetch DURING the run from
    # a helper thread (the server dies when the loop ends)
    fetched = {}
    argv = sys.argv
    try:
        sys.argv = [
            "x", "video", "--input", str(ref / "pacman.mp4"),
            "--frames", "8", "--size", "96", "--fast", "--preview", "0",
        ]
        from optical_flow_tpu.io import preview as prevmod

        orig_push = prevmod.MjpegPreview.push

        def push_and_fetch(self, frame):
            orig_push(self, frame)
            if "data" not in fetched:
                url = f"http://127.0.0.1:{self.address[1]}/frame.jpg"
                fetched["data"] = urllib.request.urlopen(url, timeout=10).read()
        prevmod.MjpegPreview.push = push_and_fetch
        try:
            cli.main()
        finally:
            prevmod.MjpegPreview.push = orig_push
    finally:
        sys.argv = argv
    err = capsys.readouterr().err
    assert re.search(r"live preview at http://\S+:\d+/", err), err
    assert fetched["data"][:2] == b"\xff\xd8"
