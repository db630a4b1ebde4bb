"""Annotated-output tests: VideoWriter backends + the C17 scrubbing demo
(reference parity: OpticalFlowDemo.cpp:265-274 stepping + :211-254 arrow
rendering; ParallelVideoPyr.cpp:884-891 circle overlay)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from optical_flow_tpu.io.video_writer import VideoWriter
from optical_flow_tpu.utils.goldens import reference_dir


def _frames(n=4, h=48, w=64):
    r = np.random.RandomState(3)
    return [(r.rand(h, w, 3) * 255).astype(np.uint8) for _ in range(n)]


def test_png_writer_roundtrip(tmp_path):
    out = tmp_path / "outdir"
    with VideoWriter(out, backend="png") as w:
        for f in _frames():
            w.write(f)
    assert w.frames_written == 4
    names = sorted(os.listdir(out))
    assert names == [f"frame_{i:05d}.png" for i in range(4)]
    from PIL import Image

    back = np.asarray(Image.open(out / names[0]))
    np.testing.assert_array_equal(back, _frames()[0])


def test_encoded_writer_roundtrip(tmp_path):
    out = tmp_path / "clip.mp4"
    frames = _frames(6)
    try:
        with VideoWriter(out, fps=10) as w:
            for f in frames:
                w.write(f)
    except (RuntimeError, ImportError) as e:
        pytest.skip(f"no encoder available: {e}")
    assert out.exists() and out.stat().st_size > 0
    from optical_flow_tpu.io.video_reader import read_frames

    back = list(read_frames(out))
    assert len(back) == 6
    assert back[0].shape == frames[0].shape


def test_writer_rejects_bad_shapes(tmp_path):
    w = VideoWriter(tmp_path / "x.mp4")
    with pytest.raises(ValueError, match="RGB"):
        w.write(np.zeros((4, 4), np.uint8))
    w.close()


def test_pair_scrub_demo_scripted(tmp_path):
    """The C17 demo end to end: forward/forward/back stepping over pacman,
    arrow-rendered PNG per pair; the backward step must re-render an
    EARLIER pair (the legacy demo's 'b' key)."""
    ref = reference_dir()
    if ref is None or not (ref / "pacman.mp4").exists():
        pytest.skip("pacman.mp4 not available")
    demo = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "examples", "pair_scrub.py"
    )
    out = tmp_path / "scrub"
    res = subprocess.run(
        [
            sys.executable, demo,
            "--input", str(ref / "pacman.mp4"),
            "--script", "fbq",
            "--outdir", str(out),
            "--cpu", "--max-frames", "4",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert sorted(os.listdir(out)) == ["pair_0000.png", "pair_0001.png"]
    # f then b: pair 1 rendered, then pair 0 re-rendered (appears twice)
    assert res.stdout.count("pair 0->1") == 2, res.stdout
    assert res.stdout.count("pair 1->2") == 1, res.stdout
