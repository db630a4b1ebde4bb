"""Smoke tests for utility modules (viz, profiling)."""

import numpy as np

import jax.numpy as jnp

from optical_flow_tpu.utils.profiling import Timer, device_loop_time, flow_roofline
from optical_flow_tpu.utils.viz import draw_arrows, draw_circle, flow_to_color


def test_flow_to_color_shapes_and_range():
    u = np.random.RandomState(0).randn(32, 48).astype(np.float32)
    v = np.random.RandomState(1).randn(32, 48).astype(np.float32)
    img = flow_to_color(u, v)
    assert img.shape == (32, 48, 3) and img.dtype == np.uint8
    # zero flow -> black
    z = flow_to_color(np.zeros((8, 8)), np.zeros((8, 8)), max_mag=1.0)
    assert z.max() == 0


def test_draw_circle_and_arrows():
    img = np.zeros((64, 64, 3), np.uint8)
    out = draw_circle(img, 32, 32, 10, color=(255, 0, 0))
    assert (out[:, :, 0] == 255).any()
    assert img.max() == 0  # input untouched
    pts = np.array([[10.0, 10.0], [50.0, 50.0]])
    flows = np.array([[5.0, 0.0], [-5.0, 2.0]])
    out2 = draw_arrows(img, pts, flows)
    assert (out2[:, :, 1] == 255).any()  # green for dx>0
    assert (out2[:, :, 0] == 255).any()  # red for dx<0


def test_timer_segments():
    t = Timer()
    with t.segment("a"):
        pass
    with t.segment("a"):
        pass
    with t.segment("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    rep = t.report()
    assert "a" in rep and "ms/call" in rep


def test_device_loop_time_runs():
    dt = device_loop_time(lambda x: x * 2.0, (jnp.ones((16, 16)),), iters=3)
    assert dt > 0


def test_flow_roofline_model():
    r = flow_roofline(1080, 1080)
    assert r["bound"] in ("memory", "compute")
    assert r["sol_us"] >= max(r["t_mem_us"], r["t_compute_us"]) - 1e-9
    assert r["sol_fps"] > 0
