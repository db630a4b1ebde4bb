"""Stereo SLAM (slam/stereo.py + incremental_slam(stereo_baseline=...)):
rectified-pair disparity via sparse LK, metric bootstrap from frame 0,
per-keyframe stereo landmarks — the map comes out in TRUE baseline units,
so trajectory accuracy is asserted WITHOUT the monocular scale fit."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
cv2 = pytest.importorskip("cv2")

from optical_flow_tpu.slam import incremental_slam
from optical_flow_tpu.slam.stereo import (
    split_sbs,
    stereo_backproject,
    stereo_match,
)


def _make_scene(h=320, w=416, focal=400.0, seed=11):
    rng = np.random.RandomState(seed)
    base = cv2.resize(
        rng.rand(80, 104).astype(np.float32), (w, h), interpolation=cv2.INTER_CUBIC
    )
    base = (255 * (base - base.min()) / np.ptp(base)).astype(np.uint8)
    depth = np.clip(
        4.0 + 6.0 * cv2.resize(rng.rand(10, 13).astype(np.float32), (w, h),
                               interpolation=cv2.INTER_CUBIC), 3.0, 12.0
    )
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    return base, depth, xs, ys, focal


def _view(base, depth, xs, ys, focal, cx_w, cy_w):
    """EXACT render of the textured surface (base pixel u has depth
    depth[u]) from camera center (cx_w, cy_w, 0), R = I. The forward map
    is x = u − f·c/d(u); the dest→source inverse u = x + f·c/d(u) is
    solved by fixed-point iteration (d is smooth, the map contracts).
    Unlike test_incremental_slam's single-step approximation (good
    enough for its scale-normalized trajectory claim), stereo asserts
    METRIC geometry, so the render must be consistent with one true 3-D
    scene. Returns the image and the source coords (for ground truth)."""
    u, v = xs.copy(), ys.copy()
    for _ in range(8):
        d = cv2.remap(depth, u, v, cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_REPLICATE)
        u = (xs + focal * float(cx_w) / d).astype(np.float32)
        v = (ys + focal * float(cy_w) / d).astype(np.float32)
    img = cv2.remap(base, u.astype(np.float32), v.astype(np.float32),
                    cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT_101)
    return img, u, v


def _render_stereo_loop(n_frames=10, baseline=0.3, seed=11):
    base, depth, xs, ys, focal = _make_scene(seed=seed)
    pairs, centers, srcs = [], [], []
    for k in range(n_frames):
        th = 2 * np.pi * k / n_frames
        cx_w = 0.12 * np.sin(th)
        cy_w = 0.08 * (1 - np.cos(th))
        left, u, v = _view(base, depth, xs, ys, focal, cx_w, cy_w)
        right, _, _ = _view(base, depth, xs, ys, focal, cx_w + baseline, cy_w)
        pairs.append((left, right))
        centers.append((cx_w, cy_w, 0.0))
        srcs.append((u, v))
    return pairs, np.asarray(centers), focal, depth, srcs


def test_stereo_match_exact_on_constant_depth():
    """A fronto-parallel plane at Z=6: every point's disparity is exactly
    focal*baseline/6 (uniform 20 px shift) — the matcher must land at
    sub-pixel precision and the epipolar gate must hold."""
    from optical_flow_tpu.track.features import good_features_to_track

    base, _, xs, ys, focal = _make_scene()
    depth = np.full(base.shape, 6.0, np.float32)
    left, _, _ = _view(base, depth, xs, ys, focal, 0.0, 0.0)
    right, _, _ = _view(base, depth, xs, ys, focal, 0.3, 0.0)
    pts, valid = good_features_to_track(jnp.asarray(left), 200, 0.01, 8)
    pts = np.asarray(pts, np.float32)[np.asarray(valid)]
    disp, ok, matched = stereo_match(left, right, pts)
    assert ok.sum() >= 50, ok.sum()
    err = np.abs(disp[ok] - focal * 0.3 / 6.0)
    assert np.median(err) < 0.1, np.median(err)
    np.testing.assert_allclose(
        matched[ok, 1], pts[ok, 1], atol=1.5  # rectified: same scanline
    )


def test_stereo_match_recovers_varying_depth():
    """Depth-varying scene: disparity tracks focal*baseline/d(u) within
    the smoothing LK's 31-px window imposes over depth gradients."""
    from optical_flow_tpu.track.features import good_features_to_track

    pairs, _, focal, depth, srcs = _render_stereo_loop(n_frames=2, baseline=0.3)
    left, right = pairs[0]
    pts, valid = good_features_to_track(jnp.asarray(left), 200, 0.01, 8)
    pts = np.asarray(pts, np.float32)[np.asarray(valid)]
    disp, ok, _ = stereo_match(left, right, pts)
    assert ok.sum() >= 50, ok.sum()
    # the scene point seen at left pixel x sits at depth d(u(x)): look up
    # the render's source coords, then its depth, bilinearly
    u_map, v_map = srcs[0]
    px = pts[ok, 0].reshape(-1, 1).astype(np.float32)
    py = pts[ok, 1].reshape(-1, 1).astype(np.float32)
    u = cv2.remap(u_map.astype(np.float32), px, py, cv2.INTER_LINEAR)
    v = cv2.remap(v_map.astype(np.float32), px, py, cv2.INTER_LINEAR)
    d = cv2.remap(depth.astype(np.float32), u, v, cv2.INTER_LINEAR)[:, 0]
    true_disp = focal * 0.3 / d
    err = np.abs(disp[ok] - true_disp)
    assert np.median(err) < 0.75, np.median(err)  # measured ~0.59


def test_stereo_backproject_metric_depth():
    pts = np.asarray([[100.0, 50.0], [200.0, 150.0]], np.float32)
    disp = np.asarray([10.0, 40.0], np.float32)
    X = stereo_backproject(pts, disp, 400.0, 208.0, 160.0, baseline=0.3)
    np.testing.assert_allclose(X[:, 2], 400.0 * 0.3 / disp, rtol=1e-6)
    np.testing.assert_allclose(
        X[0, :2], (pts[0] - [208.0, 160.0]) * X[0, 2] / 400.0, rtol=1e-6
    )


def test_split_sbs():
    f = np.arange(2 * 6 * 8, dtype=np.uint8).reshape(2, 6, 8)
    l, r = split_sbs(f)
    np.testing.assert_array_equal(l, f[..., :4])
    np.testing.assert_array_equal(r, f[..., 4:])


def test_stereo_slam_metric_trajectory():
    """The headline stereo claim: the estimated camera centers match the
    TRUE centers in absolute (baseline) units — no scale normalization.
    The same loop monocularly is only defined up to scale (its test fits
    scale from the ground truth first)."""
    pairs, centers, focal, _, _ = _render_stereo_loop(n_frames=10, baseline=0.3)
    res = incremental_slam(
        pairs, focal, stereo_baseline=0.3,
        loop_min_separation=20,  # pure odometry: no loop assist
        min_tracks=40, window=8,
    )
    assert res is not None
    assert res.keyframes[0] == 0 and res.keyframes[-1] == 9
    assert res.points.shape[0] >= 50
    assert res.rmse is not None and res.rmse < 5.0, res.rmse
    est = res.centers()
    true = np.asarray([centers[i] for i in res.keyframes])
    err = np.linalg.norm(est - true, axis=1)  # METRIC: no scale fit
    assert err.mean() < 0.05, err  # loop radius 0.12
    assert err.max() < 0.10, err
    # the recovered map scale is right: median landmark depth from the
    # origin camera sits inside the rendered 3-12 depth band
    z = res.points[:, 2]
    assert 3.0 < np.median(z) < 12.0, np.median(z)


def test_stereo_slam_survives_thin_first_pair():
    """A featureless first pair can't bootstrap; the pipeline re-seeds on
    a later frame and the world frame is wherever bootstrap succeeds."""
    pairs, centers, focal, _, _ = _render_stereo_loop(n_frames=8, baseline=0.3)
    flat = np.full_like(pairs[0][0], 128)
    pairs = [(flat, flat)] + list(pairs[1:])
    res = incremental_slam(
        pairs, focal, stereo_baseline=0.3, loop_min_separation=20,
        min_tracks=40, window=8,
    )
    assert res is not None
    assert res.keyframes[0] >= 1, res.keyframes
    assert res.keyframes[-1] == 7
    est = res.centers()
    true = np.asarray([centers[i] for i in res.keyframes])
    # world = first successful keyframe's camera: compare RELATIVE metric
    # displacements from it
    err = np.linalg.norm((est - est[0]) - (true - true[0]), axis=1)
    assert err.mean() < 0.05, err


def test_stereo_slam_cli_sbs_video(tmp_path, capsys):
    """The production entry point end-to-end: rendered stereo loop ->
    side-by-side mp4 -> `slam --stereo-sbs <baseline>` -> metric
    trajectory printed and saved."""
    pairs, centers, focal, _, _ = _render_stereo_loop(n_frames=8, baseline=0.3)
    h, w = pairs[0][0].shape
    path = str(tmp_path / "sbs.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 20.0, (2 * w, h), False)
    if not vw.isOpened():
        pytest.skip("no mp4 encoder available")
    for l, r in pairs:
        vw.write(np.concatenate([l, r], axis=1))
    vw.release()

    from optical_flow_tpu.__main__ import main

    out = str(tmp_path / "traj.npz")
    main([
        "--cpu", "slam", "--input", path, "--frames", "8",
        "--stereo-sbs", "0.3", "--focal", str(focal),
        "--kf-disparity", "0", "--out", out,
    ])
    text = capsys.readouterr().out
    assert "map points" in text
    got = np.load(out)
    est = np.stack([-R.T @ t for R, t in zip(got["poses"], got["trans"])])
    true = np.asarray([centers[i] for i in got["keyframes"]])
    # metric (no scale fit), through lossy video encoding
    assert np.linalg.norm(est - true, axis=1).mean() < 0.06


def test_stereo_slam_stacked_input():
    """(2, H, W) stacks are accepted as stereo frames (what a SBS video
    split produces)."""
    pairs, centers, focal, _, _ = _render_stereo_loop(n_frames=6, baseline=0.3)
    stacked = [np.stack(p) for p in pairs]
    res = incremental_slam(
        stacked, focal, stereo_baseline=0.3, loop_min_separation=20,
        min_tracks=40, window=8,
    )
    assert res is not None
    est = res.centers()
    true = np.asarray([centers[i] for i in res.keyframes])
    assert np.linalg.norm(est - true, axis=1).mean() < 0.05


def _textured_rig(baseline, seed=4, h=320, w=416, focal=400.0):
    """High-frequency texture (per-pixel noise, light blur): dense LK's
    3x3 windows need gradients everywhere, unlike the corner-based
    sparse path."""
    rng = np.random.RandomState(seed)
    base = cv2.GaussianBlur((rng.rand(h, w) * 255).astype(np.float32), (5, 5), 1.2)
    base = (255 * (base - base.min()) / np.ptp(base)).astype(np.uint8)
    depth = np.clip(
        4.0 + 6.0 * cv2.resize(rng.rand(10, 13).astype(np.float32), (w, h),
                               interpolation=cv2.INTER_CUBIC), 3.0, 12.0)
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    left, ul, vl = _view(base, depth, xs, ys, focal, 0.0, 0.0)
    right, _, _ = _view(base, depth, xs, ys, focal, baseline, 0.0)
    d_src = cv2.remap(depth.astype(np.float32), ul, vl, cv2.INTER_LINEAR)
    return left, right, focal * baseline / d_src, d_src, focal


def test_dense_disparity_small_baseline_subpixel():
    """Disparities <= 13 px: the dense engine is sub-pixel nearly
    everywhere (measured 0.12 px median, 100% valid)."""
    from optical_flow_tpu.slam.stereo import dense_depth, dense_disparity

    left, right, true_disp, d_src, focal = _textured_rig(baseline=0.1)
    disp, valid = dense_disparity(left, right)
    disp, valid = np.asarray(disp), np.asarray(valid)
    m = np.zeros_like(valid)
    m[20:-20, 20:-60] = True  # interior (outside warp-boundary band)
    assert valid[m].mean() > 0.95, valid[m].mean()
    err = np.abs(disp - true_disp)[valid & m]
    assert np.median(err) < 0.25, np.median(err)
    z = np.asarray(dense_depth(disp, focal, 0.1, jnp.asarray(valid)))
    sel = valid & m & (z > 0)
    zrel = np.abs(z - d_src)[sel] / d_src[sel]
    assert np.median(zrel) < 0.05, np.median(zrel)


def test_dense_disparity_large_baseline_envelope():
    """12-40 px disparities: the clamp-24 default keeps ~90% of pixels
    valid at ~1 px median error (clamp 8 collapses to 33% / 2 px — the
    per-level warp clamp is the binding limit, pinned here)."""
    from optical_flow_tpu.config import FlowConfig
    from optical_flow_tpu.slam.stereo import dense_disparity

    left, right, true_disp, _, _ = _textured_rig(baseline=0.3)
    m = None
    disp, valid = dense_disparity(left, right)
    disp, valid = np.asarray(disp), np.asarray(valid)
    m = np.zeros_like(valid)
    m[20:-20, 20:-60] = True
    assert valid[m].mean() > 0.85, valid[m].mean()
    err = np.abs(disp - true_disp)[valid & m]
    assert np.median(err) < 1.5, np.median(err)

    tight = FlowConfig(mode="corrected", warp_clamp=8.0)
    disp8, valid8 = dense_disparity(left, right, config=tight)
    assert np.asarray(valid8)[m].mean() < 0.6  # the envelope is real
