"""Full incremental SLAM on REAL-texture footage (VERDICT r4 #5).

test_real_imagery.py validates two-view SfM and sparse tracks on real
photographs; here the FULL pipeline — bootstrap, PnP chaining, windowed
BA, loop closure, and the stereo rig — runs on multi-frame sequences
whose pixels are real photographic statistics: a moving virtual camera
over the reference's hand photograph (reference C20; 3264x2448, never
read by the reference's own code) rendered with a consistent 3-D scene
model, encoded to lossy video, decoded, and tracked to completion with
quantitative trajectory and reprojection gates."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
cv2 = pytest.importorskip("cv2")

from optical_flow_tpu.slam import incremental_slam


@pytest.fixture(scope="module")
def real_base(reference_dir):
    """The hand photograph as scene texture: real sensor noise, shading,
    texture-rich and texture-poor regions."""
    p = reference_dir / "testdata" / "hand1.jpg"
    img = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
    if img is None:
        pytest.skip("hand1.jpg unreadable")
    return cv2.resize(img, (416, 320), interpolation=cv2.INTER_AREA)


def _scene(base, seed=7):
    h, w = base.shape
    rng = np.random.RandomState(seed)
    depth = np.clip(
        4.0 + 6.0 * cv2.resize(
            rng.rand(10, 13).astype(np.float32), (w, h),
            interpolation=cv2.INTER_CUBIC,
        ),
        3.0, 12.0,
    )
    xs, ys = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32)
    )
    return depth, xs, ys


def _view(base, depth, xs, ys, focal, cx_w, cy_w):
    """Exact render of the textured surface from camera center
    (cx_w, cy_w, 0), R = I — the fixed-point dest->source inversion of
    test_stereo_slam._view, so the sequence is consistent with ONE true
    3-D scene (metric claims depend on it)."""
    u, v = xs.copy(), ys.copy()
    for _ in range(8):
        d = cv2.remap(depth, u, v, cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_REPLICATE)
        u = (xs + focal * float(cx_w) / d).astype(np.float32)
        v = (ys + focal * float(cy_w) / d).astype(np.float32)
    return cv2.remap(base, u, v, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_REFLECT_101)


def _render_loop(base, n_frames=12, focal=400.0, seed=7):
    depth, xs, ys = _scene(base, seed)
    frames, centers = [], []
    for k in range(n_frames):
        th = 2 * np.pi * k / n_frames
        cx_w = 0.12 * np.sin(th)
        cy_w = 0.08 * (1 - np.cos(th))
        frames.append(_view(base, depth, xs, ys, focal, cx_w, cy_w))
        centers.append((cx_w, cy_w, 0.0))
    return frames, np.asarray(centers), focal


def test_incremental_slam_on_real_texture_video(real_base, tmp_path):
    """Moving camera over the real photograph -> lossy mp4 -> decoder ->
    streaming incremental SLAM with loop closure. Real pixel statistics
    ride the WHOLE pipeline (corner quality varies with the photo's
    texture, codec noise on real gradients)."""
    from optical_flow_tpu.io.video_reader import read_frames
    from optical_flow_tpu.pipeline.preprocess import bgr_to_gray

    frames, centers, focal = _render_loop(real_base, n_frames=20)
    h, w = frames[0].shape
    path = str(tmp_path / "hand_loop.mp4")
    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 20.0, (w, h), False
    )
    if not vw.isOpened():
        pytest.skip("no mp4 encoder available")
    for f in frames:
        vw.write(f)
    vw.release()

    gray_iter = (
        np.asarray(bgr_to_gray(jnp.asarray(f))) for f in read_frames(path)
    )
    res = incremental_slam(
        gray_iter, focal, window=8, kf_min_disparity=4.0,
        loop_min_separation=5, loop_min_inliers=30, min_tracks=40,
    )
    assert res is not None
    assert res.keyframes[-1] == 19
    assert res.points.shape[0] >= 50
    assert res.rmse is not None and res.rmse < 5.0, res.rmse
    assert res.loop_edges, "no loop closed on real-texture video"
    est = res.centers()
    true = np.asarray([centers[i] for i in res.keyframes])
    scale = np.linalg.norm(true[1]) / max(np.linalg.norm(est[1]), 1e-9)
    err = np.linalg.norm(est * scale - true, axis=1)
    assert err.mean() < 0.06, err  # loop radius 0.12
    assert err.max() < 0.12, err


def test_stereo_slam_metric_on_real_texture(real_base):
    """Stereo variant: rectified pairs rendered from the real photograph;
    the estimated centers must match ground truth in ABSOLUTE baseline
    units (no scale fit), and the recovered landmark depths must sit in
    the rendered depth band."""
    depth, xs, ys = _scene(real_base)
    focal, baseline = 400.0, 0.3
    pairs, centers = [], []
    for k in range(10):
        th = 2 * np.pi * k / 10
        cx_w = 0.12 * np.sin(th)
        cy_w = 0.08 * (1 - np.cos(th))
        left = _view(real_base, depth, xs, ys, focal, cx_w, cy_w)
        right = _view(real_base, depth, xs, ys, focal, cx_w + baseline, cy_w)
        pairs.append((left, right))
        centers.append((cx_w, cy_w, 0.0))
    centers = np.asarray(centers)
    res = incremental_slam(
        pairs, focal, stereo_baseline=baseline,
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
    assert err.mean() < 0.05, err
    assert err.max() < 0.10, err
    z = res.points[:, 2]
    assert 3.0 < np.median(z) < 12.0, np.median(z)
