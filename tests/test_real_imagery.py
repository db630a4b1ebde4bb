"""Tracking / SfM quality gates on REAL photographs and decoded video.

VERDICT r3 #5: every SLAM/stereo/IMU test renders its own scene; the only
real imagery previously exercised was the table pair (dense-flow goldens)
and pacman smoke tests. These tests point the sparse tracker and the
two-view geometry stack at the reference's real assets with quantitative
gates:

  - two-view SfM on table1/table2 (the pair the reference's own goldens
    use, serialOrig.cpp:541-542): corners -> LK tracks -> 5-point RANSAC
    essential -> pose -> triangulation, gated on inlier ratio, cheirality
    and reprojection RMSE;
  - sparse tracks on DECODED pacman.mp4 frames vs cv2.calcOpticalFlowPyrLK
    (position agreement on mutually-tracked corners);
  - the 3264x2448 hand1/hand2 pair (testdata the reference ships but never
    reads — SURVEY.md C20), gated on forward-backward track consistency
    and epipolar-inlier support.

All gates have real slack: they pin "the geometry stack works on real
photographs", not exact values hostage to corner-detector jitter.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from optical_flow_tpu.slam.epipolar import (
    EssentialRansacConfig,
    normalize_pixels,
    ransac_essential_5pt,
    recover_pose,
    refine_pose,
    triangulate,
)
from optical_flow_tpu.track.features import good_features_to_track
from optical_flow_tpu.track.sparse_lk import SparseLKConfig, track_features

from conftest import require_cv2


def _corners_np(img, max_corners=300, quality=0.01, min_distance=12.0):
    pts, valid = good_features_to_track(
        jnp.asarray(img, jnp.float32),
        max_corners=max_corners,
        quality_level=quality,
        min_distance=min_distance,
    )
    pts = np.asarray(pts)[np.asarray(valid)]
    return pts.astype(np.float32)


def _track_np(img1, img2, pts, **cfg):
    new, status, _err = track_features(
        jnp.asarray(img1, jnp.float32),
        jnp.asarray(img2, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        config=SparseLKConfig(**cfg) if cfg else None,
    )
    return np.asarray(new), np.asarray(status).astype(bool)


@pytest.fixture(scope="module")
def hand_pair(reference_dir):
    cv2 = require_cv2()
    p1 = reference_dir / "testdata" / "hand1.jpg"
    p2 = reference_dir / "testdata" / "hand2.jpg"
    a = cv2.imread(str(p1), cv2.IMREAD_GRAYSCALE)
    b = cv2.imread(str(p2), cv2.IMREAD_GRAYSCALE)
    if a is None or b is None:
        pytest.skip("hand pair unreadable")
    # 3264x2448 -> /4: plenty of texture, tractable corner/track shapes
    a = cv2.resize(a, (a.shape[1] // 4, a.shape[0] // 4), interpolation=cv2.INTER_AREA)
    b = cv2.resize(b, (b.shape[1] // 4, b.shape[0] // 4), interpolation=cv2.INTER_AREA)
    return a.astype(np.float32), b.astype(np.float32)


def test_two_view_sfm_on_table_pair(table_pair):
    """Corners -> LK -> 5-point E -> pose -> triangulation on the real
    table photographs, the full two-view SfM chain with quality gates."""
    img1, img2 = table_pair  # 448x640 float64 in [0,1]
    a = np.asarray(img1, np.float32) * 255.0
    b = np.asarray(img2, np.float32) * 255.0
    H, W = a.shape

    pts = _corners_np(a, max_corners=300)
    assert pts.shape[0] >= 100, f"only {pts.shape[0]} corners on table1"

    new, status = _track_np(a, b, pts)
    tracked = status & (new[:, 0] >= 0) & (new[:, 0] < W) & (new[:, 1] >= 0) & (new[:, 1] < H)
    assert tracked.sum() >= 80, f"only {tracked.sum()} tracks survived LK"
    p1px, p2px = pts[tracked], new[tracked]

    # unknown calibration: a generic focal guess; E absorbs moderate error
    focal, cx, cy = 0.9 * W, W / 2.0, H / 2.0
    x1 = np.asarray(normalize_pixels(p1px, focal, cx, cy))
    x2 = np.asarray(normalize_pixels(p2px, focal, cx, cy))

    E, inliers, count = ransac_essential_5pt(
        x1, x2, config=EssentialRansacConfig(inlier_thresh=2.0 / focal)
    )
    n = int(count)
    ratio = n / len(x1)
    assert ratio >= 0.5, f"epipolar inlier ratio {ratio:.2f} (n={n})"

    R, t, n_front = recover_pose(jnp.asarray(E), jnp.asarray(x1), jnp.asarray(x2),
                                 inliers=jnp.asarray(inliers))
    R, t, _E = refine_pose(R, t, jnp.asarray(x1), jnp.asarray(x2),
                           inliers=jnp.asarray(inliers))
    # cheirality: most inliers triangulate in front of both cameras
    assert int(n_front) >= 0.8 * n, f"{int(n_front)}/{n} points in front"

    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)
    keep = np.asarray(inliers).astype(bool)
    X = np.asarray(triangulate(P1, P2, x1[keep], x2[keep]))

    # reprojection RMSE in PIXELS over in-front inliers
    def reproj(P, X):
        Xh = X @ np.asarray(P)[:, :3].T + np.asarray(P)[:, 3]
        return Xh[:, :2] / Xh[:, 2:3]

    z1 = X[:, 2]
    z2 = (X @ np.asarray(R).T + np.asarray(t))[:, 2]
    front = (z1 > 0) & (z2 > 0)
    assert front.mean() >= 0.8
    r1 = (reproj(P1, X[front]) - x1[keep][front]) * focal
    r2 = (reproj(P2, X[front]) - x2[keep][front]) * focal
    rmse = float(np.sqrt(np.mean(np.sum(r1**2, -1) + np.sum(r2**2, -1)) / 2.0))
    assert rmse <= 1.5, f"reprojection RMSE {rmse:.3f} px"


def test_sparse_tracks_match_cv2_on_decoded_pacman(reference_dir):
    """Our pyramidal sparse LK vs cv2.calcOpticalFlowPyrLK on REAL decoded
    video frames (not synthetic warps): mutually-tracked corners must land
    within a sub-pixel-ish agreement bound."""
    cv2 = require_cv2()
    from optical_flow_tpu.io.video_reader import read_frames

    frames = list(read_frames(reference_dir / "pacman.mp4", max_frames=6, gray=True))
    assert len(frames) >= 2
    a = frames[0].astype(np.float32)
    b = frames[-1].astype(np.float32)  # several frames apart: real motion

    pts = _corners_np(a, max_corners=200, quality=0.01, min_distance=8.0)
    if pts.shape[0] < 20:
        pytest.skip(f"pacman too corner-poor at this config ({pts.shape[0]})")

    ours, st_ours = _track_np(a, b, pts)
    ref_pts = pts.reshape(-1, 1, 2)
    cv_new, cv_st, _ = cv2.calcOpticalFlowPyrLK(
        a.astype(np.uint8), b.astype(np.uint8), ref_pts, None,
        winSize=(31, 31), maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
    )
    cv_new = cv_new.reshape(-1, 2)
    cv_ok = cv_st.reshape(-1).astype(bool)

    both = st_ours & cv_ok
    assert both.sum() >= 0.5 * len(pts), f"only {both.sum()}/{len(pts)} mutual"
    d = np.hypot(*(ours[both] - cv_new[both]).T)
    # identical algorithm family, different implementations: the bulk of
    # mutually-tracked corners agree to ~a pixel; allow a small outlier
    # tail (window/criteria differences at occlusions)
    assert np.median(d) <= 0.5, f"median disagreement {np.median(d):.3f} px"
    assert np.quantile(d, 0.8) <= 2.0, f"q80 disagreement {np.quantile(d, 0.8):.3f} px"


def test_hand_pair_tracks_and_epipolar_support(hand_pair):
    """The unused-by-the-reference hand1/hand2 photographs: tracks must be
    forward-backward consistent and support a dominant epipolar model."""
    a, b = hand_pair
    H, W = a.shape
    pts = _corners_np(a, max_corners=400, quality=0.01, min_distance=10.0)
    assert pts.shape[0] >= 150, f"only {pts.shape[0]} corners on hand1"

    # handheld shots ~140 px median displacement at this scale: needs a
    # deeper pyramid than the reference demo's 3 levels (cv2 tracks ~235
    # of 400 round-trip at maxLevel=4 here)
    fwd, st_f = _track_np(a, b, pts, max_level=4)
    back, st_b = _track_np(b, a, fwd, max_level=4)
    ok = st_f & st_b
    fb = np.hypot(*(back - pts).T)
    consistent = ok & (fb <= 1.0)
    # large photos, ~140 px handheld motion: a healthy share must
    # round-trip to sub-pixel (cv2 manages ~235/400 under the same config;
    # the bound leaves slack for detector/tracker jitter)
    assert consistent.sum() >= 100, f"{consistent.sum()} round-trip tracks"

    p1px, p2px = pts[consistent], fwd[consistent]
    focal, cx, cy = 0.9 * W, W / 2.0, H / 2.0
    x1 = np.asarray(normalize_pixels(p1px, focal, cx, cy))
    x2 = np.asarray(normalize_pixels(p2px, focal, cx, cy))
    E, inliers, count = ransac_essential_5pt(
        x1, x2, config=EssentialRansacConfig(inlier_thresh=3.0 / focal)
    )
    ratio = int(count) / len(x1)
    assert ratio >= 0.5, f"epipolar inlier ratio {ratio:.2f} ({int(count)}/{len(x1)})"
