"""Two-view SLAM front end: video frames -> tracks -> pose -> 3D map ->
bundle-adjusted reconstruction.

The complete north-star slice (SURVEY.md section 7.7) as one function:
seed Shi-Tomasi corners on the first frame, track them with sparse
pyramidal LK, estimate the essential matrix + relative pose by batched
RANSAC, triangulate the inlier tracks, and refine cameras + points with
the Schur-complement bundle adjuster (optionally mesh-sharded). Every
stage is the batched static-shape machinery from track/ and slam/.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from optical_flow_tpu.slam.ba import BAProblem, bundle_adjust, reprojection_rmse
from optical_flow_tpu.slam.epipolar import (
    EssentialRansacConfig,
    estimate_essential,
    normalize_pixels,
    recover_pose,
    triangulate,
)
from optical_flow_tpu.track import good_features_to_track, track_features
from optical_flow_tpu.track.sparse_lk import SparseLKConfig


@dataclasses.dataclass
class MultiViewReconstruction:
    cams: np.ndarray  # (N, 6) axis-angle + translation (camera 0 = identity)
    points: np.ndarray  # (P, 3) in the camera-0 frame
    tracks: np.ndarray  # (N, P, 2) pixel observations of the kept tracks
    rmse_before: float
    rmse_after: float
    problem: "BAProblem"


@dataclasses.dataclass
class TwoViewReconstruction:
    R: np.ndarray  # (3,3) cam1 -> cam2 rotation
    t: np.ndarray  # (3,) unit-norm translation
    points: np.ndarray  # (P,3) in the camera-1 frame
    pts1: np.ndarray  # (P,2) pixel observations in frame 1
    pts2: np.ndarray  # (P,2) pixel observations in frame 2
    rmse_before: float
    rmse_after: float
    problem: BAProblem  # the refined BA problem


def _rotmat_to_axis_angle(R: np.ndarray) -> np.ndarray:
    cos = np.clip((np.trace(R) - 1) / 2, -1, 1)
    th = np.arccos(cos)
    if th < 1e-8:
        return np.zeros(3)
    if th > np.pi - 1e-3:
        # near 180 deg the antisymmetric part vanishes; take the axis from
        # the dominant column of (R + I)/2 = axis axis^T (stable branch)
        M = (R + np.eye(3)) / 2.0
        c = int(np.argmax(np.diag(M)))
        axis = M[:, c] / max(np.sqrt(M[c, c]), 1e-12)
        axis /= np.linalg.norm(axis)
        # sign from the largest antisymmetric component, if any
        anti = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        if np.dot(anti, axis) < 0:
            axis = -axis
        return axis * th
    axis = (
        np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        / (2 * np.sin(th))
    )
    return axis * th


def _init_two_view(n_a, n_b, mask, ransac):
    """Essential -> pose -> triangulation -> cheirality keep on normalized
    correspondences. Returns (R, t, X, sel) with sel indexing the original
    K slots, or None when fewer than 16 points survive any stage."""
    E, inl, _ = estimate_essential(n_a, n_b, mask, ransac)
    inl = np.asarray(inl) & np.asarray(mask)
    if inl.sum() < 16:
        return None
    R, t, _ = recover_pose(E, jnp.asarray(n_a)[inl], jnp.asarray(n_b)[inl])
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate(P1, P2, np.asarray(n_a)[inl], np.asarray(n_b)[inl])
    z_a = np.asarray(X[:, 2])
    z_b = np.asarray(X @ R.T + t)[:, 2]
    keep = (z_a > 1e-6) & (z_b > 1e-6)
    if keep.sum() < 16:
        return None
    sel = np.where(inl)[0][keep]
    return np.asarray(R), np.asarray(t), np.asarray(X)[keep], sel


def _refine_ba(cams, X, cam_idx, pt_idx, obs, focal, ba_iters):
    """Assemble + run BA; returns (refined problem, rmse_before, rmse_after)
    keeping whichever model reprojects better."""
    prob = BAProblem(
        jnp.asarray(cams),
        jnp.asarray(np.asarray(X, np.float64)),  # f64 under x64, f32 otherwise
        jnp.asarray(cam_idx),
        jnp.asarray(pt_idx),
        jnp.asarray(obs),
        focal,
    )
    rmse0 = float(reprojection_rmse(prob))
    refined, _ = bundle_adjust(prob, iters=ba_iters, lam=1e-3)
    rmse1 = float(reprojection_rmse(refined))
    if not np.isfinite(rmse1) or rmse1 > rmse0:
        return prob, rmse0, rmse0
    return refined, rmse0, rmse1


def two_view_reconstruct(
    img1,
    img2,
    focal: float,
    cx: Optional[float] = None,
    cy: Optional[float] = None,
    max_corners: int = 300,
    ba_iters: int = 8,
    lk_config: SparseLKConfig = SparseLKConfig(),
    ransac: EssentialRansacConfig = EssentialRansacConfig(),
) -> Optional[TwoViewReconstruction]:
    """Structure-from-motion on one frame pair (grayscale images).

    Returns None when too few inlier tracks survive (<16).
    """
    img1 = np.asarray(img1)
    img2 = np.asarray(img2)
    h, w = img1.shape[-2:]
    cx = w / 2.0 if cx is None else cx
    cy = h / 2.0 if cy is None else cy

    pts, valid = good_features_to_track(jnp.asarray(img1), max_corners, 0.01, 8)
    new, status, _ = track_features(img1, img2, np.asarray(pts), lk_config)
    ok = np.asarray(status) & np.asarray(valid)
    if ok.sum() < 16:
        return None

    n1 = np.asarray(normalize_pixels(np.asarray(pts), focal, cx, cy))
    n2 = np.asarray(normalize_pixels(np.asarray(new), focal, cx, cy))
    init = _init_two_view(n1, n2, ok, ransac)
    if init is None:
        return None
    R, t, X, sel = init
    p1_px = np.asarray(pts)[sel]
    p2_px = np.asarray(new)[sel]

    # assemble the BA problem in pixel units (cameras: axis-angle + t)
    P = len(X)
    cams = np.zeros((2, 6))
    cams[1, :3] = _rotmat_to_axis_angle(R)
    cams[1, 3:] = t
    cam_idx = np.concatenate([np.zeros(P, np.int32), np.ones(P, np.int32)])
    pt_idx = np.concatenate([np.arange(P, dtype=np.int32)] * 2)
    obs = np.concatenate(
        [p1_px - np.array([cx, cy]), p2_px - np.array([cx, cy])]
    ).astype(np.float64)
    refined, rmse0, rmse1 = _refine_ba(cams, X, cam_idx, pt_idx, obs, focal, ba_iters)

    return TwoViewReconstruction(
        R=np.asarray(R),
        t=np.asarray(t),
        points=np.asarray(refined.points),
        pts1=p1_px,
        pts2=p2_px,
        rmse_before=rmse0,
        rmse_after=rmse1,
        problem=refined,
    )


def multi_view_reconstruct(
    frames,
    focal: float,
    cx: Optional[float] = None,
    cy: Optional[float] = None,
    max_corners: int = 300,
    ba_iters: int = 8,
    lk_config: SparseLKConfig = SparseLKConfig(),
    ransac: EssentialRansacConfig = EssentialRansacConfig(),
) -> Optional[MultiViewReconstruction]:
    """Incremental SfM over N >= 3 grayscale frames (the keyframe chain of
    SURVEY.md section 7.7).

    Corners seeded on frame 0 are tracked through every frame (chained
    sparse LK; a track dies when any link fails); the widest-baseline pair
    (0, N-1) initializes pose + map via the essential matrix; intermediate
    keyframes are localized against the map by DLT PnP; one global
    Schur-complement BA refines all cameras and points. Returns None when
    fewer than 16 tracks survive.
    """
    frames = [np.asarray(f) for f in frames]
    N = len(frames)
    if N < 3:
        raise ValueError("multi_view_reconstruct needs >= 3 frames")
    h, w = frames[0].shape[-2:]
    cx = w / 2.0 if cx is None else cx
    cy = h / 2.0 if cy is None else cy

    # --- track chains ------------------------------------------------------
    pts0, valid = good_features_to_track(jnp.asarray(frames[0]), max_corners, 0.01, 8)
    K = pts0.shape[0]
    tracks = np.zeros((N, K, 2), np.float32)
    tracks[0] = np.asarray(pts0)
    alive = np.asarray(valid).copy()
    for i in range(1, N):
        new, status, _ = track_features(frames[i - 1], frames[i], tracks[i - 1], lk_config)
        tracks[i] = np.asarray(new)
        alive &= np.asarray(status)
    if alive.sum() < 16:
        return None

    # --- two-view init on the widest baseline (0, N-1) ---------------------
    norm = [
        np.asarray(normalize_pixels(tracks[i], focal, cx, cy)) for i in range(N)
    ]
    init = _init_two_view(norm[0], norm[-1], alive, ransac)
    if init is None:
        return None
    R_last, t_last, X, sel = init  # sel indexes the K corner slots
    P = len(sel)

    # --- localize intermediate frames by PnP -------------------------------
    from optical_flow_tpu.slam.pnp import pnp_dlt

    cams = np.zeros((N, 6))
    cams[N - 1, :3] = _rotmat_to_axis_angle(R_last)
    cams[N - 1, 3:] = t_last
    for i in range(1, N - 1):
        Ri, ti = pnp_dlt(X, norm[i][sel])
        cams[i, :3] = _rotmat_to_axis_angle(np.asarray(Ri))
        cams[i, 3:] = np.asarray(ti)

    # --- global BA ---------------------------------------------------------
    cam_idx = np.repeat(np.arange(N, dtype=np.int32), P)
    pt_idx = np.tile(np.arange(P, dtype=np.int32), N)
    obs = np.concatenate(
        [tracks[i][sel] - np.array([cx, cy]) for i in range(N)]
    ).astype(np.float64)
    refined, rmse0, rmse1 = _refine_ba(cams, X, cam_idx, pt_idx, obs, focal, ba_iters)

    return MultiViewReconstruction(
        cams=np.asarray(refined.cams),
        points=np.asarray(refined.points),
        tracks=tracks[:, sel],
        rmse_before=rmse0,
        rmse_after=rmse1,
        problem=refined,
    )
