"""Pose estimation + bundle adjustment tests (synthetic ground truth)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optical_flow_tpu.slam import (
    BAProblem,
    bundle_adjust,
    reprojection_rmse,
    sharded_bundle_adjust,
)
from optical_flow_tpu.track.pose import RansacConfig, estimate_homography


# ---------------------------------------------------------------- homography


def _apply_h(H, pts):
    ph = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ H.T
    return ph[:, :2] / ph[:, 2:3]


def test_homography_recovery_with_outliers():
    rng = np.random.RandomState(0)
    H_true = np.array([[1.02, 0.03, 5.0], [-0.02, 0.98, -3.0], [1e-4, -5e-5, 1.0]])
    p1 = rng.rand(120, 2) * 300
    p2 = _apply_h(H_true, p1) + rng.randn(120, 2) * 0.3
    # 25% outliers
    out = rng.rand(120) < 0.25
    p2[out] = rng.rand(out.sum(), 2) * 300
    H, inl, count = estimate_homography(p1, p2, config=RansacConfig(seed=3))
    inl = np.asarray(inl)
    assert int(count) >= 60
    assert inl[~out].mean() > 0.9  # finds the true inliers
    assert inl[out].mean() < 0.1  # rejects the outliers
    # transfer error of true inliers under estimated H is small
    err = np.linalg.norm(_apply_h(np.asarray(H), p1[~out]) - p2[~out], axis=1)
    assert np.median(err) < 1.0


def test_homography_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(1)
    H_true = np.array([[0.95, -0.05, 10.0], [0.04, 1.05, 2.0], [0.0, 0.0, 1.0]])
    p1 = (rng.rand(80, 2) * 200).astype(np.float32)
    p2 = (_apply_h(H_true, p1) + rng.randn(80, 2) * 0.2).astype(np.float32)
    H_ours, _, _ = estimate_homography(p1, p2)
    H_cv, _ = cv2.findHomography(p1, p2, cv2.RANSAC, 3.0)
    grid = (rng.rand(50, 2) * 200).astype(np.float64)
    d = np.linalg.norm(_apply_h(np.asarray(H_ours, np.float64), grid) - _apply_h(H_cv, grid), axis=1)
    assert np.median(d) < 0.5


# ---------------------------------------------------------------- bundle adjustment


def _make_scene(C=4, P=32, noise=0.0, seed=0, dtype=np.float64):
    rng = np.random.RandomState(seed)
    pts = rng.randn(P, 3) * np.array([2.0, 2.0, 0.5]) + np.array([0, 0, 8.0])
    cams = np.zeros((C, 6))
    cams[:, 3] = np.linspace(-1, 1, C)  # translate along x
    cams[:, :3] = rng.randn(C, 3) * 0.02  # tiny rotations
    focal = 500.0

    from optical_flow_tpu.slam.ba import project

    cam_idx = np.repeat(np.arange(C), P).astype(np.int32)
    pt_idx = np.tile(np.arange(P), C).astype(np.int32)
    obs = np.stack(
        [
            np.asarray(project(jnp.asarray(cams[c], dtype), jnp.asarray(pts[p], dtype), focal))
            for c, p in zip(cam_idx, pt_idx)
        ]
    )
    obs = obs + rng.randn(*obs.shape) * noise
    return (
        jnp.asarray(cams, dtype),
        jnp.asarray(pts, dtype),
        jnp.asarray(cam_idx),
        jnp.asarray(pt_idx),
        jnp.asarray(obs, dtype),
        focal,
    )


def test_ba_reduces_reprojection_error():
    cams, pts, ci, pi_, obs, focal = _make_scene(noise=0.0)
    rng = np.random.RandomState(7)
    cams_n = cams + jnp.asarray(rng.randn(*cams.shape) * 0.01)
    cams_n = cams_n.at[0].set(cams[0])  # gauge anchor stays true
    pts_n = pts + jnp.asarray(rng.randn(*pts.shape) * 0.05)
    prob = BAProblem(cams_n, pts_n, ci, pi_, obs, focal)
    rmse0 = float(reprojection_rmse(prob))
    refined, hist = bundle_adjust(prob, iters=12, lam=1e-4)
    rmse1 = float(reprojection_rmse(refined))
    assert rmse0 > 1.0
    assert rmse1 < 0.05 * rmse0, (rmse0, rmse1)


def test_ba_noisy_observations_converge():
    cams, pts, ci, pi_, obs, focal = _make_scene(noise=0.5, seed=2)
    rng = np.random.RandomState(8)
    prob = BAProblem(
        cams + jnp.asarray(rng.randn(*cams.shape) * 0.005),
        pts + jnp.asarray(rng.randn(*pts.shape) * 0.03),
        ci, pi_, obs, focal,
    )
    refined, _ = bundle_adjust(prob, iters=10, lam=1e-3)
    # converges to the noise floor, not below
    assert float(reprojection_rmse(refined)) < 1.5


def test_ba_scales_to_10k_points_50_cams():
    """The sparse track-table Schur assembly's scaling claim (VERDICT r1
    item 8): 10k points / 50 cameras / ~60k observations with SPARSE
    visibility (each point seen by ~6 nearby cameras) optimizes within
    memory — the old dense (P, C, 6, 3) W block would have needed
    O(P*C) = 500k blocks here regardless of visibility."""
    from optical_flow_tpu.slam.ba import project

    rng = np.random.RandomState(11)
    C, P = 50, 10_000
    pts = rng.randn(P, 3) * np.array([4.0, 4.0, 1.0]) + np.array([0, 0, 10.0])
    cams = np.zeros((C, 6))
    cams[:, 3] = np.linspace(-3, 3, C)
    cams[:, :3] = rng.randn(C, 3) * 0.01
    focal = 500.0
    # each point observed by 6 consecutive cameras starting at a random one
    first = rng.randint(0, C - 5, size=P)
    cam_idx = (first[:, None] + np.arange(6)[None, :]).reshape(-1).astype(np.int32)
    pt_idx = np.repeat(np.arange(P), 6).astype(np.int32)
    proj = jax.jit(jax.vmap(project, in_axes=(0, 0, None)))
    obs = np.asarray(
        proj(jnp.asarray(cams)[cam_idx], jnp.asarray(pts)[pt_idx], focal)
    )
    prob = BAProblem(
        jnp.asarray(cams + rng.randn(C, 6) * 0.002),
        jnp.asarray(pts + rng.randn(P, 3) * 0.02),
        jnp.asarray(cam_idx),
        jnp.asarray(pt_idx),
        jnp.asarray(obs),
        focal,
    )
    rmse0 = float(reprojection_rmse(prob))
    refined, _ = bundle_adjust(prob, iters=5, lam=1e-4)
    rmse1 = float(reprojection_rmse(refined))
    assert rmse1 < 0.1 * rmse0, (rmse0, rmse1)


def test_windowed_ba_tracks_trajectory():
    """Sliding-window BA (slam/window.py): a 14-keyframe trajectory whose
    points enter and leave view. Checks (a) out-of-window points get
    RETIRED so the live problem stays O(window), (b) noisy keyframe poses
    are pulled to ground truth by the windowed solves, (c) shape
    bucketing keeps the set of compiled programs small."""
    from optical_flow_tpu.slam.ba import project
    from optical_flow_tpu.slam.window import WindowedBA

    rng = np.random.RandomState(5)
    focal = 500.0
    n_kf = 14
    true_poses = np.zeros((n_kf, 6))
    true_poses[:, 3] = np.arange(n_kf) * 0.4  # translate along x
    # each keyframe spawns 12 points visible for the next 4 keyframes
    pts_true = {}
    visible = {}  # kf -> [pid]
    pid = 0
    for k in range(n_kf):
        for _ in range(12):
            pts_true[pid] = np.array(
                [true_poses[k, 3] + rng.uniform(-2, 2), rng.uniform(-2, 2),
                 rng.uniform(6, 10)]
            )
            for kk in range(k, min(k + 4, n_kf)):
                visible.setdefault(kk, []).append(pid)
            pid += 1

    def proj(pose, X):
        return np.asarray(project(jnp.asarray(pose), jnp.asarray(X), focal))

    wba = WindowedBA(window=4, focal=focal, ba_iters=4, lam=1e-6)
    live_sizes = []
    for k in range(n_kf):
        pose_init = true_poses[k] + rng.randn(6) * np.array([0.002] * 3 + [0.02] * 3)
        if k == 0:
            pose_init = true_poses[0]  # gauge anchor
        obs, new_pts = [], {}
        for p in visible[k]:
            uv = proj(true_poses[k], pts_true[p])
            if abs(uv[0]) > 800 or abs(uv[1]) > 800:
                continue
            obs.append((p, uv))
            if p not in wba.points and p not in wba.retired:
                new_pts[p] = pts_true[p] + rng.randn(3) * 0.02
        wba.add_keyframe(pose_init, obs, new_pts)
        rmse = wba.optimize()
        assert rmse is not None and np.isfinite(rmse)
        live_sizes.append(wba.live_observation_count)

    # (a) retirement: early points are frozen, live problem bounded — a
    # cohort stays live until its last sighting leaves the window, so the
    # plateau is (window + track_len - 1) = 7 cohorts * 48 obs = 336
    assert len(wba.retired) > 50, len(wba.retired)
    assert max(live_sizes) <= 12 * 4 * 7, max(live_sizes)
    # the live set plateaus instead of growing with the trajectory
    assert live_sizes[-1] <= max(live_sizes[:-1]), live_sizes
    # (b) pose accuracy: every keyframe within 2% of its true x-translation
    err = np.array([abs(wba.poses[k][3] - true_poses[k, 3]) for k in range(n_kf)])
    assert err.max() < 0.02 * true_poses[-1, 3], err.max()
    # (c) points stay near truth (live + retired)
    all_pts = wba.all_points()
    perr = np.array([np.linalg.norm(all_pts[p] - pts_true[p]) for p in all_pts])
    # points retire with the estimate they had when leaving the window;
    # init noise is 0.02/axis (norm ~0.035), measured median ~0.05
    assert np.median(perr) < 0.08, np.median(perr)


def test_sharded_ba_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from optical_flow_tpu.parallel import flow_mesh

    mesh = flow_mesh(frames=2, rows=2, cols=2)
    C, P = 4, 32
    cams, pts, ci, pi_, obs, focal = _make_scene(C=C, P=P, noise=0.1, seed=3)
    rng = np.random.RandomState(9)
    cams_n = cams + jnp.asarray(rng.randn(C, 6) * 0.01)
    pts_n = pts + jnp.asarray(rng.randn(P, 3) * 0.05)

    prob = BAProblem(cams_n, pts_n, ci, pi_, obs, focal)
    ref, _ = bundle_adjust(prob, iters=6, lam=1e-3)

    # shard: device d owns points [d*4, (d+1)*4) and all their observations,
    # with pt_idx local to the shard
    n = mesh.size
    P_loc = P // n
    order = np.argsort(np.asarray(pi_), kind="stable")
    ci_s = np.asarray(ci)[order]
    pi_s = np.asarray(pi_)[order] % P_loc  # local indices after grouping
    obs_s = np.asarray(obs)[order]
    prob_s = BAProblem(
        cams_n, pts_n, jnp.asarray(ci_s), jnp.asarray(pi_s), jnp.asarray(obs_s), focal
    )
    ref_s, _ = sharded_bundle_adjust(prob_s, mesh, iters=6, lam=1e-3)

    np.testing.assert_allclose(np.asarray(ref_s.cams), np.asarray(ref.cams), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref_s.points), np.asarray(ref.points), atol=1e-6)
    # evaluate with global indices (prob_s carries shard-local pt_idx)
    ref_s_global = prob._replace(cams=ref_s.cams, points=ref_s.points)
    assert float(reprojection_rmse(ref_s_global)) < float(reprojection_rmse(prob))


def test_robust_ba_survives_gross_outliers():
    """Huber IRLS (bundle_adjust robust_delta): 8% of observations
    corrupted by 30-60 px gross errors (wrong associations). Squared loss
    lets them drag the cameras; the robust solve stays near clean-data
    accuracy."""
    C, P = 5, 40
    cams, pts, ci, pi_, obs, focal = _make_scene(C=C, P=P, noise=0.2, seed=11)
    rng = np.random.RandomState(3)
    obs_bad = np.asarray(obs).copy()
    M = obs_bad.shape[0]
    bad = rng.rand(M) < 0.08
    obs_bad[bad] += rng.uniform(30, 60, (int(bad.sum()), 2)) * np.sign(
        rng.randn(int(bad.sum()), 2)
    )

    cams_n = cams + jnp.asarray(rng.randn(C, 6) * 0.01)
    pts_n = pts + jnp.asarray(rng.randn(P, 3) * 0.05)
    prob = BAProblem(
        cams_n, pts_n, ci, pi_, jnp.asarray(obs_bad), focal
    )
    plain, _ = bundle_adjust(prob, iters=8, lam=1e-3)
    robust, _ = bundle_adjust(prob, iters=8, lam=1e-3, robust_delta=2.0)

    def cam_err(sol):
        return float(jnp.abs(sol.cams[:, 3:] - cams[:, 3:]).max())

    e_plain, e_rob = cam_err(plain), cam_err(robust)
    # measured: plain 2.29 (squared loss follows the outliers), robust
    # 0.11 at delta=2 — within ~4x of the clean-data solve's 0.027 (the
    # 0.2 px observation noise floor)
    assert e_rob < e_plain * 0.1, (e_plain, e_rob)
    assert e_rob < 0.15, e_rob
    # clean observations: robust solve must not regress the plain one
    prob_clean = BAProblem(cams_n, pts_n, ci, pi_, obs, focal)
    p2, _ = bundle_adjust(prob_clean, iters=8, lam=1e-3)
    r2, _ = bundle_adjust(prob_clean, iters=8, lam=1e-3, robust_delta=2.0)
    assert cam_err(r2) < cam_err(p2) * 1.5 + 1e-4


def test_sharded_robust_ba_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from optical_flow_tpu.parallel import flow_mesh

    mesh = flow_mesh(frames=2, rows=2, cols=2)
    C, P = 4, 32
    cams, pts, ci, pi_, obs, focal = _make_scene(C=C, P=P, noise=0.1, seed=3)
    rng = np.random.RandomState(9)
    obs_bad = np.asarray(obs).copy()
    bad = rng.rand(obs_bad.shape[0]) < 0.06
    obs_bad[bad] += 40.0
    cams_n = cams + jnp.asarray(rng.randn(C, 6) * 0.01)
    pts_n = pts + jnp.asarray(rng.randn(P, 3) * 0.05)

    prob = BAProblem(cams_n, pts_n, ci, pi_, jnp.asarray(obs_bad), focal)
    ref, _ = bundle_adjust(prob, iters=6, lam=1e-3, robust_delta=2.0)

    n = mesh.size
    P_loc = P // n
    order = np.argsort(np.asarray(pi_), kind="stable")
    prob_s = BAProblem(
        cams_n, pts_n,
        jnp.asarray(np.asarray(ci)[order]),
        jnp.asarray(np.asarray(pi_)[order] % P_loc),
        jnp.asarray(obs_bad[order]), focal,
    )
    ref_s, _ = sharded_bundle_adjust(prob_s, mesh, iters=6, lam=1e-3,
                                     robust_delta=2.0)
    np.testing.assert_allclose(np.asarray(ref_s.cams), np.asarray(ref.cams),
                               atol=1e-6)


def test_sharded_ba_scales_to_10k_points():
    """sharded_bundle_adjust at the 10k-point/50-camera scale on the
    8-device mesh: per-shard W blocks stay O(local observations), the
    camera system is psum-assembled, and the result matches the
    unsharded solve at reduction-order tolerance."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from optical_flow_tpu.parallel import flow_mesh
    from optical_flow_tpu.slam.ba import project

    mesh = flow_mesh(frames=2, rows=2, cols=2)
    rng = np.random.RandomState(12)
    C, P = 50, 10_000
    pts = rng.randn(P, 3) * np.array([4.0, 4.0, 1.0]) + np.array([0, 0, 10.0])
    cams = np.zeros((C, 6))
    cams[:, 3] = np.linspace(-3, 3, C)
    cams[:, :3] = rng.randn(C, 3) * 0.01
    focal = 500.0
    first = rng.randint(0, C - 5, size=P)
    cam_idx = (first[:, None] + np.arange(6)[None, :]).reshape(-1).astype(np.int32)
    pt_idx = np.repeat(np.arange(P), 6).astype(np.int32)
    proj = jax.jit(jax.vmap(project, in_axes=(0, 0, None)))
    obs = np.asarray(
        proj(jnp.asarray(cams)[cam_idx], jnp.asarray(pts)[pt_idx], focal)
    )
    cams_n = cams + rng.randn(C, 6) * 0.002
    pts_n = pts + rng.randn(P, 3) * 0.02

    prob = BAProblem(
        jnp.asarray(cams_n), jnp.asarray(pts_n), jnp.asarray(cam_idx),
        jnp.asarray(pt_idx), jnp.asarray(obs), focal,
    )
    ref, _ = bundle_adjust(prob, iters=4, lam=1e-4)

    # shard: points grouped contiguously (pt_idx already sorted by point),
    # observations local to each point shard
    n = mesh.size
    P_loc = P // n
    prob_s = BAProblem(
        jnp.asarray(cams_n), jnp.asarray(pts_n), jnp.asarray(cam_idx),
        jnp.asarray(pt_idx % P_loc), jnp.asarray(obs), focal,
    )
    ref_s, _ = sharded_bundle_adjust(prob_s, mesh, iters=4, lam=1e-4)
    np.testing.assert_allclose(
        np.asarray(ref_s.cams), np.asarray(ref.cams), atol=1e-5
    )
    rmse = float(
        reprojection_rmse(prob._replace(cams=ref_s.cams, points=ref_s.points))
    )
    assert rmse < 0.1 * float(reprojection_rmse(prob)), rmse


def _make_rig_scene(C=4, P=32, b=0.3, seed=5, dtype=np.float64):
    """_make_scene plus a right-eye observation of every point from every
    camera (BAProblem.baseline)."""
    cams, pts, ci, pi_, obs, focal = _make_scene(C=C, P=P, seed=seed, dtype=dtype)
    from optical_flow_tpu.slam.ba import project

    obs_r = np.stack([
        np.asarray(project(cams[c], pts[p], focal, b))
        for c, p in zip(np.asarray(ci), np.asarray(pi_))
    ])
    ci2 = jnp.concatenate([ci, ci])
    pi2 = jnp.concatenate([pi_, pi_])
    obs2 = jnp.concatenate([obs, jnp.asarray(obs_r, dtype)])
    bl = jnp.concatenate([
        jnp.zeros(len(np.asarray(ci)), dtype), jnp.full(len(obs_r), b, dtype)
    ])
    return cams, pts, ci2, pi2, obs2, bl, focal


def test_rig_observations_lock_metric_scale():
    """The point of BAProblem.baseline: a global scale perturbation
    (points and translations x1.25) is INVISIBLE to mono BA (scale gauge
    freedom - the residuals are already zero) but right-eye observations
    see it, and the rig solve pulls the scale back to metric."""
    cams, pts, ci, pi_, obs, bl, focal = _make_rig_scene()
    s = 1.25
    cams_s = cams.at[:, 3:].multiply(s)
    pts_s = pts * s

    mono = BAProblem(cams_s, pts_s, ci[: len(ci) // 2], pi_[: len(pi_) // 2],
                     obs[: len(obs) // 2], focal)
    mono_ref, _ = bundle_adjust(mono, iters=8, lam=1e-6)
    # mono: scaled scene reprojects perfectly; BA cannot know the scale
    assert float(reprojection_rmse(mono_ref)) < 1e-6
    assert abs(float(jnp.linalg.norm(mono_ref.points[0])) /
               float(jnp.linalg.norm(pts[0])) - s) < 0.01

    rig = BAProblem(cams_s, pts_s, ci, pi_, obs, focal, None, bl)
    rig_ref, _ = bundle_adjust(rig, iters=12, lam=1e-6)
    # rig: the right eye's fixed metric baseline makes the x1.25 visible
    scale_back = float(jnp.linalg.norm(rig_ref.points[5])) / float(
        jnp.linalg.norm(pts[5])
    )
    assert abs(scale_back - 1.0) < 0.02, scale_back
    assert float(reprojection_rmse(rig_ref)) < 0.05


def test_sharded_ba_matches_unsharded_with_rig_obs():
    """BAProblem.baseline through sharded_bundle_adjust: identical to the
    unsharded solve (the baseline column shards with the observations)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from optical_flow_tpu.parallel import flow_mesh

    mesh = flow_mesh(frames=2, rows=2, cols=2)
    C, P = 4, 32
    cams, pts, ci, pi_, obs, bl, focal = _make_rig_scene()
    rng = np.random.RandomState(11)
    cams_n = cams + jnp.asarray(rng.randn(C, 6) * 0.01)
    pts_n = pts + jnp.asarray(rng.randn(P, 3) * 0.05)

    prob = BAProblem(cams_n, pts_n, ci, pi_, obs, focal, None, bl)
    ref, _ = bundle_adjust(prob, iters=6, lam=1e-3)

    n = mesh.size
    P_loc = P // n
    order = np.argsort(np.asarray(pi_), kind="stable")
    prob_s = BAProblem(
        cams_n, pts_n,
        jnp.asarray(np.asarray(ci)[order]),
        jnp.asarray(np.asarray(pi_)[order] % P_loc),
        jnp.asarray(np.asarray(obs)[order]),
        focal, None,
        jnp.asarray(np.asarray(bl)[order]),
    )
    ref_s, _ = sharded_bundle_adjust(prob_s, mesh, iters=6, lam=1e-3)
    np.testing.assert_allclose(np.asarray(ref_s.cams), np.asarray(ref.cams), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref_s.points), np.asarray(ref.points), atol=1e-6)
