"""Epipolar geometry + two-view SLAM front-end tests (synthetic scenes
with exact ground truth)."""

import numpy as np
import pytest

import jax.numpy as jnp

from optical_flow_tpu.slam.epipolar import (
    EssentialRansacConfig,
    estimate_essential,
    normalize_pixels,
    recover_pose,
    triangulate,
)


def _rot(axis, th):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _synthetic_pair(n=120, seed=0, noise=0.0, outliers=0.0):
    rng = np.random.RandomState(seed)
    # deep, well-conditioned structure: near-planar scenes are degenerate
    # for the 8-point algorithm (E only determined up to a family)
    X = np.stack(
        [rng.randn(n) * 1.5, rng.randn(n) * 1.0, rng.uniform(3.0, 12.0, n)], axis=1
    )
    R = _rot([0.2, 1.0, 0.1], 0.08)
    t = np.array([1.0, 0.15, 0.1])
    t /= np.linalg.norm(t)
    x1 = X[:, :2] / X[:, 2:3]
    X2 = X @ R.T + t
    x2 = X2[:, :2] / X2[:, 2:3]
    x1 = x1 + rng.randn(n, 2) * noise
    x2 = x2 + rng.randn(n, 2) * noise
    out = rng.rand(n) < outliers
    x2[out] = rng.randn(out.sum(), 2) * 0.4
    return x1.astype(np.float32), x2.astype(np.float32), X, R, t, out


def _pose_errors(E, x1, x2, mask, R_true, t_true):
    R, t, _ = recover_pose(E, jnp.asarray(x1)[mask], jnp.asarray(x2)[mask])
    R, t = np.asarray(R), np.asarray(t)
    ang = np.degrees(np.arccos(np.clip((np.trace(R.T @ R_true) - 1) / 2, -1, 1)))
    tdir = np.degrees(np.arccos(np.clip(abs(t @ t_true), -1, 1)))
    return ang, tdir


def test_essential_and_pose_recovery_clean():
    """Noise- and outlier-free: the 8-point estimate is essentially exact."""
    x1, x2, X, R_true, t_true, _ = _synthetic_pair(noise=0.0, outliers=0.0)
    E, inl, count = estimate_essential(x1, x2, config=EssentialRansacConfig(seed=1))
    assert int(count) >= 110
    ang, tdir = _pose_errors(E, x1, x2, np.asarray(inl), R_true, t_true)
    assert ang < 0.1, ang
    assert tdir < 0.5, tdir


def test_essential_and_pose_recovery_outliers():
    """20% gross outliers: a few can sit on epipolar lines by chance and
    leak through any geometric gate — 8-point accuracy then degrades to a
    few degrees (the known limitation; 5-point + LO is the upgrade)."""
    x1, x2, X, R_true, t_true, out = _synthetic_pair(noise=0.0, outliers=0.2)
    E, inl, count = estimate_essential(x1, x2, config=EssentialRansacConfig(seed=1))
    inl = np.asarray(inl)
    assert int(count) >= 80
    assert inl[~out].mean() > 0.9  # true correspondences kept
    assert inl[out].mean() < 0.5  # most outliers rejected
    # MEDSAC hypothesis selection keeps the pure-sample model: accuracy
    # survives 20% outliers (median-residual scoring, slam/epipolar.py)
    ang, tdir = _pose_errors(E, x1, x2, inl, R_true, t_true)
    assert ang < 1.0, ang
    assert tdir < 3.0, tdir


def test_five_point_minimal_exact():
    """The 5-point solver recovers the TRUE essential matrix to machine
    precision from exactly 5 perfect correspondences (8-point cannot: it
    needs 8 and only satisfies the essential constraints approximately)."""
    from optical_flow_tpu.slam.epipolar import five_point

    for seed in range(4):
        x1, x2, _, R_true, t_true, _ = _synthetic_pair(n=5, seed=seed)
        tx = np.array(
            [[0, -t_true[2], t_true[1]], [t_true[2], 0, -t_true[0]],
             [-t_true[1], t_true[0], 0]]
        )
        E_true = tx @ R_true
        E_true /= np.linalg.norm(E_true)
        Es = five_point(x1, x2)
        assert 1 <= len(Es) <= 10
        q1 = np.concatenate([x1, np.ones((5, 1))], 1)
        q2 = np.concatenate([x2, np.ones((5, 1))], 1)
        for E in Es:
            # every candidate satisfies the epipolar + essential constraints
            assert np.abs(np.einsum("ki,ij,kj->k", q2, E, q1)).max() < 1e-9
            assert abs(np.linalg.det(E)) < 1e-9
            assert np.linalg.norm(2 * E @ E.T @ E - np.trace(E @ E.T) * E) < 1e-9
        best = min(
            min(np.linalg.norm(E - E_true), np.linalg.norm(E + E_true)) for E in Es
        )
        assert best < 1e-6, (seed, best)


def test_five_point_ransac_beats_gate_leakage():
    """RANSAC over 5-point minimal hypotheses on the 20%-outlier scene:
    pose accuracy at least matches the 8-point path (the ROADMAP upgrade
    the 8-point docstring self-prescribes)."""
    from optical_flow_tpu.slam.epipolar import ransac_essential_5pt

    x1, x2, X, R_true, t_true, out = _synthetic_pair(noise=0.0, outliers=0.2)
    E, inl, count = ransac_essential_5pt(
        x1, x2, config=EssentialRansacConfig(seed=3), n_samples=32
    )
    inl = np.asarray(inl)
    assert int(count) >= 80
    assert inl[~out].mean() > 0.9
    ang, tdir = _pose_errors(E, x1, x2, inl, R_true, t_true)
    assert ang < 1.0, ang
    assert tdir < 3.0, tdir


def test_triangulation_recovers_structure():
    x1, x2, X, R, t, _ = _synthetic_pair(n=60, seed=3)
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)[:, None]], axis=1)
    Xh = np.asarray(triangulate(P1, P2, x1, x2))
    # up-to-scale: compare after scaling by median depth ratio
    s = np.median(X[:, 2]) / np.median(Xh[:, 2])
    err = np.linalg.norm(Xh * s - X, axis=1)
    assert np.median(err) < 0.02, np.median(err)


def test_normalize_pixels_roundtrip():
    px = np.array([[320.0, 240.0], [0.0, 0.0]], np.float32)
    n = np.asarray(normalize_pixels(px, 500.0, 320.0, 240.0))
    np.testing.assert_allclose(n[0], [0, 0])
    np.testing.assert_allclose(n[1], [-0.64, -0.48])


def test_two_view_frontend_synthetic_images():
    cv2 = pytest.importorskip("cv2")
    from optical_flow_tpu.slam.frontend import two_view_reconstruct

    # A textured scene with REAL parallax: depth varies smoothly across the
    # image (ramp 4 -> 10), camera translates in x; per-pixel disparity
    # f*tx/Z(x,y) rendered with cv2.remap. Planar scenes would be
    # degenerate for the essential matrix.
    rng = np.random.RandomState(5)
    h, w = 320, 416
    # high-frequency texture (trackable corners everywhere) and a modest
    # baseline: LK tracks 4-10 px disparity accurately; 30 px on blobby
    # low-frequency texture defeats LK and cv2 alike
    base = cv2.resize(
        rng.rand(80, 104).astype(np.float32), (w, h), interpolation=cv2.INTER_CUBIC
    )
    base = (255 * (base - base.min()) / np.ptp(base)).astype(np.uint8)
    focal = 400.0
    tx = 0.12
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    # rocky random depth field (smooth ramps are near-critical surfaces for
    # two-view SfM and make the translation direction ambiguous)
    depth = 4.0 + 6.0 * cv2.resize(
        rng.rand(10, 13).astype(np.float32), (w, h), interpolation=cv2.INTER_CUBIC
    )
    depth = np.clip(depth, 3.0, 12.0)
    disp = focal * tx / depth
    img2 = cv2.remap(base, xs + disp, ys, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_REFLECT_101)
    rec = two_view_reconstruct(base, img2, focal)
    assert rec is not None
    assert rec.rmse_after <= rec.rmse_before + 1e-9
    assert rec.rmse_after < 5.0, rec.rmse_after
    assert (rec.points[:, 2] > 0).mean() > 0.9
    # recovered translation is dominantly along x
    t = rec.t / np.linalg.norm(rec.t)
    assert abs(t[0]) > 0.9, t
    # recovered depths correlate with the ground-truth depth ramp at the
    # tracked pixels (up to global scale)
    gx = np.clip(rec.pts1[:, 0].astype(int), 0, w - 1)
    gy = np.clip(rec.pts1[:, 1].astype(int), 0, h - 1)
    rho = np.corrcoef(depth[gy, gx], rec.points[:, 2])[0, 1]
    assert rho > 0.7, rho


def test_pnp_recovers_pose():
    from optical_flow_tpu.slam.pnp import pnp_dlt, reprojection_errors

    rng = np.random.RandomState(7)
    X = np.stack(
        [rng.randn(60) * 1.5, rng.randn(60), rng.uniform(3, 10, 60)], axis=1
    )
    R_true = _rot([0.3, 0.7, -0.2], 0.15)
    t_true = np.array([0.4, -0.2, 0.3])
    Xc = X @ R_true.T + t_true
    x = (Xc[:, :2] / Xc[:, 2:3]).astype(np.float32)
    R, t = pnp_dlt(X.astype(np.float32), x)
    R, t = np.asarray(R), np.asarray(t)
    ang = np.degrees(np.arccos(np.clip((np.trace(R.T @ R_true) - 1) / 2, -1, 1)))
    assert ang < 0.1, ang
    np.testing.assert_allclose(t, t_true, atol=1e-3)
    errs = np.asarray(reprojection_errors(jnp.asarray(R), jnp.asarray(t), jnp.asarray(X, jnp.float32), jnp.asarray(x)))
    assert errs.max() < 1e-4


def test_multi_view_reconstruct():
    cv2 = pytest.importorskip("cv2")
    from optical_flow_tpu.slam.frontend import multi_view_reconstruct

    rng = np.random.RandomState(9)
    h, w = 320, 416
    base = cv2.resize(
        rng.rand(80, 104).astype(np.float32), (w, h), interpolation=cv2.INTER_CUBIC
    )
    base = (255 * (base - base.min()) / np.ptp(base)).astype(np.uint8)
    focal = 400.0
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    depth = np.clip(
        4.0 + 6.0 * cv2.resize(rng.rand(10, 13).astype(np.float32), (w, h),
                               interpolation=cv2.INTER_CUBIC), 3.0, 12.0
    )
    frames = [base]
    for k in (1, 2, 3):
        tx = 0.05 * k  # camera slides along +x
        disp = focal * tx / depth
        frames.append(
            cv2.remap(base, xs + disp, ys, cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_REFLECT_101)
        )
    rec = multi_view_reconstruct(frames, focal)
    assert rec is not None
    assert rec.rmse_after <= rec.rmse_before + 1e-9
    assert rec.rmse_after < 3.0, rec.rmse_after
    # camera translations along x grow monotonically with frame index
    txs = rec.cams[:, 3] * np.sign(rec.cams[-1, 3])
    assert txs[0] == 0.0
    assert np.all(np.diff(txs) > 0), txs
    # roughly uniform spacing (camera slides at constant speed)
    steps = np.diff(txs)
    assert steps.max() / max(steps.min(), 1e-9) < 1.8, steps


def test_refine_pose_improves_noisy_estimate():
    """Gauss-Newton local optimization (refine_pose) on a noisy scene:
    the refined pose must not be worse than the linear 8-point estimate
    and must stay on the essential manifold exactly."""
    from optical_flow_tpu.slam.epipolar import refine_pose

    x1, x2, X, R_true, t_true, _ = _synthetic_pair(noise=2e-3, outliers=0.0, seed=5)
    E, inl, count = estimate_essential(x1, x2, config=EssentialRansacConfig(seed=2))
    inl_np = np.asarray(inl)
    R0, t0, _ = recover_pose(E, jnp.asarray(x1)[inl_np], jnp.asarray(x2)[inl_np])
    ang0 = np.degrees(
        np.arccos(np.clip((np.trace(np.asarray(R0).T @ R_true) - 1) / 2, -1, 1))
    )
    tdir0 = np.degrees(np.arccos(np.clip(abs(np.asarray(t0) @ t_true), -1, 1)))

    R1, t1, E1 = refine_pose(R0, t0, x1, x2, inliers=inl_np)
    R1n, t1n = np.asarray(R1), np.asarray(t1)
    ang1 = np.degrees(
        np.arccos(np.clip((np.trace(R1n.T @ R_true) - 1) / 2, -1, 1))
    )
    tdir1 = np.degrees(np.arccos(np.clip(abs(t1n @ t_true), -1, 1)))
    # genuine improvement (a frozen/NaN'd GN once passed a no-regression
    # check vacuously — require the error to actually drop; measured
    # 0.93 -> 0.45 deg rotation, 1.11 -> 0.67 deg translation direction)
    assert ang1 <= ang0 * 0.8, (ang0, ang1)
    assert tdir1 <= tdir0 * 0.8, (tdir0, tdir1)
    assert abs(np.linalg.norm(t1n) - 1.0) < 1e-5
    assert np.abs(R1n @ R1n.T - np.eye(3)).max() < 1e-5
    # E1 is the essential matrix of (R1, t1) by construction
    s = np.linalg.svd(np.asarray(E1), compute_uv=False)
    assert s[2] < 1e-6 and abs(s[0] - s[1]) < 1e-5


def test_refine_pose_with_outlier_mask():
    """LO on the inlier support of an outlier-contaminated scene: the
    Sampson objective is restricted to the mask, so leaked structure
    cannot drag the pose; accuracy lands near the clean-scene level."""
    from optical_flow_tpu.slam.epipolar import refine_pose

    x1, x2, X, R_true, t_true, out = _synthetic_pair(noise=1e-3, outliers=0.2, seed=7)
    E, inl, _ = estimate_essential(x1, x2, config=EssentialRansacConfig(seed=3))
    inl_np = np.asarray(inl)
    R0, t0, _ = recover_pose(E, jnp.asarray(x1)[inl_np], jnp.asarray(x2)[inl_np])
    R1, t1, _ = refine_pose(R0, t0, x1, x2, inliers=inl_np)
    ang = np.degrees(
        np.arccos(np.clip((np.trace(np.asarray(R1).T @ R_true) - 1) / 2, -1, 1))
    )
    tdir = np.degrees(np.arccos(np.clip(abs(np.asarray(t1) @ t_true), -1, 1)))
    assert ang < 1.0, ang
    assert tdir < 3.0, tdir


def test_essential_survives_measurement_noise():
    """Regression: a fixed 2e-3 gate with ~1e-3 coordinate noise used to
    collapse the trimmed refit to an empty support (0 inliers returned).
    The gate now adapts to the winning hypothesis's median residual."""
    x1, x2, X, R_true, t_true, out = _synthetic_pair(noise=1e-3, outliers=0.1, seed=11)
    E, inl, count = estimate_essential(x1, x2, config=EssentialRansacConfig(seed=4))
    inl_np = np.asarray(inl)
    assert int(count) >= 70, int(count)
    assert inl_np[~out].mean() > 0.7
    ang, tdir = _pose_errors(E, x1, x2, inl_np, R_true, t_true)
    assert ang < 2.0, ang
    assert tdir < 6.0, tdir


def test_5pt_beats_8pt_at_low_inlier_ratio():
    """At ~55% inliers with a MATCHED 64-hypothesis budget, an all-inlier
    8-point sample has w^8 ~ 0.8% odds per draw vs w^5 ~ 5% for a minimal
    5-sample — so the 8-point path collapses on scenes the 5-point path
    solves exactly. This is why the production bootstrap and loop
    verification run the minimal solver (slam/incremental.py,
    pose_graph.verify_loop_closure). Measured on these seeds: 8pt
    translation-direction errors of 73-88 degrees on 3/6 scenes; 5pt
    under 0.05 degrees on 6/6."""
    from optical_flow_tpu.slam.epipolar import ransac_essential_5pt

    worst_8pt = []
    for seed in range(6):
        x1, x2, X, R_true, t_true, out = _synthetic_pair(
            n=150, seed=seed, noise=0.0, outliers=0.45
        )
        cfg = EssentialRansacConfig(seed=seed + 1, n_hypotheses=64)
        E8, inl8, _ = estimate_essential(x1, x2, config=cfg)
        _, tdir8 = _pose_errors(E8, x1, x2, np.asarray(inl8), R_true, t_true)
        worst_8pt.append(tdir8)
        E5, inl5, _ = ransac_essential_5pt(x1, x2, config=cfg, n_samples=64)
        ang5, tdir5 = _pose_errors(E5, x1, x2, np.asarray(inl5), R_true, t_true)
        assert ang5 < 1.0, (seed, ang5)
        assert tdir5 < 1.0, (seed, tdir5)
    # same scenes, same budget: the non-minimal path demonstrably fails
    assert sum(t > 30.0 for t in worst_8pt) >= 2, worst_8pt


def test_five_point_batch_matches_single():
    """five_point_batch is the per-sample Stewenius solver vectorized:
    every solution the single-sample path finds must appear in the batch
    output at machine precision (up to sign), and every batch solution
    must satisfy the essential constraints."""
    from optical_flow_tpu.slam.epipolar import five_point, five_point_batch

    rng = np.random.RandomState(1)
    x1, x2, X, R_true, t_true, out = _synthetic_pair(
        n=150, seed=2, noise=1e-3, outliers=0.3
    )
    S = 24
    ids = np.stack([rng.choice(150, 5, replace=False) for _ in range(S)])
    p1s = x1[ids].astype(np.float64)
    p2s = x2[ids].astype(np.float64)
    Eb, mask = five_point_batch(p1s, p2s)
    assert Eb.shape == (S, 10, 3, 3) and mask.shape == (S, 10)
    n_single = 0
    for s in range(S):
        got = Eb[s][mask[s]]
        for E in got:
            assert abs(np.linalg.det(E)) < 1e-9
            assert np.linalg.norm(2 * E @ E.T @ E - np.trace(E @ E.T) * E) < 1e-9
        for E in five_point(p1s[s], p2s[s]):
            n_single += 1
            d = min(
                min(np.linalg.norm(E - F), np.linalg.norm(E + F)) for F in got
            )
            assert d < 1e-8, (s, d)
    assert n_single >= S  # at least one real solution per clean-ish sample
