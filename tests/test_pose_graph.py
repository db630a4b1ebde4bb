"""Pose-graph optimization, loop closure, relocalization (slam/pose_graph).

Synthetic trajectories with exact ground truth: a drifted odometry chain
around a loop, a loop-closure edge, and a rendered-scene relocalization.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from optical_flow_tpu.slam.pose_graph import (
    PoseGraph,
    _log_so3,
    propose_loop_candidates,
    relative_pose,
    thumbnail_descriptor,
)


def _rot(axis, th):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _circle_trajectory(N=24, radius=5.0):
    """Ground-truth world->cam poses of a camera circling the origin."""
    Rs, ts = [], []
    for k in range(N):
        th = 2 * np.pi * k / N
        Rw = _rot([0, 1, 0], th)  # cam-from-world rotation
        cw = np.array([radius * np.sin(th), 0.0, -radius * np.cos(th)])  # center
        Rs.append(Rw)
        ts.append(-Rw @ cw)
    return np.stack(Rs).astype(np.float32), np.stack(ts).astype(np.float32)


def _integrate_with_drift(Rs, ts, rot_noise=0.004, t_noise=0.01, seed=3):
    """Chain the true relative poses with small per-step errors — the
    classic drifted odometry trajectory."""
    rng = np.random.RandomState(seed)
    N = len(Rs)
    R_est = [Rs[0]]
    t_est = [ts[0]]
    for i in range(N - 1):
        R_ij, t_ij = relative_pose(Rs[i], ts[i], Rs[i + 1], ts[i + 1])
        R_ij = _rot(rng.randn(3), rot_noise) @ R_ij
        t_ij = t_ij + rng.randn(3) * t_noise
        R_est.append((R_ij @ R_est[-1]).astype(np.float32))
        t_est.append((R_ij @ t_est[-1] + t_ij).astype(np.float32))
    return np.stack(R_est), np.stack(t_est)


def _pose_errors(Rs_a, ts_a, Rs_b, ts_b):
    angs, tds = [], []
    for Ra, ta, Rb, tb in zip(Rs_a, ts_a, Rs_b, ts_b):
        angs.append(
            np.degrees(np.arccos(np.clip((np.trace(Ra.T @ Rb) - 1) / 2, -1, 1)))
        )
        tds.append(np.linalg.norm(ta - tb))
    return np.array(angs), np.array(tds)


def test_pose_graph_closes_the_loop():
    Rs_true, ts_true = _circle_trajectory()
    Rs_drift, ts_drift = _integrate_with_drift(Rs_true, ts_true)
    ang0, td0 = _pose_errors(Rs_drift, ts_drift, Rs_true, ts_true)

    g = PoseGraph.from_odometry(Rs_drift, ts_drift)
    # the loop-closure edge: the TRUE relative pose between ends (what
    # geometric verification of the revisited place would measure)
    R_lc, t_lc = relative_pose(
        Rs_true[0], ts_true[0], Rs_true[-1], ts_true[-1]
    )
    g.add_edge(0, len(Rs_true) - 1, R_lc, t_lc, weight=4.0)
    Rn, tn = g.optimize()
    ang1, td1 = _pose_errors(Rn, tn, Rs_true, ts_true)
    # gauge: pose 0 untouched
    np.testing.assert_allclose(Rn[0], Rs_drift[0], atol=1e-6)
    # drift at the far end shrinks substantially
    assert ang1[-1] < ang0[-1] * 0.5, (ang0[-1], ang1[-1])
    assert td1[-1] < td0[-1] * 0.5, (td0[-1], td1[-1])
    # and the average error improves too
    assert ang1.mean() < ang0.mean()
    assert td1.mean() < td0.mean()
    # rotations stay orthonormal
    for R in Rn:
        assert np.abs(R @ R.T - np.eye(3)).max() < 1e-5


def test_pose_graph_consistent_chain_is_fixed_point():
    """With edges exactly equal to the current relative poses, the
    optimizer must leave the trajectory (essentially) unchanged."""
    Rs, ts = _circle_trajectory(N=10)
    g = PoseGraph.from_odometry(Rs, ts)
    Rn, tn = g.optimize(iters=5)
    ang, td = _pose_errors(Rn, tn, Rs, ts)
    assert ang.max() < 1e-3, ang.max()
    assert td.max() < 1e-4, td.max()
    assert g.residual_norms().max() < 1e-6


def test_log_so3_roundtrip():
    from optical_flow_tpu.slam.epipolar import _exp_so3

    rng = np.random.RandomState(0)
    for _ in range(10):
        d = rng.randn(3)
        # log inverts exp only for |theta| < pi (and the skew-part formula
        # degrades approaching pi); residual rotations are tiny in practice
        w = d / np.linalg.norm(d) * rng.uniform(1e-7, 2.8)
        R = np.asarray(_exp_so3(jnp.asarray(w, jnp.float32)))
        w2 = np.asarray(_log_so3(jnp.asarray(R)))
        np.testing.assert_allclose(w2, w, atol=5e-4)


def test_propose_loop_candidates_finds_revisit():
    rng = np.random.RandomState(1)
    imgs = [rng.rand(64, 64).astype(np.float32) for _ in range(15)]
    imgs.append(imgs[0] + rng.randn(64, 64).astype(np.float32) * 0.01)  # revisit
    descs = [thumbnail_descriptor(im) for im in imgs]
    cands = propose_loop_candidates(descs, min_separation=10)
    assert cands[0][:2] == (0, 15), cands[0]


def test_pnp_ransac_with_outliers():
    from optical_flow_tpu.slam.pnp import pnp_ransac

    rng = np.random.RandomState(7)
    X = np.stack(
        [rng.randn(80) * 1.5, rng.randn(80), rng.uniform(3, 10, 80)], axis=1
    ).astype(np.float32)
    R_true = _rot([0.3, 0.7, -0.2], 0.15)
    t_true = np.array([0.4, -0.2, 0.3])
    Xc = X @ R_true.T + t_true
    x = (Xc[:, :2] / Xc[:, 2:3]).astype(np.float32)
    out = rng.rand(80) < 0.25
    x[out] = rng.randn(out.sum(), 2).astype(np.float32) * 0.4
    R, t, inl = pnp_ransac(X, x)
    inl = np.asarray(inl)
    ang = np.degrees(
        np.arccos(np.clip((np.trace(np.asarray(R).T @ R_true) - 1) / 2, -1, 1))
    )
    assert ang < 0.5, ang
    np.testing.assert_allclose(np.asarray(t), t_true, atol=0.01)
    assert inl[~out].mean() > 0.9
    assert inl[out].mean() < 0.2


def test_relocalize_against_synthetic_map():
    cv2 = pytest.importorskip("cv2")
    from optical_flow_tpu.slam.frontend import multi_view_reconstruct
    from optical_flow_tpu.slam.pose_graph import relocalize

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
    disp_unit = focal / depth
    frames = [base]
    for k in (1, 2, 3):
        tx = 0.05 * k
        frames.append(
            cv2.remap(base, xs + tx * disp_unit, ys, cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_REFLECT_101)
        )
    rec = multi_view_reconstruct(frames[:3], focal)
    assert rec is not None
    # frame 3 was never used in the reconstruction: relocalize it
    got = relocalize(
        frames[3], frames[:3], rec.tracks, rec.points, focal, w / 2.0, h / 2.0
    )
    assert got is not None
    R, t, kf, n = got
    # nearest keyframe by appearance should be the closest viewpoint (2)
    assert kf == 2, kf
    assert n >= 20
    # the new camera continues the +x slide: its center sits beyond the
    # last reconstructed camera's along x. center = -R^T t (world == cam0
    # frame; rec.cams rows are (axis-angle, t)).
    from optical_flow_tpu.slam.epipolar import _exp_so3

    c3 = -np.asarray(R).T @ np.asarray(t)
    R2 = np.asarray(_exp_so3(jnp.asarray(rec.cams[2, :3], jnp.float32)))
    c2 = -R2.T @ rec.cams[2, 3:]
    assert c3[0] > c2[0], (c3, c2)


def test_sim3_pose_graph_corrects_scale_drift():
    """Monocular scale drift, the representable model: every odometry
    edge measures the correct relative (R, t) but a scale ratio of 0.93
    (each keyframe's local map is ~7% smaller than its predecessor's —
    the classic compounding monocular failure). Integrated, the
    trajectory spirals inward with node scales gamma^k. A single
    true-scale loop edge lets the Sim(3) graph lift the scales back and
    recover the geometry; the SE(3) graph has no scale dof and is stuck
    with the spiral."""
    from optical_flow_tpu.slam.pose_graph import Sim3PoseGraph, sim3_compose

    Rs_true, ts_true = _circle_trajectory(N=16)
    gamma = 0.93
    # measured Sim(3) odometry edges: (gamma, R_rel_true, t_rel_true)
    edges = []
    for i in range(len(Rs_true) - 1):
        R_ij, t_ij = relative_pose(
            Rs_true[i], ts_true[i], Rs_true[i + 1], ts_true[i + 1]
        )
        edges.append((gamma, R_ij, t_ij))
    # integrate the drifted Sim(3) trajectory
    S = [(1.0, Rs_true[0], ts_true[0])]
    for m in edges:
        S.append(sim3_compose(m, S[-1]))
    ss0 = np.asarray([s for s, _, _ in S], np.float32)
    Rs0 = np.stack([R for _, R, _ in S]).astype(np.float32)
    ts0 = np.stack([t for _, _, t in S]).astype(np.float32)

    true_c = np.stack([-R.T @ t for R, t in zip(Rs_true, ts_true)])

    def center_errs(centers):
        return np.linalg.norm(centers - true_c, axis=1)

    g7 = Sim3PoseGraph(ss=ss0.copy(), Rs=Rs0.copy(), ts=ts0.copy())
    for i, (s_m, R_m, t_m) in enumerate(edges):
        g7.add_edge(i, i + 1, s_m, R_m, t_m)
    drift = center_errs(g7.centers())
    assert drift[-1] > 1.0  # the spiral is a real failure before closure

    R_lc, t_lc = relative_pose(Rs_true[0], ts_true[0], Rs_true[-1], ts_true[-1])
    g7.add_edge(0, len(Rs_true) - 1, 1.0, R_lc, t_lc, weight=4.0)
    ss, Rsim, tsim = g7.optimize(iters=20)
    sim3 = center_errs(g7.centers(ss, Rsim, tsim))

    # the SE(3) baseline: odometry edges measured from the drifted
    # trajectory itself (an SE(3) system cannot see the scale components,
    # so its edges ARE the drifted relative poses) + the same loop edge
    g3 = PoseGraph.from_odometry(Rs0, ts0)
    g3.add_edge(0, len(Rs_true) - 1, R_lc, t_lc, weight=4.0)
    Rse, tse = g3.optimize(iters=20)
    se3 = center_errs(np.stack([-R.T @ t for R, t in zip(Rse, tse)]))

    assert sim3.mean() < se3.mean() * 0.5, (sim3.mean(), se3.mean())
    assert sim3.mean() < drift.mean() * 0.25, (sim3.mean(), drift.mean())
    # the node scales lift back toward 1 from gamma^15 = 0.34
    assert abs(ss[0] - 1.0) < 1e-6  # gauge
    assert ss[-1] > 0.7, ss


def test_sim3_consistent_chain_is_fixed_point():
    from optical_flow_tpu.slam.pose_graph import Sim3PoseGraph

    Rs, ts = _circle_trajectory(N=8)
    g = Sim3PoseGraph.from_se3_odometry(Rs, ts)
    ss, Rn, tn = g.optimize(iters=5)
    np.testing.assert_allclose(ss, 1.0, atol=1e-4)
    ang, td = _pose_errors(Rn, tn, Rs, ts)
    assert ang.max() < 1e-3 and td.max() < 1e-3


def test_sim3_compose_inverse_roundtrip():
    from optical_flow_tpu.slam.pose_graph import sim3_compose, sim3_inverse

    rng = np.random.RandomState(2)
    a = (1.7, _rot(rng.randn(3), 0.4), rng.randn(3))
    b = (0.6, _rot(rng.randn(3), -0.9), rng.randn(3))
    s, R, t = sim3_compose(a, sim3_inverse(a))
    assert abs(s - 1) < 1e-6 and np.abs(R - np.eye(3)).max() < 1e-6
    assert np.abs(t).max() < 1e-5
    # associativity of apply: (a∘b)(X) == a(b(X))
    X = rng.randn(3)
    sc, Rc, tc = sim3_compose(a, b)
    direct = sc * (Rc @ X) + tc
    nested = a[0] * (a[1] @ (b[0] * (b[1] @ X) + b[2])) + a[2]
    np.testing.assert_allclose(direct, nested, rtol=1e-5)


def test_umeyama_alignment_recovers_similarity():
    from optical_flow_tpu.slam.pose_graph import umeyama_alignment

    rng = np.random.RandomState(4)
    X = rng.randn(50, 3).astype(np.float32)
    s_true, R_true, t_true = 0.37, _rot([0.2, -1.0, 0.5], 0.8), np.array([1.0, -2.0, 0.5])
    Y = s_true * (X @ R_true.T) + t_true
    s, R, t = umeyama_alignment(X, Y)
    assert abs(s - s_true) < 1e-4
    assert np.abs(R - R_true).max() < 1e-4
    np.testing.assert_allclose(t, t_true, atol=1e-4)
    # weighted: gross outliers with zero weight don't perturb the fit
    Yo = Y.copy()
    Yo[:5] += 100.0
    w = np.ones(50); w[:5] = 0.0
    s2, R2, t2 = umeyama_alignment(X, Yo, w=w)
    assert abs(s2 - s_true) < 1e-4
    np.testing.assert_allclose(t2, t_true, atol=1e-4)


def test_umeyama_feeds_sim3_loop_edge():
    """End-to-end mechanism: measure a loop edge's Sim(3) from matched
    local structure with Umeyama, feed it to the graph."""
    from optical_flow_tpu.slam.pose_graph import Sim3PoseGraph, umeyama_alignment

    rng = np.random.RandomState(5)
    # structure expressed in keyframe i's local frame, and the same points
    # in keyframe j's local frame whose map is 0.4x scaled and rotated
    Xi = rng.randn(40, 3).astype(np.float32) + np.array([0, 0, 6], np.float32)
    s_ij, R_ij = 0.4, _rot([0.1, 0.9, 0.2], 0.5)
    t_ij = np.array([0.3, -0.1, 0.2])
    Xj = s_ij * (Xi @ R_ij.T) + t_ij
    s, R, t = umeyama_alignment(Xi, Xj)
    assert abs(s - s_ij) < 1e-4 and np.abs(R - R_ij).max() < 1e-4


def test_measure_loop_sim3_recovers_scale_drift():
    """The production loop-edge measurement (measure_loop_sim3): at a
    revisit, keyframe i's landmarks and keyframe j's landmarks cover the
    same physical corners but live in the drifted map at different local
    scales. The LK-track + nearest-landmark association + trimmed Umeyama
    must recover the relative similarity — including the scale ratio —
    WITHOUT triangulation (the i-j baseline at a revisit is ~zero, which
    would poison any triangulation-based measurement)."""
    cv2 = pytest.importorskip("cv2")
    from optical_flow_tpu.slam.pose_graph import measure_loop_sim3

    rng = np.random.RandomState(8)
    h, w, focal = 320, 416, 400.0
    cx, cy = w / 2.0, h / 2.0
    base = cv2.resize(
        rng.rand(80, 104).astype(np.float32), (w, h), interpolation=cv2.INTER_CUBIC
    )
    base = (255 * (base - base.min()) / np.ptp(base)).astype(np.uint8)
    depth = np.clip(
        4.0 + 6.0 * cv2.resize(rng.rand(10, 13).astype(np.float32), (w, h),
                               interpolation=cv2.INTER_CUBIC), 3.0, 12.0
    )
    tx = 0.02  # ~1.6 px disparity: a true revisit, near-zero baseline
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    frame_i = base
    frame_j = cv2.remap(base, xs + tx * focal / depth, ys, cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_REFLECT_101)
    t_j_true = np.array([-tx, 0.0, 0.0])  # world->cam-j, camera slid +x

    # physical points on a grid; world == camera-i frame (pose_i = identity)
    uu, vv = np.meshgrid(np.arange(60, w - 60, 42), np.arange(60, h - 60, 42))
    uu, vv = uu.ravel(), vv.ravel()
    Z = depth[vv, uu]
    X = np.stack([(uu - cx) / focal * Z, (vv - cy) / focal * Z, Z], axis=1)

    sigma = 0.6  # j's neighborhood of the map drifted to 0.6x scale
    obs_i = [(k, np.array([u, v], np.float32)) for k, (u, v) in enumerate(zip(uu, vv))]
    # j's own landmark observations: the same corners as seen in frame j
    # (content at u in frame j came from u + disp in frame i), re-detected
    # with sub-pixel jitter; their map entries carry j's drifted scale
    disp = tx * focal / Z
    obs_j = [
        (1000 + k,
         np.array([u - d + rng.uniform(-0.8, 0.8),
                   v + rng.uniform(-0.8, 0.8)], np.float32))
        for k, (u, v, d) in enumerate(zip(uu, vv, disp))
    ]
    points = {k: X[k] for k in range(len(uu))}
    points.update({1000 + k: sigma * X[k] for k in range(len(uu))})

    got = measure_loop_sim3(
        frame_i, frame_j, obs_i, obs_j, points,
        np.eye(3), np.zeros(3), np.eye(3), sigma * t_j_true,
    )
    assert got is not None
    s, R, t, n = got
    assert n >= 12, n
    assert abs(s - sigma) < 0.05 * sigma, s
    ang = np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))
    assert ang < 1.0, ang
    np.testing.assert_allclose(t, sigma * t_j_true, atol=0.02)


def test_place_descriptor_survives_viewpoint_change():
    """The Fourier-Mellin place descriptor ranks a revisit first under
    in-plane rotation + zoom + brightness/contrast shift; the 16x16
    thumbnail NCC provably fails on the same queries (measured: at 60
    degrees/1.3x it ranks a different place first). This is why
    incremental_slam proposes loop candidates with place_descriptor."""
    cv2 = pytest.importorskip("cv2")
    from optical_flow_tpu.slam.pose_graph import place_descriptor

    h = w = 160

    def make_place(seed):
        r = np.random.RandomState(seed)
        img = cv2.resize(r.rand(40, 40).astype(np.float32), (w, h),
                         interpolation=cv2.INTER_CUBIC)
        return (255 * (img - img.min()) / np.ptp(img)).astype(np.uint8)

    places = [make_place(s) for s in range(12)]

    def query(rot, sc):
        M = cv2.getRotationMatrix2D((w / 2, h / 2), rot, sc)
        q = cv2.warpAffine(places[4], M, (w, h), flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_REFLECT_101)
        return np.clip(q.astype(np.float32) * 1.3 + 30.0, 0, 255).astype(np.uint8)

    def top1(desc_fn, q):
        dq = desc_fn(q)
        dists = [float(np.linalg.norm(desc_fn(p) - dq)) for p in places]
        return int(np.argmin(dists))

    thumb_fails = 0
    for rot, sc in ((25, 1.15), (60, 1.3), (90, 1.2)):
        q = query(rot, sc)
        assert top1(place_descriptor, q) == 4, (rot, sc)
        if top1(thumbnail_descriptor, q) != 4:
            thumb_fails += 1
    # the thumbnail path demonstrably fails on these queries
    assert thumb_fails >= 2, thumb_fails


def test_measure_loop_sim3_degenerate_inputs():
    """measure_loop_sim3 must return None (not crash) on thin support:
    empty observation lists, observations whose points left the map, and
    keyframes with fewer landmarks than min_support."""
    from optical_flow_tpu.slam.pose_graph import measure_loop_sim3

    rng = np.random.RandomState(0)
    img = (rng.rand(96, 128) * 255).astype(np.float32)
    I3, z3 = np.eye(3), np.zeros(3)
    # empty obs
    assert measure_loop_sim3(img, img, [], [], {}, I3, z3, I3, z3) is None
    # obs referencing retired/absent points
    obs = [(k, np.array([20.0 + k, 30.0], np.float32)) for k in range(20)]
    assert measure_loop_sim3(img, img, obs, obs, {}, I3, z3, I3, z3) is None
    # fewer than min_support landmarks in the map
    pts = {k: np.array([0.0, 0.0, 5.0]) for k in range(5)}
    assert (
        measure_loop_sim3(img, img, obs[:5], obs[:5], pts, I3, z3, I3, z3)
        is None
    )
