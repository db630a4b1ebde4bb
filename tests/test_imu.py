"""IMU preintegration + monocular visual-inertial alignment
(slam/imu.py): batched deltas pinned against closed forms, and the
linear alignment recovering metric scale + gravity on a synthetic
trajectory — including from a real monocular SlamResult."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from optical_flow_tpu.slam.imu import preintegrate, visual_inertial_alignment

G_W = np.asarray([0.0, -9.81, 0.0])  # world gravity (acceleration)


def test_preintegrate_constant_rates_closed_form():
    """Constant angular rate about one axis and constant acceleration:
    dR = exp([w]x T) exactly (same-axis rotations compose), dv = a T and
    dp = 1/2 a T^2 exactly (piecewise-constant Euler is exact there)."""
    import cv2

    N, h = 400, 0.0025  # T = 1 s
    w = np.asarray([0.0, 0.0, 1.3])
    a = np.asarray([0.4, -0.2, 9.0])
    gyro = np.tile(w, (N, 1))
    accel = np.tile(a, (N, 1))
    dt = np.full(N, h)
    dR, dv, dp = preintegrate(gyro, accel, dt)
    Rt, _ = cv2.Rodrigues(w * N * h)
    np.testing.assert_allclose(np.asarray(dR), Rt, atol=1e-5)
    # accel is rotated by the evolving dR: closed form is the integral of
    # exp([w]x t) a — check against a fine numpy reference instead
    R = np.eye(3)
    v = np.zeros(3)
    p = np.zeros(3)
    for _ in range(N):
        Rm, _ = cv2.Rodrigues(w * (h / 2))  # midpoint rotation (slam/imu.py)
        aw = (R @ Rm) @ a
        p = p + v * h + 0.5 * aw * h * h
        v = v + aw * h
        Rh, _ = cv2.Rodrigues(w * h)
        R = R @ Rh
    np.testing.assert_allclose(np.asarray(dv), v, atol=1e-4)  # f32 scan
    np.testing.assert_allclose(np.asarray(dp), p, atol=1e-4)


def test_preintegrate_batched_and_padded():
    """(B, N, 3) batching and the valid mask: a padded interval matches
    its unpadded integration; all-padding gives identity."""
    rng = np.random.RandomState(3)
    g1 = rng.randn(50, 3) * 0.5
    a1 = rng.randn(50, 3)
    dt1 = np.full(50, 0.004)
    dR1, dv1, dp1 = preintegrate(g1, a1, dt1)

    gp = np.zeros((2, 80, 3))
    ap = np.zeros((2, 80, 3))
    dtp = np.zeros((2, 80))
    ok = np.zeros((2, 80), bool)
    gp[0, :50], ap[0, :50], dtp[0, :50], ok[0, :50] = g1, a1, dt1, True
    dR, dv, dp = preintegrate(gp, ap, dtp, valid=ok)
    np.testing.assert_allclose(np.asarray(dR[0]), np.asarray(dR1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv[0]), np.asarray(dv1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dp[0]), np.asarray(dp1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dR[1]), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(dv[1]), 0, atol=1e-7)


def _loop_trajectory(K=12, period=6.0, rate_hz=200.0):
    """The test loop's camera centers as a continuous-time trajectory
    (radius as in the SLAM tests), with exact velocity/acceleration."""
    om = 2 * np.pi / period

    def c(t):
        return np.stack([0.12 * np.sin(om * t), 0.08 * (1 - np.cos(om * t)),
                         np.zeros_like(t)], -1)

    def acc(t):
        return np.stack([-0.12 * om * om * np.sin(om * t),
                         0.08 * om * om * np.cos(om * t),
                         np.zeros_like(t)], -1)

    kf_t = np.linspace(0.0, period * (K - 1) / K, K)
    n = int(round((kf_t[1] - kf_t[0]) * rate_hz))
    gyros, accels, dts = [], [], []
    for i in range(K - 1):
        ts = kf_t[i] + (np.arange(n) + 0.5) / rate_hz
        accels.append(acc(ts) - G_W)  # body frame == world (R = I)
        gyros.append(np.zeros((n, 3)))
        dts.append(np.full(n, 1.0 / rate_hz))
    return c(kf_t), kf_t, np.stack(gyros), np.stack(accels), np.stack(dts)


def test_alignment_recovers_scale_and_gravity():
    s_true = 3.7
    centers, kf_t, gyro, accel, dt = _loop_trajectory()
    dR, dv, dp = preintegrate(gyro, accel, dt)
    K = len(centers)
    poses = np.tile(np.eye(3), (K, 1, 1))
    trans = -centers / s_true  # up-to-scale vision: c_vis = c_true/s
    s, g, v, rms = visual_inertial_alignment(
        poses, trans, np.diff(kf_t), np.asarray(dv), np.asarray(dp)
    )
    assert abs(s - s_true) / s_true < 0.02, s
    np.testing.assert_allclose(g, G_W, atol=0.15)
    assert rms < 1e-2, rms
    # velocity of the first keyframe: dc/dt at t=0 is (0.12*om, 0, 0)
    om = 2 * np.pi / 6.0
    np.testing.assert_allclose(v[0], [0.12 * om, 0.0, 0.0], atol=0.02)


def test_alignment_gravity_mag_refinement():
    centers, kf_t, gyro, accel, dt = _loop_trajectory()
    _, dv, dp = preintegrate(gyro, accel, dt)
    K = len(centers)
    poses = np.tile(np.eye(3), (K, 1, 1))
    s, g, _, _ = visual_inertial_alignment(
        poses, trans=-centers / 2.0, interval_T=np.diff(kf_t),
        dv=np.asarray(dv), dp=np.asarray(dp), gravity_mag=9.81,
    )
    assert abs(np.linalg.norm(g) - 9.81) < 1e-9
    assert abs(s - 2.0) / 2.0 < 0.02


def test_alignment_rejects_too_few_keyframes():
    with pytest.raises(ValueError):
        visual_inertial_alignment(
            np.tile(np.eye(3), (2, 1, 1)), np.zeros((2, 3)), np.ones(1),
            np.zeros((1, 3)), np.zeros((1, 3)),
        )


def test_alignment_on_monocular_slam_result():
    """End-to-end hook: monocular SLAM's up-to-scale trajectory + an IMU
    log -> metric scale. The recovered scale must match the oracle scale
    fitted directly against ground truth."""
    cv2 = pytest.importorskip("cv2")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_incremental_slam import _render_loop

    from optical_flow_tpu.slam import incremental_slam

    n = 12
    frames, centers, focal = _render_loop(n_frames=n)
    res = incremental_slam(
        frames, focal, loop_min_separation=20, min_tracks=40, window=8
    )
    assert res is not None and len(res.keyframes) >= 6
    # IMU from the TRUE trajectory between the chosen keyframes
    period = 6.0
    om = 2 * np.pi / period
    rate = 200.0

    def acc(t):
        return np.stack([-0.12 * om * om * np.sin(om * t),
                         0.08 * om * om * np.cos(om * t),
                         np.zeros_like(t)], -1)

    kf_t = np.asarray(res.keyframes) * (period / n)
    segs = []
    for i in range(len(kf_t) - 1):
        m = int(round((kf_t[i + 1] - kf_t[i]) * rate))
        ts = kf_t[i] + (np.arange(m) + 0.5) / rate
        segs.append((np.zeros((m, 3)), acc(ts) - G_W, np.full(m, 1 / rate)))
    width = max(len(s[2]) for s in segs)
    B = len(segs)
    gyro = np.zeros((B, width, 3))
    accel = np.zeros((B, width, 3))
    dt = np.zeros((B, width))
    ok = np.zeros((B, width), bool)
    for i, (gs, as_, hs) in enumerate(segs):
        m = len(hs)
        gyro[i, :m], accel[i, :m], dt[i, :m], ok[i, :m] = gs, as_, hs, True
    _, dv, dp = preintegrate(gyro, accel, dt, valid=ok)
    s, g, _, _ = visual_inertial_alignment(
        res.poses, res.trans, np.diff(kf_t), np.asarray(dv), np.asarray(dp),
        gravity_mag=9.81,
    )
    est = res.centers()
    true = np.asarray([centers[i] for i in res.keyframes])
    s_oracle = np.linalg.norm(true[1]) / max(np.linalg.norm(est[1]), 1e-12)
    # metric centers from the IMU-aligned scale match ground truth
    err = np.linalg.norm(est * s - true, axis=1)
    assert abs(s - s_oracle) / s_oracle < 0.15, (s, s_oracle)
    assert err.mean() < 0.05, (s, s_oracle, err)
    np.testing.assert_allclose(
        g / np.linalg.norm(g), G_W / 9.81, atol=0.1
    )


def _rotating_trajectory(K=12, period=6.0, rate_hz=200.0, spin_period=4.0):
    """The circular trajectory with the BODY additionally spinning — about
    one axis for the first half of the log and a different one for the
    second half. Bias estimation NEEDS this rotation-axis variety: under
    a single fixed spin axis the accel-bias component along that axis is
    a constant world-frame acceleration, exactly confounded with gravity
    (measured here: the free (g, ba) system is rank-deficient and scale
    lands anywhere)."""
    import cv2

    om = 2 * np.pi / period
    k1 = np.asarray([0.3, 0.2, 1.0])
    k1 /= np.linalg.norm(k1)
    k2 = np.asarray([1.0, -0.3, 0.2])
    k2 /= np.linalg.norm(k2)
    om_spin = 2 * np.pi / spin_period
    t_switch = period * (K - 1) / K / 2.0

    def c(t):
        return np.stack([0.12 * np.sin(om * t), 0.08 * (1 - np.cos(om * t)),
                         np.zeros_like(t)], -1)

    def acc_w(t):
        return np.stack([-0.12 * om * om * np.sin(om * t),
                         0.08 * om * om * np.cos(om * t),
                         np.zeros_like(t)], -1)

    def axis(t):
        return k1 if t < t_switch else k2

    def R_wb(t):  # body->world: piecewise single-axis spin, continuous
        if t < t_switch:
            R, _ = cv2.Rodrigues(k1 * (om_spin * t))
            return R
        R0, _ = cv2.Rodrigues(k1 * (om_spin * t_switch))
        R1, _ = cv2.Rodrigues(k2 * (om_spin * (t - t_switch)))
        return R0 @ R1

    kf_t = np.linspace(0.0, period * (K - 1) / K, K)
    n = int(round((kf_t[1] - kf_t[0]) * rate_hz))
    gyros, accels, dts = [], [], []
    for i in range(K - 1):
        ts = kf_t[i] + (np.arange(n) + 0.5) / rate_hz
        # single-axis segments: body rate = om_spin * axis (axis is the
        # same in world and body frames while spinning about it)
        gyros.append(np.stack([axis(t) * om_spin for t in ts]))
        accels.append(
            np.stack([R_wb(t).T @ (a - G_W) for t, a in zip(ts, acc_w(ts))])
        )
        dts.append(np.full(n, 1.0 / rate_hz))
    poses = np.stack([R_wb(t).T for t in kf_t])  # world->cam = (R^wb)^T
    return c(kf_t), poses, kf_t, np.stack(gyros), np.stack(accels), np.stack(dts)


def test_gyro_bias_estimation_recovers_injected_bias():
    from optical_flow_tpu.slam.imu import estimate_gyro_bias

    bg_true = np.asarray([0.01, -0.008, 0.012])
    centers, poses, kf_t, gyro, accel, dt = _rotating_trajectory()
    bg = estimate_gyro_bias(poses, gyro + bg_true, dt)
    np.testing.assert_allclose(bg, bg_true, atol=1.5e-3)


def test_alignment_with_bias_under_realistic_biases():
    """VERDICT r3 #6's done-criterion, both halves: under bg=0.01 rad/s,
    ba=0.1 m/s^2 the bias-free solver measurably fails, and the
    bias-estimating pipeline recovers scale within a few percent."""
    from optical_flow_tpu.slam.imu import visual_inertial_alignment_with_bias

    s_true = 3.7
    bg_true = np.asarray([0.01, -0.006, 0.008])
    ba_true = np.asarray([0.10, -0.07, 0.05])
    centers, poses, kf_t, gyro, accel, dt = _rotating_trajectory()
    gyro_m = gyro + bg_true
    accel_m = accel + ba_true
    trans = np.stack([-R @ c for R, c in zip(poses, centers)]) / s_true

    # the bias-free solver on biased logs: measurably wrong scale
    _, dv_b, dp_b = preintegrate(gyro_m, accel_m, dt)
    s_biased, _, _, rms_biased = visual_inertial_alignment(
        poses, trans, np.diff(kf_t), np.asarray(dv_b), np.asarray(dp_b),
        gravity_mag=9.81,
    )
    assert abs(s_biased - s_true) / s_true > 0.05, (
        "bias-free solver unexpectedly robust", s_biased)

    s, g, v, bg, ba, rms = visual_inertial_alignment_with_bias(
        poses, trans, np.diff(kf_t), gyro_m, accel_m, dt,
        gravity_mag=9.81, estimate_accel_bias=True,
    )
    assert abs(s - s_true) / s_true < 0.03, (s, s_true)
    np.testing.assert_allclose(bg, bg_true, atol=1.5e-3)
    np.testing.assert_allclose(ba, ba_true, atol=0.04)
    np.testing.assert_allclose(
        g / np.linalg.norm(g), G_W / np.linalg.norm(G_W), atol=0.05
    )
    assert rms < rms_biased


def test_gyro_bias_jacobian_finite_at_zero_rates():
    """Regression: at an EXACTLY zero gyro log (stationary or
    translation-only rig) the bias Jacobian used to NaN — jnp.where
    evaluates both branches and jacrev propagated the untaken
    (1-cos)/th2 0/0 in _exp_so3 (now clamped)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from optical_flow_tpu.slam.imu import _rotation_residuals, estimate_gyro_bias

    rng = np.random.RandomState(0)
    K = 5
    poses = np.stack([cv2.Rodrigues(rng.randn(3) * 1e-3)[0] for _ in range(K)])
    R_rel = jnp.asarray(
        np.stack([poses[i] @ poses[i + 1].T for i in range(K - 1)]), jnp.float32
    )
    gyro = jnp.zeros((K - 1, 20, 3), jnp.float32)
    dt = jnp.full((K - 1, 20), 0.005, jnp.float32)
    ok = jnp.ones((K - 1, 20), bool)
    J = jax.jacrev(_rotation_residuals, argnums=0)(
        jnp.zeros(3, jnp.float32), gyro, dt, ok, R_rel
    )
    assert bool(jnp.isfinite(J).all())
    bg = estimate_gyro_bias(poses, np.asarray(gyro), np.asarray(dt), np.asarray(ok))
    assert np.isfinite(bg).all() and np.abs(bg).max() < 0.01
