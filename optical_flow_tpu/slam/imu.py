"""IMU preintegration + monocular visual-inertial alignment.

The reference is pure vision (SURVEY.md §2 — no sensors beyond the
webcam); these are the standard hooks a production visual(-inertial)
tracker adds on top of the SLAM stack:

- `preintegrate`: Forster-style relative IMU deltas (dR, dv, dp) over a
  keyframe interval — ONE `lax.scan` over samples, `vmap`-batched over
  padded same-length intervals, so a whole trajectory's intervals
  integrate in one jitted call.
- `visual_inertial_alignment`: the classic linear initialization — given
  up-to-scale visual keyframe poses and the preintegrated deltas between
  them, solve for the metric scale, the gravity vector, and per-keyframe
  velocities in one least-squares system (the rotation part of vision is
  already metric, so the system is LINEAR in (s, g, v_i)).

- `estimate_gyro_bias`: Gauss-Newton on the SO(3) residuals between the
  preintegrated rotations and the relative VISUAL rotations (which are
  bias-free) — the standard first stage of VI initialization. The
  Jacobian w.r.t. the bias comes from jax.jacrev of the preintegration
  itself (no hand-derived right-Jacobian chains to get wrong).
- `visual_inertial_alignment_with_bias`: gyro-bias solve ->
  re-preintegration with corrected gyro -> the linear alignment extended
  with accelerometer-bias columns (d(dv,dp)/d(ba), again by jax autodiff).

Together they close the monocular scale gap without a stereo rig: a
SlamResult's trajectory (defined up to scale) plus an IMU log yields
metric scale + the world gravity direction, now under realistic sensor
biases (VERDICT r3 #6: the bias-free solver measurably fails at
0.01 rad/s gyro bias; see tests/test_imu.py). Accel bias is only weakly
observable without rotation variety — it is estimated jointly with the
|g|-constrained refinement and should be trusted only on trajectories
that actually rotate (the tests use one).

Conventions: body frame == camera frame (identity extrinsics);
accelerometer measures specific force a_b = R_bw (a_w - g_w); vision
poses are world->cam (R_i, t_i) with camera center c_i = -R_i^T t_i.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _exp_so3(w):
    """Axis-angle (3,) -> SO(3), smooth at 0 (f32-safe series switch).

    The large-angle branch divides by a CLAMPED th2: `where` evaluates
    both branches, and jacrev propagates NaN from an untaken 0/0 even
    though the forward pass is fine — at w == 0 exactly (e.g. a
    stationary gyro log) the unclamped (1-cos)/th2 NaN'd the gyro-bias
    Jacobian (found by tests/test_vi_ba.py's zero-rotation SLAM log)."""
    th2 = jnp.sum(w * w)
    th = jnp.sqrt(th2 + 1e-24)
    K = jnp.array(
        [[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]], [-w[1], w[0], 0.0]], w.dtype
    )
    A = jnp.where(th2 > 1e-12, jnp.sin(th) / th, 1.0 - th2 / 6.0)
    B = jnp.where(
        th2 > 1e-12,
        (1.0 - jnp.cos(th)) / jnp.maximum(th2, 1e-12),
        0.5 - th2 / 24.0,
    )
    return jnp.eye(3, dtype=w.dtype) + A * K + B * (K @ K)


@jax.jit
def preintegrate(gyro, accel, dt, valid=None):
    """Relative IMU deltas over (batched) sample windows.

    gyro, accel: (..., N, 3) body-frame angular rate / specific force;
    dt: (..., N) sample periods; valid: optional (..., N) bool — padded
    samples (vmap-batching ragged intervals to one length) contribute
    identity.

    Returns (dR (..., 3, 3), dv (..., 3), dp (..., 3)): the frame-i body
    pose change with gravity and initial velocity REMOVED — the
    preintegrated quantities of the standard VI formulation:
        R_{i+1} = R_i dR,  v_{i+1} = v_i + g T + R_i dv,
        p_{i+1} = p_i + v_i T + 1/2 g T^2 + R_i dp.
    (Here R_i is body->world; `visual_inertial_alignment` handles the
    world->cam flip.)
    """
    gyro = jnp.asarray(gyro, jnp.float32)
    accel = jnp.asarray(accel, jnp.float32)
    dt = jnp.asarray(dt, jnp.float32)
    if valid is None:
        valid = jnp.ones(dt.shape, bool)
    else:
        valid = jnp.asarray(valid, bool)

    def one(g_seq, a_seq, dt_seq, ok_seq):
        def step(carry, inp):
            R, v, p = carry
            w, a, h, ok = inp
            h = jnp.where(ok, h, 0.0)
            # midpoint rotation for the accel term (VINS-style): under
            # rotation, start-of-step Euler leaves an O(w h) bias on the
            # gravity-scale accel integral that rivals the motion signal
            # in the alignment equations (measured: 13% scale error on a
            # 1.6 rad/s spin at 200 Hz; midpoint makes it <1%)
            a_w = (R @ _exp_so3(w * (0.5 * h))) @ a
            p = p + v * h + 0.5 * a_w * h * h
            v = v + a_w * h
            R = R @ _exp_so3(w * h)
            return (R, v, p), None

        init = (jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
                jnp.zeros(3, jnp.float32))
        (R, v, p), _ = lax.scan(step, init, (g_seq, a_seq, dt_seq, ok_seq))
        return R, v, p

    flat_g = gyro.reshape((-1,) + gyro.shape[-2:])
    flat_a = accel.reshape((-1,) + accel.shape[-2:])
    flat_dt = dt.reshape((-1,) + dt.shape[-1:])
    flat_ok = valid.reshape((-1,) + valid.shape[-1:])
    R, v, p = jax.vmap(one)(flat_g, flat_a, flat_dt, flat_ok)
    lead = dt.shape[:-1]
    return R.reshape(lead + (3, 3)), v.reshape(lead + (3,)), p.reshape(lead + (3,))


def preintegrate_with_bias_jacobians(gyro, accel, dt, valid=None):
    """Preintegrated deltas plus FIRST-ORDER bias Jacobians (the Forster
    correction terms a bias-state VI-BA consumes, VERDICT r4 #4).

    gyro/accel are the (already bias-corrected) per-interval sample
    windows of `preintegrate`; the Jacobians are d(deltas)/d(delta-bias)
    at delta-bias = 0, produced by jax.jacfwd THROUGH the preintegration
    scan itself (6 JVP passes — no hand-derived right-Jacobian chains).
    The rotation Jacobian uses the standard Exp-correction
    parametrization dR(dbg) ~= dR Exp(J_dR_bg dbg); dv/dp are linear in
    the accelerometer, so their ba columns are exact, and their bg
    columns are the usual first-order rotation coupling.

    Returns (dR, dv, dp, J) with J a (..., 5, 3, 3) stack ordered
    [J_dR_bg, J_dv_bg, J_dv_ba, J_dp_bg, J_dp_ba] — the layout
    `slam.vi_ba.VIBAProblem.bias_jac` carries.
    """
    gyro = jnp.asarray(gyro, jnp.float32)
    accel = jnp.asarray(accel, jnp.float32)
    dt = jnp.asarray(dt, jnp.float32)
    if valid is None:
        valid = jnp.ones(dt.shape, bool)
    else:
        valid = jnp.asarray(valid, bool)

    def deltas(b):
        return preintegrate(gyro - b[:3], accel - b[3:], dt, valid)

    # ONE primal pass + 6 JVPs (jax.linearize): jacfwd(corrections) would
    # re-run the primal preintegration a second time just to re-derive
    # deltas it already has. The rotation Jacobian in the Exp-correction
    # chart falls out of the raw tangent: for dR(e) = dR0 Exp(J e),
    # dRdot = dR0 [J e]x, so J's columns are vee(dR0^T dRdot).
    zero = jnp.zeros(6, jnp.float32)
    (dR0, dv0, dp0), jvp = jax.linearize(deltas, zero)
    dRd, dvd, dpd = jax.vmap(jvp)(jnp.eye(6, dtype=jnp.float32))
    S = jnp.einsum("...ji,k...jl->k...il", dR0, dRd)  # (6, ..., 3, 3)
    S = 0.5 * (S - jnp.swapaxes(S, -1, -2))  # exact skew (f32 hygiene)
    w = jnp.stack([S[..., 2, 1], S[..., 0, 2], S[..., 1, 0]], axis=-1)
    Jr = jnp.moveaxis(w, 0, -1)  # (..., 3, 6); accel columns are zero
    Jv = jnp.moveaxis(dvd, 0, -1)
    Jp = jnp.moveaxis(dpd, 0, -1)
    J = jnp.stack(
        [Jr[..., :3], Jv[..., :3], Jv[..., 3:], Jp[..., :3], Jp[..., 3:]],
        axis=-3,
    )  # (..., 5, 3, 3)
    return dR0, dv0, dp0, J


def _log_so3(R):
    """SO(3) -> axis-angle (3,) for angles < pi/2, smooth AND
    differentiable at 0 (jax.jacrev flows through this in the gyro-bias
    Gauss-Newton; the arccos(trace) form has an infinite gradient at
    identity and NaNs the Jacobian). w = 2 sin(th) * axis from the skew
    part; th = arcsin(|w|/2); scale = th / (2 sin th) with its series."""
    w = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    x2 = jnp.sum(w * w) * 0.25 + 1e-24  # sin^2(th), eps keeps sqrt smooth
    x = jnp.sqrt(x2)
    th = jnp.arcsin(jnp.clip(x, 0.0, 1.0 - 1e-7))
    scale = jnp.where(x2 > 1e-12, th / (2.0 * x), 0.5 + x2 / 12.0)
    return w * scale


@jax.jit
def _rotation_residuals(bg, gyro, dt, valid, R_rel_vis):
    """Stacked Log(dR_i(bg)^T * RelVis_i) over intervals; the quantity
    estimate_gyro_bias drives to zero. gyro: (M, N, 3), dt/valid: (M, N),
    R_rel_vis: (M, 3, 3) body-frame relative visual rotations."""
    def one(g_seq, dt_seq, ok_seq, R_vis):
        def step(R, inp):
            w, h, ok = inp
            h = jnp.where(ok, h, 0.0)
            return R @ _exp_so3((w - bg) * h), None

        R, _ = lax.scan(
            step, jnp.eye(3, dtype=jnp.float32), (g_seq, dt_seq, ok_seq)
        )
        return _log_so3(R.T @ R_vis)

    return jax.vmap(one)(gyro, dt, valid, R_rel_vis)


def estimate_gyro_bias(poses, gyro, dt, valid=None, iters: int = 3):
    """Gyroscope bias from visual rotations (the bias-free measurement).

    poses: (K, 3, 3) world->cam visual keyframe rotations; gyro: (K-1, N, 3)
    body-rate samples per keyframe interval (padded to one length);
    dt: (K-1, N); valid: optional (K-1, N) bool for the padding.

    Gauss-Newton on r_i(bg) = Log(dR_i(bg)^T R_i^bw R_{i+1}^wb): each
    iteration re-preintegrates the rotations with the corrected gyro and
    takes one step with the jax.jacrev Jacobian (3 columns — cheap).
    Returns bg (3,) in rad/s.
    """
    poses = np.asarray(poses, np.float32)
    gyro = jnp.asarray(gyro, jnp.float32)
    dt = jnp.asarray(dt, jnp.float32)
    if valid is None:
        valid = jnp.ones(dt.shape, bool)
    else:
        valid = jnp.asarray(valid, bool)
    # relative visual rotation between body frames: with world->cam
    # poses[i] and body==cam, R^wb_i = poses[i]^T, so
    # dR_vis_i = (R^wb_i)^T R^wb_{i+1} = poses[i] @ poses[i+1]^T
    R_rel = jnp.asarray(
        np.stack([poses[i] @ poses[i + 1].T for i in range(len(poses) - 1)])
    )
    bg = jnp.zeros(3, jnp.float32)
    jac = jax.jit(jax.jacrev(_rotation_residuals, argnums=0))
    for _ in range(iters):
        r = np.asarray(_rotation_residuals(bg, gyro, dt, valid, R_rel))
        J = np.asarray(jac(bg, gyro, dt, valid, R_rel))
        Jf = J.reshape(-1, 3).astype(np.float64)
        rf = r.reshape(-1).astype(np.float64)
        step, *_ = np.linalg.lstsq(Jf, -rf, rcond=None)
        bg = bg + jnp.asarray(step, jnp.float32)
    return np.asarray(bg, np.float64)


def visual_inertial_alignment(
    poses, trans, interval_T, dv, dp, *, gravity_mag: float | None = None
) -> Tuple[float, np.ndarray, np.ndarray, float]:
    """Monocular VI initialization: metric scale + gravity + velocities.

    poses, trans: (K, 3, 3), (K, 3) world->cam visual keyframe poses
    (SlamResult.poses/.trans — up-to-scale translations).
    interval_T: (K-1,) total time of each keyframe interval.
    dv, dp: (K-1, 3) preintegrated deltas between consecutive keyframes
    (`preintegrate` on each interval's samples).

    Solves, linearly in (s, g, v_0..v_{K-1}):
        s (c_{i+1} - c_i) = v_i T_i + 1/2 g T_i^2 + R_i^wb dp_i
        v_{i+1} - v_i     = g T_i + R_i^wb dv_i
    where c_i are the visual camera centers and R_i^wb = poses[i]^T
    (body->world). Returns (scale, gravity (3,), velocities (K, 3),
    rms residual). If gravity_mag is given, g is refined to that norm by
    one projection + re-solve of the remaining unknowns (the standard
    VINS-style refinement).
    """
    poses = np.asarray(poses, np.float64)
    trans = np.asarray(trans, np.float64)
    T = np.asarray(interval_T, np.float64)
    dv = np.asarray(dv, np.float64)
    dp = np.asarray(dp, np.float64)
    K = len(poses)
    if K < 3:
        raise ValueError("alignment needs >= 3 keyframes")
    centers = np.stack([-R.T @ t for R, t in zip(poses, trans)])
    Rwb = np.stack([R.T for R in poses])  # body->world

    # unknown vector x = [s, g(3), v_0..v_{K-1} (3K)]
    n = 1 + 3 + 3 * K
    rows_A, rows_b = [], []
    for i in range(K - 1):
        Ti = T[i]
        # position row (3 eqs)
        A = np.zeros((3, n))
        A[:, 0] = centers[i + 1] - centers[i]
        A[:, 1:4] = -0.5 * Ti * Ti * np.eye(3)
        A[:, 4 + 3 * i : 7 + 3 * i] = -Ti * np.eye(3)
        rows_A.append(A)
        rows_b.append(Rwb[i] @ dp[i])
        # velocity row (3 eqs)
        A = np.zeros((3, n))
        A[:, 1:4] = -Ti * np.eye(3)
        A[:, 4 + 3 * i : 7 + 3 * i] = -np.eye(3)
        A[:, 4 + 3 * (i + 1) : 7 + 3 * (i + 1)] = np.eye(3)
        rows_A.append(A)
        rows_b.append(Rwb[i] @ dv[i])
    A = np.concatenate(rows_A)
    b = np.concatenate(rows_b)
    x, *_ = np.linalg.lstsq(A, b, rcond=None)
    if gravity_mag is not None:
        # project g onto the sphere |g| = gravity_mag, then re-solve the
        # rest with g fixed (one step of the tangent-space refinement)
        g = x[1:4]
        g = g / max(np.linalg.norm(g), 1e-12) * gravity_mag
        A2 = np.delete(A, [1, 2, 3], axis=1)
        b2 = b - A[:, 1:4] @ g
        x2, *_ = np.linalg.lstsq(A2, b2, rcond=None)
        x = np.concatenate([x2[:1], g, x2[1:]])
    resid = A @ x - b
    rms = float(np.sqrt(np.mean(resid**2)))
    s = float(x[0])
    g = x[1:4].copy()
    v = x[4:].reshape(K, 3).copy()
    return s, g, v, rms


def visual_inertial_alignment_with_bias(
    poses,
    trans,
    interval_T,
    gyro,
    accel,
    dt,
    valid=None,
    *,
    gravity_mag: float | None = 9.81,
    estimate_accel_bias: bool = True,
    gyro_iters: int = 3,
):
    """VI initialization under sensor biases (VERDICT r3 #6).

    Same visual inputs as `visual_inertial_alignment`, but raw per-interval
    IMU logs instead of precomputed deltas: gyro/accel (K-1, N, 3),
    dt (K-1, N), valid optional padding mask.

    Pipeline: (1) gyro bias from visual rotations (`estimate_gyro_bias`);
    (2) re-preintegrate with the corrected gyro; (3) the linear alignment
    extended with accelerometer-bias columns — d(dv, dp)/d(ba) from
    jax.jacrev of the preintegration (ba enters as accel - ba, evaluated
    at ba = 0; the deltas are linear in accel so these Jacobians are
    exact, not a linearization error). ba and g are separable only when
    the body ROTATES during the log; with gravity_mag given, g is
    projected to its sphere and (s, ba, v) re-solved, the standard
    VINS-style refinement.

    Returns (scale, gravity (3,), velocities (K, 3), bg (3,), ba (3,), rms).
    """
    gyro = np.asarray(gyro, np.float32)
    accel = np.asarray(accel, np.float32)
    dt_np = np.asarray(dt, np.float32)
    if valid is None:
        valid = np.ones(dt_np.shape, bool)
    bg = estimate_gyro_bias(poses, gyro, dt_np, valid, iters=gyro_iters)
    corrected = gyro - np.asarray(bg, np.float32)

    def deltas(ba):
        _, dv, dp = preintegrate(
            jnp.asarray(corrected), jnp.asarray(accel) - ba,
            jnp.asarray(dt_np), jnp.asarray(valid),
        )
        return dv, dp

    dv0, dp0 = deltas(jnp.zeros(3, jnp.float32))
    Jdv, Jdp = jax.jit(jax.jacrev(deltas))(jnp.zeros(3, jnp.float32))
    dv0, dp0 = np.asarray(dv0, np.float64), np.asarray(dp0, np.float64)
    Jdv, Jdp = np.asarray(Jdv, np.float64), np.asarray(Jdp, np.float64)

    poses_np = np.asarray(poses, np.float64)
    trans_np = np.asarray(trans, np.float64)
    T = np.asarray(interval_T, np.float64)
    K = len(poses_np)
    if K < 3:
        raise ValueError("alignment needs >= 3 keyframes")
    centers = np.stack([-R.T @ t for R, t in zip(poses_np, trans_np)])
    Rwb = np.stack([R.T for R in poses_np])
    nb = 3 if estimate_accel_bias else 0

    def solve(g_fix=None):
        """One linear solve. g_fix=None: g free (3 columns). Otherwise
        g = g_fix + B w with B an orthonormal tangent basis at g_fix
        (2 columns) — the |g|-sphere parametrization that removes the
        radial (g, ba) gauge freedom which makes the free system
        rank-deficient under weak rotation (the VINS RefineGravity
        iteration). Unknowns: [s, g-part, ba?, v_0..v_{K-1}]."""
        if g_fix is None:
            ng, B, g0 = 3, np.eye(3), np.zeros(3)
        else:
            g0 = g_fix
            k = g0 / np.linalg.norm(g0)
            t0 = np.array([1.0, 0.0, 0.0])
            if abs(k[0]) > 0.9:
                t0 = np.array([0.0, 1.0, 0.0])
            b1 = np.cross(k, t0)
            b1 /= np.linalg.norm(b1)
            b2 = np.cross(k, b1)
            ng, B = 2, np.stack([b1, b2], axis=1)
        n = 1 + ng + nb + 3 * K
        rows_A, rows_b = [], []
        for i in range(K - 1):
            Ti = T[i]
            A = np.zeros((3, n))
            A[:, 0] = centers[i + 1] - centers[i]
            A[:, 1 : 1 + ng] = -0.5 * Ti * Ti * B
            if nb:
                # dp(ba) = dp0 + Jdp ba; the ba term moves to the unknowns
                A[:, 1 + ng : 4 + ng] = -Rwb[i] @ Jdp[i]
            A[:, 1 + ng + nb + 3 * i : 4 + ng + nb + 3 * i] = -Ti * np.eye(3)
            rows_A.append(A)
            rows_b.append(Rwb[i] @ dp0[i] + 0.5 * Ti * Ti * g0)
            A = np.zeros((3, n))
            A[:, 1 : 1 + ng] = -Ti * B
            if nb:
                A[:, 1 + ng : 4 + ng] = -Rwb[i] @ Jdv[i]
            A[:, 1 + ng + nb + 3 * i : 4 + ng + nb + 3 * i] = -np.eye(3)
            A[:, 1 + ng + nb + 3 * (i + 1) : 4 + ng + nb + 3 * (i + 1)] = np.eye(3)
            rows_A.append(A)
            rows_b.append(Rwb[i] @ dv0[i] + Ti * g0)
        A = np.concatenate(rows_A)
        b = np.concatenate(rows_b)
        x, *_ = np.linalg.lstsq(A, b, rcond=None)
        g = g0 + B @ x[1 : 1 + ng]
        ba_est = x[1 + ng : 4 + ng].copy() if nb else np.zeros(3)
        v_est = x[1 + ng + nb :].reshape(K, 3).copy()
        rms_est = float(np.sqrt(np.mean((A @ x - b) ** 2)))
        return float(x[0]), g, ba_est, v_est, rms_est

    if gravity_mag is None:
        s, g, ba, v, rms = solve(None)
    else:
        # bootstrap direction from the free solve, then iterate on the
        # |g| sphere (3-4 iterations converge; each re-linearizes B at
        # the renormalized g)
        _, g, _, _, _ = solve(None)
        for _ in range(4):
            g = g / max(np.linalg.norm(g), 1e-12) * gravity_mag
            s, g, ba, v, rms = solve(g)
        g = g / max(np.linalg.norm(g), 1e-12) * gravity_mag
    return s, g, v, np.asarray(bg), ba, rms
