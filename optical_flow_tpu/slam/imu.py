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

Together they close the monocular scale gap without a stereo rig: a
SlamResult's trajectory (defined up to scale) plus an IMU log yields
metric scale + the world gravity direction. No bias estimation here —
biases are a refinement loop on top of the same deltas (the Jacobians
of (dR, dv, dp) w.r.t. bias are the standard extension), and the
alignment is already useful with factory-calibrated IMUs.

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
    """Axis-angle (3,) -> SO(3), smooth at 0 (f32-safe series switch)."""
    th2 = jnp.sum(w * w)
    th = jnp.sqrt(th2 + 1e-24)
    K = jnp.array(
        [[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]], [-w[1], w[0], 0.0]], w.dtype
    )
    A = jnp.where(th2 > 1e-12, jnp.sin(th) / th, 1.0 - th2 / 6.0)
    B = jnp.where(th2 > 1e-12, (1.0 - jnp.cos(th)) / th2, 0.5 - th2 / 24.0)
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
            # midpoint-free Euler on SO(3) x R^6 (the standard discrete
            # preintegration; accuracy is set by the IMU rate)
            p = p + v * h + 0.5 * (R @ a) * h * h
            v = v + (R @ a) * h
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
