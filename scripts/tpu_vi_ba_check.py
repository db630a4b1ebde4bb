"""Visual-inertial BA on the real chip (f32, the production dtype).

CI runs slam/vi_ba.py on CPU only (x64). This check pins the two TPU-only
numerics hazards the f64 tests cannot see:

1. matmul-pass precision: the TPU default computes f32 einsums/solves
   with bf16 multiplies. The GN normal equations square the conditioning
   and the Schur complement cancels — measured here (2026-08-19, v5e):
   the default precision walks the metric scale to 0.8503 (center err
   0.071); `jax.default_matmul_precision('float32')` inside the solvers
   (ba.py/vi_ba.py) recovers 0.9912 / 0.0055.
2. the mixed-unit reduced camera system in f32 (pixel-, rad-, m/s-unit
   rows with 1e6-spread weights): Jacobi preconditioning in
   _solve_cameras (precondition=True on the VI path).

Run: python scripts/tpu_vi_ba_check.py   (NOT under pytest; single client)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from optical_flow_tpu.utils.compat import enable_persistent_cache

enable_persistent_cache()
# warm compile BEFORE cv2/libavcodec loads (docs/TPU_WEDGE_LOG.md deadlock)
jax.jit(lambda x: x + 1)(jnp.ones(8)).block_until_ready()
print("device:", jax.devices())

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)
os.environ.setdefault("OPTICAL_FLOW_REFERENCE_DIR", "/root/reference")
from test_vi_ba import _make_scene, _problem, _scale_of  # noqa: E402

from optical_flow_tpu.slam.vi_ba import vi_bundle_adjust  # noqa: E402


def main():
    sc = _make_scene()
    rng = np.random.RandomState(7)
    states = np.concatenate([sc["cams"], sc["vel"]], -1)
    pert = states.copy()
    pert[1:, :3] += rng.randn(len(states) - 1, 3) * 0.01
    pert[1:, 3:6] += rng.randn(len(states) - 1, 3) * 0.02
    pert[:, 6:9] += rng.randn(len(states), 3) * 0.05
    prob = _problem(
        sc, states=pert, points=sc["X"] + rng.randn(*sc["X"].shape) * 0.02
    )
    t0 = time.time()
    out, hist = vi_bundle_adjust(prob, iters=12, lam=1e-4)
    jax.block_until_ready(out.states)
    t1 = time.time()
    t2 = time.time()
    out2, _ = vi_bundle_adjust(prob, iters=12, lam=1e-4)
    jax.block_until_ready(out2.states)
    t3 = time.time()
    scale, est = _scale_of(np.asarray(out.states), sc)
    err = np.linalg.norm(est - sc["centers"], axis=1)
    print(
        f"TPU f32 VI-BA: compile+run {t1 - t0:.1f}s warm {1e3 * (t3 - t2):.1f} ms"
        f" scale {scale:.4f} center err {err.mean():.5f}"
    )
    assert abs(scale - 1.0) < 0.02, scale
    assert err.mean() < 0.01, err.mean()
    print("OK: metric scale recovered in f32 on", jax.devices()[0])

    bias_state_check(sc, rng)


def bias_state_check(sc, rng):
    """The 15-DOF bias-state solve in f32 on chip (round 5): its reduced
    camera system mixes MORE units than the 9-DOF one (pixel, rad, m/s,
    rad/s, m/s^2 with random-walk weights), so the Jacobi-preconditioned
    f32 path must be re-pinned at this width — the end-to-end
    refine_with_imu under an injected DRIFTING gyro bias, as in
    tests/test_vi_ba_bias_states.py but on the real device."""
    from test_vi_ba_bias_states import _add_drifting_bias  # noqa: E402

    from optical_flow_tpu.slam.vi_ba import refine_with_imu  # noqa: E402

    s_true = 3.0
    bg0 = np.asarray([0.01, -0.008, 0.012])
    bg_slope = np.asarray([0.016, -0.012, 0.014])
    ba0 = np.asarray([0.08, -0.05, 0.10])
    gyro, accel = _add_drifting_bias(sc, bg0, bg_slope, ba0, 0.0)
    t0 = time.time()
    out_b, info_b = refine_with_imu(
        sc["poses"], sc["trans"] / s_true, sc["X"] / s_true,
        sc["cam_idx"], sc["pt_idx"], sc["obs"], 500.0,
        gyro, accel, sc["dt"], iters=12, bias_states=True,
        bias_rw_weight=(1e2, 1e2),
    )
    jax.block_until_ready(out_b.states)
    t1 = time.time()
    _, est_b = _scale_of(np.asarray(out_b.states), sc)
    err_b = np.linalg.norm(est_b - sc["centers"], axis=1).mean()
    span = np.linalg.norm(sc["centers"], axis=1).max()
    bg_kf = info_b["gyro_bias_per_kf"]
    true_bg = bg0[None] + bg_slope[None] * sc["kf_t"][:, None]
    track = np.abs(bg_kf - true_bg).mean()
    print(
        f"TPU f32 bias-state VI-BA: {t1 - t0:.1f}s center err {err_b:.4f} "
        f"({err_b / span:.3f} span) bias track MAE {track:.5f} rad/s"
    )
    assert err_b < 0.03 * span, (err_b, span)
    assert track < 0.006, track
    print("OK: drifting bias tracked in f32 on", jax.devices()[0])


if __name__ == "__main__":
    main()
