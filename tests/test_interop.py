"""Evaluation-format interop (utils/interop.py): Middlebury .flo flow
files and TUM trajectory text — the formats the community's benchmark
tooling consumes."""

import numpy as np
import pytest

from optical_flow_tpu.utils.interop import (
    load_flo,
    load_tum_trajectory,
    rotation_to_quaternion,
    save_flo,
    save_tum_trajectory,
    _quaternion_to_rotation,
)


def test_flo_round_trip(tmp_path):
    rng = np.random.RandomState(3)
    u = rng.randn(37, 53).astype(np.float32) * 4
    v = rng.randn(37, 53).astype(np.float32) * 4
    p = str(tmp_path / "f.flo")
    save_flo(p, u, v)
    u2, v2 = load_flo(p)
    np.testing.assert_array_equal(u2, u)
    np.testing.assert_array_equal(v2, v)


def test_flo_layout_matches_spec(tmp_path):
    """Byte layout pinned against the published format: float magic
    202021.25, int32 width then height, row-major interleaved (u, v)."""
    u = np.arange(6, dtype=np.float32).reshape(2, 3)
    v = -u
    p = str(tmp_path / "f.flo")
    save_flo(p, u, v)
    raw = open(p, "rb").read()
    assert np.frombuffer(raw[:4], np.float32)[0] == np.float32(202021.25)
    assert tuple(np.frombuffer(raw[4:12], np.int32)) == (3, 2)
    body = np.frombuffer(raw[12:], "<f4")
    np.testing.assert_array_equal(body[0::2], u.ravel())
    np.testing.assert_array_equal(body[1::2], v.ravel())


def test_flo_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.flo")
    open(p, "wb").write(b"not a flo file at all")
    with pytest.raises(ValueError):
        load_flo(p)


def _random_rotations(n, seed=0):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(seed)
    Rs = []
    for _ in range(n):
        r = rng.randn(3)
        Rs.append(cv2.Rodrigues(r)[0])
    # include near-180-degree rotations (the naive trace formula's
    # failure zone Shepperd's method must survive)
    for axis in np.eye(3):
        Rs.append(cv2.Rodrigues(axis * (np.pi - 1e-6))[0])
    return Rs


def test_quaternion_round_trip():
    for R in _random_rotations(20):
        q = rotation_to_quaternion(R)
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-12)
        np.testing.assert_allclose(_quaternion_to_rotation(q), R, atol=1e-9)


def test_tum_round_trip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(5)
    K = 7
    poses = np.stack([cv2.Rodrigues(rng.randn(3) * 0.4)[0] for _ in range(K)])
    trans = rng.randn(K, 3)
    ts = np.arange(K) / 30.0
    p = str(tmp_path / "traj.txt")
    save_tum_trajectory(p, ts, poses, trans)
    ts2, poses2, trans2 = load_tum_trajectory(p)
    np.testing.assert_allclose(ts2, ts, atol=1e-6)
    np.testing.assert_allclose(poses2, poses, atol=1e-5)
    np.testing.assert_allclose(trans2, trans, atol=1e-5)
    # format spot check: 8 columns, comment header
    lines = open(p).read().splitlines()
    assert lines[0].startswith("#")
    assert len(lines) == K + 1
    assert all(len(l.split()) == 8 for l in lines[1:])


def test_cli_flow_flo_and_slam_tum(tmp_path, capsys):
    """The CLI surfaces: flow --flo writes a loadable .flo of the exact
    computed flow; slam --out-tum writes a parseable trajectory whose
    centers match the printed solution."""
    import sys

    cv2 = pytest.importorskip("cv2")
    from optical_flow_tpu.utils.goldens import reference_dir

    ref = reference_dir()
    if ref is None:
        pytest.skip("reference checkout not available")
    import optical_flow_tpu.__main__ as cli

    flo = str(tmp_path / "out.flo")
    argv = sys.argv
    try:
        sys.argv = [
            "x", "flow", str(ref / "testdata" / "table1.jpg"),
            str(ref / "testdata" / "table2.jpg"),  # 685x494: 1 level max
            "--flo", flo,
        ]
        cli.main()
    finally:
        sys.argv = argv
    u, v = load_flo(flo)
    assert u.shape == v.shape and u.ndim == 2
    assert np.isfinite(u).all() and np.isfinite(v).all()

    # slam --out-tum on the rendered loop
    from tests.test_incremental_slam import _render_loop

    frames, centers, focal = _render_loop(n_frames=8)
    clip = str(tmp_path / "loop.mp4")
    h, w = frames[0].shape
    vw = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 20.0, (w, h), False)
    if not vw.isOpened():
        pytest.skip("no mp4 encoder")
    for f in frames:
        vw.write(f)
    vw.release()
    tum = str(tmp_path / "traj.txt")
    argv = sys.argv
    try:
        sys.argv = [
            "x", "slam", "--input", clip, "--focal", str(focal),
            "--window", "8", "--out-tum", tum,
        ]
        cli.main()
    finally:
        sys.argv = argv
    ts, poses, trans = load_tum_trajectory(tum)
    assert len(ts) >= 2
    assert np.isfinite(trans).all()

    # self-evaluation closes the loop: --eval-tum against the trajectory
    # just exported must associate every pose and report ~zero ATE/RPE
    argv = sys.argv
    try:
        sys.argv = [
            "x", "slam", "--input", clip, "--focal", str(focal),
            "--window", "8", "--eval-tum", tum,
        ]
        cli.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    import re

    m = re.search(r"ATE\(sim3\) rmse ([0-9.]+)", out)
    assert m, out
    assert float(m.group(1)) < 1e-4, out
    assert "RPE trans" in out


def test_ate_sim3_recovers_scaled_rotated_trajectory():
    """ATE with Sim(3) alignment: a rescaled+rotated+shifted copy of a
    trajectory aligns to ~zero error; with noise the RMSE reports it."""
    cv2 = pytest.importorskip("cv2")
    from optical_flow_tpu.utils.interop import ate_rmse

    rng = np.random.RandomState(7)
    ref = np.cumsum(rng.randn(20, 3) * 0.1, axis=0)
    R = cv2.Rodrigues(np.asarray([0.2, -0.3, 0.5]))[0]
    est = (2.5 * (R.T @ (ref - [1.0, 2.0, -0.5]).T)).T  # inverse map
    rmse, err, (s, Ra, t) = ate_rmse(est, ref, align="sim3")
    assert rmse < 1e-9, rmse
    noisy = est + rng.randn(*est.shape) * 0.01
    rmse_n, _, _ = ate_rmse(noisy, ref, align="sim3")
    assert 0.005 < rmse_n < 0.1, rmse_n
    # se3 alignment cannot absorb the 2.5x scale
    rmse_se3, _, _ = ate_rmse(est, ref, align="se3")
    assert rmse_se3 > 0.1, rmse_se3


def test_rpe_zero_on_identical_and_positive_on_drift():
    cv2 = pytest.importorskip("cv2")
    from optical_flow_tpu.utils.interop import rpe_stats

    rng = np.random.RandomState(9)
    K = 12
    poses = np.stack([cv2.Rodrigues(rng.randn(3) * 0.2)[0] for _ in range(K)])
    trans = rng.randn(K, 3)
    r = rpe_stats(poses, trans, poses, trans)
    assert r["trans_rmse"] < 1e-12 and r["rot_rmse_rad"] < 1e-7
    assert r["n_pairs"] == K - 1
    drift = trans + np.arange(K)[:, None] * [0.01, 0, 0]
    r2 = rpe_stats(poses, drift, poses, trans)
    assert 0.005 < r2["trans_rmse"] < 0.05, r2


def test_kitti_flow_round_trip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from optical_flow_tpu.utils.interop import load_kitti_flow, save_kitti_flow

    rng = np.random.RandomState(11)
    u = rng.uniform(-80, 80, (24, 31))
    v = rng.uniform(-80, 80, (24, 31))
    valid = rng.rand(24, 31) > 0.2
    p = str(tmp_path / "f.png")
    save_kitti_flow(p, u, v, valid)
    u2, v2, valid2 = load_kitti_flow(p)
    np.testing.assert_array_equal(valid2, valid)
    # 1/64 px quantization of the devkit encoding
    np.testing.assert_allclose(u2[valid], u[valid], atol=1.0 / 64)
    np.testing.assert_allclose(v2[valid], v[valid], atol=1.0 / 64)
    assert (u2[~valid] == 0).all() and (v2[~valid] == 0).all()
    # the file really is a 16-bit 3-channel PNG
    img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert img.dtype == np.uint16 and img.shape == (24, 31, 3)
