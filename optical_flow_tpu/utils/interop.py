"""Interop with the standard optical-flow / SLAM evaluation formats.

The reference persists flow only as its private %lf text matrices
(saveMat, LKof.cpp:139-150 — `utils/goldens.py` covers that for
parity). A production framework also has to speak the community
formats its outputs get EVALUATED in:

- Middlebury `.flo` — the interchange format of every dense-flow
  benchmark (Middlebury/Sintel/KITTI tooling): magic float 202021.25,
  int32 width/height, row-major interleaved (u, v) float32.
- TUM trajectory text — the format of the TUM-RGBD / evo evaluation
  tools: one `timestamp tx ty tz qx qy qz qw` line per pose,
  CAMERA-TO-WORLD convention (our SlamResult stores world->cam).
"""

from __future__ import annotations

import numpy as np

_FLO_MAGIC = 202021.25


def save_flo(path, u, v) -> None:
    """Write a dense flow field as Middlebury .flo."""
    u = np.asarray(u, np.float32)
    v = np.asarray(v, np.float32)
    if u.ndim != 2 or u.shape != v.shape:
        raise ValueError(f"u/v must be matching (H, W); got {u.shape} {v.shape}")
    H, W = u.shape
    with open(path, "wb") as f:
        np.float32(_FLO_MAGIC).tofile(f)
        np.asarray([W, H], np.int32).tofile(f)
        np.stack([u, v], axis=-1).astype("<f4").tofile(f)


def load_flo(path):
    """Read a Middlebury .flo file -> (u (H, W), v (H, W)) float32."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, 1)
        if magic.size != 1 or magic[0] != np.float32(_FLO_MAGIC):
            raise ValueError(f"{path}: not a .flo file (magic {magic})")
        W, H = np.fromfile(f, np.int32, 2)
        data = np.fromfile(f, "<f4", int(W) * int(H) * 2)
    if data.size != W * H * 2:
        raise ValueError(f"{path}: truncated .flo payload")
    uv = data.reshape(int(H), int(W), 2)
    return uv[..., 0].copy(), uv[..., 1].copy()


def rotation_to_quaternion(R) -> np.ndarray:
    """(3,3) rotation -> unit quaternion (qx, qy, qz, qw), TUM order.

    Shepperd's method (branch on the largest diagonal term) — stable for
    every rotation, unlike the naive trace formula near 180 degrees."""
    R = np.asarray(R, np.float64)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        qx = 0.25 * s
        qw = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 1] + R[1, 0]) / s
        qz = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        qy = 0.25 * s
        qw = (R[0, 2] - R[2, 0]) / s
        qx = (R[0, 1] + R[1, 0]) / s
        qz = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        qz = 0.25 * s
        qw = (R[1, 0] - R[0, 1]) / s
        qx = (R[0, 2] + R[2, 0]) / s
        qy = (R[1, 2] + R[2, 1]) / s
    q = np.asarray([qx, qy, qz, qw])
    return q / np.linalg.norm(q)


def save_tum_trajectory(path, timestamps, poses, trans) -> None:
    """Write world->cam keyframe poses as a TUM trajectory file.

    timestamps: (K,) seconds; poses/trans: (K,3,3)/(K,3) world->cam
    (`SlamResult.poses/.trans`). TUM wants camera-to-world: the camera
    center c = -R^T t and orientation R^T, as
    `timestamp tx ty tz qx qy qz qw` — consumable by evo/TUM tooling
    (`evo_traj tum <path>`)."""
    timestamps = np.asarray(timestamps, np.float64)
    poses = np.asarray(poses, np.float64)
    trans = np.asarray(trans, np.float64)
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for ts, R, t in zip(timestamps, poses, trans):
            c = -R.T @ t
            q = rotation_to_quaternion(R.T)
            f.write(
                f"{ts:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )


def load_tum_trajectory(path):
    """Read a TUM trajectory -> (timestamps (K,), poses (K,3,3) world->cam,
    trans (K,3)) — the inverse of `save_tum_trajectory`."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(x) for x in line.split()])
    if not rows:
        raise ValueError(f"{path}: empty TUM trajectory")
    arr = np.asarray(rows, np.float64)
    if arr.shape[1] != 8:
        raise ValueError(f"{path}: expected 8 columns, got {arr.shape[1]}")
    ts = arr[:, 0]
    cs = arr[:, 1:4]
    qs = arr[:, 4:8]
    poses = np.stack([_quaternion_to_rotation(q).T for q in qs])  # world->cam
    trans = np.stack([-R @ c for R, c in zip(poses, cs)])
    return ts, poses, trans


def _quaternion_to_rotation(q) -> np.ndarray:
    x, y, z, w = np.asarray(q, np.float64) / np.linalg.norm(q)
    return np.asarray(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )
