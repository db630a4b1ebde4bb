"""Perspective-n-Point: absolute camera pose from 3D-2D correspondences.

DLT linear solve (SVD of the 2K x 12 design matrix) with orthonormal
R projection and cheirality sign fix — batched over correspondences, used
by the multi-view front end to chain keyframes onto the map. Inputs are
normalized camera coordinates (see epipolar.normalize_pixels).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pnp_dlt(X, x, w=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera pose from K>=6 correspondences.

    X: (K, 3) world points; x: (K, 2) normalized image points; w: optional
    (K,) weights. Returns (R (3,3), t (3,)) with x ~ pi(R X + t).
    """
    X = jnp.asarray(X, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    K = X.shape[0]
    w = jnp.ones((K,), X.dtype) if w is None else jnp.asarray(w, X.dtype)
    Xh = jnp.concatenate([X, jnp.ones((K, 1), X.dtype)], axis=1)  # (K,4)
    z = jnp.zeros((K, 4), X.dtype)
    r1 = jnp.concatenate([Xh, z, -x[:, 0:1] * Xh], axis=1)  # (K,12)
    r2 = jnp.concatenate([z, Xh, -x[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    P = vt[-1].reshape(3, 4)
    M = P[:, :3]
    # orthonormalize: R = U V^T; the arithmetic mean of the singular values
    # estimates the projective scale |lambda|
    u, s, vt2 = jnp.linalg.svd(M)
    R0 = u @ vt2
    det = jnp.linalg.det(R0)
    # The SVD null-vector sign ambiguity (P vs -P) cancels: forcing
    # det(R) = +1 and carrying the sign into the scale makes (R, t)
    # invariant, and cheirality is then automatic for consistent data.
    R = R0 * det
    t = P[:, 3] / (det * jnp.mean(s))
    return R, t


def reprojection_errors(R, t, X, x) -> jnp.ndarray:
    """Per-point reprojection error in normalized coords (K,)."""
    Xc = X @ R.T + t
    z = jnp.where(jnp.abs(Xc[:, 2:3]) > 1e-9, Xc[:, 2:3], 1e-9)
    proj = Xc[:, :2] / z
    return jnp.sqrt(jnp.sum((proj - x) ** 2, axis=-1))
