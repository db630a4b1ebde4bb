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


def pnp_ransac(
    X,
    x,
    valid=None,
    *,
    n_hypotheses: int = 256,
    inlier_thresh: float = 2e-3,
    seed: int = 0,
):
    """Robust PnP: batched 6-point DLT hypotheses, inlier counting on the
    reprojection error, then a weighted refit on the consensus (same
    all-hypotheses-in-one-batch shape as epipolar._ransac_essential).

    Returns (R, t, inlier mask). The gate adapts to the winning
    hypothesis's median residual like the essential RANSAC.
    """
    import jax

    X = jnp.asarray(X, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    K = X.shape[0]
    v = jnp.ones((K,), bool) if valid is None else jnp.asarray(valid, bool)
    key = jax.random.PRNGKey(seed)
    scores = jnp.where(v[None, :], jax.random.uniform(key, (n_hypotheses, K)), -jnp.inf)
    _, idx = jax.lax.top_k(scores, 6)

    def solve_one(ids):
        w = jnp.zeros((K,), X.dtype).at[ids].set(1.0) * v
        return pnp_dlt(X, x, w)

    Rs, ts = jax.vmap(solve_one)(idx)
    errs = jax.vmap(lambda R, t: reprojection_errors(R, t, X, x))(Rs, ts)
    errs_m = jnp.where(v[None, :], errs, jnp.inf)
    med_idx = jnp.maximum(jnp.sum(v) // 2, 0)
    med = jnp.sort(errs_m, axis=-1)[:, med_idx]
    best = jnp.argmin(med)
    t0 = jnp.asarray(inlier_thresh, X.dtype)
    cap = 8.0 * t0  # see epipolar: never adapt the gate to garbage scale
    base = jnp.clip(2.5 * med[best], t0, cap)

    def gate(e):
        # re-adapt per model (see epipolar._ransac_essential): the current
        # model's median residual tracks the real noise scale; a minimal
        # sample's near-exact fit must not freeze the gate below it
        med_all = jnp.sort(jnp.where(v, e, jnp.inf))[med_idx]
        return jnp.clip(2.5 * med_all, base, cap)

    R, t = Rs[best], ts[best]
    for _ in range(3):
        e = reprojection_errors(R, t, X, x)
        cur = (e <= gate(e)) & v
        # floor at the 6 best residuals so the DLT never goes degenerate
        em = jnp.where(v, e, jnp.inf)
        k6 = em <= jnp.sort(em)[jnp.minimum(5, jnp.sum(v) - 1)]
        cur = jnp.where(jnp.sum(cur) >= 6, cur, k6 & v)
        R, t = pnp_dlt(X, x, cur.astype(X.dtype))
    e = reprojection_errors(R, t, X, x)
    final = (e <= gate(e)) & v
    return R, t, final
