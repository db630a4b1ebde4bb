"""Two-view epipolar geometry: essential-matrix RANSAC, pose recovery,
triangulation (north-star pipeline, SURVEY.md section 7.7: tracks -> pose
-> map points -> bundle adjustment).

Same TPU-native RANSAC shape as track/pose.py: every hypothesis is drawn,
solved (batched 8-point via SVD) and scored in one batch; pose recovery
tests the four (R, t) decompositions by batched cheirality counting;
triangulation is a batched per-point DLT. No per-feature Python loops
anywhere.

Convention: normalized camera coordinates (pixels pre-divided by focal,
principal point at 0) — pass pixels through `normalize_pixels`. x2^T E x1 = 0
with x = (u, v, 1); recovered (R, t) maps world==camera-1 frame to
camera 2: X_2 = R X_1 + t, |t| = 1 (scale is unobservable).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EssentialRansacConfig:
    n_hypotheses: int = 512
    # Inlier gate on the LINEAR Sampson distance in normalized coords
    # (~ pixels / focal): 2e-3 is ~0.8 px at focal 400.
    inlier_thresh: float = 2e-3
    seed: int = 0


def normalize_pixels(pts, focal: float, cx: float, cy: float):
    """Pixel coords -> normalized camera coords."""
    p = jnp.asarray(pts, jnp.float32)
    return (p - jnp.asarray([cx, cy], jnp.float32)) / jnp.float32(focal)


def _hartley(pts, w):
    """Weighted Hartley normalization: similarity T with weighted centroid
    at 0 and mean distance sqrt(2). Returns (pts_n, T)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - c) ** 2, axis=-1))
    s = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / wsum, 1e-9)
    T = jnp.asarray(
        [[s, 0.0, -s * c[0]], [0.0, s, -s * c[1]], [0.0, 0.0, 1.0]], pts.dtype
    )
    return (pts - c) * s, T


def _eight_point(p1, p2, w):
    """Weighted, Hartley-normalized 8-point algorithm: E s.t. x2^T E x1 = 0,
    from K pairs in normalized camera coords. Returns E with the essential
    constraint (two equal singular values, third zero) enforced."""
    p1n, T1 = _hartley(p1, w)
    p2n, T2 = _hartley(p2, w)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    o = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], axis=-1
    )  # (K, 9)
    _, _, vt = jnp.linalg.svd(A * w[:, None], full_matrices=False)
    En = vt[-1].reshape(3, 3)
    E = T2.T @ En @ T1  # denormalize
    # enforce essential structure
    u, s, vt2 = jnp.linalg.svd(E)
    sm = 0.5 * (s[0] + s[1])
    return u @ jnp.diag(jnp.asarray([sm, sm, 0.0], E.dtype)) @ vt2


def _sampson(E, p1, p2):
    """Linear Sampson distance per correspondence (K,), in the same units
    as the coordinates (normalized ~ pixels/focal)."""
    ones = jnp.ones((p1.shape[0], 1), p1.dtype)
    x1 = jnp.concatenate([p1, ones], axis=-1)  # (K,3)
    x2 = jnp.concatenate([p2, ones], axis=-1)
    Ex1 = x1 @ E.T  # (K,3)
    Etx2 = x2 @ E
    num = jnp.sum(x2 * Ex1, axis=-1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return jnp.sqrt(num / jnp.maximum(den, 1e-12))


@partial(jax.jit, static_argnames=("n_hypotheses",))
def _ransac_essential(p1, p2, valid, thresh, seed, n_hypotheses: int):
    K = p1.shape[0]
    key = jax.random.PRNGKey(seed)
    scores = jax.random.uniform(key, (n_hypotheses, K))
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    _, idx = jax.lax.top_k(scores, 8)

    def solve_one(ids):
        w = jnp.zeros((K,), p1.dtype).at[ids].set(1.0) * valid
        return _eight_point(p1, p2, w)

    Es = jax.vmap(solve_one)(idx)
    errs = jax.vmap(_sampson, in_axes=(0, None, None))(Es, p1, p2)
    inl = (errs <= thresh) & valid[None, :]
    # Hypothesis selection by MEDIAN residual (MEDSAC), not inlier count: a
    # minimal sample of 8 true correspondences yields an (almost) exact
    # model whose median residual is ~0, while contaminated samples score
    # orders of magnitude worse — far more discriminative than counting
    # inliers when outliers can sit near epipolar lines by chance.
    n_valid = jnp.sum(valid)
    errs_masked = jnp.where(valid[None, :], errs, jnp.inf)
    med_idx = jnp.maximum(n_valid // 2, 0)
    med_scores = jnp.sort(errs_masked, axis=-1)[:, med_idx]
    best = jnp.argmin(med_scores)
    # Trimmed-LS refit: a random outlier can sit ON the (1-D) epipolar
    # line and pass any fixed gate, and squared loss is hypersensitive to
    # it (one leaked outlier costs ~1 deg of rotation). Refitting on the
    # best half of the consensus (by residual) each round suppresses most
    # leakage; residual bias from epipolar-coincident outliers is inherent
    # to 8-point — a 5-point minimal solver + local optimization is the
    # known upgrade (ROADMAP).
    cur = inl[best]
    E = _eight_point(p1, p2, cur.astype(p1.dtype))
    for _ in range(6):
        e = _sampson(E, p1, p2)
        cur = (e <= thresh) & valid
        es = jnp.sort(jnp.where(cur, e, jnp.inf))
        med = es[jnp.maximum(jnp.sum(cur) // 2, 0)]
        trim = cur & (e <= med)
        E = _eight_point(p1, p2, trim.astype(p1.dtype))
    final_inl = (_sampson(E, p1, p2) <= thresh) & valid
    return E, final_inl, jnp.sum(final_inl)


def estimate_essential(
    pts1,
    pts2,
    valid=None,
    config: EssentialRansacConfig = EssentialRansacConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RANSAC essential matrix from matched NORMALIZED points.

    Returns (E (3,3), inlier mask (K,), inlier count)."""
    p1 = jnp.asarray(pts1, jnp.float32)
    p2 = jnp.asarray(pts2, jnp.float32)
    v = jnp.ones((p1.shape[0],), bool) if valid is None else jnp.asarray(valid, bool)
    return _ransac_essential(
        p1, p2, v, jnp.float32(config.inlier_thresh), config.seed, config.n_hypotheses
    )


def triangulate(P1, P2, p1, p2):
    """Batched DLT triangulation.

    P1/P2: (3,4) projection matrices (normalized coords: [R | t]);
    p1/p2: (K,2). Returns (K,3) points in the world (camera-1) frame.
    """

    def one(a, b):
        rows = jnp.stack(
            [
                a[0] * P1[2] - P1[0],
                a[1] * P1[2] - P1[1],
                b[0] * P2[2] - P2[0],
                b[1] * P2[2] - P2[1],
            ]
        )  # (4,4)
        _, _, vt = jnp.linalg.svd(rows)
        X = vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) > 1e-12, X[3], 1e-12)

    return jax.vmap(one)(jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32))


def recover_pose(E, p1, p2, inliers=None):
    """Decompose E into the (R, t) with maximal cheirality support.

    Returns (R (3,3), t (3,), n_in_front). t has unit norm.
    """
    u, _, vt = jnp.linalg.svd(E)
    # ensure proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = u @ W @ vt
    Rb = u @ W.T @ vt
    t = u[:, 2]
    K = p1.shape[0]
    mask = jnp.ones((K,), bool) if inliers is None else jnp.asarray(inliers, bool)
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)

    def support(R, tt):
        P2 = jnp.concatenate([R, tt[:, None]], axis=1)
        X = triangulate(P1, P2, p1, p2)  # world frame
        z1 = X[:, 2]
        z2 = (X @ R.T + tt)[:, 2]
        return jnp.sum((z1 > 0) & (z2 > 0) & mask)

    cands = [(Ra, t), (Ra, -t), (Rb, t), (Rb, -t)]
    counts = jnp.stack([support(R, tt) for R, tt in cands])
    best = jnp.argmax(counts)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best], counts[best]
