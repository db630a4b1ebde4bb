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
import numpy as np


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
    # Noise-adaptive gate: the winning median residual is a robust scale
    # estimate (median of |N(0, s)| = 0.674 s, so 2.5x median ~ 1.7 s keeps
    # ~91% of true matches). Noise-free data leaves the configured gate
    # untouched (median ~ 0); without this, measurement noise above
    # thresh/2 made the trim loop collapse to an empty support. CAPPED at
    # 8x the configured gate: on garbage correspondences (e.g. LK
    # "converging" on a corrupted frame) the median is itself garbage and
    # an uncapped gate would declare everything an inlier.
    cap = 8.0 * thresh
    thresh = jnp.clip(2.5 * med_scores[best], thresh, cap)
    # Trimmed-LS refit: a random outlier can sit ON the (1-D) epipolar
    # line and pass any fixed gate, and squared loss is hypersensitive to
    # it (one leaked outlier costs ~1 deg of rotation). Refitting on the
    # best half of the consensus (by residual) each round suppresses most
    # leakage; residual bias from epipolar-coincident outliers is inherent
    # to 8-point — the upgrades are the 5-point minimal solver
    # (ransac_essential_5pt) and Gauss-Newton local optimization on the
    # consensus (refine_pose).
    def floor8(e, cur):
        # refit support floor: if the gate leaves < 8 points the system is
        # under-determined — fall back to the 8 smallest residuals
        em = jnp.where(valid, e, jnp.inf)
        k8 = em <= jnp.sort(em)[jnp.minimum(7, n_valid - 1)]
        return jnp.where(jnp.sum(cur) >= 8, cur, k8 & valid)

    def gate(e):
        # re-adapt per model: a minimal sample can fit ITS 8 points nearly
        # exactly (median residual ~ machine noise, observed under f64),
        # freezing the hypothesis-time gate below the measurement noise
        # and rejecting most true matches; the CURRENT model's median over
        # all valid points tracks the real noise scale (capped — see above)
        med_all = jnp.sort(jnp.where(valid, e, jnp.inf))[med_idx]
        return jnp.clip(2.5 * med_all, thresh, cap)

    cur = floor8(errs[best], (errs[best] <= gate(errs[best])) & valid)
    E = _eight_point(p1, p2, cur.astype(p1.dtype))
    for _ in range(6):
        e = _sampson(E, p1, p2)
        cur = floor8(e, (e <= gate(e)) & valid)
        es = jnp.sort(jnp.where(cur, e, jnp.inf))
        med = es[jnp.maximum(jnp.sum(cur) // 2, 0)]
        trim = floor8(e, cur & (e <= med))
        E = _eight_point(p1, p2, trim.astype(p1.dtype))
    e = _sampson(E, p1, p2)
    final_inl = (e <= gate(e)) & valid
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
    # with < 8 valid points top_k would select -inf-scored invalid rows
    # and the zero-weighted 8-point solve is under-determined — its SVD
    # null vector is arbitrary, returned as a garbage E with a nonsense
    # inlier mask (round-5 review). Checkable only on concrete input
    # (the host-orchestrated call sites all are).
    try:
        n_valid = int(np.asarray(v).sum())
    except Exception:
        n_valid = None  # traced: caller must guarantee >= 8
    if n_valid is not None and n_valid < 8:
        raise ValueError(
            f"estimate_essential needs >= 8 valid correspondences, got {n_valid}"
        )
    return _ransac_essential(
        p1, p2, v, jnp.float32(config.inlier_thresh), config.seed, config.n_hypotheses
    )


# ------------------------------------------------------------- 5-point solver
#
# Minimal essential-matrix solver (Nister's problem, solved with the
# Stewenius action-matrix method): exactly 5 correspondences give up to 10
# essential matrices. Unlike 8-point, the essential constraints
# (det E = 0 and 2 E E^T E - tr(E E^T) E = 0) are enforced EXACTLY, so a
# 5-sample hypothesis from true correspondences is an exact model — the
# upgrade the 8-point RANSAC notes self-prescribe (see _ransac_essential).
# Host-side numpy: the 10x10 eigen-decomposition has no TPU story and
# RANSAC hypothesis generation is a host-time activity anyway.

_MONOMIALS3 = None  # (20, 3) exponent table for degree-<=3 monomials in x,y,z


def _monomials3():
    """Stewenius monomial order: x3 x2y x2z xy2 xyz xz2 y3 y2z yz2 z3 |
    x2 xy xz y2 yz z2 x y z 1 — leading 10 then quotient-ring basis."""
    global _MONOMIALS3
    if _MONOMIALS3 is None:
        import numpy as np

        _MONOMIALS3 = np.array(
            [
                (3, 0, 0), (2, 1, 0), (2, 0, 1), (1, 2, 0), (1, 1, 1),
                (1, 0, 2), (0, 3, 0), (0, 2, 1), (0, 1, 2), (0, 0, 3),
                (2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1),
                (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0),
            ],
            np.int64,
        )
    return _MONOMIALS3


def _poly_mul(a, b):
    """Multiply trivariate polynomials stored as (4,4,4) coefficient cubes
    (index = exponent of x, y, z)."""
    import numpy as np

    out = np.zeros((4, 4, 4))
    for i, j, k in np.argwhere(a):
        aijk = a[i, j, k]
        for p, q, r in np.argwhere(b):
            out[i + p, j + q, k + r] += aijk * b[p, q, r]
    return out


def five_point(p1, p2):
    """Up to 10 essential matrices from EXACTLY 5 correspondences in
    normalized camera coords ((5,2) each). Returns (N, 3, 3) float64.

    Thin wrapper over `five_point_batch` (S=1) plus near-duplicate
    removal — one implementation of the Stewenius action-matrix pipeline
    to maintain. See five_point_batch for the algorithm."""
    import numpy as np

    p1 = np.asarray(p1, np.float64)
    p2 = np.asarray(p2, np.float64)
    if p1.shape != (5, 2) or p2.shape != (5, 2):
        raise ValueError(f"need exactly 5 pairs, got {p1.shape}, {p2.shape}")
    Es, mask = five_point_batch(p1[None], p2[None])
    out = []
    for E in Es[0][mask[0]]:
        if all(
            min(np.linalg.norm(E - F), np.linalg.norm(E + F)) > 1e-6 for F in out
        ):
            out.append(E)
    return np.stack(out) if out else np.zeros((0, 3, 3))


def _poly_mul_batch(A, B):
    """Batched trivariate polynomial product over (S, 4, 4, 4) coefficient
    cubes, truncated to degree <= 3 per axis (every product the 5-point
    construction forms stays within the cube — deg1*deg1 and deg2*deg1).
    Iterates only A's statically-nonzero cells; each step is one
    vectorized multiply-accumulate over the whole sample batch."""
    import numpy as np

    out = np.zeros_like(B)
    nz = np.argwhere(np.any(A, axis=0))
    for p, q, r in nz:
        out[:, p:, q:, r:] += (
            A[:, p, q, r, None, None, None] * B[:, : 4 - p, : 4 - q, : 4 - r]
        )
    return out


def five_point_batch(p1s, p2s):
    """`five_point` vectorized over S samples: (S, 5, 2) x2 -> up to 10
    essential matrices per sample, returned as (S, 10, 3, 3) float64 plus
    a validity mask (S, 10). Same algorithm (Stewenius action matrix),
    with every stage batched — SVD nullspaces, the polynomial coefficient
    assembly (_poly_mul_batch), the Gauss-Jordan solve (singular samples
    masked out, not raised), the 10x10 eigendecompositions, and the root
    extraction. No per-sample dedup: duplicate hypotheses only cost
    redundant rows in the (also batched) RANSAC scoring.

    Host numpy throughout: the batched eigendecomposition has no TPU
    story and hypothesis generation is a host-time activity; batching
    still matters — the per-sample python construction cost ~1.8 ms,
    capping practical RANSAC budgets (VERDICT r2 weak #6)."""
    import numpy as np

    p1s = np.asarray(p1s, np.float64)
    p2s = np.asarray(p2s, np.float64)
    S = p1s.shape[0]
    if p1s.shape != (S, 5, 2) or p2s.shape != (S, 5, 2):
        raise ValueError(f"need (S,5,2) pairs, got {p1s.shape}, {p2s.shape}")
    ones = np.ones((S, 5, 1))
    q1 = np.concatenate([p1s, ones], axis=2)
    q2 = np.concatenate([p2s, ones], axis=2)
    A = np.einsum("ski,skj->skij", q2, q1).reshape(S, 5, 9)
    _, _, vt = np.linalg.svd(A)
    basis = vt[:, 5:9].reshape(S, 4, 3, 3)  # X, Y, Z, W per sample

    Epoly = np.zeros((3, 3, S, 4, 4, 4))
    Epoly[:, :, :, 1, 0, 0] = np.moveaxis(basis[:, 0], 0, -1)
    Epoly[:, :, :, 0, 1, 0] = np.moveaxis(basis[:, 1], 0, -1)
    Epoly[:, :, :, 0, 0, 1] = np.moveaxis(basis[:, 2], 0, -1)
    Epoly[:, :, :, 0, 0, 0] = np.moveaxis(basis[:, 3], 0, -1)

    pm = _poly_mul_batch
    det = np.zeros((S, 4, 4, 4))
    for (i, j, k), s in (
        ((0, 1, 2), +1), ((1, 2, 0), +1), ((2, 0, 1), +1),
        ((0, 2, 1), -1), ((1, 0, 2), -1), ((2, 1, 0), -1),
    ):
        det += s * pm(pm(Epoly[0, i], Epoly[1, j]), Epoly[2, k])

    EEt = np.zeros((3, 3, S, 4, 4, 4))
    for i in range(3):
        for j in range(3):
            for k in range(3):
                EEt[i, j] += pm(Epoly[i, k], Epoly[j, k])
    trace = EEt[0, 0] + EEt[1, 1] + EEt[2, 2]
    eqs = [det]
    for i in range(3):
        for j in range(3):
            acc = np.zeros((S, 4, 4, 4))
            for k in range(3):
                acc += pm(EEt[i, k], Epoly[k, j])
            eqs.append(2.0 * acc - pm(trace, Epoly[i, j]))

    mono = _monomials3()
    M = np.stack(
        [[eq[:, dx, dy, dz] for dx, dy, dz in mono] for eq in eqs]
    )  # (10, 20, S)
    M = np.moveaxis(M, -1, 0)  # (S, 10, 20)

    lead = M[:, :, :10]
    ok_s = np.abs(np.linalg.det(lead)) > 1e-300  # singular leading blocks
    B = np.zeros((S, 10, 10))
    if ok_s.any():
        B[ok_s] = np.linalg.solve(lead[ok_s], M[ok_s][:, :, 10:])
    # near-singular blocks can pass the det gate yet solve to inf/nan;
    # an inf anywhere makes the BATCHED eig below raise (LinAlgError) for
    # every sample — mask those samples out instead
    finite = np.isfinite(B).all(axis=(1, 2))
    ok_s &= finite
    B = np.where(finite[:, None, None], B, 0.0)

    At = np.zeros((S, 10, 10))
    At[:, :6] = -B[:, :6]
    At[:, 6, 0] = 1.0
    At[:, 7, 1] = 1.0
    At[:, 8, 2] = 1.0
    At[:, 9, 6] = 1.0
    wvals, vecs = np.linalg.eig(At)  # (S, 10), (S, 10, 10)

    real = np.abs(wvals.imag) <= 1e-8 * np.maximum(1.0, np.abs(wvals.real))
    v = vecs.real  # (S, 10 basis, 10 eigvec) — columns are eigenvectors
    v9 = v[:, 9, :]
    nz9 = np.abs(v9) > 1e-12
    denom = np.where(nz9, v9, 1.0)
    x = v[:, 6, :] / denom
    y = v[:, 7, :] / denom
    z = v[:, 8, :] / denom
    coef = np.stack([x, y, z, np.ones_like(x)], axis=1)  # (S, 4, 10)
    Es = np.einsum("scn,scij->snij", coef, basis)
    nrm = np.linalg.norm(Es, axis=(2, 3))
    good = real & nz9 & ok_s[:, None] & np.isfinite(nrm) & (nrm > 1e-12)
    Es = Es / np.where(good, nrm, 1.0)[:, :, None, None]
    return Es, good


def ransac_essential_5pt(
    pts1,
    pts2,
    valid=None,
    config: EssentialRansacConfig = EssentialRansacConfig(),
    n_samples: int = 256,
):
    """Host-side RANSAC over 5-point minimal hypotheses, with the same
    MEDSAC selection as the 8-point path and an 8-point trimmed refit on
    the winning consensus. Returns (E, inliers, count) like
    estimate_essential.

    Hypothesis generation AND scoring are fully batched (five_point_batch
    + one vectorized Sampson/median pass), so the budget matches the
    8-point path's scale: 256 samples cost ~60 ms of host time (the old
    per-sample solver + per-hypothesis device round-trips capped
    practical budgets at a fraction of that — VERDICT r2 weak #6)."""
    import numpy as np

    p1 = np.asarray(pts1, np.float64)
    p2 = np.asarray(pts2, np.float64)
    K = p1.shape[0]
    v = np.ones(K, bool) if valid is None else np.asarray(valid, bool)
    live = np.flatnonzero(v)
    if len(live) < 5:
        raise ValueError(f"need >= 5 valid correspondences, got {len(live)}")
    rng = np.random.RandomState(config.seed)

    ids = np.stack(
        [rng.choice(live, 5, replace=False) for _ in range(n_samples)]
    )
    E_b, good = five_point_batch(p1[ids], p2[ids])
    E_all = E_b[good]  # (M, 3, 3)
    if len(E_all) == 0:
        raise RuntimeError("no 5-point hypothesis produced a valid model")

    x1 = np.concatenate([p1, np.ones((K, 1))], axis=1)  # (K, 3)
    x2 = np.concatenate([p2, np.ones((K, 1))], axis=1)
    Ex1 = np.einsum("mij,kj->mki", E_all, x1)  # (M, K, 3)
    Etx2 = np.einsum("mji,kj->mki", E_all, x2)
    num = np.einsum("ki,mki->mk", x2, Ex1) ** 2
    den = Ex1[:, :, 0] ** 2 + Ex1[:, :, 1] ** 2
    den += Etx2[:, :, 0] ** 2 + Etx2[:, :, 1] ** 2
    e_all = np.sqrt(num / np.maximum(den, 1e-12))  # linear Sampson, (M, K)
    med_idx = max(int(v.sum()) // 2, 0)
    meds = np.sort(np.where(v[None, :], e_all, np.inf), axis=1)[:, med_idx]
    best = int(np.argmin(meds))
    best_E, best_med = E_all[best], float(meds[best])
    # trimmed 8-point refit on the consensus (same loop as the jnp path,
    # including its noise-adaptive gate)
    E = jnp.asarray(best_E, jnp.float32)
    p1j, p2j = jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32)
    vj = jnp.asarray(v)
    cap5 = 8.0 * float(config.inlier_thresh)
    base = jnp.float32(
        min(max(config.inlier_thresh, 2.5 * best_med), cap5)
    )
    med_idx_j = jnp.maximum(jnp.sum(vj) // 2, 0)

    def gate(e):
        med_all = jnp.sort(jnp.where(vj, e, jnp.inf))[med_idx_j]
        return jnp.clip(2.5 * med_all, base, cap5)

    for _ in range(6):
        e = _sampson(E, p1j, p2j)
        cur = (e <= gate(e)) & vj
        es = jnp.sort(jnp.where(cur, e, jnp.inf))
        med = es[jnp.maximum(jnp.sum(cur) // 2, 0)]
        trim = cur & (e <= med)
        E = _eight_point(p1j, p2j, trim.astype(p1j.dtype))
    e = _sampson(E, p1j, p2j)
    final = (e <= gate(e)) & vj
    return E, final, jnp.sum(final)


# ------------------------------------------------- local pose optimization
#
# The LO step of LO-RANSAC: after hypothesis selection and consensus refit,
# minimize the sum of squared Sampson residuals over the 5 pose dofs
# (3 axis-angle for R, 2 tangent-plane for the unit translation) with
# Gauss-Newton. Unlike the linear 8-point refit this enforces the essential
# manifold EXACTLY at every iterate (E = [t]_x R by construction) and
# optimizes the geometric (first-order) reprojection proxy rather than the
# algebraic residual.


def _skew(t):
    z = jnp.zeros((), t.dtype)
    return jnp.asarray(
        [[z, -t[2], t[1]], [t[2], z, -t[0]], [-t[1], t[0], z]]
    )


def _exp_so3(w):
    """Rodrigues: exp([w]_x), value- AND gradient-safe at w = 0.

    The epsilon must be large enough that the quotient-rule denominator
    (th2 + eps)^2 stays a NORMAL f32 (eps = 1e-24 squared underflows to
    0 and the jacfwd of (1-cos)/th2 silently NaNs — which froze every
    Gauss-Newton user of this function at the zero-perturbation point).
    At eps = 1e-12 the small-angle values are exact to f32: sin(1e-6)/1e-6
    = 1, (1-cos(1e-6))/1e-12 = 0.5.
    """
    th2 = jnp.sum(w * w)
    th = jnp.sqrt(th2 + 1e-12)
    K = _skew(w)
    a = jnp.sin(th) / th
    b = (1.0 - jnp.cos(th)) / (th2 + 1e-12)
    return jnp.eye(3, dtype=w.dtype) + a * K + b * (K @ K)


def _tangent_basis(t):
    """(3, 2) orthonormal basis of the plane perpendicular to unit t."""
    # pick the axis least aligned with t to seed Gram-Schmidt
    e = jnp.eye(3, dtype=t.dtype)[jnp.argmin(jnp.abs(t))]
    b1 = e - jnp.dot(e, t) * t
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(t, b1)
    return jnp.stack([b1, b2], axis=-1)


def _sampson_signed(E, x1, x2):
    """Signed Sampson residual (K,) — the least-squares objective; its
    absolute value is `_sampson`."""
    Ex1 = x1 @ E.T
    Etx2 = x2 @ E
    num = jnp.sum(x2 * Ex1, axis=-1)
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / jnp.sqrt(jnp.maximum(den, 1e-12))


@partial(jax.jit, static_argnames=("iters",))
def _refine_pose_gn(R0, t0, x1, x2, w, iters: int):
    damp = jnp.asarray(1e-10, R0.dtype)

    def residuals(theta, R, t):
        Rn = R @ _exp_so3(theta[:3])
        tn = t + _tangent_basis(t) @ theta[3:]
        tn = tn / jnp.linalg.norm(tn)
        return _sampson_signed(_skew(tn) @ Rn, x1, x2) * w

    def step(_, carry):
        R, t = carry
        z = jnp.zeros((5,), R.dtype)
        r = residuals(z, R, t)
        J = jax.jacfwd(residuals)(z, R, t)  # (K, 5)
        H = J.T @ J + damp * jnp.eye(5, dtype=R.dtype)
        g = J.T @ r
        delta = -jnp.linalg.solve(H, g)
        # accept only if the squared residual does not increase (plain GN
        # can overshoot near-degenerate inlier sets)
        r_new = residuals(delta, R, t)
        better = jnp.sum(r_new * r_new) < jnp.sum(r * r)
        delta = jnp.where(better, delta, jnp.zeros_like(delta))
        Rn = R @ _exp_so3(delta[:3])
        tn = t + _tangent_basis(t) @ delta[3:]
        tn = tn / jnp.linalg.norm(tn)
        return Rn, tn

    return jax.lax.fori_loop(0, iters, step, (R0, t0))


def refine_pose(R, t, pts1, pts2, inliers=None, iters: int = 10):
    """Gauss-Newton local optimization of a calibrated relative pose (the
    LO in LO-RANSAC; upgrade self-prescribed by `_ransac_essential`).

    R/t: initial pose from `recover_pose`; pts1/pts2: (K, 2) normalized
    correspondences; inliers: boolean (K,) support mask. Returns the
    refined (R, t (unit), E = [t]_x R).
    """
    x1 = jnp.concatenate(
        [jnp.asarray(pts1, jnp.float32), jnp.ones((len(pts1), 1), jnp.float32)], -1
    )
    x2 = jnp.concatenate(
        [jnp.asarray(pts2, jnp.float32), jnp.ones((len(pts2), 1), jnp.float32)], -1
    )
    w = (
        jnp.ones((x1.shape[0],), jnp.float32)
        if inliers is None
        else jnp.asarray(inliers, jnp.float32)
    )
    R0 = jnp.asarray(R, jnp.float32)
    t0 = jnp.asarray(t, jnp.float32)
    t0 = t0 / jnp.linalg.norm(t0)
    Rn, tn = _refine_pose_gn(R0, t0, x1, x2, w, iters)
    return Rn, tn, _skew(tn) @ Rn


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
        # sign-PRESERVING scale guard: substituting +1e-12 for a tiny
        # negative X[3] flipped the point across the camera, which could
        # tip recover_pose's cheirality vote on low-parallax pairs
        # (round-5 review)
        w = jnp.where(
            jnp.abs(X[3]) > 1e-12,
            X[3],
            jnp.where(X[3] < 0, -1e-12, 1e-12),
        )
        return X[:3] / w

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
