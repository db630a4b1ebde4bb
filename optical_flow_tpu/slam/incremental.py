"""Incremental visual SLAM: the SURVEY §7.7 north-star pieces as ONE system.

    corners -> sparse-LK tracks (with re-seeding, an appearance drift
               gate, and descriptor-based occlusion revival —
               slam/descriptors.py)
            -> essential-matrix bootstrap (E + cheirality + LO refinement)
            -> PnP keyframe chaining against the live map
            -> triangulation of newly matured tracks
            -> sliding-window BA with track retirement (slam/window.py)
            -> thumbnail place recognition + geometric loop verification
            -> Sim(3) pose-graph drift correction (slam/pose_graph.py):
               loop edges carry Umeyama-measured scale, so accumulated
               monocular SCALE drift is corrected along with rotation
               and translation (measure_loop_sim3; falls back to an
               estimate-scaled s=1 edge when structure support is thin)

Host code here is orchestration/bookkeeping only; every solve is a jitted
batched kernel (RANSAC hypothesis batches, windowed sparse-Schur BA, the
Sim(3) pose-graph Gauss-Newton).

Monocular caveat, stated honestly:
- `window` must cover a meaningful fraction of any loop you expect to
  close: poses frozen out of the window keep their drift, and the pose
  graph can only redistribute error over the odometry edges it is given
  (measured: a 10-keyframe loop closes to ~0.015 mean center error with
  window >= 6 but is unrecoverable at window 5).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from optical_flow_tpu.slam.descriptors import (
    match_descriptors,
    ncc_scores,
    patch_descriptors,
)
from optical_flow_tpu.slam.epipolar import (
    EssentialRansacConfig,
    estimate_essential,
    normalize_pixels,
    ransac_essential_5pt,
    recover_pose,
    refine_pose,
    triangulate,
)
from optical_flow_tpu.slam.pnp import pnp_ransac, reprojection_errors
from optical_flow_tpu.slam.pose_graph import (
    Sim3PoseGraph,
    measure_loop_sim3,
    place_descriptor,
    propose_loop_candidates,
    verify_loop_closure,
)
from optical_flow_tpu.slam.window import WindowedBA


def _aa_to_R(aa):
    from optical_flow_tpu.slam.epipolar import _exp_so3

    return np.asarray(_exp_so3(jnp.asarray(aa, jnp.float32)))


def _R_to_aa(R):
    from optical_flow_tpu.slam.pose_graph import _log_so3

    return np.asarray(_log_so3(jnp.asarray(R, jnp.float32)))


@dataclasses.dataclass
class SlamResult:
    poses: np.ndarray  # (N_kf, 3, 3) world->cam rotations, loop-corrected
    trans: np.ndarray  # (N_kf, 3)
    points: np.ndarray  # (P, 3) map points (world = keyframe-0 camera frame)
    keyframes: List[int]  # source frame index of each keyframe
    loop_edges: List[tuple]  # (i, j, n_inliers) accepted loop closures
    rmse: Optional[float]  # final windowed-BA reprojection RMSE (px)
    # the keyframe observations behind the map, in `ba.BAProblem` layout
    # (obs CENTERED at the principal point; pt_idx rows of `points`;
    # obs_baseline nonzero for stereo right-eye measurements) — what
    # downstream refiners need (slam/vi_ba.refine_with_imu consumes these
    # to run tightly-coupled VI-BA on a finished SLAM solution)
    cam_idx: Optional[np.ndarray] = None  # (M,) int32
    pt_idx: Optional[np.ndarray] = None  # (M,) int32
    obs: Optional[np.ndarray] = None  # (M, 2)
    obs_baseline: Optional[np.ndarray] = None  # (M,)

    def centers(self) -> np.ndarray:
        return np.stack([-R.T @ t for R, t in zip(self.poses, self.trans)])


def _collect_observations(kf_obs, rig_obs, row_of, cx, cy, stereo_baseline):
    """Every live map point's observations in `ba.BAProblem` layout:
    (cam_idx, pt_idx, obs CENTERED at the principal point, baseline) —
    the ONE assembly both the final global BA and the SlamResult export
    consume (kf_obs pixels are absolute; rig_obs are already centered
    with their rig baseline)."""
    import numpy as np

    ci, pi, uv, bl = [], [], [], []
    for kf_i, obs_list in enumerate(kf_obs):
        for p, px in obs_list:
            if p in row_of:
                ci.append(kf_i)
                pi.append(row_of[p])
                uv.append(np.asarray(px, np.float64) - [cx, cy])
                bl.append(0.0)
    for p, kf_i, uv_r in rig_obs:
        if p in row_of:
            ci.append(kf_i)
            pi.append(row_of[p])
            uv.append(np.asarray(uv_r, np.float64))
            bl.append(float(stereo_baseline))
    return ci, pi, uv, bl


def incremental_slam(
    frames,
    focal: float,
    cx: Optional[float] = None,
    cy: Optional[float] = None,
    *,
    max_corners: int = 300,
    min_tracks: int = 60,
    window: int = 5,
    ba_iters: int = 4,
    # wait this many keyframes of baseline before triangulating a track:
    # adjacent-keyframe parallax is typically too thin (baseline/depth
    # ~1-2%) and the resulting depth noise destabilizes windowed PnP
    # (measured: the test loop closes at 0.016 mean error with 2, 0.52
    # with 1)
    triangulate_after: int = 2,
    loop_min_separation: int = 6,
    loop_min_inliers: int = 40,
    # the bootstrap pair must have real parallax: triangulating a map from
    # a thin baseline leaves point depths ill-conditioned — BA then parks
    # them anywhere along their rays (observed: f32-vs-f64 BA placed the
    # same low-parallax points 8+ units apart) and PnP later trusts the
    # garbage depths and collapses
    bootstrap_min_disparity: float = 8.0,
    # adaptive keyframe selection: a frame becomes a keyframe only once
    # the median track disparity since the LAST keyframe exceeds this
    # (px), or the live track set thins below min_tracks. 0 = every frame
    # is a keyframe (the dense default; real video should select — thin
    # inter-keyframe baselines make triangulation and windowed PnP
    # ill-conditioned, and per-frame BA work is wasted on frames that
    # add no parallax)
    kf_min_disparity: float = 0.0,
    # appearance drift gate: every track carries a normalized patch
    # descriptor from its birth position (slam/descriptors.py); a track
    # whose current-frame NCC against that anchor falls below this is
    # killed even though LK still reports status=1 — the chained-LK
    # drift failure PnP's inlier gate catches only after the map is
    # already polluted. 0 disables the gate (and appearance revival).
    track_ncc_gate: float = 0.25,
    # re-association: when re-seeding, a fresh corner whose descriptor
    # mutually matches a DEAD map track's anchor at >= this NCC revives
    # that track's map point instead of starting a blank track —
    # landmarks survive occlusion instead of being re-triangulated as
    # duplicates
    revive_min_ncc: float = 0.8,
    # revival is appearance + GEOMETRY (ADVICE r3): the fresh corner must
    # also lie within this pixel radius of the dead landmark's reprojection
    # under the current pose — on repetitive texture (windows,
    # checkerboards) NCC alone can rebind a landmark anywhere in the image
    revive_px_radius: float = 20.0,
    # after a verified loop closure, re-anchor the map to the corrected
    # poses and run one global BA so map and trajectory agree again
    final_global_ba: bool = True,
    # rectified stereo rig: when set, `frames` yields (left, right) pairs
    # (or (2, H, W) stacks) and the map is METRIC in baseline units —
    # bootstrap comes from frame 0's stereo pair (no parallax wait, no
    # |t|=1 gauge) and new landmarks get stereo depth at their first
    # keyframe (slam/stereo.py), so monocular scale drift never starts.
    # Tracking, PnP, loop closure all run on the LEFT stream.
    stereo_baseline: Optional[float] = None,
    stereo_max_dy: float = 1.5,
    ransac: EssentialRansacConfig = EssentialRansacConfig(),
) -> Optional[SlamResult]:
    """Run the incremental pipeline over grayscale frames — a list OR any
    iterator/generator: frames are consumed STREAMING, and only keyframe
    frames are retained (for relocalization and loop closure), so memory
    is O(keyframes), not O(video). By default every frame becomes a
    keyframe; set kf_min_disparity for adaptive keyframe selection on
    real video. Returns None when the bootstrap pair can't produce a
    map."""
    from optical_flow_tpu.track.features import good_features_to_track
    from optical_flow_tpu.track.sparse_lk import (
        build_tracking_pyramid,
        track_features,
    )

    it = iter(frames)

    def _next():
        try:
            f = next(it)
        except StopIteration:
            return None
        if stereo_baseline is not None:
            if isinstance(f, (tuple, list)):
                l, r = f
            else:
                f = np.asarray(f)
                if f.shape[0] != 2:
                    raise ValueError(
                        "stereo frames must be (left, right) pairs or "
                        f"(2, H, W) stacks, got shape {f.shape}"
                    )
                l, r = f[0], f[1]
            return np.asarray(l), np.asarray(r)
        return np.asarray(f), None

    first = _next()
    second_pair = _next()
    if first is None or second_pair is None:
        raise ValueError("incremental_slam needs >= 2 frames")
    frame0, right0 = first
    second, second_right = second_pair
    h, w = frame0.shape[-2:]
    cx = w / 2.0 if cx is None else cx
    cy = h / 2.0 if cy is None else cy

    def norm(px):
        # host numpy (not normalize_pixels/jnp): this glue runs on
        # ever-varying track-count shapes, and every eager jnp op on a new
        # shape costs an XLA mini-compile — unbounded on long videos
        return ((np.asarray(px, np.float32) - np.asarray([cx, cy], np.float32))
                / np.float32(focal))

    def _pad64(*arrays):
        # shape-bucket batched solves: pad row counts to a multiple of 64
        # so the jnp op cascade compiles O(log) distinct programs instead
        # of one per track count (rows are independent; callers slice)
        n = arrays[0].shape[0]
        m = -(-max(n, 1) // 64) * 64
        if m == n:
            return arrays + (n,)
        out = []
        for a in arrays:
            pad = np.zeros((m - n,) + a.shape[1:], a.dtype)
            out.append(np.concatenate([np.asarray(a), pad]))
        return tuple(out) + (n,)

    def descs_at(img, px):
        # shape-bucketed (64-multiple) descriptor extraction — same
        # compile-growth bound as every other host-glue solve here
        out = _pad64(np.asarray(px, np.float32))
        padded, n = out[0], out[-1]
        d = np.asarray(patch_descriptors(jnp.asarray(img), jnp.asarray(padded)))
        # writable copy: anchor_desc rows are updated in place (revival
        # slots, per-keyframe refresh) and np.asarray of a jax array is a
        # read-only buffer view
        return d[:n].copy()

    # --- live track table --------------------------------------------------
    # Each row: current pixel, anchor keyframe + anchor pixel (for
    # triangulation), map point id (-1 until triangulated), alive flag,
    # and the appearance anchor (descriptor at birth, drift/revival gate).
    pts0, valid0 = good_features_to_track(jnp.asarray(frame0), max_corners, 0.01, 8)
    cur_px = np.asarray(pts0, np.float32)
    alive = np.asarray(valid0).copy()
    anchor_kf = np.zeros(len(cur_px), np.int32)
    anchor_px = cur_px.copy()
    anchor_desc = descs_at(frame0, cur_px)
    point_id = np.full(len(cur_px), -1, np.int64)
    next_pid = 0

    mapper = WindowedBA(window=window, focal=focal, ba_iters=ba_iters)
    kf_R = [np.eye(3, dtype=np.float32)]
    kf_t = [np.zeros(3, np.float32)]
    kf_obs: List[list] = [[]]  # per keyframe: [(pid, ABSOLUTE pixel)] — the
    # relocalization index (which landmarks this keyframe saw, and where)
    bootstrapped = False
    rmse = None
    last_kf_px = cur_px.copy()  # track positions at the last keyframe...
    kf_seen = alive.copy()  # ...and which rows were alive there
    keyframes: List[int] = []
    rig_obs: List[tuple] = []  # (pid, keyframe index, centered right-eye
    # pixel) — every stereo measurement ever made, re-asserted in the
    # loop-closure global BA so the refined map stays metric

    def _stereo_new_points(left, right, rows, R, t):
        """Stereo-measured landmarks for track rows (alive, unmapped):
        match into the rectified right image, back-project at metric
        depth, lift into the world via the keyframe pose. Returns
        {row: (X_world, uv_right)} for the rows whose match passed the
        epipolar and disparity gates — uv_right is the measured right-eye
        pixel, which enters the BA as a baseline-offset observation
        (BAProblem.baseline), anchoring metric depth per keyframe."""
        from optical_flow_tpu.slam.stereo import stereo_backproject, stereo_match

        if not len(rows):
            return {}
        px, n_s = _pad64(cur_px[rows])[0], len(rows)
        disp, okd, matched = stereo_match(left, right, px, max_dy=stereo_max_dy)
        disp, okd, matched = disp[:n_s], okd[:n_s], matched[:n_s]
        Xc = stereo_backproject(
            cur_px[rows], disp, focal, cx, cy, stereo_baseline
        )
        # X_cam = R X_w + t  =>  X_w = R^T (X_cam - t)
        Xw = (Xc - np.asarray(t, np.float32)) @ np.asarray(R, np.float32)
        return {
            int(r): (Xw[i], matched[i]) for i, r in enumerate(rows) if okd[i]
        }

    def _try_stereo_bootstrap(left, right, src_idx):
        """Metric map from one stereo pair: keyframe 0 = this frame's
        left camera. False when the pair yields too few gated matches
        (featureless/degenerate start — the caller re-seeds on the next
        frame and retries)."""
        nonlocal bootstrapped, rmse, next_pid
        rows = np.flatnonzero(alive)
        found = _stereo_new_points(left, right, rows, np.eye(3), np.zeros(3))
        if len(found) < 16:
            return False
        new_points, obs = {}, []
        for row, (Xw, uv_r) in found.items():
            pid = next_pid
            next_pid += 1
            point_id[row] = pid
            new_points[pid] = Xw.astype(np.float64)
            obs.append((pid, cur_px[row] - [cx, cy]))
            obs.append((pid, uv_r - [cx, cy], stereo_baseline))
            rig_obs.append((pid, 0, uv_r - [cx, cy]))
        mapper.add_keyframe(np.zeros(6), obs, new_points)
        kf_obs[0] = [(int(point_id[r]), cur_px[r].copy()) for r in found]
        # NO optimize() here: a one-camera BA is gauge-degenerate (the
        # Schur camera system is singular with the only camera pinned)
        # and would NaN the freshly measured stereo map
        bootstrapped = True
        keyframes.append(src_idx)
        kept[src_idx] = left
        return True

    def pose6(R, t):
        return np.concatenate([_R_to_aa(R), np.asarray(t, np.float64)])

    desc_cache = {}
    kept = {}  # keyframe frames only (relocalization/loop store)
    if stereo_baseline is None:
        mapper.add_keyframe(np.zeros(6), [])  # keyframe 0 at the origin
        kept[0] = frame0
    else:
        # metric bootstrap from the first stereo pair; on failure the
        # loop below re-seeds on a later frame and retries
        _try_stereo_bootstrap(frame0, right0, 0)

    def frame_descriptor(idx):
        # place_descriptor is ~2 FFTs + a log-polar resample per call and
        # relocalization ranks every keyframe on every lost frame: compute
        # each keyframe's descriptor exactly once
        if idx not in desc_cache:
            desc_cache[idx] = place_descriptor(kept[idx])
        return desc_cache[idx]

    def _stream():
        # (k, prev, cur, cur_right, is_last) with one-frame lookahead so
        # the last frame is known without knowing the video length
        k, prev, cur = 0, (frame0, right0), (second, second_right)
        while cur is not None:
            k += 1
            nxt = _next()
            yield (k, prev[0]) + cur + (nxt is None,)
            prev, cur = cur, nxt

    prev_pyr = None
    for k, prev, cur, cur_right, is_last in _stream():
        # -- track everything one frame forward (each frame's tracking
        # pyramid is built ONCE and reused as prev on the next step —
        # the hot-loop reuse the dense path has in pipeline/video.py)
        if prev_pyr is None:
            prev_pyr = build_tracking_pyramid(prev)
        cur_pyr = build_tracking_pyramid(cur)
        new_px, status, _ = track_features(
            prev, cur, cur_px, pyr1=prev_pyr, pyr2=cur_pyr
        )
        prev_pyr = cur_pyr
        new_px = np.asarray(new_px, np.float32)
        alive &= np.asarray(status)
        cur_px = np.where(alive[:, None], new_px, cur_px)

        if track_ncc_gate > 0 and alive.any():
            # appearance drift gate: LK keeps status=1 on a track sliding
            # off its landmark; the birth-anchor NCC does not. Flat-at-birth
            # anchors (all-zero rows) are exempt — no identity to enforce.
            now_desc = descs_at(cur, cur_px)
            s = ncc_scores(anchor_desc, now_desc)
            no_anchor = np.abs(anchor_desc).sum(axis=1) < 1e-6
            alive &= no_anchor | (s >= track_ncc_gate)

        if not bootstrapped and stereo_baseline is not None:
            # the first pair was too thin (featureless/degenerate start):
            # rebuild the track table on THIS frame and bootstrap from its
            # stereo pair — the world frame is wherever bootstrap succeeds
            pts_r, valid_r = good_features_to_track(
                jnp.asarray(cur), max_corners, 0.01, 8
            )
            cur_px = np.asarray(pts_r, np.float32)
            alive = np.asarray(valid_r).copy()
            anchor_kf = np.zeros(len(cur_px), np.int32)
            anchor_px = cur_px.copy()
            anchor_desc = descs_at(cur, cur_px)
            point_id = np.full(len(cur_px), -1, np.int64)
            _try_stereo_bootstrap(cur, cur_right, k)
            last_kf_px = cur_px.copy()
            kf_seen = alive.copy()
            continue

        if not bootstrapped:
            # -- bootstrap: essential matrix on anchor(=frame 0) vs current
            sel = alive & (anchor_kf == 0)
            if sel.sum() < 16:
                return None
            disp = np.linalg.norm(cur_px - anchor_px, axis=1)[sel]
            if np.median(disp) < bootstrap_min_disparity:
                # below-minimum baseline NEVER bootstraps — the old
                # last-frame bypass built exactly the ill-conditioned map
                # this gate exists to prevent (round-5 review); a clip
                # that never accumulates baseline returns None, the
                # documented contract
                continue  # keep accumulating baseline
            p1n, p2n = norm(anchor_px), norm(cur_px)
            # minimal (5-point) hypotheses: a clean sample yields an EXACT
            # essential matrix, and an all-inlier 5-sample is w^5 likely vs
            # the 8-point path's w^8 — decisive at low inlier ratios
            # (test_epipolar.py::test_5pt_beats_8pt_at_low_inlier_ratio).
            # The 8-point batch is the fallback for degenerate samples.
            try:
                E, inl, count = ransac_essential_5pt(
                    p1n, p2n, valid=sel, config=ransac
                )
            except (RuntimeError, np.linalg.LinAlgError):
                # RuntimeError: no valid minimal hypothesis;
                # LinAlgError: a batched eig blow-up (ill-conditioned
                # sample) — either way the 8-point batch is the fallback
                E, inl, count = estimate_essential(
                    p1n, p2n, valid=sel, config=ransac
                )
            if int(count) < 16:
                continue  # not enough parallax yet; try the next frame
            inl_np = np.asarray(inl)
            R0, t0, _ = recover_pose(
                E, jnp.asarray(p1n)[inl_np], jnp.asarray(p2n)[inl_np]
            )
            R1, t1, _ = refine_pose(R0, t0, p1n, p2n, inliers=inl_np)
            R1, t1 = np.asarray(R1), np.asarray(t1)  # |t1| = 1 sets the scale
            P1 = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
            P2 = np.concatenate([R1, t1[:, None]], axis=1)
            X = np.asarray(triangulate(P1, P2, p1n[inl_np], p2n[inl_np]))
            # BOTH-view cheirality + reprojection gate, mirroring the
            # in-loop triangulation (round-5 review: camera-1 depth alone
            # let an epipole-adjacent outlier seed the initial map, and
            # the windowed BA's squared loss dragged the bootstrap poses)
            Z2 = (X @ R1.T + t1)[:, 2]
            Xb, xb, n_b = _pad64(np.asarray(X, np.float32), p2n[inl_np])
            e_b = np.asarray(
                reprojection_errors(
                    jnp.asarray(R1, jnp.float32), jnp.asarray(t1, jnp.float32),
                    jnp.asarray(Xb), jnp.asarray(xb),
                )
            )[:n_b]
            good = (X[:, 2] > 0.1) & (Z2 > 0.1) & (e_b < 5.0 / focal)
            ids = np.flatnonzero(inl_np)[good]
            kf_R.append(R1)
            kf_t.append(t1.astype(np.float32))
            new_points = {}
            obs = []
            for row, Xw in zip(ids, X[good]):
                pid = next_pid
                next_pid += 1
                point_id[row] = pid
                new_points[pid] = Xw
                obs.append((pid, cur_px[row] - [cx, cy]))
            mapper.add_keyframe(pose6(R1, t1), obs, new_points)
            # frame-0 observations of the same points anchor the gauge
            for row in ids:
                mapper.add_observation(point_id[row], 0, anchor_px[row] - [cx, cy])
            kf_obs[0] = [(int(point_id[r]), anchor_px[r].copy()) for r in ids]
            kf_obs.append([(int(point_id[r]), cur_px[r].copy()) for r in ids])
            rmse = mapper.optimize()
            # pull BA-refined poses back into the odometry chain (see
            # the keyframe path; a 2-frame video ends right here)
            for i_s, p6_s in enumerate(mapper.poses):
                kf_R[i_s] = _aa_to_R(p6_s[:3]).astype(np.float32)
                kf_t[i_s] = np.asarray(p6_s[3:], np.float32)
            bootstrapped = True
            keyframes = [0, k]
            kept[k] = cur
            last_kf_px = cur_px.copy()
            kf_seen = alive.copy()
            continue

        # -- adaptive keyframe selection: frames that added no baseline
        # since the last keyframe are tracked but not keyframed (the last
        # frame always is, so the trajectory ends where the video does)
        if kf_min_disparity > 0 and not is_last:
            moved = alive & kf_seen
            if moved.sum() >= 8 and alive.sum() >= min_tracks:
                med = float(np.median(
                    np.linalg.norm((cur_px - last_kf_px)[moved], axis=1)
                ))
                if med < kf_min_disparity:
                    continue

        # -- localize against the live map (PnP on tracked map points)
        has_pt = alive & (point_id >= 0)
        live_pids = point_id[has_pt]
        # explicit dtype: on total tracking loss the comprehension is empty
        # and a default np.asarray([]) would be float64 — an illegal index
        # that crashed the recovery path it guards (ADVICE r2)
        in_map = np.asarray(
            [pid in mapper.points for pid in live_pids], dtype=bool
        )
        rows = np.flatnonzero(has_pt)[in_map]

        def attempt_relocalize():
            """Tracking lost: relocalize against keyframe history (closest
            keyframes by thumbnail; LK their landmark observations into
            this frame directly, bypassing the broken chain; robust PnP).
            On success, appends the recovered keyframe and REBUILDS the
            track table from this frame. False = still lost (the caller
            skips the frame and retries on the next one)."""
            nonlocal cur_px, alive, anchor_px, anchor_kf, point_id, rmse
            nonlocal last_kf_px, kf_seen, anchor_desc
            allpts = mapper.all_points()
            d = place_descriptor(cur)
            dists = [
                float(np.linalg.norm(frame_descriptor(i) - d))
                for i in keyframes
            ]
            for kf_i in np.argsort(dists)[:3]:
                obs_list = [(p, px) for p, px in kf_obs[kf_i] if p in allpts]
                if len(obs_list) < 12:
                    continue
                src = np.asarray([px for _, px in obs_list], np.float32)
                new, st, _ = track_features(kept[keyframes[kf_i]], cur, src)
                st = np.asarray(st)
                if st.sum() < 12:
                    continue
                Xl = np.stack([allpts[p] for p, _ in obs_list])
                new = np.asarray(new, np.float32)
                Xlp, xlp, stp, n_r = _pad64(
                    np.asarray(Xl, np.float32), norm(new), np.asarray(st, bool)
                )
                Rr, tr, inl = pnp_ransac(Xlp, xlp, valid=stp, seed=1000 + k)
                inl = np.asarray(inl)[:n_r]
                if int(inl.sum()) < 12:
                    continue
                Rr, tr = np.asarray(Rr), np.asarray(tr)
                kf_R.append(Rr.astype(np.float32))
                kf_t.append(np.asarray(tr, np.float32))
                keyframes.append(k)
                kept[k] = cur
                mapper.add_keyframe(pose6(Rr, tr), [
                    (p, px_new - [cx, cy])
                    for (p, _), px_new, ok in zip(obs_list, new, inl)
                    if ok and p in mapper.points  # retired can't re-enter
                ])
                kf_obs.append(
                    [(p, px_new.copy())
                     for (p, _), px_new, ok in zip(obs_list, new, inl) if ok]
                )
                rmse = mapper.optimize()
                # pull BA-refined poses back into the odometry chain
                # (round-5 review: a run ending here exported stale
                # pre-BA poses against the BA-refined map)
                for i_s, p6_s in enumerate(mapper.poses):
                    kf_R[i_s] = _aa_to_R(p6_s[:3]).astype(np.float32)
                    kf_t[i_s] = np.asarray(p6_s[3:], np.float32)
                # rebuild the track table: re-tracked landmarks first (live
                # map tracks), fresh corners for future structure
                kf_now = len(kf_R) - 1
                land = [(p, px_new)
                        for (p, _), px_new, ok in zip(obs_list, new, inl) if ok]
                fresh, fvalid = good_features_to_track(
                    jnp.asarray(cur), max_corners, 0.01, 8
                )
                fresh = np.asarray(fresh, np.float32)[np.asarray(fvalid)]
                cur_px = np.concatenate(
                    [np.asarray([px for _, px in land], np.float32), fresh]
                )
                anchor_px = cur_px.copy()
                anchor_kf = np.full(len(cur_px), kf_now, np.int32)
                point_id = np.concatenate(
                    [np.asarray([p for p, _ in land], np.int64),
                     np.full(len(fresh), -1, np.int64)]
                )
                alive = np.ones(len(cur_px), bool)
                anchor_desc = descs_at(cur, cur_px)
                last_kf_px = cur_px.copy()
                kf_seen = alive.copy()
                return True
            return False

        if len(rows) < 8:
            attempt_relocalize()
            continue
        X = np.stack([mapper.points[point_id[r]] for r in rows])
        Xp, xp, n_rows = _pad64(
            np.asarray(X, np.float32), norm(cur_px[rows])
        )
        vmask = np.arange(len(Xp)) < n_rows
        R, t, inliers = pnp_ransac(Xp, xp, valid=vmask, seed=k)
        inliers = np.asarray(inliers)[:n_rows]
        # acceptance floor: 12 inliers when >= 12 landmarks are live; on
        # a sparse stretch (8-11 live) require 3/4 support instead — the
        # old unconditional max(12, ...) was UNREACHABLE there, so every
        # sparse frame was misclassified as tracking loss (round-5
        # review; with relocalization also failing the pipeline stalled:
        # re-seeding only runs on the keyframe path)
        if len(rows) >= 12:
            need = max(12, len(rows) // 4)
        else:
            need = max(6, (3 * len(rows)) // 4)
        if int(np.asarray(inliers).sum()) < need:
            # the pose didn't explain the tracked landmarks (corrupted
            # frame, degenerate geometry): treat as tracking loss rather
            # than poisoning the map with a junk keyframe
            attempt_relocalize()
            continue
        R, t = np.asarray(R), np.asarray(t)
        kf_R.append(R.astype(np.float32))
        kf_t.append(np.asarray(t, np.float32))
        keyframes.append(k)
        kept[k] = cur

        obs = [
            (int(point_id[r]), cur_px[r] - [cx, cy])
            for r, ok in zip(rows, np.asarray(inliers))
            if ok
        ]

        # -- new map points
        kf_now = len(kf_R) - 1
        new_points = {}
        new_rows = {}  # pid -> table row (no per-pid table scans later)
        if stereo_baseline is not None:
            # stereo depth is available the moment a track is seen from a
            # keyframe — no parallax maturity wait, and the landmark is
            # metric from birth. Rows whose stereo match fails (occluded
            # in the right view, off-scanline) stay unmapped and fall
            # through to the temporal triangulation below.
            rows_s = np.flatnonzero(alive & (point_id < 0))
            for row, (Xw, uv_r) in _stereo_new_points(
                cur, cur_right, rows_s, R, t
            ).items():
                pid = next_pid
                next_pid += 1
                point_id[row] = pid
                new_rows[pid] = int(row)
                new_points[pid] = Xw.astype(np.float64)
                obs.append((pid, cur_px[row] - [cx, cy]))
                obs.append((pid, uv_r - [cx, cy], stereo_baseline))
                rig_obs.append((pid, kf_now, uv_r - [cx, cy]))
        # -- triangulate matured anchor tracks (monocular path; stereo
        # fallback for match failures)
        mature = alive & (point_id < 0) & (anchor_kf <= kf_now - 1 - triangulate_after)
        if mature.sum() >= 4:
            rows_m = np.flatnonzero(mature)
            aks = anchor_kf[rows_m]
            for ak in np.unique(aks):
                sel_m = rows_m[aks == ak]
                Pa = np.concatenate([kf_R[ak], kf_t[ak][:, None]], axis=1)
                Pb = np.concatenate([R, t[:, None]], axis=1)
                ta, tb, n_m = _pad64(norm(anchor_px[sel_m]), norm(cur_px[sel_m]))
                Xn = np.asarray(triangulate(Pa, Pb, ta, tb))[:n_m]
                # cheirality + reprojection gate in both views
                Za = (Xn @ kf_R[ak].T + kf_t[ak])[:, 2]
                Zb = (Xn @ R.T + t)[:, 2]
                Xp, xp, n_m2 = _pad64(
                    np.asarray(Xn, np.float32), norm(cur_px[sel_m])
                )
                e = np.asarray(
                    reprojection_errors(
                        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
                        jnp.asarray(Xp), jnp.asarray(xp),
                    )
                )[:n_m2]
                ok = (Za > 0.1) & (Zb > 0.1) & (e < 5.0 / focal)
                for row, Xw, o in zip(sel_m, Xn, ok):
                    if not o:
                        continue
                    pid = next_pid
                    next_pid += 1
                    point_id[row] = pid
                    new_rows[pid] = int(row)
                    new_points[pid] = Xw
                    obs.append((pid, cur_px[row] - [cx, cy]))

        mapper.add_keyframe(pose6(R, t), obs, new_points)
        for pid, row in new_rows.items():
            ak = int(anchor_kf[row])
            mapper.add_observation(pid, ak, anchor_px[row] - [cx, cy])
            # record the anchor view in the per-keyframe observation
            # index too (round-5 review): kf_obs feeds relocalization,
            # the FINAL global BA and the SlamResult export — without it
            # a landmark whose track dies before the next keyframe
            # reaches the final BA with a single observation (depth
            # unconstrained along its ray), and every landmark loses its
            # widest-baseline constraint there
            if ak != kf_now:
                kf_obs[ak].append((pid, anchor_px[row].copy()))
        # the relocalization index keeps LEFT-eye pixels only (entries
        # with a third element are right-eye rig observations)
        kf_obs.append(
            [(int(e[0]), np.asarray(e[1]) + [cx, cy]) for e in obs if len(e) == 2]
        )
        rmse = mapper.optimize()
        # pull the BA-refined poses back into the odometry chain
        for i, p6 in enumerate(mapper.poses):
            kf_R[i] = _aa_to_R(p6[:3]).astype(np.float32)
            kf_t[i] = np.asarray(p6[3:], np.float32)

        # -- re-seed when the live track set thins out
        if alive.sum() < min_tracks:
            fresh, fvalid = good_features_to_track(
                jnp.asarray(cur), max_corners, 0.01, 8
            )
            fresh = np.asarray(fresh, np.float32)[np.asarray(fvalid)]
            consumed = np.zeros(len(fresh), bool)
            fresh_desc = None
            if track_ncc_gate > 0 and len(fresh):
                # appearance revival: a fresh corner that mutually matches
                # a DEAD map track's birth anchor IS that landmark coming
                # back from occlusion — rebind the map point instead of
                # letting triangulation mint a duplicate later
                dead_map = np.flatnonzero(~alive & (point_id >= 0))
                dead_map = np.asarray(
                    [r for r in dead_map if point_id[r] in mapper.points],
                    np.int64,
                )
                fresh_desc = descs_at(cur, fresh)
                if len(dead_map):
                    idx, okm = match_descriptors(
                        fresh_desc, anchor_desc[dead_map],
                        min_score=revive_min_ncc,
                    )
                    Rk = np.asarray(kf_R[kf_now], np.float64)
                    tk = np.asarray(kf_t[kf_now], np.float64)
                    for j in np.flatnonzero(okm):
                        r = dead_map[idx[j]]
                        # geometric gate: reproject the landmark with the
                        # (BA-refined) current pose; a match far from the
                        # prediction is repetitive texture, not a revival
                        Xc = Rk @ np.asarray(
                            mapper.points[point_id[r]], np.float64
                        ) + tk
                        if Xc[2] <= 0.1:
                            continue
                        pred = focal * Xc[:2] / Xc[2] + np.asarray([cx, cy])
                        if np.linalg.norm(fresh[j] - pred) > revive_px_radius:
                            continue
                        cur_px[r] = fresh[j]
                        alive[r] = True
                        consumed[j] = True
            # the rest of the fresh corners occupy dead slots as new tracks
            left = np.flatnonzero(~consumed)
            dead = np.flatnonzero(~alive)
            take = min(len(dead), len(left))
            src = left[:take]
            cur_px[dead[:take]] = fresh[src]
            anchor_px[dead[:take]] = fresh[src]
            anchor_kf[dead[:take]] = kf_now
            point_id[dead[:take]] = -1
            alive[dead[:take]] = True
            if track_ncc_gate > 0 and take:
                if fresh_desc is None:
                    fresh_desc = descs_at(cur, fresh)
                anchor_desc[dead[:take]] = fresh_desc[src]
        if track_ncc_gate > 0:
            # refresh appearance anchors at every keyframe a track survives
            # (ADVICE r3): under slow viewpoint/scale/illumination change
            # the birth descriptor decays and the drift gate would kill
            # long healthy tracks; gating against the last-keyframe
            # appearance keeps the slid-off-landmark detection (drift is
            # fast between keyframes) while tolerating gradual change.
            # anchor_px/anchor_kf stay at birth — they are the
            # triangulation baseline, not appearance state.
            live_rows = np.flatnonzero(alive)
            if len(live_rows):
                anchor_desc[live_rows] = descs_at(cur, cur_px[live_rows])
        last_kf_px = cur_px.copy()
        kf_seen = alive.copy()

    if not bootstrapped:
        return None

    # --- loop closure + Sim(3) pose graph ----------------------------------
    # Loop edges are measured as FULL similarities (scale from Umeyama
    # alignment of shared structure, measure_loop_sim3) and optimized on a
    # Sim(3) graph: monocular scale drift is corrected, not just rotation
    # and translation direction. When the structure-based measurement
    # fails, the edge degrades to s=1 with the translation scaled from the
    # current estimate (the SE(3)-era behavior).
    # Fourier-Mellin place descriptors: rotation/scale/brightness-tolerant
    # candidate proposal (the 16x16 thumbnail NCC collapses under viewpoint
    # change — see test_place_descriptor_survives_viewpoint_change)
    descs = [frame_descriptor(i) for i in keyframes]
    cands = propose_loop_candidates(descs, min_separation=loop_min_separation)
    sgraph = Sim3PoseGraph.from_se3_odometry(np.stack(kf_R), np.stack(kf_t))
    loop_edges = []
    # one full-map dict: read-only for the edge measurements below, then
    # mutated in place by the re-anchoring epilogue
    pts = mapper.all_points()
    for i, j, _ in cands[:3]:
        got = verify_loop_closure(
            kept[keyframes[i]], kept[keyframes[j]], focal, cx, cy,
            min_inliers=loop_min_inliers, max_corners=max_corners,
        )
        if got is None:
            continue
        R_ij, t_ij, n = got
        sim = measure_loop_sim3(
            kept[keyframes[i]], kept[keyframes[j]],
            kf_obs[i], kf_obs[j], pts,
            kf_R[i], kf_t[i], kf_R[j], kf_t[j],
        )
        if sim is not None:
            # cross-check: the structure-measured rotation must agree with
            # the independently verified epipolar rotation
            s_ij, R_s, t_s, _ = sim
            cosang = (np.trace(R_s.T @ R_ij) - 1.0) / 2.0
            if cosang < np.cos(np.radians(10.0)):
                sim = None
        if sim is not None:
            sgraph.add_edge(i, j, s_ij, R_s, t_s, weight=4.0)
        else:
            ci = -kf_R[i].T @ kf_t[i]
            cj = -kf_R[j].T @ kf_t[j]
            sgraph.add_edge(
                i, j, 1.0, R_ij, t_ij * np.linalg.norm(cj - ci), weight=4.0
            )
        loop_edges.append((i, j, n))
    if loop_edges:
        ss, Rn, tn = sgraph.optimize()
        # SE(3)-ize the similarity nodes for everything downstream: the
        # camera (R, t/s) sees every ray of (s, R, t) unchanged
        # (X_cam = s R X + t projects like R X + t/s), and the center
        # -(1/s) R^T t = -R^T (t/s) is preserved
        tn = (tn / ss[:, None]).astype(np.float32)
        if final_global_ba and pts:
            # Loop-aware refinement: the pose graph moved the cameras but
            # the map still sits where the DRIFTED trajectory built it.
            # Re-anchor each point to its first observing keyframe (its
            # local-camera coordinates are what the observations actually
            # measured, so the point rides with its anchor's correction),
            # then one global BA over every keyframe and observation makes
            # map and trajectory consistent again.
            anchors = {}
            for kf_i, obs_list in enumerate(kf_obs):
                for p, _ in obs_list:
                    anchors.setdefault(p, kf_i)
            for p, X in pts.items():
                a = anchors.get(p, 0)
                X_cam = kf_R[a] @ X + kf_t[a]
                # full similarity inverse: X_w = (1/s) R^T (X_cam - t_sim)
                #                              = R^T (X_cam/s - t_sim/s)
                # (tn is already t_sim/s) — the anchor's scale correction
                # rides into the map, not just its rotation/translation
                pts[p] = Rn[a].T @ (X_cam / ss[a] - tn[a])
            from optical_flow_tpu.slam.ba import (
                BAProblem,
                bundle_adjust,
                reprojection_rmse,
            )

            pids = sorted(pts)
            pidx = {p: i for i, p in enumerate(pids)}
            # every stereo right-eye measurement re-enters the global BA:
            # without them the mono reprojection problem is scale-gauge
            # free and the refinement could drift off metric
            ci, pi, uv, bl = _collect_observations(
                kf_obs, rig_obs, pidx, cx, cy, stereo_baseline
            )
            cams = np.stack(
                [np.concatenate([_R_to_aa(R), t]) for R, t in zip(Rn, tn)]
            ).astype(np.float64)
            # f64 inputs; jnp converts per the x64 setting (f32 otherwise)
            prob = BAProblem(
                jnp.asarray(cams),
                jnp.asarray(np.stack([pts[p] for p in pids]).astype(np.float64)),
                jnp.asarray(ci, jnp.int32),
                jnp.asarray(pi, jnp.int32),
                jnp.asarray(np.stack(uv)),
                focal,
                jnp.asarray(np.ones(len(ci))),
                jnp.asarray(np.asarray(bl)),
            )
            # Huber loss: the global problem spans every association ever
            # made — one wrong track must not drag the whole loop-corrected
            # trajectory (squared loss lets it; slam/ba.py robust_delta)
            refined, _ = bundle_adjust(prob, iters=ba_iters, robust_delta=3.0)
            rmse = float(reprojection_rmse(refined))
            cams_r = np.asarray(refined.cams)
            Rn = np.stack([_aa_to_R(c[:3]) for c in cams_r]).astype(np.float32)
            tn = cams_r[:, 3:].astype(np.float32)
            pts = {p: np.asarray(x) for p, x in zip(pids, np.asarray(refined.points))}
    else:
        Rn, tn = np.stack(kf_R), np.stack(kf_t)

    pid_list = list(pts)
    points = np.stack([pts[p] for p in pid_list]) if pts else np.zeros((0, 3))
    # export the observations behind the map (BAProblem layout, centered
    # pixels) so downstream refiners — e.g. tightly-coupled VI-BA — can
    # re-optimize the finished solution without re-tracking
    row_of = {p: i for i, p in enumerate(pid_list)}
    o_ci, o_pi, o_uv, o_bl = _collect_observations(
        kf_obs, rig_obs, row_of, cx, cy, stereo_baseline
    )
    return SlamResult(
        poses=np.asarray(Rn),
        trans=np.asarray(tn),
        points=points,
        keyframes=keyframes,
        loop_edges=loop_edges,
        rmse=rmse,
        cam_idx=np.asarray(o_ci, np.int32),
        pt_idx=np.asarray(o_pi, np.int32),
        obs=np.stack(o_uv) if o_uv else np.zeros((0, 2)),
        obs_baseline=np.asarray(o_bl),
    )
