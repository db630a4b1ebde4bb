"""Sliding-window bundle adjustment with track retirement.

The reference has no mapping backend at all (SURVEY.md section 7: the
tracking/SLAM layer is the north-star extension); full-batch BA (slam/ba.py)
re-optimizes every camera and point forever, which no real-time system can
afford. The standard production structure is a SLIDING WINDOW:

  - only the last `window` keyframe poses are free variables; older poses
    are frozen (they still constrain the solve through their observations
    of active points — passed to bundle_adjust as `fixed_cams`);
  - points with no observation inside the window are RETIRED: frozen at
    their current estimate and dropped from the live problem, so the
    optimized problem size is O(window), not O(trajectory).

Everything host-side here is bookkeeping (numpy index juggling); the solve
itself is the jitted sparse-Schur bundle_adjust, whose cost per keyframe is
bounded by the window size. Shapes presented to jit are padded to
power-of-two-ish buckets so a long trajectory reuses a handful of
compiled programs instead of compiling per keyframe.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from optical_flow_tpu.slam.ba import BAProblem, bundle_adjust, reprojection_rmse


def _bucket(n: int) -> int:
    """Smallest power of two >= n (jit shape bucketing)."""
    b = 1
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class WindowedBA:
    """Incremental mapper: add_keyframe() then optimize().

    Coordinates follow slam/ba.py: poses are (6,) axis-angle+translation
    world->camera, observations are pixel coordinates under `focal`.
    """

    window: int = 5
    focal: float = 1.0
    ba_iters: int = 4
    lam: float = 1e-4
    dtype: type = np.float64

    def __post_init__(self):
        self.poses: List[np.ndarray] = []  # every keyframe pose, grows
        self.points: Dict[int, np.ndarray] = {}  # live points
        self.retired: Dict[int, np.ndarray] = {}  # frozen points
        # live observations: per point id, list of (cam_index, uv)
        self._tracks: Dict[int, List[Tuple[int, np.ndarray]]] = {}
        self._last_seen: Dict[int, int] = {}

    # ------------------------------------------------------------ building

    def add_keyframe(
        self,
        pose_init,
        observations: Sequence[Tuple],
        new_points: Optional[Dict[int, Sequence[float]]] = None,
    ) -> int:
        """Append a keyframe.

        pose_init: (6,) initial pose guess.
        observations: [(point_id, (u, v)), ...] for this keyframe; an
        entry may carry a third element — a rectified-rig eye offset
        (BAProblem.baseline): (point_id, (u, v), baseline). A stereo
        right-eye measurement enters the solve that way, making depth
        observable from a single keyframe.
        new_points: {point_id: (x, y, z)} initial positions for ids not
        seen before (must cover any observation of an unknown id).
        Returns the keyframe index.
        """
        k = len(self.poses)
        self.poses.append(np.asarray(pose_init, self.dtype).copy())
        if new_points:
            for pid, X in new_points.items():
                if pid in self.retired:
                    raise ValueError(f"point {pid} was retired; ids are single-use")
                self.points[pid] = np.asarray(X, self.dtype).copy()
                self._tracks.setdefault(pid, [])
                # registration counts for retirement even if no
                # observation ever arrives: an obs-less point must age
                # out of the window like any other, not live forever
                # (round-5 review)
                self._last_seen.setdefault(pid, k)
        for entry in observations:
            pid, uv = entry[0], entry[1]
            b = float(entry[2]) if len(entry) > 2 else 0.0
            if pid in self.retired:
                continue  # stale track: the map already froze this point
            if pid not in self.points:
                raise ValueError(f"observation of unknown point {pid}")
            self._tracks[pid].append((k, np.asarray(uv, self.dtype), b))
            self._last_seen[pid] = k
        self._retire(k)
        return k

    def add_observation(self, pid: int, cam_index: int, uv, baseline: float = 0.0) -> None:
        """Attach an observation of live point `pid` from an EARLIER
        keyframe (e.g. the anchor view a track was triangulated against).
        Does not refresh the retirement clock — the track still retires
        when its LATEST view leaves the window."""
        if pid in self.retired:
            return
        if pid not in self.points:
            raise ValueError(f"observation of unknown point {pid}")
        self._tracks[pid].append(
            (int(cam_index), np.asarray(uv, self.dtype), float(baseline))
        )

    def _retire(self, newest: int) -> None:
        """Freeze points whose tracks ended before the active window."""
        horizon = newest - self.window + 1
        for pid in [p for p, last in self._last_seen.items() if last < horizon]:
            self.retired[pid] = self.points.pop(pid)
            del self._tracks[pid]
            del self._last_seen[pid]

    # ---------------------------------------------------------- optimizing

    def _gather_problem(self):
        """Compact the live window into a BAProblem (+ index maps)."""
        newest = len(self.poses) - 1
        horizon = max(newest - self.window + 1, 0)
        # only points with at least one observation enter the solve: an
        # obs-less registered point has nothing to say and previously
        # crashed the empty np.stack below (round-5 review)
        pids = sorted(p for p in self.points if self._tracks[p])
        if not pids:
            return None
        cam_set = sorted({t[0] for pid in pids for t in self._tracks[pid]})
        cam_map = {c: i for i, c in enumerate(cam_set)}
        pt_map = {p: i for i, p in enumerate(pids)}
        cam_idx, pt_idx, uvs, blines = [], [], [], []
        for pid in pids:
            for k, uv, b in self._tracks[pid]:
                cam_idx.append(cam_map[k])
                pt_idx.append(pt_map[pid])
                uvs.append(uv)
                blines.append(b)
        # out-of-window cameras participate (their observations anchor the
        # points) but stay fixed; the oldest in-window camera is also the
        # gauge anchor when nothing older exists (bundle_adjust pins
        # index 0 = the oldest camera in cam_set, which is correct in both
        # cases: it is either frozen history or the window's anchor).
        fixed = np.array([c < horizon for c in cam_set])

        # Pad every axis to a power-of-two bucket so a long trajectory
        # reuses a few compiled programs instead of one per keyframe.
        # Padded observations carry weight 0 (zero residual and Jacobians),
        # padded points have no observations (their update is exactly 0),
        # padded cameras are marked fixed.
        C, P, M = len(cam_set), len(pids), len(cam_idx)
        C_b, P_b, M_b = _bucket(C), _bucket(P), _bucket(M)
        cams_arr = np.zeros((C_b, 6), self.dtype)
        cams_arr[:C] = np.stack([self.poses[c] for c in cam_set])
        pts_arr = np.zeros((P_b, 3), self.dtype)
        pts_arr[:P] = np.stack([self.points[p] for p in pids])
        pts_arr[P:, 2] = 1.0  # keep padded points off the z=0 singularity
        ci = np.zeros(M_b, np.int32)
        ci[:M] = cam_idx
        pi = np.zeros(M_b, np.int32)
        pi[:M] = pt_idx
        uv_arr = np.zeros((M_b, 2), self.dtype)
        uv_arr[:M] = np.stack(uvs)
        w = np.zeros(M_b, self.dtype)
        w[:M] = 1.0
        b_arr = np.zeros(M_b, self.dtype)
        b_arr[:M] = blines
        fixed_b = np.ones(C_b, bool)
        fixed_b[:C] = fixed
        prob = BAProblem(
            jnp.asarray(cams_arr),
            jnp.asarray(pts_arr),
            jnp.asarray(ci),
            jnp.asarray(pi),
            jnp.asarray(uv_arr),
            self.focal,
            jnp.asarray(w),
            jnp.asarray(b_arr),
        )
        return prob, cam_set, pids, jnp.asarray(fixed_b)

    def optimize(self) -> Optional[float]:
        """One windowed BA solve; writes results back. Returns the final
        reprojection RMSE over the live window (None if nothing to solve)."""
        gathered = self._gather_problem()
        if gathered is None:
            return None
        prob, cam_set, pids, fixed = gathered
        refined, _ = bundle_adjust(
            prob, iters=self.ba_iters, lam=self.lam, fixed_cams=fixed
        )
        cams = np.asarray(refined.cams)
        pts = np.asarray(refined.points)
        fixed_np = np.asarray(fixed)
        # index 0 of the subproblem is bundle_adjust's gauge anchor and
        # never moves; fixed (out-of-window / padded) cameras don't either
        for i, c in enumerate(cam_set):
            if not fixed_np[i] and i != 0:
                self.poses[c] = cams[i]
        for i, pid in enumerate(pids):
            self.points[pid] = pts[i]
        return float(reprojection_rmse(refined))

    # ------------------------------------------------------------- queries

    def all_points(self) -> Dict[int, np.ndarray]:
        out = dict(self.retired)
        out.update(self.points)
        return out

    @property
    def live_observation_count(self) -> int:
        return sum(len(t) for t in self._tracks.values())
