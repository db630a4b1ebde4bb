"""Sparse-LK 'shift' vs 'gather' on the real chip: agreement + device time.

The 'shift' impl replaces the 20-per-level bilinear window gathers with
one integer region gather per level + hat-weighted static-shift sampling
(track/sparse_lk.py). CPU CI pins agreement; this measures what the
trade is worth on hardware (gathers are per-element scalar loads there).

Run directly on the chip: python scripts/tpu_sparse_lk_check.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optical_flow_tpu.utils.compat import enable_persistent_cache

enable_persistent_cache()

import jax

from optical_flow_tpu.track.sparse_lk import SparseLKConfig, track_features


def main():
    print(f"device: {jax.devices()[0]}")
    rng = np.random.RandomState(0)
    H, W, K = 512, 640, 512

    def mk(seed):
        r = np.random.RandomState(seed)
        base = (r.rand(H, W) * 255).astype(np.float32)
        img2 = np.roll(base, (2, 3), axis=(0, 1))
        pts = np.stack(
            [r.uniform(30, W - 30, K), r.uniform(30, H - 30, K)], axis=1
        ).astype(np.float32)
        return base, img2, pts

    # agreement on one scene
    b, i2, pts = mk(1)
    pg, sg, _ = track_features(b, i2, pts, SparseLKConfig(impl="gather"))
    ps, ss, _ = track_features(b, i2, pts, SparseLKConfig(impl="shift"))
    pg, sg, ps, ss = map(np.asarray, (pg, sg, ps, ss))
    agree = float((sg == ss).mean())
    d = np.linalg.norm(pg - ps, axis=1)[sg & ss]
    print(f"status agreement {agree:.3f}; endpoint diff max {d.max():.2e}")

    for impl in ("gather", "shift"):
        cfg = SparseLKConfig(impl=impl)
        scenes = [mk(s) for s in range(2, 12)]
        # warm
        p, s_, e = track_features(*scenes[0], cfg)
        float(np.asarray(p)[0, 0])
        t0 = time.perf_counter()
        for sc in scenes:
            p, s_, e = track_features(*sc, cfg)
        float(np.asarray(p)[0, 0])  # drain the in-order queue
        dt = (time.perf_counter() - t0) / len(scenes)
        print(f"{impl:6s}: {dt * 1e3:7.2f} ms / call ({K} features, "
              f"{H}x{W}, 3 levels; wall incl. dispatch)")


if __name__ == "__main__":
    main()
