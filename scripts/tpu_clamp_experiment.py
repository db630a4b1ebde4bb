"""Clamp-4 operating-point experiment on the real chip (ROADMAP).

The production corrected config warps each level by the accumulated flow
CLAMPED to warp_clamp; the gather-free shift warp's tap count per
separable pass is 2*ceil(clamp/2)+1, so lowering the clamp cuts the
dominant per-level VPU work of the fused kernels (clamp 8 -> 4 is
9 -> 5 taps, roughly a 35-45% cut) at the cost of truncating the warp
whenever the true accumulated flow exceeds the clamp at that level.

Two measurements, decision gates for flipping the default:

1. SPEED: streaming-formulation device time at 1080^2 / 4 levels for
   clamp in {8, 6, 4} (same honest protocol as bench.py: use-once
   inputs, device spans, final-slice sync).
2. ACCURACY: global-translation EPE ladder on the real table image
   (the test_ops.py::test_pyramid_shift_sep_translation_epe harness,
   widened to larger motions — the clamp risk is exactly large motion):
   translations up to ~12 px with 4 levels. A clamp-4 config stays a
   safe default only if its EPE tracks clamp-8 across the whole ladder.

Run directly on the chip: python scripts/tpu_clamp_experiment.py
"""

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optical_flow_tpu.utils.compat import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from optical_flow_tpu.config import FlowConfig
from optical_flow_tpu.flow.coarse_to_fine import (
    coarse_to_fine,
    coarse_to_fine_pyramids,
)
from optical_flow_tpu.ops.pyramid import gaussian_pyramid
from optical_flow_tpu.utils.goldens import load_table_pair, reference_dir


def _device_seconds(trace_dir, tag, expected):
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        return None
    with gzip.open(files[0]) as f:
        tr = json.load(f)
    total, calls = 0.0, 0
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and tag in e.get("name", ""):
            total += e.get("dur", 0)
            calls += 1
    return total / 1e6 if calls >= expected else None


def sync(out):
    u = out[0]
    return float(np.asarray(u[..., :1, :1]).ravel()[0])


def measure_streaming(clamp, size=1080, levels=4, frames=4, iters=12):
    cfg = FlowConfig(impl="auto", levels=levels, mode="corrected",
                     warp_clamp=clamp, warp_impl="auto")
    nb = frames + 1

    def mk(seed):
        r = np.random.RandomState(seed)
        base = (r.rand(nb, size, size) * 2040.0).astype(np.float32)
        m = (r.rand(nb, size, size) < 0.15).astype(np.float32)
        return (jnp.asarray(base * m),)

    def _stream(diffs):
        pyr = tuple(gaussian_pyramid(diffs, levels))
        prev = tuple(p[:-1] for p in pyr)
        cur = tuple(p[1:] for p in pyr)
        u, v, _, _ = coarse_to_fine_pyramids(prev, cur, config=cfg)
        return u, v

    warmup = 2
    ps = [mk(s) for s in range(warmup + iters)]
    jax.block_until_ready(ps)
    fn = jax.jit(_stream)
    for p in ps[:warmup]:
        sync(fn(*p))
    trace_dir = f"/tmp/clamp_trace_{clamp:g}"
    os.system(f"rm -rf {trace_dir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        outs = [fn(*p) for p in ps[warmup:]]
        sync(outs[-1])
    wall = time.perf_counter() - t0
    dev = _device_seconds(trace_dir, "_stream", iters)
    per_frame_ms = (dev if dev else wall) / (iters * frames) * 1e3
    fps = 1e3 / per_frame_ms
    print(f"clamp {clamp:4g}: {per_frame_ms:7.3f} ms/frame streaming "
          f"({fps:7.1f} fps)  [device spans]" if dev else
          f"clamp {clamp:4g}: {per_frame_ms:7.3f} ms/frame (WALL fallback)")
    return per_frame_ms


def epe_ladder(clamps, levels=4):
    if reference_dir() is None:
        print("reference checkout unavailable; skipping EPE ladder")
        return
    img1, _ = load_table_pair()
    a = jnp.asarray(img1.astype(np.float32))
    sl = np.s_[32:-32, 32:-32]
    print(f"\ntranslation-EPE ladder (table image, {levels} levels, "
          "production corrected config; interior mean px):")
    header = "  motion(px)   " + "".join(f"clamp {c:<6g}" for c in clamps)
    print(header)
    worst = {c: 0.0 for c in clamps}
    for (dy, dx) in ((1, 1), (2, 3), (4, 3), (6, 5), (9, 7), (12, 9)):
        b = jnp.asarray(np.roll(np.asarray(a), (dy, dx), axis=(0, 1)))
        row = f"  ({dy:2d},{dx:2d})     "
        for c in clamps:
            cfg = FlowConfig(impl="auto", levels=levels, mode="corrected",
                             warp_clamp=c, warp_impl="auto")
            u, v = jax.jit(
                lambda x, y, cfg=cfg: coarse_to_fine(x, y, levels, config=cfg)
            )(a, b)
            e = float(np.hypot(np.asarray(u)[sl] - dx,
                               np.asarray(v)[sl] - dy).mean())
            worst[c] = max(worst[c], e)
            row += f"{e:12.4f}"
        print(row)
    print("  worst-case  " + "".join(f"{worst[c]:12.4f}" for c in clamps))
    return worst


def main():
    print(f"device: {jax.devices()[0]}")
    clamps = (8.0, 6.0, 4.0)
    worst = epe_ladder(clamps)
    print()
    times = {c: measure_streaming(c) for c in clamps}
    if worst:
        print("\ndecision inputs: clamp 4 saves "
              f"{times[8.0] - times[4.0]:.3f} ms/frame "
              f"({(1 - times[4.0] / times[8.0]) * 100:.1f}%); worst-ladder "
              f"EPE {worst[4.0]:.4f} vs clamp-8 {worst[8.0]:.4f} px")


if __name__ == "__main__":
    main()
