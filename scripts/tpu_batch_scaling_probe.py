"""Why does per-frame DEVICE throughput fall as the streaming batch
grows? (BENCH_r05 dispatch sweep: 2081 fps at 4 frames/call -> 1700 at
64 — backwards from the usual amortization.)

Hypothesis: the fused Pallas kernels band over rows under a fixed VMEM
budget; a larger frame batch multiplies the per-row working set, forcing
shorter bands and more band overhead. This probe times the pyramid build
and the flow solve SEPARATELY at each batch size (device spans,
per-frame normalized) to locate the degrading stage.

Run: python scripts/tpu_batch_scaling_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from optical_flow_tpu.utils.compat import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from optical_flow_tpu import FlowConfig, coarse_to_fine_pyramids
from optical_flow_tpu.ops.pyramid import gaussian_pyramid, max_pyramid_levels


from optical_flow_tpu.utils.profiling import (  # noqa: E402
    device_seconds_from_trace as _device_seconds,
)


def drain(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.ravel()[-1:])[0])


def stage_time(fn, mk_args, iters=6, warmup=2):
    f = jax.jit(fn)
    argsets = [mk_args(s) for s in range(warmup + iters)]
    jax.block_until_ready(argsets)
    for a in argsets[:warmup]:
        drain(f(*a))
    trace_dir = "/tmp/oft_batch_probe_trace"
    os.system(f"rm -rf {trace_dir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        outs = [f(*a) for a in argsets[warmup:]]
        drain(outs[-1])
    wall = time.perf_counter() - t0
    dev = _device_seconds(trace_dir, fn.__name__, iters)
    return 1e6 * (dev if dev else wall) / iters


def main():
    H = W = 1080
    lv = max_pyramid_levels((H, W))
    cfg = FlowConfig(
        impl="auto", levels=lv, mode="corrected", warp_clamp=8.0,
        warp_impl="auto", pyr_impl="auto",
    )

    def _st_pyr(diffs):
        return tuple(gaussian_pyramid(diffs, lv, impl=cfg.pyr_impl))

    def _st_stream(diffs):
        pyr = tuple(gaussian_pyramid(diffs, lv, impl=cfg.pyr_impl))
        prev = tuple(p[:-1] for p in pyr)
        cur = tuple(p[1:] for p in pyr)
        u, v, _, _ = coarse_to_fine_pyramids(prev, cur, config=cfg)
        return u, v

    out = {}
    for fpc in (4, 16, 64):
        nb = fpc + 1

        def mk(seed, nb=nb):
            r = np.random.RandomState(seed)
            base = (r.rand(nb, H, W) * 2040.0).astype(np.float32)
            m = (r.rand(nb, H, W) < 0.15).astype(np.float32)
            return (jnp.asarray(base * m),)

        t_pyr = stage_time(_st_pyr, mk)
        t_all = stage_time(_st_stream, mk)
        out[str(fpc)] = {
            "pyr_us_per_frame": round(t_pyr / fpc, 1),
            "flow_us_per_frame": round((t_all - t_pyr) / fpc, 1),
            "total_us_per_frame": round(t_all / fpc, 1),
            "device_fps": round(fpc * 1e6 / t_all, 1),
        }
        print(json.dumps({str(fpc): out[str(fpc)]}), flush=True)
    with open("/tmp/batch_scaling_probe.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
