"""pyr_down implementation shootout on the real chip (ROADMAP 'image
pyramid build': 126 us/frame-pair at 1080^2 — the next single-chip
headroom after the fused warp+LK kernels).

Variants:
  poly    — ops/pyramid.pyr_down (polyphase, reshape parity splits): the
            production baseline.
  mxu     — row pass polyphase on the VPU, column decimation as ONE
            banded-matrix matmul on the MXU (out = rows @ S, S[2c+t, c] =
            K5[t]). The lane parity-split reshape that Mosaic/XLA layout
            machinery dislikes disappears; the MXU is idle during the
            pyramid build anyway.
  mxu2    — both passes as matmuls (St^T @ x, then @ Sc): pure-MXU form.
  pyramid — full 4-level gaussian_pyramid built from each variant, the
            actual production composition (levels 1080 -> 540 -> 270 -> 135).

Timing per the honest protocol (bench.py): use-once inputs, device spans
from jax.profiler, final-slice sync. Accuracy vs the f64 oracle printed
per variant (matmul forms use precision=HIGHEST; exact-binary K5 taps are
bf16-representable so products are exact, only the accumulation order
differs from the VPU form).

Run directly on the chip: python scripts/tpu_pyrdown_experiments.py
"""

import glob
import gzip
import json
import os
import sys
import time
from functools import lru_cache, partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optical_flow_tpu.utils.compat import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from optical_flow_tpu.ops.pad import pad_last2
from optical_flow_tpu.ops.pyramid import (
    _decim_matrix,
    _row_pass_poly,
    gaussian_pyramid,
    pyr_down,
)


def pyr_down_mxu(x):
    """ops/pyramid.pyr_down(impl='mxu') — the promoted production
    candidate."""
    return pyr_down(x, impl="mxu")


def pyr_down_mxu2(x):
    """Both passes as banded matmuls (pure MXU)."""
    H, W = x.shape[-2], x.shape[-1]
    Sr = jnp.asarray(_decim_matrix(H))  # (H+4, Hc)
    Sc = jnp.asarray(_decim_matrix(W))
    p = pad_last2(x, 2, 2, 0, 0, mode="reflect")
    r = jnp.einsum(
        "hc,...hw->...cw", Sr, p,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    p2 = pad_last2(r, 0, 0, 2, 2, mode="reflect")
    return jnp.matmul(
        p2, Sc, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


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
    return (total / 1e6, calls) if calls >= expected else None


def measure(fn, name, shape=(2, 1080, 1080), iters=20):
    def mk(seed):
        r = np.random.RandomState(seed)
        return (jnp.asarray((r.rand(*shape) * 255).astype(np.float32)),)

    ps = [mk(s) for s in range(3 + iters)]
    jax.block_until_ready(ps)
    jfn = jax.jit(fn)
    for p in ps[:3]:
        out = jfn(*p)
        out = out[-1] if isinstance(out, (list, tuple)) else out
        float(np.asarray(out[..., :1, :1]).ravel()[0])
    trace_dir = f"/tmp/pyrdown_trace_{name}"
    os.system(f"rm -rf {trace_dir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        outs = [jfn(*p) for p in ps[3:]]
        last = outs[-1]
        last = last[-1] if isinstance(last, (list, tuple)) else last
        float(np.asarray(last[..., :1, :1]).ravel()[0])
    wall = time.perf_counter() - t0
    dev = _device_seconds(trace_dir, "jit_", iters)
    us = (dev[0] / iters * 1e6) if dev else wall / iters * 1e6
    print(f"{name:28s} {us:9.1f} us/call  (iters={iters}, wall {wall/iters*1e6:.0f})")
    return us


def main():
    print(f"device: {jax.devices()[0]}")
    r = np.random.RandomState(0)
    x = (r.rand(2, 256, 256) * 255).astype(np.float32)
    oracle = np.asarray(pyr_down(jnp.asarray(x, jnp.float64)))
    for name, fn in (("poly", pyr_down), ("mxu", pyr_down_mxu), ("mxu2", pyr_down_mxu2)):
        got = np.asarray(jax.jit(fn)(jnp.asarray(x)))
        print(f"accuracy {name:6s}: max |err| vs f64 oracle = "
              f"{np.abs(got - oracle).max():.3e}")

    measure(pyr_down, "pyr_down_poly")
    measure(pyr_down_mxu, "pyr_down_mxu")
    measure(pyr_down_mxu2, "pyr_down_mxu2")
    measure(partial(gaussian_pyramid, levels=4), "pyramid4_poly")

    def pyramid4_mxu(img):
        pyr = [img]
        for _ in range(3):
            pyr.append(pyr_down_mxu(pyr[-1]))
        return pyr

    measure(pyramid4_mxu, "pyramid4_mxu")


if __name__ == "__main__":
    main()
