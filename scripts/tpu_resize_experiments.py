"""Fused resize+blur operator shootout on the real chip.

The fast-mode preprocess head (pipeline/preprocess._resize_blur_f32)
applies the blur-folded bicubic resample as two DENSE matmuls
(1080x720 rows, 1080x1280 cols for the flagship 720p -> 1080^2 chain,
ParallelVideoPyr.cpp:782-793's resize+blur). But the true operator is
~13-banded: a bicubic tap spread of 4 composed with the 9-tap blur —
each output row/col reads ~13 contiguous inputs. Dense form wastes
~60x the FLOPs; a block-banded form (tile the OUTPUT axis by 128, slice
the ~128-wide input slab each tile actually reads, one small matmul per
tile) cuts compiled FLOPs ~5-6x while keeping MXU-friendly shapes.

Variants:
  dense        — production _resize_blur_f32 (einsum, HIGHEST).
  dense_def    — same with Precision.DEFAULT (bf16 multiplies): a
                 datapoint for what precision buys/costs, NOT a
                 production candidate (pixel-LSB-scale error).
  banded       — block-banded both axes (tile 128), HIGHEST.
  banded256    — tile 256 (fewer, fatter matmuls).

Timing per the honest protocol (bench.py): use-once inputs, device
spans from jax.profiler, final-slice sync. Accuracy vs the f64 oracle
printed per variant.

Run directly on the chip: python scripts/tpu_resize_experiments.py
"""

import glob
import gzip
import json
import os
import sys
import time
from functools import lru_cache

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optical_flow_tpu.utils.compat import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax import lax

from optical_flow_tpu.pipeline.preprocess import (
    _resize_blur_f32,
    _resize_blur_matrix,
)

KSIZE, SIGMA = 9, 1.5
H_IN, W_IN, H_OUT, W_OUT = 720, 1280, 1080, 1080
BATCH = 6  # the e2e bench's frames_per_call + 2


def _round_up(x, m):
    return -(-x // m) * m


@lru_cache(maxsize=None)
def _banded_factors(n_in, n_out, tile):
    """Split the (n_out, n_in) fused operator into per-tile dense blocks:
    (nt, tile, width) weights + per-tile input-slab starts. width is the
    max nonzero support over tiles, rounded to the sublane/lane grain so
    every slab slice has the same static shape."""
    M = _resize_blur_matrix(n_in, n_out, KSIZE, SIGMA).astype(np.float32)
    nt = -(-n_out // tile)
    starts, width = [], 0
    for t in range(nt):
        rows = M[t * tile : (t + 1) * tile]
        nz = np.nonzero(np.abs(rows).sum(0) > 0)[0]
        starts.append(int(nz.min()))
        width = max(width, int(nz.max() - nz.min() + 1))
    width = min(_round_up(width, 64), n_in)
    starts = [min(s, n_in - width) for s in starts]
    W = np.zeros((nt, tile, width), np.float32)
    for t in range(nt):
        rows = M[t * tile : (t + 1) * tile]
        W[t, : rows.shape[0]] = rows[:, starts[t] : starts[t] + width]
    return W, tuple(starts)


def _apply_banded_rows(x, n_out, tile):
    Wt, starts = _banded_factors(x.shape[-2], n_out, tile)
    Wj = jnp.asarray(Wt)
    outs = [
        jnp.einsum(
            "ij,...jw->...iw", Wj[t], x[..., s : s + Wt.shape[2], :],
            precision=lax.Precision.HIGHEST,
        )
        for t, s in enumerate(starts)
    ]
    return jnp.concatenate(outs, axis=-2)[..., :n_out, :]


def _apply_banded_cols(x, n_out, tile):
    Wt, starts = _banded_factors(x.shape[-1], n_out, tile)
    Wj = jnp.asarray(Wt)
    outs = [
        jnp.einsum(
            "ij,...hj->...hi", Wj[t], x[..., s : s + Wt.shape[2]],
            precision=lax.Precision.HIGHEST,
        )
        for t, s in enumerate(starts)
    ]
    return jnp.concatenate(outs, axis=-1)[..., :n_out]


def resize_blur_banded(x, tile=128):
    r = _apply_banded_rows(x.astype(jnp.float32), H_OUT, tile)
    return _apply_banded_cols(r, W_OUT, tile)


def resize_blur_dense(x):
    # explicit dense form (the pre-round-3 production path; the package's
    # _resize_blur_f32 is now the banded winner below)
    Mr = jnp.asarray(_resize_blur_matrix(H_IN, H_OUT, KSIZE, SIGMA))
    Mc = jnp.asarray(_resize_blur_matrix(W_IN, W_OUT, KSIZE, SIGMA))
    return jnp.einsum(
        "oh,...hw,pw->...op", Mr, x.astype(jnp.float32), Mc,
        precision=lax.Precision.HIGHEST,
    )


def resize_blur_production(x):
    return _resize_blur_f32(x, (H_OUT, W_OUT), KSIZE, SIGMA)


def resize_blur_dense_default(x):
    Mr = jnp.asarray(_resize_blur_matrix(H_IN, H_OUT, KSIZE, SIGMA))
    Mc = jnp.asarray(_resize_blur_matrix(W_IN, W_OUT, KSIZE, SIGMA))
    return jnp.einsum(
        "oh,...hw,pw->...op", Mr, x.astype(jnp.float32), Mc,
        precision=lax.Precision.DEFAULT,
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


def measure(fn, name, iters=20):
    def mk(seed):
        r = np.random.RandomState(seed)
        return (jnp.asarray((r.rand(BATCH, H_IN, W_IN) * 255).astype(np.float32)),)

    ps = [mk(s) for s in range(3 + iters)]
    jax.block_until_ready(ps)
    jfn = jax.jit(fn)
    for p in ps[:3]:
        out = jfn(*p)
        float(np.asarray(out[..., :1, :1]).ravel()[0])
    trace_dir = f"/tmp/resize_trace_{name}"
    os.system(f"rm -rf {trace_dir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        outs = [jfn(*p) for p in ps[3:]]
        float(np.asarray(outs[-1][..., :1, :1]).ravel()[0])
    wall = time.perf_counter() - t0
    dev = _device_seconds(trace_dir, "jit_", iters)
    us = (dev[0] / iters * 1e6) if dev else wall / iters * 1e6
    print(
        f"{name:16s} {us:9.1f} us/call ({us/BATCH:7.1f} us/frame, "
        f"iters={iters}, wall {wall/iters*1e6:.0f})",
        flush=True,
    )
    return us


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    r = np.random.RandomState(0)
    x = (r.rand(2, H_IN, W_IN) * 255).astype(np.float32)
    Mr = _resize_blur_matrix(H_IN, H_OUT, KSIZE, SIGMA).astype(np.float64)
    Mc = _resize_blur_matrix(W_IN, W_OUT, KSIZE, SIGMA).astype(np.float64)
    # two matmuls, NOT a bare np.einsum: unoptimized np.einsum would do
    # the naive 5-index contraction (~1e15 flops) and hang the host
    oracle = (Mr @ x.astype(np.float64)) @ Mc.T
    for name, fn in (
        ("dense", resize_blur_dense),
        ("dense_def", resize_blur_dense_default),
        ("banded", resize_blur_banded),
        ("banded256", lambda v: resize_blur_banded(v, 256)),
    ):
        got = np.asarray(jax.jit(fn)(jnp.asarray(x)))
        print(
            f"accuracy {name:10s}: max |err| vs f64 oracle = "
            f"{np.abs(got - oracle).max():.3e}",
            flush=True,
        )

    measure(resize_blur_dense, "dense")
    measure(resize_blur_dense_default, "dense_def")
    measure(resize_blur_banded, "banded")
    measure(lambda v: resize_blur_banded(v, 256), "banded256")
    measure(resize_blur_production, "production")


if __name__ == "__main__":
    main()
