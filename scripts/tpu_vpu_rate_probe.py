"""VPU elementwise throughput: f32 vs bf16 (and the MXU f32 rate).

The fused warp+LK kernel runs at ~93% of the MEASURED-practical f32 VPU
rate (utils/profiling.py roofline); the remaining single-chip lever is
doing the same work cheaper. If bf16 elementwise throughput is ~2x f32
on this chip, a bf16 tap-weight core (image data is 8-bit; products
round at bf16's 8 mantissa bits — the 0.1 px EPE gate arbitrates) would
be worth building. This probe answers the rate question directly with a
mul-add chain long enough to be issue-bound, not bandwidth-bound.

Run directly on the chip: python scripts/tpu_vpu_rate_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optical_flow_tpu.utils.compat import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 512, 1024
CHAIN = 64  # mul-adds per element per pass


def make_kernel(dtype):
    def kern(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        acc = a
        for i in range(CHAIN):
            acc = acc * b + a  # one FMA-shaped step per iteration
        o_ref[...] = acc

    return kern


def measure(dtype, name):
    kern = make_kernel(dtype)
    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((H, W), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jfn = jax.jit(fn)

    def mk(seed):
        r = np.random.RandomState(seed)
        return (
            jnp.asarray(r.rand(H, W).astype(np.float32) + 0.5, dtype),
            jnp.asarray(r.rand(H, W).astype(np.float32) * 1e-3, dtype),
        )

    iters = 50
    args = [mk(s) for s in range(3 + iters)]
    jax.block_until_ready(args)
    for a in args[:3]:
        float(np.asarray(jfn(*a)[:1, :1], np.float32).ravel()[0])
    t0 = time.perf_counter()
    outs = [jfn(*a) for a in args[3:]]
    float(np.asarray(outs[-1][:1, :1], np.float32).ravel()[0])
    wall = (time.perf_counter() - t0) / iters
    flops = 2 * H * W * CHAIN
    print(f"{name:6s}: {wall * 1e6:8.1f} us/call  "
          f"{flops / wall / 1e12:6.2f} Tflop/s (wall incl. dispatch)")
    return wall


def main():
    print(f"device: {jax.devices()[0]}")
    t32 = measure(jnp.float32, "f32")
    tbf = measure(jnp.bfloat16, "bf16")
    print(f"bf16/f32 speedup: {t32 / tbf:.2f}x")


if __name__ == "__main__":
    main()
