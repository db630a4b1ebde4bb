"""Microbench: column-tap accumulation via misaligned slices vs pltpu.roll.

The LK/warp kernels' hot loop reads 12 lane-offset slices per plane; the
suspicion (ROADMAP 'kernel vector efficiency') is that Mosaic lowers each
as a full lane relayout while tpu.DynamicRotate (pltpu.roll) is cheap."""
import glob, gzip, json, os, sys
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from optical_flow_tpu.utils.compat import enable_persistent_cache
enable_persistent_cache()

B, H, W = 15, 88, 1280  # one 1080^2 frame's worth of fused-kernel slabs
WIN = 1156
TAPS = list(range(-5, 7))


def k_slice(x_ref, o_ref):
    x = x_ref[0]
    acc = jnp.zeros((H, WIN), x.dtype)
    for t in TAPS:
        acc = acc + jnp.float32(0.1 * t) * x[:, 6 + t : 6 + t + WIN]
    o_ref[0, :, :WIN] = acc
    o_ref[0, :, WIN:] = jnp.zeros((H, W - WIN), acc.dtype)


def k_roll(x_ref, o_ref):
    x = x_ref[0]
    acc = jnp.zeros((H, W), x.dtype)
    for t in TAPS:
        acc = acc + jnp.float32(0.1 * t) * pltpu.roll(x, shift=(-t) % W, axis=1)
    o_ref[0] = pltpu.roll(acc, shift=(W - 6) % W, axis=1)


def run(kern, name):
    f = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
    )
    fj = jax.jit(f)
    xs = [jnp.asarray(np.random.RandomState(s).rand(B, H, W).astype(np.float32)) for s in range(24)]
    jax.block_until_ready(xs)
    float(np.asarray(fj(xs[0])[0, :1, :1]).ravel()[0])
    td = f"/tmp/roll_micro_{name}"
    os.system(f"rm -rf {td}")
    with jax.profiler.trace(td):
        outs = [fj(x) for x in xs]
        float(np.asarray(outs[-1][0, :1, :1]).ravel()[0])
    files = glob.glob(td + "/**/*.trace.json.gz", recursive=True)
    total, calls = 0.0, 0
    with gzip.open(files[0]) as fh:
        tr = json.load(fh)
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("name", "").startswith("jit_"):
            total += e.get("dur", 0)
            calls += 1
    print(f"{name}: {total/max(calls,1):.1f} us/call ({calls} calls)")


run(k_slice, "slice")
run(k_roll, "roll")
