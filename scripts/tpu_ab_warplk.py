"""A/B device-span timing: fused warp_lk_pallas vs unfused shift_sep warp + LK.

Usage: python scripts/tpu_ab_warplk.py {fused|unfused} [H W]
One mode per process (profiling two pallas kernels in one trace can hang).
Prints mean device ms over use-once inputs.
"""
import glob, gzip, json, os, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from optical_flow_tpu.utils.compat import enable_persistent_cache
enable_persistent_cache()

mode = sys.argv[1]
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
W = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
CLAMP = 8.0
MAX_DISP = 4  # shift_sep flow-space quantization: ceil(clamp/2), no slack

from optical_flow_tpu.flow.lk import lucas_kanade
from optical_flow_tpu.ops.warp import symmetric_warp
from optical_flow_tpu.kernels.warp_lk_kernel import warp_lk_pallas


def fused(a, b, u, v):
    return warp_lk_pallas(a, b, u, v, max_disp=MAX_DISP, clamp=CLAMP, negate=False)


def unfused(a, b, u, v):
    w1, w2 = symmetric_warp(a, b, u, v, quantize=True, impl="shift_sep", max_disp=MAX_DISP)
    return lucas_kanade(w1, w2, impl="pallas")


fn = jax.jit(fused if mode == "fused" else unfused)

def mk(seed):
    r = np.random.RandomState(seed)
    img = (r.rand(H, W) * 255).astype(np.float32)
    u = (r.rand(H, W) * 4 - 2).astype(np.float32)
    return (jnp.asarray(img), jnp.asarray(np.roll(img, 1, 1)),
            jnp.asarray(u), jnp.asarray(-u))

inputs = [mk(s) for s in range(13)]
jax.block_until_ready(inputs)
float(np.asarray(fn(*inputs[0])[0][:1, :1]).ravel()[0])  # compile+warm
td = f"/tmp/ab_{mode}"
os.system(f"rm -rf {td}")
with jax.profiler.trace(td):
    outs = [fn(*p) for p in inputs[1:]]
    float(np.asarray(outs[-1][0][:1, :1]).ravel()[0])

f = glob.glob(td + "/**/*.trace.json.gz", recursive=True)[0]
with gzip.open(f) as fh:
    tr = json.load(fh)
tot = {}
for e in tr.get("traceEvents", []):
    if e.get("ph") != "X":
        continue
    n = e.get("name", "")
    if n.startswith("jit_"):
        d = tot.setdefault(n, [0.0, 0])
        d[0] += e.get("dur", 0)
        d[1] += 1
for n, (d, c) in tot.items():
    print(f"{mode} {H}x{W}: {n} {d/c/1e3:.4f} ms/call over {c} calls")
