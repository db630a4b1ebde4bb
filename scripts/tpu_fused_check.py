"""On-TPU validation of the fused warp+LK kernel: accuracy vs the unfused
pallas composition, plus device-span timing (fused vs unfused per level,
and the full corrected pyramid per frame)."""
import glob, gzip, json, os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from optical_flow_tpu.utils.compat import enable_persistent_cache
enable_persistent_cache()

from optical_flow_tpu.kernels.lk_kernel import lucas_kanade_pallas
from optical_flow_tpu.kernels.warp_lk_kernel import warp_lk_band, warp_lk_pallas
from optical_flow_tpu.ops.warp import symmetric_warp

H = W = 1080
C, CLAMP = 5, 8.0
rng = np.random.RandomState(0)

def mk(seed):
    r = np.random.RandomState(seed)
    i1 = jnp.asarray(r.rand(H, W).astype(np.float32))
    i2 = jnp.asarray(r.rand(H, W).astype(np.float32))
    f = r.randn(H // 8, W // 8, 2).astype(np.float32) * 2.0
    f = jax.image.resize(jnp.asarray(f), (H, W, 2), "linear")
    return i1, i2, f[..., 0], f[..., 1]

@jax.jit
def unfused(i1, i2, u, v):
    wu = jnp.clip(u, -CLAMP, CLAMP); wv = jnp.clip(v, -CLAMP, CLAMP)
    w1, w2 = symmetric_warp(i1, i2, -wu, -wv, quantize=True, impl="shift_sep", max_disp=C)
    return lucas_kanade_pallas(w1, w2)

@jax.jit
def fused(i1, i2, u, v):
    return warp_lk_pallas(i1, i2, u, v, max_disp=C, clamp=CLAMP, negate=True)

# --- accuracy ---
i1, i2, u, v = mk(7)
du0, dv0 = unfused(i1, i2, u, v)
du1, dv1 = fused(i1, i2, u, v)
a = np.asarray(du0); b = np.asarray(du1)
c = np.asarray(dv0); d = np.asarray(dv1)
print("band:", warp_lk_band(H, W, C))
print("max |du diff|:", np.abs(a - b).max(), " max |dv diff|:", np.abs(c - d).max())
print("bitwise equal:", np.array_equal(a, b) and np.array_equal(c, d))
diff = np.hypot(a - b, c - d)
print("q999 diff:", np.quantile(diff, 0.999))

def device_ms(fn, name, iters=20):
    ps = [mk(100 + s) for s in range(iters)]
    jax.block_until_ready(ps)
    out = fn(*ps[0]); float(np.asarray(out[0][:1, :1]).ravel()[0])
    td = f"/tmp/fused_trace_{name}"
    os.system(f"rm -rf {td}")
    with jax.profiler.trace(td):
        outs = [fn(*p) for p in ps]
        float(np.asarray(outs[-1][0][:1, :1]).ravel()[0])
    files = glob.glob(td + "/**/*.trace.json.gz", recursive=True)
    total, calls = 0.0, 0
    with gzip.open(files[0]) as f:
        tr = json.load(f)
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("name", "").startswith("jit_") and name in e.get("name", ""):
            total += e.get("dur", 0); calls += 1
    return (total / calls / 1e3 if calls else float("nan")), calls

ms_u, n_u = device_ms(unfused, "unfused")
ms_f, n_f = device_ms(fused, "fused")
print(f"unfused warp+LK 1080^2: {ms_u:.3f} ms/level ({n_u} calls)")
print(f"fused   warp+LK 1080^2: {ms_f:.3f} ms/level ({n_f} calls)")
