"""POC: pyr_up interleaves inside a Pallas kernel (Mosaic lowering check).

Computes pyr_up (exact _pyr_up_stack arithmetic) of a (Hc, Wc) plane in one
pallas_call and compares bit-wise vs ops.pyramid.pyr_up, then times both.
Decides whether the fused upsample+warp+LK kernel is viable.
"""
import sys, os, glob, gzip, json
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial

sys.path.insert(0, "/root/repo")
from optical_flow_tpu.utils.compat import enable_persistent_cache
enable_persistent_cache()
from optical_flow_tpu.ops.pyramid import pyr_up

K = tuple(2.0 * v for v in (0.0625, 0.25, 0.375, 0.25, 0.0625))


def kernel(x_ref, o_ref):
    # x_ref: (Hc+2, Wc+2) padded coarse (asym border applied outside);
    # o_ref: (2Hc, 2Wc)
    p = x_ref[...]
    Hc = o_ref.shape[0] // 2
    Wc = o_ref.shape[1] // 2
    ev = K[0] * p[:-2, :] + K[2] * p[1:-1, :] + K[4] * p[2:, :]
    od = K[1] * p[1:-1, :] + K[3] * p[2:, :]
    rows = jnp.stack([ev, od], axis=-2).reshape(2 * Hc, Wc + 2)
    evc = K[0] * rows[:, :-2] + K[2] * rows[:, 1:-1] + K[4] * rows[:, 2:]
    odc = K[1] * rows[:, 1:-1] + K[3] * rows[:, 2:]
    inter = jnp.stack([evc.T, odc.T], axis=-2).reshape(2 * Wc, 2 * Hc)
    o_ref[...] = inter.T


from functools import partial as _p
@_p(jax.jit, static_argnames=('Hc','Wc'))
def pyrup_pallas(xp, Hc, Wc):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * Hc, 2 * Wc), xp.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(xp)


def pad_asym(x):
    H, W = x.shape
    x = jnp.concatenate([x[1:2], x, x[H - 1 : H]], 0)
    x = jnp.concatenate([x[:, 1:2], x, x[:, W - 1 : W]], 1)
    return x


Hc = Wc = 540
r = np.random.RandomState(0)
x = jnp.asarray(r.rand(Hc, Wc).astype(np.float32))
xp = pad_asym(x)
ref = np.asarray(pyr_up(x))
try:
    got = np.asarray(pyrup_pallas(xp, Hc, Wc))
except Exception as e:
    print("PALLAS FAILED:", type(e).__name__); print(str(e)[-2500:])
    sys.exit(1)
print("max|diff| vs pyr_up:", np.abs(got - ref).max())

# timing: use-once inputs, device spans
xs = [jnp.asarray(r.rand(Hc, Wc).astype(np.float32)) for _ in range(13)]
f_ref = jax.jit(pyr_up)
f_pal = jax.jit(lambda a: pyrup_pallas(pad_asym(a), Hc, Wc))
for name, fn in (("xla_stack", f_ref), ("pallas", f_pal)):
    float(np.asarray(fn(xs[0])[:1, :1]).ravel()[0])
    td = f"/tmp/poc_{name}"
    os.system(f"rm -rf {td}")
    with jax.profiler.trace(td):
        outs = [fn(a) for a in xs[1:]]
        float(np.asarray(outs[-1][:1, :1]).ravel()[0])
    f = glob.glob(td + "/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    tot = 0.0
    n = 0
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("name", "").startswith("jit_"):
            tot += e.get("dur", 0)
            n += 1
    print(f"{name}: {tot/max(n,1)/1e3:.4f} ms/call over {n} calls")
