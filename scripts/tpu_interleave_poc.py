"""Which interleave formulations does Mosaic lower? Each variant builds a
(2H,) row or (, 2W) col interleave of two planes inside a pallas kernel."""
import sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial

sys.path.insert(0, "/root/repo")
from optical_flow_tpu.utils.compat import enable_persistent_cache
enable_persistent_cache()

H, W = 256, 256


def k_rows_stack(a_ref, b_ref, o_ref):
    a, b = a_ref[...], b_ref[...]
    o_ref[...] = jnp.stack([a, b], axis=-2).reshape(2 * H, W)


def k_rows_concat_reshape(a_ref, b_ref, o_ref):
    a, b = a_ref[...], b_ref[...]
    o_ref[...] = jnp.concatenate([a, b], axis=-1).reshape(2 * H, W)


def k_cols_stack(a_ref, b_ref, o_ref):
    a, b = a_ref[...], b_ref[...]
    o_ref[...] = jnp.stack([a, b], axis=-1).reshape(H, 2 * W)


def k_cols_dilate(a_ref, b_ref, o_ref):
    a, b = a_ref[...], b_ref[...]
    z = jnp.zeros((), a.dtype)
    ad = lax.pad(a, z, [(0, 0, 0), (0, 1, 1)])  # (H, 2W-1) evens
    bd = lax.pad(b, z, [(0, 0, 0), (1, 0, 1)])  # (H, 2W) odds at 1,3,..
    o_ref[...] = lax.pad(ad, z, [(0, 0, 0), (0, 1, 0)]) + bd


def k_rows_dilate(a_ref, b_ref, o_ref):
    a, b = a_ref[...], b_ref[...]
    z = jnp.zeros((), a.dtype)
    ad = lax.pad(a, z, [(0, 1, 1), (0, 0, 0)])
    bd = lax.pad(b, z, [(1, 0, 1), (0, 0, 0)])
    o_ref[...] = ad + bd


def k_cols_repeat_mask(a_ref, b_ref, o_ref):
    a, b = a_ref[...], b_ref[...]
    ar = pltpu.repeat(a, 2, axis=1)  # may or may not exist/lower
    br = pltpu.repeat(b, 2, axis=1)
    par = lax.broadcasted_iota(jnp.int32, (H, 2 * W), 1) % 2
    o_ref[...] = jnp.where(par == 0, ar, br)


VARIANTS = {
    "rows_stack": (k_rows_stack, (2 * H, W), "rows"),
    "rows_concat_reshape": (k_rows_concat_reshape, (2 * H, W), "rows"),
    "rows_dilate": (k_rows_dilate, (2 * H, W), "rows"),
    "cols_stack": (k_cols_stack, (H, 2 * W), "cols"),
    "cols_dilate": (k_cols_dilate, (H, 2 * W), "cols"),
    "cols_repeat_mask": (k_cols_repeat_mask, (H, 2 * W), "cols"),
}

r = np.random.RandomState(0)
a = jnp.asarray(r.rand(H, W).astype(np.float32))
b = jnp.asarray(r.rand(H, W).astype(np.float32))
want_rows = np.zeros((2 * H, W), np.float32)
want_rows[0::2] = np.asarray(a); want_rows[1::2] = np.asarray(b)
want_cols = np.zeros((H, 2 * W), np.float32)
want_cols[:, 0::2] = np.asarray(a); want_cols[:, 1::2] = np.asarray(b)

for name, (kern, oshape, kind) in VARIANTS.items():
    try:
        fn = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        got = np.asarray(jax.jit(fn)(a, b))
        want = want_rows if kind == "rows" else want_cols
        ok = np.array_equal(got, want)
        print(f"{name}: {'OK' if ok else 'WRONG VALUES'}")
    except Exception as e:
        msg = str(e)
        tail = [l for l in msg.splitlines() if "tpu." in l or "error:" in l.lower() or "Not implemented" in l]
        print(f"{name}: FAILED {type(e).__name__}: {(tail[-1] if tail else msg[:160])[:200]}")


def k_cols_transpose(a_ref, b_ref, o_ref):
    at, bt = a_ref[...].T, b_ref[...].T  # (W, H)
    rows = jnp.stack([at, bt], axis=-2).reshape(2 * W, H)
    o_ref[...] = rows.T


try:
    fn = pl.pallas_call(
        k_cols_transpose,
        out_shape=jax.ShapeDtypeStruct((H, 2 * W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    got = np.asarray(jax.jit(fn)(a, b))
    print("cols_transpose:", "OK" if np.array_equal(got, want_cols) else "WRONG VALUES")
except Exception as e:
    msg = str(e)
    tail = [l for l in msg.splitlines() if "tpu." in l or "error:" in l.lower()]
    print(f"cols_transpose: FAILED {type(e).__name__}: {(tail[-1] if tail else msg[:160])[:200]}")


# ---------------------------------------------------------------- timing
# Which interleave is FASTEST (not just lowerable)? And what do the
# XLA-level lane parity split/merge cost at production size? These numbers
# decide the polyphase (column-parity-split) warp-core rewrite (ROADMAP):
# the rewrite only pays if split/merge at the pipeline edges costs less
# than the in-kernel transposes it removes (~60-80 us/frame at 1080^2).

def _device_us(fn, args_fn, iters=30, tag="jit_"):
    import glob, gzip, json, os, time
    argsets = [args_fn(s) for s in range(3 + iters)]
    jax.block_until_ready(argsets)
    jfn = jax.jit(fn)
    for a in argsets[:3]:
        out = jfn(*a)
        out = out[0] if isinstance(out, tuple) else out
        float(np.asarray(out[..., :1, :1]).ravel()[0])
    d = "/tmp/ipoc_trace"
    os.system(f"rm -rf {d}")
    with jax.profiler.trace(d):
        outs = [jfn(*a) for a in argsets[3:]]
        last = outs[-1]
        last = last[0] if isinstance(last, tuple) else last
        float(np.asarray(last[..., :1, :1]).ravel()[0])
    fs = glob.glob(d + "/**/*.trace.json.gz", recursive=True)
    if not fs:
        return float("nan")
    with gzip.open(fs[0]) as f:
        tr = json.load(f)
    tot = sum(e.get("dur", 0) for e in tr.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("name", "").startswith(tag))
    return tot / iters


def time_variants():
    HT, WT = 1080, 1080

    def mk(seed):
        r = np.random.RandomState(seed)
        return (jnp.asarray(r.rand(HT, WT // 2).astype(np.float32)),
                jnp.asarray(r.rand(HT, WT // 2).astype(np.float32)))

    def mk_full(seed):
        r = np.random.RandomState(seed)
        return (jnp.asarray(r.rand(HT, WT).astype(np.float32)),)

    # XLA-level lane parity SPLIT (reshape trick) and MERGE (stack+reshape)
    def xla_split(x):
        s = x.reshape(HT, WT // 2, 2)
        return s[..., 0] + 0.0, s[..., 1] + 0.0

    def xla_merge(a, b):
        return jnp.stack([a, b], axis=-1).reshape(HT, WT)

    def xla_split_strided(x):
        return x[:, 0::2] + 0.0, x[:, 1::2] + 0.0

    print("\n-- XLA-level costs at 1080^2 (device us/call) --")
    print(f"lane split (reshape): {_device_us(xla_split, mk_full):8.1f} us")
    print(f"lane split (strided): {_device_us(xla_split_strided, mk_full):8.1f} us")
    print(f"lane merge (stack):   {_device_us(xla_merge, mk):8.1f} us")

    # in-kernel interleave variants at half-width -> full width
    def kern_transpose(a_ref, b_ref, o_ref):
        at, bt = a_ref[...].T, b_ref[...].T
        rows = jnp.stack([at, bt], axis=-2).reshape(WT, HT)
        o_ref[...] = rows.T

    def kern_repeat(a_ref, b_ref, o_ref):
        ar = pltpu.repeat(a_ref[...], 2, axis=1)
        br = pltpu.repeat(b_ref[...], 2, axis=1)
        par = lax.broadcasted_iota(jnp.int32, (HT, WT), 1) % 2
        o_ref[...] = jnp.where(par == 0, ar, br)

    for name, kern in (("transpose", kern_transpose), ("repeat", kern_repeat)):
        try:
            fn = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((HT, WT), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            got = np.asarray(jax.jit(fn)(*mk(0)))
            a0, b0 = mk(0)
            want = np.zeros((HT, WT), np.float32)
            want[:, 0::2] = np.asarray(a0)
            want[:, 1::2] = np.asarray(b0)
            ok = np.array_equal(got, want)
            us = _device_us(fn, mk)
            print(f"in-kernel cols interleave ({name}): "
                  f"{'OK' if ok else 'WRONG'} {us:8.1f} us")
        except Exception as e:
            print(f"in-kernel cols interleave ({name}): FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}")


if "--time" in sys.argv:
    time_variants()
