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
