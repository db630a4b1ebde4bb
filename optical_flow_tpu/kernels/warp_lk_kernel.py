"""Fused warp+LK Pallas kernel (the corrected pyramid's per-level step).

In the displacement-true pyramid every level (below the coarsest) does
    w1, w2 = symmetric_warp(img1, img2, -clip(flow), shift_sep)
    du, dv = lucas_kanade(w1, w2)
(flow/pyramid_loop.py). Unfused that is two kernels with the warped frames
round-tripping through HBM: 4 reads + 2 writes for the warp, then the LK
kernel's 2 reads + 2 writes — 10 HBM plane-traversals per level. This
kernel fuses the whole step into one VMEM band pass: read img1/img2/u/v
bands, warp in registers (the separable quantized shift decomposition of
ops/warp.py::remap_bilinear_shift), REFLECT_101-extend the warped planes
(what the unfused LK's jnp.pad sees), then gradients -> products -> window
sums -> Cramer solve, writing only du/dv: 4 reads + 2 writes total.

Semantics match the unfused composition
    symmetric_warp(img1, img2, s*clip(u), s*clip(v), impl='shift_sep',
                   max_disp=C, quantize=True)  ->  lucas_kanade
bit-for-bit in exact arithmetic (same flow-space quantization
(ops/warp.py quantize_disp), same tap/sum order; on hardware the fusion
changes float contraction only at the 1e-6 level — pinned in
tests/test_warp_lk_kernel.py).

Flow-space quantization makes the displacement position-independent:
image2's displacement is exactly -d, so each hat-weight plane is computed
ONCE per tap and applied to img1 at +k and img2 at -k (half the weight
arithmetic of two independent warps), taps k in [-C, C] suffice with no
fixed-point rounding slack, and no coordinate iotas are needed.

Constraints (caller falls back to the unfused pair otherwise, see
`warp_lk_band`): W >= 4, H >= 8. Rows are padded to a multiple of 8
(Hp) and the band divides Hp; output rows H..Hp-1 are discarded. The
interior mask (rows 0 and H-1 zeroed, LKof.cpp isInsideImage) means a
kept output row gr <= H-2 reads warped rows gr-2..gr+1 <= H-1 only, so
the pad rows never feed a kept output and no bottom REFLECT fix is
needed; the top fix (rows -2,-1 := 2,1) still is, for gr == 1.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTER_TAB = 32.0  # cv2 remap 5-bit fixed-point fractions (ops/warp.py)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def warp_lk_band(H: int, W: int, max_disp: int) -> Optional[int]:
    """Band height for the fused kernel, or None if (H, W) doesn't fit.

    Rows are padded to Hp = round_up(H, 8); the band must divide Hp (so
    every REFLECT_101 row fix sits at a static in-band offset) and be a
    multiple of 8 (f32 sublane tile). ~64 rows keeps the 4 double-buffered
    input slabs + ~12 working planes within VMEM.
    """
    if H < 8 or W < 4:
        return None
    Hp = _round_up(H, 8)
    best = None
    for band in range(8, min(Hp, 256) + 1, 8):
        if Hp % band == 0:
            if band <= 96:
                best = band
            elif best is None:
                best = band
    return best


def _warp_lk_kernel(
    i1_hbm, i2_hbm, u_hbm, v_hbm, du_ref, dv_ref, bufs, sems,
    *, H, W, Wc, band, C, clamp, sign,
):
    # input halo: warped ext (2) + shift tap reach (C), rounded up so the
    # DMA slab height band + 2R stays 8-aligned (Mosaic memref_slice tiling)
    R = _round_up(C + 2, 4)
    b = pl.program_id(0)
    i = pl.program_id(1)
    nbands = pl.num_programs(1)
    row0 = i * band

    slot = lax.rem(i, jnp.int32(2))
    nslot = jnp.int32(1) - slot
    srcs = (i1_hbm, i2_hbm, u_hbm, v_hbm)

    def dma(band_idx, buf_slot, k):
        r0 = band_idx * band
        return pltpu.make_async_copy(
            srcs[k].at[b, pl.ds(r0, band + 2 * R), :],
            bufs.at[k, buf_slot],
            sems.at[k, buf_slot],
        )

    @pl.when(i == 0)
    def _():
        for k in range(4):
            dma(i, slot, k).start()

    @pl.when(i + 1 < nbands)
    def _():
        for k in range(4):
            dma(i + 1, nslot, k).start()

    for k in range(4):
        dma(i, slot, k).wait()

    x1 = bufs[0, slot]
    x2 = bufs[1, slot]
    uu = bufs[2, slot]
    vv = bufs[3, slot]

    f32 = x1.dtype
    half = jnp.asarray(0.5 * sign, f32)
    cl = jnp.asarray(clamp, f32)
    one = jnp.asarray(1.0, f32)
    Cf = jnp.asarray(float(C), f32)

    # Quantized half-flow displacement on the full slab (rows r0-R ..
    # r0+band+R, cols -R .. Wp-R), flow-space like ops/warp.quantize_disp:
    # position-independent, so image2's displacement is exactly -d and
    # both images share each tap's hat weight.
    def quant(flow):
        h = jnp.clip(jnp.clip(flow, -cl, cl) * half, -Cf, Cf)
        return jnp.round(h * _INTER_TAB) / _INTER_TAB

    qx = quant(uu)
    qy = quant(vv)

    Wt = Wc + 4  # tmp/warped plane width: global cols [-2, Wc+2)
    Ht = band + 2 * R  # tmp rows: the full slab, global [row0-R, row0+band+R)

    qx_t = qx[:, R - 2 : R - 2 + Wt]
    t1 = jnp.zeros((Ht, Wt), f32)
    t2 = jnp.zeros((Ht, Wt), f32)
    for k in range(-C, C + 1):
        w = jnp.maximum(0.0, one - jnp.abs(qx_t - k))
        t1 = t1 + w * x1[:, R - 2 + k : R - 2 + k + Wt]
        t2 = t2 + w * x2[:, R - 2 - k : R - 2 - k + Wt]

    # y-pass: warped plane rows = global [row0-2, row0+band+2); warped row
    # a (slab-local a+R) reads tmp rows a+R+k -> slice offset R-2+k.
    qy_w = qy[R - 2 : R - 2 + band + 4, R - 2 : R - 2 + Wt]
    w1 = jnp.zeros((band + 4, Wt), f32)
    w2 = jnp.zeros((band + 4, Wt), f32)
    for k in range(-C, C + 1):
        w = jnp.maximum(0.0, one - jnp.abs(qy_w - k))
        w1 = w1 + w * t1[R - 2 + k : R - 2 + k + band + 4, :]
        w2 = w2 + w * t2[R - 2 - k : R - 2 - k + band + 4, :]

    # REFLECT_101 extension of the warped planes — exactly what the
    # unfused LK reads from jnp.pad(mode='reflect') around the warped
    # image. Columns are at static positions; the top row fix only matters
    # in band 0 (a kept output row gr reads warped rows gr-2..gr+1, so only
    # gr == 1 reads row -1). No bottom fix: kept rows stop at gr == H-2,
    # whose read set ends at row H-1 — pad/junk rows never feed output.
    def reflect(w):
        # (Mosaic has no `rev` lowering; a 2-wide flip is two swapped slices.)
        wl = jnp.concatenate([w[:, 4:5], w[:, 3:4]], 1)  # cols -2,-1 := 2,1
        wr = jnp.concatenate(
            [w[:, W : W + 1], w[:, W - 1 : W]], 1
        )  # cols W,W+1 := W-2,W-3
        w = jnp.concatenate([wl, w[:, 2 : W + 2], wr, w[:, W + 4 :]], 1)
        top = jnp.concatenate([w[4:5], w[3:4], w[2:]], 0)
        return jnp.where(i == 0, top, w)

    w1 = reflect(w1)
    w2 = reflect(w2)

    # LK on the warped planes (identical to kernels/lk_kernel.py).
    def stencil4(x):
        a = x[0 : band + 3, 0 : Wc + 2]
        b_ = x[0 : band + 3, 1 : Wc + 3]
        c = x[1 : band + 4, 0 : Wc + 2]
        d = x[1 : band + 4, 1 : Wc + 3]
        return a, b_, c, d

    a1, b1, c1, d1 = stencil4(w1)
    a2, b2, c2, d2 = stencil4(w2)
    fx = (b1 - a1 + d1 - c1) + (b2 - a2 + d2 - c2)
    fy = (c1 + d1 - a1 - b1) + (c2 + d2 - a2 - b2)
    ft = (a2 + b2 + c2 + d2) - (a1 + b1 + c1 + d1)

    def sum9(p):
        pr = p[0:band, :] + p[1 : band + 1, :] + p[2 : band + 2, :]
        return pr[:, 0:Wc] + pr[:, 1 : Wc + 1] + pr[:, 2 : Wc + 2]

    sfx2 = sum9(fx * fx)
    sfy2 = sum9(fy * fy)
    sfxfy = sum9(fx * fy)
    sfxft = sum9(fx * ft)
    sfyft = sum9(fy * ft)

    det = sfx2 * sfy2 - sfxfy * sfxfy
    ok = det != 0
    inv = jnp.where(ok, det, 1.0)
    du = jnp.where(ok, sfxfy * sfyft - sfy2 * sfxft, 0.0) / inv
    dv = jnp.where(ok, sfxft * sfxfy - sfx2 * sfyft, 0.0) / inv

    gr = row0 + lax.broadcasted_iota(jnp.int32, (band, Wc), 0)
    gc = lax.broadcasted_iota(jnp.int32, (band, Wc), 1)
    keep = (gr > 0) & (gr < H - 1) & (gc > 0) & (gc < W - 1)
    du_ref[0] = jnp.where(keep, du, 0.0)
    dv_ref[0] = jnp.where(keep, dv, 0.0)


@partial(jax.jit, static_argnames=("band", "C", "clamp", "sign"))
def _warp_lk_batched(img1, img2, u, v, band: int, C: int, clamp: float, sign: float):
    B, H, W = img1.shape
    R = _round_up(C + 2, 4)  # must match _warp_lk_kernel
    Hp = _round_up(H, 8)  # band divides Hp (warp_lk_band); rows H..Hp-1 dropped
    nbands = Hp // band
    Wc = _round_up(W, 128)
    Wp = Wc + _round_up(2 * R, 128)  # cols [-R, Wc+R) live at offset R

    def pad(x):
        # zero borders: the warp's BORDER_CONSTANT taps, the out-of-range
        # flow rows, and the Hp-H pad rows all want zeros (junk ext rows of
        # the warped plane never reach a kept output — see module docstring)
        buf = jnp.zeros((x.shape[0], Hp + 2 * R, Wp), x.dtype)
        return lax.dynamic_update_slice(buf, x, (0, R, R))

    p1, p2, pu, pv = pad(img1), pad(img2), pad(u), pad(v)

    kernel = partial(
        _warp_lk_kernel, H=H, W=W, Wc=Wc, band=band, C=C, clamp=clamp, sign=sign
    )
    du, dv = pl.pallas_call(
        kernel,
        grid=(B, nbands),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[
            pl.BlockSpec((1, band, Wc), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band, Wc), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hp, Wc), img1.dtype),
            jax.ShapeDtypeStruct((B, Hp, Wc), img1.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, 2, band + 2 * R, Wp), img1.dtype),
            pltpu.SemaphoreType.DMA((4, 2)),
        ],
    )(p1, p2, pu, pv)
    return du[:, :H, :W], dv[:, :H, :W]


def warp_lk_pallas(
    img1, img2, u, v, *, max_disp: int, clamp: float, negate: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused clip->negate->symmetric shift_sep warp->LK solve.

    img1/img2/u/v: (..., H, W); returns (du, dv) like lucas_kanade on the
    warped frames. Raises ValueError when the shape doesn't fit the band
    constraints — use warp_lk_band() to decide, or catch and fall back.
    """
    band = warp_lk_band(img1.shape[-2], img1.shape[-1], max_disp)
    if band is None:
        raise ValueError(f"shape {img1.shape} unsupported by the fused kernel")
    dtype = jnp.float32
    lead = img1.shape[:-2]
    H, W = img1.shape[-2], img1.shape[-1]
    args = [a.astype(dtype).reshape((-1, H, W)) for a in (img1, img2, u, v)]
    du, dv = _warp_lk_batched(
        *args, band=band, C=int(max_disp), clamp=float(clamp),
        sign=-1.0 if negate else 1.0,
    )
    return du.reshape(lead + (H, W)), dv.reshape(lead + (H, W))
