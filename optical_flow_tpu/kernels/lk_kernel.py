"""Fused dense-LK Pallas kernel.

One VMEM pass per row-band fuses the reference's entire single-level solve
(LKof.cpp:152-178): the six 2x2 filter2D correlations (fx/fy/ft over both
frames, LKof.cpp:34-74), the five elementwise products, the five 3x3 window
sums (get_Sum9_Mat, LKof.cpp:129-137), and the per-pixel Cramer solve with
divide-by-zero -> 0 (cv::divide semantics). The reference spreads this over
OpenMP task teams (ParallelVideoPyr.cpp:327-542); on TPU it is one kernel:
HBM traffic is 2 reads + 2 writes per pixel, everything else lives in VMEM.

Layout: Mosaic requires DMA/ref-slice shapes aligned to the f32 (8, 128)
tile, so the images are pre-padded to
    rows: HALO-reflect top, round-up to whole bands (+8-row DMA slack),
    cols: HALO-reflect left, total width Wp = Wc + 128 where
          Wc = round_up(W, 128) is the (padded) output width.
The grid walks row-bands; each step DMAs an aligned (band+8, Wp) window of
both images into VMEM, computes at value level (arbitrary slices are fine
on loaded vectors), and writes an aligned (band, Wc) block of u and v.
Row/col positions beyond (H, W) and the global border ring are zeroed by
the same mask (sum3x3_interior leaves the ring at 0 => u = v = 0 there).

Index bookkeeping (band start row0 = i*band, global unpadded coords):
  ext value x[r, c]   <-> image(row0 - 2 + r, c - 2)
  gradient G[k, m]    = grad(row0 - 1 + k, m - 1)
  sum S[d, j] at (row0 + d, j) = sum G[d..d+2, j..j+2]
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 2  # gradient stencil (1) + 3x3 window (1)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lk_band_kernel(img1_hbm, img2_hbm, u_ref, v_ref, e1, e2, sems, *, H, W, Wc, band):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nbands = pl.num_programs(1)
    row0 = i * band  # global row of this band's first output

    # Double-buffered input DMA: band i+1 streams in while band i computes.
    slot = lax.rem(i, jnp.int32(2))  # explicit i32: tests run with x64 on
    nslot = jnp.int32(1) - slot

    def dma(band_idx, buf_slot):
        r0 = band_idx * band
        c1 = pltpu.make_async_copy(
            img1_hbm.at[b, pl.ds(r0, band + 8), :], e1.at[buf_slot], sems.at[0, buf_slot]
        )
        c2 = pltpu.make_async_copy(
            img2_hbm.at[b, pl.ds(r0, band + 8), :], e2.at[buf_slot], sems.at[1, buf_slot]
        )
        return c1, c2

    @pl.when(i == 0)  # first band of this frame: fetch synchronously
    def _():
        c1, c2 = dma(i, slot)
        c1.start()
        c2.start()

    @pl.when(i + 1 < nbands)  # prefetch the next band
    def _():
        c1, c2 = dma(i + 1, nslot)
        c1.start()
        c2.start()

    w1, w2 = dma(i, slot)  # same shapes/sems: wait on this band's arrival
    w1.wait()
    w2.wait()

    x1 = e1[slot]
    x2 = e2[slot]

    u, v = lk_solve_tail(x1, x2, band=band, Wc=Wc, row0=row0, col0=0,
                         Hg=H, Wg=W)
    u_ref[0] = u
    v_ref[0] = v


def lk_solve_tail(x1, x2, *, band, Wc, row0, col0, Hg, Wg):
    """The parity-pinned LK tail shared by EVERY Pallas kernel: 2x2
    correlation gradients (anchor (1,1)) -> products -> 3x3 window sums
    -> Cramer solve with det==0 -> 0 (cv::divide) -> global border-ring
    zeroing on GLOBAL coordinates (row0/col0 are the band/tile origin;
    Hg/Wg the global image size). x1/x2: (band+4, Wc+4) image planes.
    One copy of the numerics — kernels/warp_lk_kernel.py consumes this
    after its warp stage (round-5 review: the tail was duplicated
    line-for-line and could drift)."""

    def stencil4(x):
        # 2x2 correlation reads with anchor (1,1): a=(y-1,x-1) b=(y-1,x)
        # c=(y,x-1) d=(y,x), evaluated on the gradient plane (band+3, Wc+2)
        a = x[0 : band + 3, 0 : Wc + 2]
        b = x[0 : band + 3, 1 : Wc + 3]
        c = x[1 : band + 4, 0 : Wc + 2]
        d = x[1 : band + 4, 1 : Wc + 3]
        return a, b, c, d

    a1, b1, c1, d1 = stencil4(x1)
    a2, b2, c2, d2 = stencil4(x2)
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
    u = jnp.where(ok, sfxfy * sfyft - sfy2 * sfxft, 0.0) / inv
    v = jnp.where(ok, sfxft * sfxfy - sfx2 * sfyft, 0.0) / inv

    # Zero the global border ring (sum3x3_interior semantics) plus all
    # round-up rows/cols beyond (Hg, Wg).
    gr = row0 + lax.broadcasted_iota(jnp.int32, (band, Wc), 0)
    gc = col0 + lax.broadcasted_iota(jnp.int32, (band, Wc), 1)
    keep = (gr > 0) & (gr < Hg - 1) & (gc > 0) & (gc < Wg - 1)
    return jnp.where(keep, u, 0.0), jnp.where(keep, v, 0.0)


def _pick_band(H: int, W: int) -> int:
    """Row-band height: ~0.5 MiB per (band, Wp) f32 buffer, 8-row aligned
    (roughly 12 planes live at peak + 2 DMA scratches < 16 MiB VMEM)."""
    target_bytes = 1 << 19
    band = max(8, min(256, target_bytes // max(W * 4, 1) // 8 * 8))
    return band


@partial(jax.jit, static_argnames=("band",))
def _lk_pallas_batched(img1, img2, band: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, H, W = img1.shape
    nbands = -(-H // band)
    Hp = nbands * band
    Wc = _round_up(W, 128)  # output (padded) width
    Wp = Wc + 128  # input padded width; rightmost read col is Wc+3 < Wp

    def pad(x):
        # Build the DMA-aligned padded buffer with dynamic-update-slices
        # (XLA updates the fresh buffer in place: ~1 copy, vs 2 full
        # relayout copies for chained jnp.pad). REFLECT_101 halo top/left is
        # the only halo valid outputs read; the round-up slack stays zero
        # (finite, feeds only masked outputs).
        buf = jnp.zeros((x.shape[0], Hp + 8, Wp), x.dtype)
        buf = lax.dynamic_update_slice(buf, x, (0, HALO, HALO))
        # padded row 0 <=> global row -2 = row 2 = padded row 4; row 1 <=> 3
        buf = lax.dynamic_update_slice(buf, jnp.flip(buf[:, 3:5, :], 1), (0, 0, 0))
        buf = lax.dynamic_update_slice(buf, jnp.flip(buf[:, :, 3:5], 2), (0, 0, 0))
        return buf

    p1 = pad(img1)
    p2 = pad(img2)

    kernel = partial(_lk_band_kernel, H=H, W=W, Wc=Wc, band=band)
    u, v = pl.pallas_call(
        kernel,
        grid=(B, nbands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, band, Wc), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band, Wc), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hp, Wc), img1.dtype),
            jax.ShapeDtypeStruct((B, Hp, Wc), img1.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, band + 8, Wp), img1.dtype),
            pltpu.VMEM((2, band + 8, Wp), img1.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(p1, p2)
    return u[:, :H, :W], v[:, :H, :W]


def lucas_kanade_pallas(img1, img2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense LK via the fused band kernel.

    img1/img2: (..., H, W) float32 (f64 inputs are computed in f32 — the TPU
    production dtype; the jnp path is the f64 parity oracle). Leading axes
    are mapped via vmap.
    """
    if img1.shape != img2.shape:
        raise ValueError(f"shape mismatch {img1.shape} vs {img2.shape}")
    dtype = jnp.float32
    img1 = img1.astype(dtype)
    img2 = img2.astype(dtype)
    H, W = img1.shape[-2], img1.shape[-1]
    if H < 3 or W < 3:
        # degenerate level: every pixel is on the border ring => zero flow
        return jnp.zeros_like(img1), jnp.zeros_like(img2)
    band = _pick_band(H, W)
    lead = img1.shape[:-2]
    b1 = img1.reshape((-1, H, W))
    b2 = img2.reshape((-1, H, W))
    u, v = _lk_pallas_batched(b1, b2, band)
    return u.reshape(lead + (H, W)), v.reshape(lead + (H, W))
