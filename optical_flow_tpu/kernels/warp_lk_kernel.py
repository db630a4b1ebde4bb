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

from optical_flow_tpu.kernels.lk_kernel import lk_solve_tail
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTER_TAB = 32.0  # cv2 remap 5-bit fixed-point fractions (ops/warp.py)


def _quant_half_flow(flow, cl, half, Cf):
    """Flow-space quantized half-displacement (ops/warp.quantize_disp
    semantics): clip to the clamp, halve (sign carried by `half`), clip
    to the tap range, round to the INTER_TAB grid. The one copy both
    fused kernels share."""
    h = jnp.clip(jnp.clip(flow, -cl, cl) * half, -Cf, Cf)
    return jnp.round(h * _INTER_TAB) / _INTER_TAB


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# The Mosaic compiler's ACTUAL scoped-VMEM allocation per band row,
# MEASURED on v5e (2026-08-19, scripts/tpu_vmem_calibration.py) by forcing
# over-large bands at every padded-width class and reading the size out of
# the OOM diagnostic. It is 1.4-2.8x the analytic buffer estimate with a
# width-dependent shape no multiplicative factor captures; the old factor
# model chose pyrup bands whose FRESH compile OOMs the 16 MiB scoped
# limit — masked for two rounds by the persistent compile cache serving
# executables built under older tooling. Keyed by Wc = round_up(W, 128)
# (the only width the kernel's buffers see); values are bytes/row at
# LARGE rows — per-row cost grows mildly with rows, so these upper-bound
# every smaller candidate band. Re-run the calibration script after a
# jax/libtpu upgrade and refresh.
_VMEM_PER_ROW = {
    # Wc=768 is NOT the raw probe value (112900): per-row cost is band-
    # dependent non-monotonically and the band the probe happened to hit
    # (152) is anomalously cheap at this width — band 104 measured 144.4
    # KB/row (18.05M total at W=720, 19.07M at W=768). Entry raised above
    # the worst measured band at this width.
    "pyrup": {
        256: 70612, 384: 94341, 512: 126742, 640: 135683, 768: 160000,
        896: 179706, 1024: 199229, 1152: 222123, 1280: 244499,
        1408: 262908, 1536: 280017, 1664: 291110, 1792: 320471,
        1920: 339767, 2048: 352001,
    },
    "plain": {
        256: 48667, 384: 61770, 512: 79981, 640: 91750, 768: 106883,
        896: 121756, 1024: 136786, 1152: 151209, 1280: 165937,
        1408: 181170, 1536: 194887, 1664: 210501, 1792: 225069,
        1920: 238853, 2048: 253515,
    },
}
# Budget under the 16 MiB scoped-vmem limit. The table upper-bounds true
# usage for any band SMALLER than its probe band (total allocation is
# convex in rows: per-row cost grows with rows), so candidates certified
# <= 15.5 MiB by the table sit well below it in practice (e.g. 1080^2
# pyrup band 48: bound 15.25M, measured 14.2M).
_VMEM_BUDGET = 31 << 19


def _vmem_per_row(Wc: int, pyrup: bool) -> float:
    tab = _VMEM_PER_ROW["pyrup" if pyrup else "plain"]
    if Wc in tab:
        return tab[Wc]
    if Wc < 256:
        return tab[256]  # conservative: narrower buffers cost less
    # beyond the table: extrapolate from the top two knots, +10% margin
    return (tab[2048] + (tab[2048] - tab[1920]) / 128 * (Wc - 2048)) * 1.1


def warp_lk_tiling(
    H: int, W: int, max_disp: int, *, pyrup: bool = False
) -> Optional[Tuple[int, int]]:
    """(Hp, band) for the fused kernel, or None if (H, W) doesn't fit.

    Rows are padded to Hp >= round_up(H, 8) (a multiple of 8) and the band
    must divide Hp (so every REFLECT_101 row fix sits at a static in-band
    offset) and be a multiple of 8 (f32 sublane tile). Hp is allowed a few
    percent of SLACK rows beyond the minimum: pad rows are zeros, their
    outputs are discarded, and a slightly larger Hp often admits a much
    larger dividing band — fewer bands means fewer fixed per-band costs
    (DMA issues, transposes, halo re-reads). Among candidates whose
    MEASURED VMEM cost (_VMEM_PER_ROW) fits the budget, minimize the total
    rows processed, nbands * (band + 2R); tie-break toward the smaller Hp.

    `pyrup` selects the calibration for pyrup_warp_lk_pallas, whose
    upsample temporaries roughly double the compiler's actual scoped
    allocation per band row vs the plain warp_lk_pallas variant.
    """
    if H < 8 or W < 4:
        return None
    H8 = _round_up(H, 8)
    R = _round_up(max_disp + 2, 4)
    Wc = _round_up(W, 128)
    Wp = Wc + _round_up(2 * R, 128)
    per_row = _vmem_per_row(Wc, pyrup)
    best = None  # (cost, Hp, band)
    slack = max(32, H8 // 12)
    for Hp in range(H8, H8 + slack + 1, 8):
        for band in range(8, Hp + 1, 8):
            if Hp % band:
                continue
            if band > 160 and Wp > 512:
                # empirical Mosaic limit: a 200-row band at Wp=640 crashes
                # the AOT compiler with no diagnostic (exit 1) even though
                # the VMEM estimate fits, while tall bands at Wp <= 512
                # (200@384, 272@512) compile and run.
                continue
            rows = band + 2 * R
            if rows * per_row > _VMEM_BUDGET:
                continue
            cost = (Hp // band) * rows
            if best is None or (cost, Hp) < (best[0], best[1]):
                best = (cost, Hp, band)
    if best is not None:
        return best[1], best[2]
    # nothing fits the budget: smallest divisor of the minimal Hp, let
    # Mosaic try (tiny/degenerate shapes)
    for band in range(8, H8 + 1, 8):
        if H8 % band == 0:
            return H8, band
    return None


def warp_lk_band(
    H: int, W: int, max_disp: int, *, pyrup: bool = False
) -> Optional[int]:
    """Band height for the fused kernel, or None if (H, W) doesn't fit.
    Gate form of warp_lk_tiling (see there for the selection rule)."""
    t = warp_lk_tiling(H, W, max_disp, pyrup=pyrup)
    return None if t is None else t[1]


def _warp_lk_kernel(
    org_ref, i1_hbm, i2_hbm, u_hbm, v_hbm, du_ref, dv_ref, bufs, sems,
    *, H, W, Hg, Wg, Wc, band, C, clamp, sign,
):
    # org_ref (scalar prefetch, SMEM): (row, col) of this image's top-left
    # pixel in the GLOBAL frame — (0, 0) when the image IS the full frame;
    # a mesh tile's offset when running per-shard under shard_map. The
    # interior mask and the REFLECT_101 fixes predicate on it, so a tile
    # computes bit-identically to the corresponding rows/cols of the
    # full-frame kernel (Hg/Wg are the GLOBAL dims for the mask).
    #
    # input halo: warped ext (2) + shift tap reach (C), rounded up so the
    # DMA slab height band + 2R stays 8-aligned (Mosaic memref_slice tiling)
    R = _round_up(C + 2, 4)
    b = pl.program_id(0)
    i = pl.program_id(1)
    nbands = pl.num_programs(1)
    row0 = org_ref[0] + i * band
    col0 = org_ref[1]

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
    qx = _quant_half_flow(uu, cl, half, Cf)
    qy = _quant_half_flow(vv, cl, half, Cf)
    Wt = Wc + 4
    qx_t = qx[:, R - 2 : R - 2 + Wt]
    qy_w = qy[R - 2 : R - 2 + band + 4, R - 2 : R - 2 + Wt]
    du, dv = _warp_lk_core(
        x1, x2, qx_t, qy_w, row0, col0,
        W=W, Hg=Hg, Wg=Wg, Wc=Wc, band=band, C=C, R=R,
    )
    du_ref[0] = du
    dv_ref[0] = dv


def _warp_lk_core(x1, x2, qx_t, qy_w, row0, col0, *, W, Hg, Wg, Wc, band, C, R):
    """Shared warp+LK band computation.

    x1/x2: image slabs (band + 2R, >= Wc + 2R) with the image at col
    offset R (rows cover image-local [row0g-R, row0g+band+R)).
    qx_t: quantized x-displacement on the tmp grid, (band + 2R, Wt) for
    tmp cols [-2, Wc+2); qy_w: y-displacement on the warped grid,
    (band + 4, Wt). row0/col0: GLOBAL coordinates of this band's first
    output pixel (Hg/Wg: global frame dims; W: this image's width —
    equal to Wg unless running on a mesh tile). Returns (du, dv)
    (band, Wc), interior-masked in GLOBAL coordinates.
    """
    f32 = x1.dtype
    one = jnp.asarray(1.0, f32)
    Wt = Wc + 4  # tmp/warped plane width: global cols [-2, Wc+2)
    Ht = band + 2 * R  # tmp rows: the full slab, global [row0-R, row0+band+R)

    t1 = jnp.zeros((Ht, Wt), f32)
    t2 = jnp.zeros((Ht, Wt), f32)
    for k in range(-C, C + 1):
        w = jnp.maximum(0.0, one - jnp.abs(qx_t - k))
        t1 = t1 + w * x1[:, R - 2 + k : R - 2 + k + Wt]
        t2 = t2 + w * x2[:, R - 2 - k : R - 2 - k + Wt]

    # y-pass: warped plane rows = global [row0-2, row0+band+2); warped row
    # a (slab-local a+R) reads tmp rows a+R+k -> slice offset R-2+k.
    w1 = jnp.zeros((band + 4, Wt), f32)
    w2 = jnp.zeros((band + 4, Wt), f32)
    for k in range(-C, C + 1):
        w = jnp.maximum(0.0, one - jnp.abs(qy_w - k))
        w1 = w1 + w * t1[R - 2 + k : R - 2 + k + band + 4, :]
        w2 = w2 + w * t2[R - 2 - k : R - 2 - k + band + 4, :]

    # REFLECT_101 extension of the warped planes — exactly what the
    # unfused LK reads from jnp.pad(mode='reflect') around the warped
    # image, applied ONLY at GLOBAL frame borders (predicated on the
    # origin: on an interior mesh tile the halo already carries the
    # neighbour's real warped values and must pass through untouched).
    # Columns are at static positions; the top row fix only matters when
    # the band starts at global row 0 (a kept output row gr reads warped
    # rows gr-2..gr+1, so only gr == 1 reads row -1). No bottom fix: kept
    # rows stop at gr == Hg-2, whose read set ends at row Hg-1 — pad/junk
    # rows never feed output.
    at_left = col0 == 0
    at_right = col0 + W == Wg
    at_top = row0 == 0

    def reflect(w):
        # (Mosaic has no `rev` lowering; a 2-wide flip is two swapped slices.)
        wl = jnp.concatenate([w[:, 4:5], w[:, 3:4]], 1)  # cols -2,-1 := 2,1
        wr = jnp.concatenate(
            [w[:, W : W + 1], w[:, W - 1 : W]], 1
        )  # cols W,W+1 := W-2,W-3
        parts = [jnp.where(at_left, wl, w[:, 0:2]), w[:, 2 : W + 2],
                 jnp.where(at_right, wr, w[:, W + 2 : W + 4])]
        if W + 4 < w.shape[1]:
            # junk tail beyond the 128-padded width; when W is already a
            # multiple of 128 this slice would be ZERO-width, which Mosaic
            # rejects ("vector types must have positive constant sizes")
            parts.append(w[:, W + 4 :])
        w = jnp.concatenate(parts, 1)
        top = jnp.concatenate([w[4:5], w[3:4], w[2:]], 0)
        return jnp.where(at_top, top, w)

    w1 = reflect(w1)
    w2 = reflect(w2)

    # LK on the warped planes: the ONE shared tail (lk_kernel.py)
    return lk_solve_tail(w1, w2, band=band, Wc=Wc, row0=row0, col0=col0,
                         Hg=Hg, Wg=Wg)


@partial(
    jax.jit,
    static_argnames=("band", "C", "clamp", "sign", "halo", "Hg", "Wg", "Hp"),
)
def _warp_lk_batched(
    img1, img2, u, v, origin, band: int, C: int, clamp: float, sign: float,
    halo: int = 0, Hg: Optional[int] = None, Wg: Optional[int] = None,
    Hp: Optional[int] = None,
):
    """img1/img2/u/v: (B, H + 2*halo, W + 2*halo) when halo > 0 — a mesh
    tile extended with its exchanged halo (real neighbour data, or zeros
    beyond the global frame, exactly what the full-frame kernel's zero pad
    holds there). origin: (2,) int32 global (row, col) of the tile's first
    pixel; Hg/Wg: global frame dims for the interior mask / reflect
    predicates. halo=0, origin=(0,0): the original full-frame behavior."""
    B = img1.shape[0]
    H, W = img1.shape[-2] - 2 * halo, img1.shape[-1] - 2 * halo
    Hg = H if Hg is None else Hg
    Wg = W if Wg is None else Wg
    R = _round_up(C + 2, 4)  # must match _warp_lk_kernel
    if halo > R:
        raise ValueError(f"halo {halo} exceeds the kernel's slab margin {R}")
    # band divides Hp (warp_lk_tiling, possibly with slack rows beyond
    # round_up(H, 8)); rows H..Hp-1 are zero-padded junk and dropped
    Hp = _round_up(H, 8) if Hp is None else Hp
    assert Hp % band == 0 and Hp >= H
    nbands = Hp // band
    Wc = _round_up(W, 128)
    Wp = Wc + _round_up(2 * R, 128)  # cols [-R, Wc+R) live at offset R

    def pad(x):
        # zero borders: the warp's BORDER_CONSTANT taps, the out-of-range
        # flow rows, and the Hp-H pad rows all want zeros (junk ext rows of
        # the warped plane never reach a kept output — see module docstring).
        # With a halo the extended tile lands at offset R-halo, so the
        # image proper still sits at (R, R) and the halo occupies part of
        # the zero margin (R >= C+2 >= halo by construction).
        buf = jnp.zeros((x.shape[0], Hp + 2 * R, Wp), x.dtype)
        return lax.dynamic_update_slice(buf, x, (0, R - halo, R - halo))

    p1, p2, pu, pv = pad(img1), pad(img2), pad(u), pad(v)

    kernel = partial(
        _warp_lk_kernel, H=H, W=W, Hg=Hg, Wg=Wg, Wc=Wc, band=band, C=C,
        clamp=clamp, sign=sign,
    )
    du, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nbands),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=[
                # index maps under scalar prefetch receive the scalar ref too
                pl.BlockSpec(
                    (1, band, Wc), lambda b, i, org: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, band, Wc), lambda b, i, org: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((4, 2, band + 2 * R, Wp), img1.dtype),
                pltpu.SemaphoreType.DMA((4, 2)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hp, Wc), img1.dtype),
            jax.ShapeDtypeStruct((B, Hp, Wc), img1.dtype),
        ],
    )(jnp.asarray(origin, jnp.int32), p1, p2, pu, pv)
    return du[:, :H, :W], dv[:, :H, :W]


_ORIGIN0 = (0, 0)


def warp_lk_pallas(
    img1, img2, u, v, *, max_disp: int, clamp: float, negate: bool = True,
    halo: int = 0, origin=None, global_hw: Optional[Tuple[int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused clip->negate->symmetric shift_sep warp->LK solve.

    img1/img2/u/v: (..., H, W); returns (du, dv) like lucas_kanade on the
    warped frames. Raises ValueError when the shape doesn't fit the band
    constraints — use warp_lk_band() to decide, or catch and fall back.

    Tile mode (parallel/sharded_flow.py): pass inputs extended by `halo`
    exchanged pixels per side, the tile's global `origin` (row, col) and
    the `global_hw` frame dims — outputs stay (..., H, W) and match the
    corresponding region of the full-frame kernel bit-for-bit.
    """
    H, W = img1.shape[-2] - 2 * halo, img1.shape[-1] - 2 * halo
    tiling = warp_lk_tiling(H, W, max_disp)
    if tiling is None:
        raise ValueError(f"shape {img1.shape} unsupported by the fused kernel")
    Hp, band = tiling
    dtype = jnp.float32
    lead = img1.shape[:-2]
    He, We = img1.shape[-2], img1.shape[-1]
    args = [a.astype(dtype).reshape((-1, He, We)) for a in (img1, img2, u, v)]
    Hg, Wg = global_hw if global_hw is not None else (H, W)
    origin = _ORIGIN0 if origin is None else origin
    origin = jnp.stack(
        [jnp.asarray(origin[0], jnp.int32), jnp.asarray(origin[1], jnp.int32)]
    )
    du, dv = _warp_lk_batched(
        *args, origin, band=band, C=int(max_disp), clamp=float(clamp),
        sign=-1.0 if negate else 1.0, halo=halo, Hg=Hg, Wg=Wg, Hp=Hp,
    )
    return du.reshape(lead + (H, W)), dv.reshape(lead + (H, W))


# --------------------------------------------- fused inter-level step
#
# The corrected pyramid's ENTIRE inter-level step in one kernel:
#     upu, upv = 2 * pyr_up(u_coarse), 2 * pyr_up(v_coarse)
#     wu, wv   = -clip(upu, +-clamp), -clip(upv, +-clamp)
#     w1, w2   = symmetric shift_sep warp of (img1, img2) by (wu, wv)
#     du, dv   = lucas_kanade(w1, w2)
#     return (du + upu, dv + upv)
# The 5-tap pyrUp runs in VMEM per band (row interleave: stack+reshape;
# column interleave: transpose sandwich — Mosaic lowers both; the
# lane-interleave reshape it rejects is avoided). Same tap order as
# ops/pyramid._pyr_up_stack, so results are bit-identical to the unfused
# XLA composition (verified on hardware) while eliminating the fine-flow
# HBM round-trip and the XLA-side interleave relayout copies (~0.15 ms of
# the 1080^2 frame).

_K5UP = (0.125, 0.5, 0.75, 0.5, 0.125)  # 2 * [1,4,6,4,1]/16 (per-axis pyrUp)


def _pyrup_warp_lk_kernel(
    org_ref, i1_hbm, i2_hbm, uc_hbm, vc_hbm, u_ref, v_ref,
    ibufs, isems, fbufs, fsems,
    *, H, W, Hg, Wg, Wc, band, C, clamp, Lc, Wpc,
):
    # org_ref (scalar prefetch): global (row, col) of this image's origin —
    # (0, 0) full-frame; a mesh tile's offset under shard_map (the
    # interior mask, the in-image flow gate and the REFLECT_101 fixes all
    # predicate on global coordinates; see _warp_lk_kernel's note)
    R = _round_up(C + 2, 4)
    nc = band // 2 + R  # coarse rows covering the fine slab
    mc = Wc // 2 + 2  # even-parity output cols of the tmp grid [-2, Wc+2)
    b = pl.program_id(0)
    i = pl.program_id(1)
    nbands = pl.num_programs(1)
    row0 = org_ref[0] + i * band
    col0 = org_ref[1]

    slot = lax.rem(i, jnp.int32(2))
    nslot = jnp.int32(1) - slot
    imgs = (i1_hbm, i2_hbm)
    flows = (uc_hbm, vc_hbm)

    def dma_img(band_idx, buf_slot, k):
        r0 = band_idx * band
        return pltpu.make_async_copy(
            imgs[k].at[b, pl.ds(r0, band + 2 * R), :],
            ibufs.at[k, buf_slot],
            isems.at[k, buf_slot],
        )

    half_band = band // 2  # always a multiple of 4 (band is a multiple of 8)
    off_stride = half_band % 8  # so the slab offset alternates in {0, 4}

    def dma_flow(band_idx, buf_slot, k):
        # coarse buffer holds coarse row y at y + R//2 + 1, so the slab
        # [yc0-1, yc0+nc+1) starts at band_idx * half_band — rounded DOWN
        # to a multiple of 8 (Mosaic requires provably tile-aligned DMA
        # starts when it places the small coarse plane in VMEM); the
        # remainder (0 or off_stride by band parity) is re-sliced inside.
        rc0 = (band_idx * half_band // 8) * 8
        return pltpu.make_async_copy(
            flows[k].at[b, pl.ds(rc0, Lc), :],
            fbufs.at[k, buf_slot],
            fsems.at[k, buf_slot],
        )

    @pl.when(i == 0)
    def _():
        for k in range(2):
            dma_img(i, slot, k).start()
            dma_flow(i, slot, k).start()

    @pl.when(i + 1 < nbands)
    def _():
        for k in range(2):
            dma_img(i + 1, nslot, k).start()
            dma_flow(i + 1, nslot, k).start()

    for k in range(2):
        dma_img(i, slot, k).wait()
        dma_flow(i, slot, k).wait()

    x1 = ibufs[0, slot]
    x2 = ibufs[1, slot]
    f32 = x1.dtype

    Wt = Wc + 4
    K = _K5UP
    fr = lax.broadcasted_iota(jnp.int32, (band + 2 * R, Wt), 0) + (row0 - R)
    fc = lax.broadcasted_iota(jnp.int32, (band + 2 * R, Wt), 1) - 2 + col0
    inimg = (fr >= 0) & (fr < Hg) & (fc >= 0) & (fc < Wg)

    def upsample2(cx, cy):
        # COLUMN pass first at coarse height (ops/pyramid.py
        # _pyr_up_stack_cols_first — the jnp corrected path mirrors this
        # order, keeping fused == unfused float-for-float). The lane
        # interleave Mosaic can't lower becomes a sublane (row) interleave
        # in TRANSPOSED space — one transpose in, one out, at the COARSE
        # height (half the relayout volume of transposing after the row
        # pass; see scripts/tpu_interleave_poc.py). BOTH flow components
        # ride ONE transpose sandwich (concatenated along the coarse-row
        # axis — elementwise taps and the sublane interleave are
        # per-column, so values are bit-identical to two separate
        # sandwiches while Mosaic pays the small-shape transpose overhead
        # half as often: 442 -> 412 us/call at 1080^2, v5e device spans).
        # Buffer col m = coarse col m-2; fine col 2n-2 <- coarse n-1..n+1.
        c2 = jnp.concatenate([cx, cy], axis=0)  # (2(nc+2), Wpc)
        ct = c2.T  # (Wpc, 2(nc+2))
        evc = K[0] * ct[0:mc, :] + K[2] * ct[1 : mc + 1, :] + K[4] * ct[2 : mc + 2, :]
        odc = K[1] * ct[1 : mc + 1, :] + K[3] * ct[2 : mc + 2, :]
        cols2 = (
            jnp.stack([evc, odc], axis=-2).reshape(2 * mc, 2 * (nc + 2)).T
        )  # (2(nc+2), Wt)

        def rows(cols2):
            # rows: even fine row 2y <- coarse y-1..y+1, odd <- y..y+1
            # (slab row j = coarse yc0-1+j); the row interleave lowers
            # natively.
            ev = K[0] * cols2[0:nc, :] + K[2] * cols2[1 : nc + 1, :] + K[4] * cols2[2 : nc + 2, :]
            od = K[1] * cols2[1 : nc + 1, :] + K[3] * cols2[2 : nc + 2, :]
            up = jnp.stack([ev, od], axis=-2).reshape(2 * nc, 2 * mc)
            # corrected-mode doubling AFTER the col pass, like the XLA
            # `2.0 * pyr_up(u)`; flow outside the image is exactly 0
            # (matches the unfused path's zero padding — the asym pyrUp
            # border rows must not leak past the image edge)
            return jnp.where(inimg, 2.0 * up, 0.0)

        return rows(cols2[: nc + 2]), rows(cols2[nc + 2 :])

    def flow_slab(k):
        cfull = fbufs[k, slot]
        if off_stride == 0:
            return cfull[0 : nc + 2]
        # both candidate offsets are STATIC slices; pick by band parity
        return jnp.where(
            lax.rem(i * half_band, jnp.int32(8)) == 0,
            cfull[0 : nc + 2],
            cfull[off_stride : off_stride + nc + 2],
        )

    upx, upy = upsample2(flow_slab(0), flow_slab(1))

    half = jnp.asarray(-0.5, f32)  # corrected mode: convergent (negated) warp
    cl = jnp.asarray(clamp, f32)
    Cf = jnp.asarray(float(C), f32)

    qx_t = _quant_half_flow(upx, cl, half, Cf)
    qy_w = _quant_half_flow(upy, cl, half, Cf)[R - 2 : R - 2 + band + 4, :]
    du, dv = _warp_lk_core(
        x1, x2, qx_t, qy_w, row0, col0,
        W=W, Hg=Hg, Wg=Wg, Wc=Wc, band=band, C=C, R=R,
    )
    u_ref[0] = du + upx[R : R + band, 2 : 2 + Wc]
    v_ref[0] = dv + upy[R : R + band, 2 : 2 + Wc]


@partial(
    jax.jit,
    static_argnames=("band", "C", "clamp", "halo", "flow_halo", "Hg", "Wg", "Hp"),
)
def _pyrup_warp_lk_batched(
    img1, img2, uc, vc, origin, band: int, C: int, clamp: float,
    halo: int = 0, flow_halo: bool = False,
    Hg: Optional[int] = None, Wg: Optional[int] = None,
    Hp: Optional[int] = None,
):
    """Tile mode (halo > 0 / flow_halo): img1/img2 arrive extended by
    `halo` exchanged pixels per side; uc/vc arrive extended by (Ocr rows,
    2 cols) with the pyrUp asymmetric border pre-applied at GLOBAL edges
    (parallel/halo.py border='pyrup') and real neighbour data elsewhere —
    the tile's coarse buffer is then laid out exactly like the full-frame
    padflow, so the kernel body is untouched."""
    B = img1.shape[0]
    H, W = img1.shape[-2] - 2 * halo, img1.shape[-1] - 2 * halo
    Hg = H if Hg is None else Hg
    Wg = W if Wg is None else Wg
    R = _round_up(C + 2, 4)
    if halo > R:
        raise ValueError(f"halo {halo} exceeds the kernel's slab margin {R}")
    Ocr = R // 2 + 1
    Hc = uc.shape[-2] - (2 * Ocr if flow_halo else 0)
    Wcc = uc.shape[-1] - (4 if flow_halo else 0)
    # band divides Hp (warp_lk_tiling, possibly with slack rows beyond
    # round_up(H, 8)); rows H..Hp-1 are zero-padded junk and dropped
    Hp = _round_up(H, 8) if Hp is None else Hp
    assert Hp % band == 0 and Hp >= H
    nbands = Hp // band
    Wc = _round_up(W, 128)
    Wp = Wc + _round_up(2 * R, 128)
    off_stride = (band // 2) % 8
    Lc = _round_up(band // 2 + R + 2 + off_stride, 8)
    Wpc = _round_up(max(Wcc + 4, Wc // 2 + 4), 128)
    Hcb = _round_up(max((Hp - band) // 2 + Lc, Hc + Ocr + 1, Hc + 2 * Ocr), 8)

    def padimg(x):
        buf = jnp.zeros((x.shape[0], Hp + 2 * R, Wp), x.dtype)
        return lax.dynamic_update_slice(buf, x, (0, R - halo, R - halo))

    def padflow(x):
        if flow_halo:
            # pre-extended tile: rows [-Ocr, Hc+Ocr) x cols [-2, Wcc+2)
            # land with the coarse image at (Ocr, 2) — identical layout
            buf = jnp.zeros((B, Hcb, Wpc), x.dtype)
            return lax.dynamic_update_slice(buf, x, (0, 0, 0))
        # coarse plane with cv::pyrUp's asymmetric border baked in
        # (ops/pyramid._pad_pyrup: row/col -1 reflect to 1, n to n-1),
        # image at (Ocr, 2); everything else zero
        buf = jnp.zeros((B, Hcb, Wpc), x.dtype)
        buf = lax.dynamic_update_slice(buf, x, (0, Ocr, 2))
        top = x[:, 1:2, :] if Hc > 1 else x[:, 0:1, :]
        buf = lax.dynamic_update_slice(buf, top, (0, Ocr - 1, 2))
        buf = lax.dynamic_update_slice(buf, x[:, Hc - 1 : Hc, :], (0, Ocr + Hc, 2))
        strip = lax.dynamic_slice(buf, (0, Ocr - 1, 2), (B, Hc + 2, Wcc))
        left = strip[:, :, 1:2] if Wcc > 1 else strip[:, :, 0:1]
        buf = lax.dynamic_update_slice(buf, left, (0, Ocr - 1, 1))
        buf = lax.dynamic_update_slice(
            buf, strip[:, :, Wcc - 1 : Wcc], (0, Ocr - 1, 2 + Wcc)
        )
        return buf

    p1, p2 = padimg(img1), padimg(img2)
    pu, pv = padflow(uc), padflow(vc)

    kernel = partial(
        _pyrup_warp_lk_kernel,
        H=H, W=W, Hg=Hg, Wg=Wg, Wc=Wc, band=band, C=C, clamp=clamp,
        Lc=Lc, Wpc=Wpc,
    )
    u, v = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nbands),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=[
                pl.BlockSpec(
                    (1, band, Wc), lambda b, i, org: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, band, Wc), lambda b, i, org: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 2, band + 2 * R, Wp), img1.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.VMEM((2, 2, Lc, Wpc), img1.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hp, Wc), img1.dtype),
            jax.ShapeDtypeStruct((B, Hp, Wc), img1.dtype),
        ],
    )(jnp.asarray(origin, jnp.int32), p1, p2, pu, pv)
    return u[:, :H, :W], v[:, :H, :W]


def pyrup_coarse_halo(max_disp: int) -> int:
    """Row halo the tile-mode coarse flow must carry (cols always 2):
    the kernel's coarse buffer places the image at row Ocr = R//2 + 1."""
    return _round_up(max_disp + 2, 4) // 2 + 1


def pyrup_warp_lk_pallas(
    img1, img2, u_coarse, v_coarse, *, max_disp: int, clamp: float,
    halo: int = 0, origin=None, global_hw: Optional[Tuple[int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused corrected-mode inter-level step (see module note above).

    img1/img2: level-i frames (..., H, W) with H, W even; u_coarse/
    v_coarse: level-(i+1) flow (..., H/2, W/2). Returns the ACCUMULATED
    level-i flow (du + 2*pyr_up(u_coarse), dv + 2*pyr_up(v_coarse)).
    Raises ValueError when the shape doesn't fit the band constraints —
    use warp_lk_band() to decide, or catch and fall back.

    Tile mode (parallel/sharded_warp_lk.py): images extended by `halo`
    exchanged pixels per side; u_coarse/v_coarse extended by
    (pyrup_coarse_halo(max_disp) rows, 2 cols) with border='pyrup';
    `origin` is the tile's global (row, col); `global_hw` the frame dims.
    Tile H must additionally be a multiple of 8 (no pad rows, so the
    coarse buffer geometry matches the full-frame kernel's exactly).
    """
    H, W = img1.shape[-2] - 2 * halo, img1.shape[-1] - 2 * halo
    tiling = warp_lk_tiling(H, W, max_disp, pyrup=True)
    band = None if tiling is None else tiling[1]
    if band is None or H % 2 or W % 2 or (halo and H % 8):
        raise ValueError(f"shape {img1.shape} unsupported by the fused kernel")
    Ocr = pyrup_coarse_halo(max_disp) if halo else 0
    ch, cw = (2 * Ocr, 4) if halo else (0, 0)
    if (u_coarse.shape[-2] - ch) * 2 != H or (u_coarse.shape[-1] - cw) * 2 != W:
        raise ValueError(
            f"coarse flow {u_coarse.shape} is not the ceil-half of {img1.shape}"
        )
    dtype = jnp.float32
    lead = img1.shape[:-2]
    He, We = img1.shape[-2], img1.shape[-1]
    Hce, Wce = u_coarse.shape[-2], u_coarse.shape[-1]
    a = [x.astype(dtype).reshape((-1, He, We)) for x in (img1, img2)]
    f = [x.astype(dtype).reshape((-1, Hce, Wce)) for x in (u_coarse, v_coarse)]
    Hg, Wg = global_hw if global_hw is not None else (H, W)
    origin = _ORIGIN0 if origin is None else origin
    origin = jnp.stack(
        [jnp.asarray(origin[0], jnp.int32), jnp.asarray(origin[1], jnp.int32)]
    )
    u, v = _pyrup_warp_lk_batched(
        a[0], a[1], f[0], f[1], origin, band=band, C=int(max_disp),
        clamp=float(clamp), halo=halo, flow_halo=bool(halo), Hg=Hg, Wg=Wg,
        Hp=tiling[0],
    )
    return u.reshape(lead + (H, W)), v.reshape(lead + (H, W))
