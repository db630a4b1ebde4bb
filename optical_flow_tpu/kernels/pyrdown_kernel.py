"""Fused pyr_down Pallas kernel: both separable passes in one VMEM visit.

The XLA polyphase pyr_down (ops/pyramid.py, the parity oracle for
cv::pyrDown's 5-tap [1,4,6,4,1]/16 + 2x decimation, LKof.cpp:180-189 via
OpenCV) materializes the row-passed intermediate and its reflect paddings
in HBM between the two passes — measured ~63 us per 1080^2 image on v5e
against a ~13 us speed-of-light (read the input + write the quarter-size
output once). This kernel reads each input row-band into VMEM exactly
once and writes only the decimated output:

  * ROW pass: the polyphase form, bit-identical to ops/pyramid's
    (parity planes via a row deinterleave reshape — one of the reshape
    shapes Mosaic does lower; see scripts/tpu_interleave_poc.py).
  * COLUMN pass: one banded-matrix matmul on the otherwise-idle MXU with
    REFLECT_101 folded into the matrix (the `pyr_impl='mxu'` semantics:
    taps are exact binary fractions so HIGHEST-precision products are
    exact; only the accumulation order differs from the VPU form —
    f32-roundoff-level, pinned in tests). The lane-parity split that
    Mosaic cannot lower never appears.

Grid walks (batch, output row-bands); input bands are double-buffered
DMAs like the LK kernels.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K5 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=64)
def _col_decim_matrix(W: int, Wp: int, Wcop: int) -> np.ndarray:
    """(Wp, Wcop) column-pass operator: out[:, j] = sum_t K5[t] *
    in[:, reflect101(2j - 2 + t)] for j < ceil(W/2); zero rows for the
    lane-padding junk cols >= W and zero cols for j >= ceil(W/2)."""
    Wco = -(-W // 2)
    S = np.zeros((Wp, Wcop), np.float32)
    for j in range(Wco):
        for t, k in enumerate(_K5):
            m = 2 * j - 2 + t
            if m < 0:
                m = -m
            if m >= W:
                m = 2 * (W - 1) - m
            S[m, j] += np.float32(k)
    return S


def _pyrdown_band_kernel(in_hbm, S_ref, out_ref, slab, sems, *, Wp, band):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nbands = pl.num_programs(1)

    slot = lax.rem(i, jnp.int32(2))
    nslot = jnp.int32(1) - slot

    def dma(band_idx, buf_slot):
        r0 = 2 * band_idx * band
        return pltpu.make_async_copy(
            in_hbm.at[b, pl.ds(r0, 2 * band + 8), :],
            slab.at[buf_slot],
            sems.at[buf_slot],
        )

    @pl.when(i == 0)
    def _():
        dma(i, slot).start()

    @pl.when(i + 1 < nbands)
    def _():
        dma(i + 1, nslot).start()

    dma(i, slot).wait()
    x = slab[slot]  # (2*band + 8, Wp); slab row r = padded row 2*i*band + r

    # ROW pass (polyphase, bit-identical to ops/pyramid._row_pass_poly):
    # out_row[r] = sum_t K5[t] * slab[2r + t]. Parity planes via a row
    # deinterleave reshape (lowers on Mosaic; lane reshapes would not).
    eo = x.reshape(band + 4, 2, Wp)
    E = eo[:, 0, :]
    O = eo[:, 1, :]
    f32 = x.dtype
    k = [jnp.asarray(t, f32) for t in _K5]
    R = (
        k[0] * E[0:band]
        + k[1] * O[0:band]
        + k[2] * E[1 : band + 1]
        + k[3] * O[1 : band + 1]
        + k[4] * E[2 : band + 2]
    )

    # COLUMN pass: banded matmul with REFLECT_101 folded into S (MXU).
    out_ref[0] = jnp.dot(
        R, S_ref[...],
        precision=lax.Precision.HIGHEST,
        preferred_element_type=f32,
    )


def _pick_band(Hc: int, Wp: int) -> int:
    """Output-band height: slab is (2*band + 8, Wp) double-buffered; keep
    the pair of slabs near ~2.5 MiB and the band a multiple of 8 (the
    output block's sublane tiling; the slab height/start follow)."""
    target = 10 << 17  # ~1.25 MiB per slab
    band = max(8, min(256, target // max(Wp * 8, 1) // 8 * 8))
    return band


@partial(jax.jit, static_argnames=("band",))
def _pyrdown_pallas_batched(x, band: int):
    B, H, W = x.shape
    Hc = -(-H // 2)
    Wco = -(-W // 2)
    nbands = -(-Hc // band)
    Wp = _round_up(W, 128)
    Wcop = _round_up(Wco, 128)

    # Padded input: padded[p] = in[p - 2]; REFLECT_101 halos top (rows
    # in[2], in[1]) and bottom (in[H-2], in[H-3] — the reads for the last
    # kept output row under both even and odd H); round-up slack rows are
    # zero and feed only sliced-off outputs.
    Hp2 = 2 * nbands * band + 8
    buf = jnp.zeros((B, Hp2, Wp), x.dtype)
    buf = lax.dynamic_update_slice(buf, x, (0, 2, 0))
    buf = lax.dynamic_update_slice(buf, jnp.flip(buf[:, 3:5, :], 1), (0, 0, 0))
    if H >= 4:
        bot = jnp.flip(x[:, H - 3 : H - 1, :], 1)
        buf = lax.dynamic_update_slice(
            buf, bot.astype(x.dtype), (0, H + 2, 0)
        )

    S = jnp.asarray(_col_decim_matrix(W, Wp, Wcop))
    kernel = partial(_pyrdown_band_kernel, Wp=Wp, band=band)
    out = pl.pallas_call(
        kernel,
        grid=(B, nbands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            # constant block index: stays VMEM-resident across grid steps
            pl.BlockSpec((Wp, Wcop), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, band, Wcop), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, nbands * band, Wcop), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * band + 8, Wp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(buf, S)
    return out[:, :Hc, :Wco]


def pyr_down_pallas(x):
    """cv::pyrDown via the fused band kernel; (..., H, W) float32.

    Matches ops/pyramid.pyr_down(impl='mxu') semantics exactly (poly row
    pass + matmul column pass): within f32 roundoff of the bit-pinned
    'poly' path. Needs H >= 4 for the reflect halos; callers fall back to
    the XLA path below that.
    """
    H, W = x.shape[-2], x.shape[-1]
    if H < 4 or W < 2:
        raise ValueError(f"pyr_down_pallas needs H >= 4 (got {H}x{W})")
    dtype = jnp.float32
    lead = x.shape[:-2]
    b = x.astype(dtype).reshape((-1, H, W))
    Wp = _round_up(W, 128)
    out = _pyrdown_pallas_batched(b, _pick_band(-(-H // 2), Wp))
    return out.reshape(lead + out.shape[-2:])
