"""Fused inter-level kernel (pyrup_warp_lk_pallas) vs the unfused
composition: 2*pyr_up -> clip -> negate -> shift_sep warp -> LK -> add.

On CPU the kernel runs in Mosaic interpret mode (~1 ulp contraction
differences); on a real TPU the verify protocol additionally pins it
bit-identical to the jnp path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optical_flow_tpu.flow.lk import lucas_kanade_jnp
from optical_flow_tpu.kernels.warp_lk_kernel import pyrup_warp_lk_pallas
from optical_flow_tpu.ops.pyramid import pyr_up_cols_first
from optical_flow_tpu.ops.warp import symmetric_warp

on_tpu = jax.default_backend() == "tpu"

CLAMP = 8.0
C = 4  # ceil(CLAMP/2), the shift_sep production operating point


def _unfused(img1, img2, uc, vc):
    img1, img2, uc, vc = (a.astype(jnp.float32) for a in (img1, img2, uc, vc))
    upu = 2.0 * pyr_up_cols_first(uc)
    upv = 2.0 * pyr_up_cols_first(vc)
    wu = -jnp.clip(upu, -CLAMP, CLAMP)
    wv = -jnp.clip(upv, -CLAMP, CLAMP)
    w1, w2 = symmetric_warp(
        img1, img2, wu, wv, quantize=True, impl="shift_sep", max_disp=C
    )
    du, dv = lucas_kanade_jnp(w1, w2)
    return du + upu, dv + upv


def _fused(img1, img2, uc, vc):
    if on_tpu:
        return pyrup_warp_lk_pallas(img1, img2, uc, vc, max_disp=C, clamp=CLAMP)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return pyrup_warp_lk_pallas(img1, img2, uc, vc, max_disp=C, clamp=CLAMP)


def _compare(shape, scale=2.0, seed=0, atol=3e-4):
    H, W = shape[-2:]
    Hc, Wc = H // 2, W // 2
    rng = np.random.RandomState(seed)
    img1 = jnp.asarray(rng.rand(*shape).astype(np.float32))
    img2 = jnp.asarray(rng.rand(*shape).astype(np.float32))
    cshape = shape[:-2] + (Hc, Wc)
    uc = jnp.asarray((rng.randn(*cshape) * scale).astype(np.float32))
    vc = jnp.asarray((rng.randn(*cshape) * scale).astype(np.float32))
    u0, v0 = _unfused(img1, img2, uc, vc)
    try:
        u1, v1 = _fused(img1, img2, uc, vc)
    except NotImplementedError as e:
        pytest.skip(f"pallas interpret unsupported here: {e}")
    # the accumulated flow is dominated by upu (exact); the du part can
    # flip on near-singular pixels under interpret-mode rounding — compare
    # at a quantile, not max
    for a, b in ((u0, u1), (v0, v1)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert np.median(d) < atol, np.median(d)
        assert np.quantile(d, 0.95) < 0.05, np.quantile(d, 0.95)


@pytest.mark.parametrize("shape", [(64, 96), (48, 40), (2, 32, 130), (52, 38), (64, 128)])
def test_fused_level_step_matches_unfused(shape):
    _compare(shape)


def test_multiband_and_large_flow():
    # H=1024, W=40 -> band 512 -> 2 bands; flow far beyond the clamp
    _compare((1024, 40), scale=12.0, seed=3)


def test_zero_coarse_flow_reduces_to_plain_lk():
    rng = np.random.RandomState(5)
    img1 = jnp.asarray(rng.rand(64, 72).astype(np.float32))
    img2 = jnp.asarray(rng.rand(64, 72).astype(np.float32))
    z = jnp.zeros((32, 36), jnp.float32)
    u0, v0 = lucas_kanade_jnp(img1, img2)
    try:
        u1, v1 = _fused(img1, img2, z, z)
    except NotImplementedError as e:
        pytest.skip(f"pallas interpret unsupported here: {e}")
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=2e-5)


def test_shape_validation():
    z = jnp.zeros((64, 64))
    with pytest.raises(ValueError):
        pyrup_warp_lk_pallas(z, z, jnp.zeros((16, 32)), jnp.zeros((16, 32)),
                             max_disp=C, clamp=CLAMP)
    with pytest.raises(ValueError):
        pyrup_warp_lk_pallas(
            jnp.zeros((4, 64)), jnp.zeros((4, 64)), jnp.zeros((2, 32)),
            jnp.zeros((2, 32)), max_disp=C, clamp=CLAMP,
        )


def test_pyrup_tile_mode_matches_full_frame():
    """Tile mode of the fused inter-level kernel: halo-extended image
    tiles + pyrUp-border-extended coarse-flow tiles + global origin must
    reproduce the corresponding region of the full-frame kernel BIT
    identically (the property parallel/sharded_warp_lk.py's tiled
    level_step rests on; the shard_map feed is pinned separately in
    test_parallel.py)."""
    from jax.experimental.pallas import tpu as pltpu

    from optical_flow_tpu.kernels.warp_lk_kernel import pyrup_coarse_halo

    rng = np.random.RandomState(5)
    H, W = 32, 256
    th, tw = 16, 128  # 2x2 tile grid; th % 8 == 0 (tile-mode requirement)
    halo = C + 2
    ocr = pyrup_coarse_halo(C)
    Hc, Wc = H // 2, W // 2
    hc, wc = th // 2, tw // 2
    img1 = rng.rand(H, W).astype(np.float32)
    img2 = rng.rand(H, W).astype(np.float32)
    uc = (rng.randn(Hc, Wc) * 2.0).astype(np.float32)
    vc = (rng.randn(Hc, Wc) * 2.0).astype(np.float32)

    def pyrup_ext_full(x):
        # the full-frame padflow's central block: pyrUp asymmetric border
        # (row/col -1 -> 1, n -> n-1) one sample deep, zeros beyond
        buf = np.zeros((Hc + 2 * ocr, Wc + 4), np.float32)
        buf[ocr : ocr + Hc, 2 : 2 + Wc] = x
        buf[ocr - 1, 2 : 2 + Wc] = x[1]
        buf[ocr + Hc, 2 : 2 + Wc] = x[Hc - 1]
        strip = buf[ocr - 1 : ocr + Hc + 1, 2 : 2 + Wc]
        buf[ocr - 1 : ocr + Hc + 1, 1] = strip[:, 1]
        buf[ocr - 1 : ocr + Hc + 1, 2 + Wc] = strip[:, Wc - 1]
        return buf

    ue, ve = pyrup_ext_full(uc), pyrup_ext_full(vc)

    def img_ext(x, r0, c0):
        p = np.zeros((H + 2 * halo, W + 2 * halo), np.float32)
        p[halo : halo + H, halo : halo + W] = x
        return jnp.asarray(p[r0 : r0 + th + 2 * halo, c0 : c0 + tw + 2 * halo])

    ctx = (
        __import__("contextlib").nullcontext()
        if on_tpu
        else pltpu.force_tpu_interpret_mode()
    )
    with ctx:
        u0, v0 = pyrup_warp_lk_pallas(
            jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(uc),
            jnp.asarray(vc), max_disp=C, clamp=CLAMP,
        )
        u0, v0 = np.asarray(u0), np.asarray(v0)
        for ti in range(2):
            for tj in range(2):
                r0, c0 = ti * th, tj * tw
                cr0, cc0 = ti * hc, tj * wc
                ceu = jnp.asarray(ue[cr0 : cr0 + hc + 2 * ocr, cc0 : cc0 + wc + 4])
                cev = jnp.asarray(ve[cr0 : cr0 + hc + 2 * ocr, cc0 : cc0 + wc + 4])
                u1, v1 = pyrup_warp_lk_pallas(
                    img_ext(img1, r0, c0), img_ext(img2, r0, c0), ceu, cev,
                    max_disp=C, clamp=CLAMP,
                    halo=halo, origin=(r0, c0), global_hw=(H, W),
                )
                np.testing.assert_array_equal(
                    np.asarray(u1), u0[r0 : r0 + th, c0 : c0 + tw]
                )
                np.testing.assert_array_equal(
                    np.asarray(v1), v0[r0 : r0 + th, c0 : c0 + tw]
                )
