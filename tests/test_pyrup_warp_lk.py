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
