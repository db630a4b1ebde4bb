"""Fused warp+LK Pallas kernel vs the unfused composition.

The fused kernel (kernels/warp_lk_kernel.py) must reproduce
    wu, wv = clip(u, v, clamp); optionally negate
    w1, w2 = symmetric_warp(img1, img2, wu, wv, impl='shift_sep',
                            max_disp=C, quantize=True)
    du, dv = lucas_kanade(w1, w2)
— the corrected pyramid's per-level step (flow/pyramid_loop.py). On CPU the
kernel runs in Mosaic interpret mode (~1 ulp contraction differences); on a
real TPU the verify protocol additionally pins it bit-identical.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optical_flow_tpu.flow.lk import lucas_kanade_jnp
from optical_flow_tpu.kernels.warp_lk_kernel import warp_lk_band, warp_lk_pallas
from optical_flow_tpu.ops.warp import symmetric_warp

on_tpu = jax.default_backend() == "tpu"


def _unfused(img1, img2, u, v, *, max_disp, clamp, negate):
    f = [a.astype(jnp.float32) for a in (img1, img2, u, v)]
    img1, img2, u, v = f
    wu = jnp.clip(u, -clamp, clamp)
    wv = jnp.clip(v, -clamp, clamp)
    if negate:
        wu, wv = -wu, -wv
    w1, w2 = symmetric_warp(
        img1, img2, wu, wv, quantize=True, impl="shift_sep", max_disp=max_disp
    )
    return lucas_kanade_jnp(w1, w2)


def _fused(img1, img2, u, v, *, max_disp, clamp, negate):
    if on_tpu:
        return warp_lk_pallas(
            img1, img2, u, v, max_disp=max_disp, clamp=clamp, negate=negate
        )
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return warp_lk_pallas(
            img1, img2, u, v, max_disp=max_disp, clamp=clamp, negate=negate
        )


def _flow(rng, shape, scale):
    # smooth-ish flow: low-res noise upsampled, plus a constant component
    H, W = shape[-2:]
    coarse = rng.randn(*shape[:-2], max(H // 8, 1), max(W // 8, 1), 2)
    f = jax.image.resize(jnp.asarray(coarse, jnp.float32), shape + (2,), "linear")
    f = f * scale + jnp.asarray(rng.randn(2) * scale, jnp.float32)
    return f[..., 0], f[..., 1]


def _well_conditioned_mask(img1, img2, u, v, *, max_disp, clamp, negate):
    """Pixels whose 2x2 LK system is not near-singular. Where det ~ 0 the
    solve amplifies the ~1-ulp contraction differences between interpret
    mode and XLA into O(1) output flips (ok-mask toggles); those pixels are
    legitimately indeterminate at f32 and excluded from the comparison."""
    from optical_flow_tpu.ops.gradients import spatio_temporal_gradients
    from optical_flow_tpu.ops.window import sum3x3_interior

    wu = jnp.clip(u.astype(jnp.float32), -clamp, clamp)
    wv = jnp.clip(v.astype(jnp.float32), -clamp, clamp)
    if negate:
        wu, wv = -wu, -wv
    w1, w2 = symmetric_warp(
        img1, img2, wu, wv, quantize=True, impl="shift_sep", max_disp=max_disp
    )
    fx, fy, ft = spatio_temporal_gradients(w1, w2)
    prods = jnp.stack([fx * fx, fy * fy, fx * fy], axis=0)
    s = sum3x3_interior(prods)
    det = s[0] * s[1] - s[2] * s[2]
    scale = jnp.maximum(jnp.max(jnp.abs(det)), 1.0)
    return np.asarray(jnp.abs(det) > 1e-6 * scale)


def _compare(shape, *, max_disp, clamp, negate, scale, seed=0, atol=2e-5):
    rng = np.random.RandomState(seed)
    img1 = jnp.asarray(rng.rand(*shape).astype(np.float32))
    img2 = jnp.asarray(rng.rand(*shape).astype(np.float32))
    u, v = _flow(rng, shape, scale)
    du0, dv0 = _unfused(
        img1, img2, u, v, max_disp=max_disp, clamp=clamp, negate=negate
    )
    try:
        du1, dv1 = _fused(
            img1, img2, u, v, max_disp=max_disp, clamp=clamp, negate=negate
        )
    except NotImplementedError as e:
        pytest.skip(f"pallas interpret unsupported here: {e}")
    ok = _well_conditioned_mask(
        img1, img2, u, v, max_disp=max_disp, clamp=clamp, negate=negate
    )
    assert ok.mean() > 0.5  # the mask must not hide real divergence
    z = np.zeros((), np.float32)
    for a, b in ((du0, du1), (dv0, dv1)):
        a = np.where(ok, np.asarray(a, np.float32), z)
        b = np.where(ok, np.asarray(b, np.float32), z)
        np.testing.assert_allclose(a, b, atol=atol)


@pytest.mark.parametrize(
    "shape", [(64, 96), (48, 40), (2, 32, 130), (50, 40), (61, 37), (64, 128)]
)
def test_fused_matches_unfused(shape):
    # production operating point: warp_clamp=8 -> max_disp=5.
    # (50, 40) and (61, 37): H % 8 != 0 — rows padded to Hp, pad rows dropped
    _compare(shape, max_disp=5, clamp=8.0, negate=True, scale=2.0)


def test_flow_beyond_clamp_is_clipped():
    _compare((40, 64), max_disp=5, clamp=8.0, negate=True, scale=30.0, seed=3)


def test_no_negate_reference_direction():
    _compare((32, 48), max_disp=3, clamp=4.0, negate=False, scale=1.5, seed=7)


def test_multiband_row_seams():
    # force multiple bands: at W=40 the VMEM-aware picker allows tall
    # bands, so use H=1024 -> band 512 => 2 bands (asserted)
    from optical_flow_tpu.kernels.warp_lk_kernel import warp_lk_band

    assert 1024 // warp_lk_band(1024, 40, 2) >= 2
    _compare((1024, 40), max_disp=2, clamp=2.5, negate=True, scale=1.0, seed=11)


def test_padded_rows_straddle_last_band():
    # H=122 -> Hp=128: the last band holds 6 pad rows after the final
    # real rows — the interior mask must keep them from leaking.
    _compare((122, 40), max_disp=2, clamp=2.5, negate=True, scale=1.0, seed=13)


def test_zero_flow_equals_plain_lk():
    rng = np.random.RandomState(5)
    img1 = jnp.asarray(rng.rand(64, 72).astype(np.float32))
    img2 = jnp.asarray(rng.rand(64, 72).astype(np.float32))
    z = jnp.zeros((64, 72), jnp.float32)
    u0, v0 = lucas_kanade_jnp(img1, img2)
    try:
        u1, v1 = _fused(img1, img2, z, z, max_disp=5, clamp=8.0, negate=True)
    except NotImplementedError as e:
        pytest.skip(f"pallas interpret unsupported here: {e}")
    np.testing.assert_allclose(np.asarray(u0, np.float32), np.asarray(u1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v0, np.float32), np.asarray(v1), atol=2e-5)


def _pyramid_pair(shape=(64, 96), dx=2.5, dy=-1.5, seed=42):
    rng = np.random.RandomState(seed)
    big = rng.rand(shape[0] + 32, shape[1] + 32).astype(np.float32)
    try:
        import scipy.ndimage as ndi

        big = ndi.gaussian_filter(big, 3.0)
    except ImportError:
        k = np.ones(9) / 9.0
        big = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, big)
        big = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, big)
    ys, xs = np.mgrid[0 : shape[0], 0 : shape[1]]

    def sample(oy, ox):
        y = ys + 16 + oy
        x = xs + 16 + ox
        y0, x0 = np.floor(y).astype(int), np.floor(x).astype(int)
        fy, fx = y - y0, x - x0
        g = big
        return (
            g[y0, x0] * (1 - fy) * (1 - fx)
            + g[y0, x0 + 1] * (1 - fy) * fx
            + g[y0 + 1, x0] * fy * (1 - fx)
            + g[y0 + 1, x0 + 1] * fy * fx
        )

    # img2(p) = img1(p - d): features move by +d from img1 to img2, so the
    # recovered displacement-true flow is (dx, dy).
    return (
        jnp.asarray(sample(0.0, 0.0), jnp.float32),
        jnp.asarray(sample(-dy, -dx), jnp.float32),
        dx,
        dy,
    )


def test_fused_pyramid_end_to_end():
    """The corrected pyramid with the fused warp+LK kernel recovers a
    known sub-pixel translation and matches the unfused shift_sep pyramid."""
    from optical_flow_tpu.config import FlowConfig
    from optical_flow_tpu.flow.coarse_to_fine import coarse_to_fine

    img1, img2, dx, dy = _pyramid_pair()
    base = dict(
        mode="corrected", warp_clamp=8.0, warp_impl="shift_sep", level_iters=2
    )
    cfg_jnp = FlowConfig(impl="jnp", **base)
    u0, v0 = coarse_to_fine(img1, img2, 3, config=cfg_jnp)

    from jax.experimental.pallas import tpu as pltpu

    cfg_pl = FlowConfig(impl="pallas", **base)
    try:
        if on_tpu:
            u1, v1 = coarse_to_fine(img1, img2, 3, config=cfg_pl)
        else:
            with pltpu.force_tpu_interpret_mode():
                u1, v1 = coarse_to_fine(img1, img2, 3, config=cfg_pl)
    except NotImplementedError as e:
        pytest.skip(f"pallas interpret unsupported here: {e}")

    # accuracy: interior flow recovers the translation
    inner = (slice(8, -8), slice(8, -8))
    err = np.hypot(
        np.asarray(u1)[inner] - dx, np.asarray(v1)[inner] - dy
    )
    assert np.median(err) < 0.2, np.median(err)
    # parity with the unfused pyramid: identical composition, different
    # float contraction only (near-singular pixels may flip; use quantiles)
    d = np.hypot(
        np.asarray(u1)[inner] - np.asarray(u0)[inner],
        np.asarray(v1)[inner] - np.asarray(v0)[inner],
    )
    # interpret-mode rounding is amplified through 3 levels x 2 iters of
    # warp->solve feedback; typical divergence is ~1e-5 with a short tail
    assert np.median(d) < 1e-3, np.median(d)
    assert np.quantile(d, 0.99) < 0.02, np.quantile(d, 0.99)


def test_band_constraints():
    assert warp_lk_band(1080, 1080, 5) == 72  # largest divisor within VMEM
    assert warp_lk_band(540, 540, 5) == 136  # narrow level -> tall band
    assert warp_lk_band(270, 270, 5) == 136  # 2 bands (table-bounded)
    assert warp_lk_band(50, 40, 5) == 56  # Hp=56, single band
    assert warp_lk_band(64, 2, 5) is None  # too narrow
    assert warp_lk_band(4, 64, 5) is None  # too short
    # pyrup variant: the compiler's actual scoped allocation per band row
    # is ~1.4-2.8x the analytic estimate with a width-dependent shape
    # (measured on v5e 2026-08-19, scripts/tpu_vmem_calibration.py; e.g.
    # 18.98M at 1080/band 72 OOMs the 16M limit), so its bands shrink
    # where the plain variant's fit; Hp slack rows recover dividing bands
    # the tight round_up(H, 8) padding forbids.
    from optical_flow_tpu.kernels.warp_lk_kernel import warp_lk_tiling

    assert warp_lk_tiling(1080, 1080, 8, pyrup=True) == (1104, 48)
    assert warp_lk_tiling(540, 540, 8, pyrup=True) == (560, 80)
    assert warp_lk_tiling(270, 270, 8, pyrup=True) == (272, 136)
    # plain 1080 band is unchanged by the calibration
    assert warp_lk_tiling(1080, 1080, 8) == (1080, 72)
    with pytest.raises(ValueError):
        warp_lk_pallas(
            jnp.zeros((4, 64)), jnp.zeros((4, 64)), jnp.zeros((4, 64)),
            jnp.zeros((4, 64)), max_disp=5, clamp=8.0,
        )


def test_tile_mode_matches_full_frame():
    """The kernel's tile mode (halo + global origin via scalar prefetch):
    running it on halo-extended tiles must reproduce the corresponding
    region of the full-frame kernel BIT-identically — the property the
    sharded pyramid's per-tile fusion rests on
    (parallel/sharded_warp_lk.py; the shard_map composition itself is
    covered in test_parallel.py)."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(11)
    H, W = 32, 256
    th, tw = 16, 128  # 2x2 tile grid
    C, clamp = 2, 4.0
    halo = C + 2
    img1 = rng.rand(H, W).astype(np.float32)
    img2 = rng.rand(H, W).astype(np.float32)
    u, v = _flow(rng, (H, W), 2.0)
    wu = np.asarray(jnp.clip(u, -clamp, clamp))
    wv = np.asarray(jnp.clip(v, -clamp, clamp))

    ctx = (
        __import__("contextlib").nullcontext()
        if on_tpu
        else pltpu.force_tpu_interpret_mode()
    )
    with ctx:
        du0, dv0 = warp_lk_pallas(
            jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(wu),
            jnp.asarray(wv), max_disp=C, clamp=clamp, negate=False,
        )
        du0, dv0 = np.asarray(du0), np.asarray(dv0)

        def ext(x, r0, c0):
            # zero-padded halo extension — exactly what exchange_halo with
            # border='zero' supplies at global borders, and what interior
            # tiles receive from their neighbours
            p = np.zeros((H + 2 * halo, W + 2 * halo), np.float32)
            p[halo : halo + H, halo : halo + W] = x
            return jnp.asarray(p[r0 : r0 + th + 2 * halo, c0 : c0 + tw + 2 * halo])

        for r0 in (0, th):
            for c0 in (0, tw):
                du1, dv1 = warp_lk_pallas(
                    ext(img1, r0, c0), ext(img2, r0, c0),
                    ext(wu, r0, c0), ext(wv, r0, c0),
                    max_disp=C, clamp=clamp, negate=False,
                    halo=halo, origin=(r0, c0), global_hw=(H, W),
                )
                np.testing.assert_array_equal(
                    np.asarray(du1), du0[r0 : r0 + th, c0 : c0 + tw]
                )
                np.testing.assert_array_equal(
                    np.asarray(dv1), dv0[r0 : r0 + th, c0 : c0 + tw]
                )


@pytest.mark.parametrize("geom", [(40, 192, 20, 96), (48, 256, 24, 128)])
def test_tile_mode_awkward_geometries(geom):
    """Tile mode with tiles whose height is not a multiple of 8 (pad rows
    in play) and whose width is below the 128-lane pad: kept outputs must
    still match the full-frame kernel bit-for-bit."""
    from jax.experimental.pallas import tpu as pltpu

    H, W, th, tw = geom
    rng = np.random.RandomState(13)
    C, clamp = 3, 6.0
    halo = C + 2
    img1 = rng.rand(H, W).astype(np.float32)
    img2 = rng.rand(H, W).astype(np.float32)
    u, v = _flow(rng, (H, W), 2.0)
    wu = np.asarray(jnp.clip(u, -clamp, clamp))
    wv = np.asarray(jnp.clip(v, -clamp, clamp))

    def ext(x, r0, c0):
        p = np.zeros((H + 2 * halo, W + 2 * halo), np.float32)
        p[halo : halo + H, halo : halo + W] = x
        return jnp.asarray(p[r0 : r0 + th + 2 * halo, c0 : c0 + tw + 2 * halo])

    ctx = (
        __import__("contextlib").nullcontext()
        if on_tpu
        else pltpu.force_tpu_interpret_mode()
    )
    with ctx:
        du0, dv0 = warp_lk_pallas(
            jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(wu),
            jnp.asarray(wv), max_disp=C, clamp=clamp, negate=False,
        )
        du0, dv0 = np.asarray(du0), np.asarray(dv0)
        for r0 in (0, H - th):
            for c0 in (0, W - tw):
                du1, dv1 = warp_lk_pallas(
                    ext(img1, r0, c0), ext(img2, r0, c0),
                    ext(wu, r0, c0), ext(wv, r0, c0),
                    max_disp=C, clamp=clamp, negate=False,
                    halo=halo, origin=(r0, c0), global_hw=(H, W),
                )
                np.testing.assert_array_equal(
                    np.asarray(du1), du0[r0 : r0 + th, c0 : c0 + tw]
                )
                np.testing.assert_array_equal(
                    np.asarray(dv1), dv0[r0 : r0 + th, c0 : c0 + tw]
                )
