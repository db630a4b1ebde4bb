"""Seeded fuzz of preprocessing ops against live cv2 (ROADMAP: Robustness).

The deterministic parity tests in test_pipeline.py pin one shape/dtype per
op; this file sweeps randomized dtype x shape x parameter combinations so
semantic drift on odd sizes, tiny images, channel layouts, or unusual
parameters shows up. Every case is seeded (no flaky randomness) and small
enough to keep the sweep a few seconds on CPU.

Tolerances mirror test_pipeline.py: uint8 stages allow +-1 (OpenCV's 8u
paths use fixed-point filter coefficients, e.g. INTER_RESIZE_COEF_BITS);
integer-exact stages (gray, threshold, morphology, Sobel-on-small-ints)
must match exactly; float stages compare at f32-roundoff scale.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
cv2 = pytest.importorskip("cv2")

from optical_flow_tpu.pipeline.preprocess import (
    bgr_to_gray,
    dilate3x3,
    erode3x3,
    gaussian_blur,
    resize_cubic,
    sobel3,
    temporal_diff,
    threshold_tozero,
)

# Shapes chosen to hit: tiny (near the 4-tap cubic support), odd dims,
# non-square aspect, and a realistic size.
SHAPES = [(4, 4), (5, 9), (17, 13), (32, 7), (61, 47), (96, 128)]


def _img(rng, shape, dtype, channels=0):
    full = shape + ((channels,) if channels else ())
    x = rng.rand(*full) * 255.0
    if dtype == np.uint8:
        return x.astype(np.uint8)
    return x.astype(dtype)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_resize_cubic(seed):
    rng = np.random.RandomState(100 + seed)
    for _ in range(8):
        h, w = SHAPES[rng.randint(len(SHAPES))]
        ho, wo = int(rng.randint(3, 80)), int(rng.randint(3, 80))
        dtype = [np.uint8, np.float32][rng.randint(2)]
        channels = [0, 3][rng.randint(2)]
        img = _img(rng, (h, w), dtype, channels)
        ours = np.asarray(resize_cubic(jnp.asarray(img), (ho, wo)))
        ref = cv2.resize(img, (wo, ho), interpolation=cv2.INTER_CUBIC)
        assert ours.shape == ref.shape, (img.shape, (ho, wo))
        if dtype == np.uint8:
            assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1, (
                img.shape, (ho, wo), channels,
            )
        else:
            np.testing.assert_allclose(ours, ref, atol=2e-2)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_gaussian_blur(seed):
    rng = np.random.RandomState(200 + seed)
    for _ in range(8):
        h, w = SHAPES[rng.randint(len(SHAPES))]
        ksize = [3, 5, 7, 9][rng.randint(4)]
        # reflect padding needs dim > radius; skip impossible combos
        if min(h, w) <= ksize // 2:
            ksize = 3
        sigma = [0.0, 0.8, 1.5, 2.5][rng.randint(4)]
        dtype = [np.uint8, np.float32][rng.randint(2)]
        channels = [0, 3][rng.randint(2)]
        img = _img(rng, (h, w), dtype, channels)
        ours = np.asarray(gaussian_blur(jnp.asarray(img), ksize, sigma))
        ref = cv2.GaussianBlur(img, (ksize, ksize), sigma)
        if dtype == np.uint8:
            assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1, (
                img.shape, ksize, sigma, channels,
            )
        else:
            np.testing.assert_allclose(ours, ref, atol=1e-3)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sobel(seed):
    rng = np.random.RandomState(300 + seed)
    for _ in range(8):
        h, w = SHAPES[rng.randint(len(SHAPES))]
        dx, dy = [(1, 0), (0, 1)][rng.randint(2)]
        dtype = [np.uint8, np.float32][rng.randint(2)]
        img = _img(rng, (h, w), dtype)
        ours = np.asarray(sobel3(jnp.asarray(img), dx, dy))
        ref = cv2.Sobel(img, cv2.CV_32F, dx, dy, ksize=3)
        if dtype == np.uint8:
            # integer taps on integer inputs: exact in f32 up to 2^24
            np.testing.assert_array_equal(ours, ref)
        else:
            np.testing.assert_allclose(ours, ref, atol=1e-3)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_temporal_diff_threshold(seed):
    rng = np.random.RandomState(400 + seed)
    for _ in range(10):
        h, w = SHAPES[rng.randint(len(SHAPES))]
        lr = float(rng.choice([0.1, 0.3, 0.5, 0.9, 1.0]))
        thresh = float(rng.choice([0.0, 5.0, 10.0, 128.0, 254.0]))
        dtype = [np.uint8, np.float32][rng.randint(2)]
        cur, prev = _img(rng, (h, w), dtype), _img(rng, (h, w), dtype)
        d = temporal_diff(jnp.asarray(cur), jnp.asarray(prev), lr)
        ours = np.asarray(threshold_tozero(d, thresh))
        # cv2 Mat-expression semantics: evaluate in double, saturate back
        refd = cur.astype(np.float64) - lr * prev.astype(np.float64)
        if dtype == np.uint8:
            # saturate_cast<uchar> rounds half to even
            refd = np.clip(np.rint(refd), 0, 255).astype(np.uint8)
            _, ref = cv2.threshold(refd, thresh, 255, cv2.THRESH_TOZERO)
            np.testing.assert_array_equal(ours, ref)
        else:
            _, ref = cv2.threshold(
                refd.astype(np.float32), thresh, 255, cv2.THRESH_TOZERO
            )
            np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_morphology(seed):
    rng = np.random.RandomState(500 + seed)
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
    for _ in range(10):
        h, w = SHAPES[rng.randint(len(SHAPES))]
        iters = int(rng.randint(1, 4))
        dtype = [np.uint8, np.float32][rng.randint(2)]
        img = _img(rng, (h, w), dtype)
        for ours_fn, ref_fn in ((dilate3x3, cv2.dilate), (erode3x3, cv2.erode)):
            ours = np.asarray(ours_fn(jnp.asarray(img), iters))
            ref = ref_fn(img, kernel, iterations=iters)
            np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_bgr_to_gray(seed):
    rng = np.random.RandomState(600 + seed)
    for _ in range(10):
        h, w = SHAPES[rng.randint(len(SHAPES))]
        dtype = [np.uint8, np.float32][rng.randint(2)]
        img = _img(rng, (h, w), dtype, channels=3)
        ours = np.asarray(bgr_to_gray(jnp.asarray(img)))
        ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        if dtype == np.uint8:
            np.testing.assert_array_equal(ours, ref)
        else:
            np.testing.assert_allclose(ours, ref, atol=2e-3)
