"""Horn-Schunck flow tests: analytic properties + translation recovery."""

import numpy as np
import pytest

import jax.numpy as jnp

from optical_flow_tpu.flow.horn_schunck import HornSchunckConfig, horn_schunck


def _smooth_texture(h, w, seed=0):
    r = np.random.RandomState(seed)
    x = r.rand(h // 4, w // 4)
    # bilinear upsample for smooth gradients
    x = np.kron(x, np.ones((4, 4)))
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(x, 2.0).astype(np.float64)


def test_zero_motion_zero_flow():
    img = jnp.asarray(np.random.RandomState(0).rand(64, 64))
    u, v = horn_schunck(img, img, HornSchunckConfig(iters=50))
    np.testing.assert_allclose(np.asarray(u), 0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(v), 0, atol=1e-10)


def test_translation_recovery():
    try:
        img = _smooth_texture(96, 96, seed=1)
    except ImportError:
        pytest.skip("scipy unavailable")
    img2 = np.roll(img, 1, axis=1)  # 1 px right
    u, v = horn_schunck(
        jnp.asarray(img), jnp.asarray(img2), HornSchunckConfig(alpha=0.5, iters=400)
    )
    interior_u = np.asarray(u)[16:-16, 16:-16]
    interior_v = np.asarray(v)[16:-16, 16:-16]
    # HS converges toward the true displacement in smooth interiors.
    # Note the sign/scale convention follows the reference gradients
    # (no 0.25 factor), so |u| ~ displacement.
    assert abs(np.median(interior_u) - 1.0) < 0.35, np.median(interior_u)
    assert abs(np.median(interior_v)) < 0.1


def test_smoothness_increases_with_alpha():
    try:
        img = _smooth_texture(64, 64, seed=2)
    except ImportError:
        pytest.skip("scipy unavailable")
    img2 = np.roll(img, 1, axis=0)

    def roughness(alpha):
        u, v = horn_schunck(
            jnp.asarray(img), jnp.asarray(img2), HornSchunckConfig(alpha=alpha, iters=100)
        )
        du = np.diff(np.asarray(u), axis=0)
        return float(np.mean(du * du))

    assert roughness(5.0) < roughness(0.1)


def test_pyramidal_hs_runs():
    r = np.random.RandomState(3)
    img = jnp.asarray(r.rand(64, 64).astype(np.float32))
    img2 = jnp.asarray(np.roll(np.asarray(img), 2, axis=1))
    u, v = horn_schunck(img, img2, HornSchunckConfig(alpha=1.0, iters=30, levels=3))
    assert u.shape == (64, 64)
    assert np.isfinite(np.asarray(u)).all()


def test_pyramidal_hs_large_translation_accuracy():
    """The displacement-true pyramid must recover a 3 px shift — far
    beyond single-level HS's linearization range — to sub-0.2 px
    (VERDICT r1 item 7's acceptance bar). Uses the shared 'corrected'
    controller: flow doubled on upsample + convergent warp."""
    try:
        img = _smooth_texture(128, 128, seed=4)
    except ImportError:
        pytest.skip("scipy unavailable")
    img2 = np.roll(img, 3, axis=1)  # 3 px right
    u, v = horn_schunck(
        jnp.asarray(img),
        jnp.asarray(img2),
        HornSchunckConfig(alpha=0.5, iters=300, levels=3),
    )
    interior_u = np.asarray(u)[24:-24, 24:-24]
    interior_v = np.asarray(v)[24:-24, 24:-24]
    assert abs(np.median(interior_u) - 3.0) < 0.2, np.median(interior_u)
    assert abs(np.median(interior_v)) < 0.1, np.median(interior_v)


def test_pyramidal_hs_beats_single_level_on_large_motion():
    """The reason the corrected pyramid exists: single-level HS cannot see
    a 3 px displacement at all (gradient linearization), the pyramid can."""
    try:
        img = _smooth_texture(128, 128, seed=5)
    except ImportError:
        pytest.skip("scipy unavailable")
    img2 = np.roll(img, 3, axis=1)
    a, b = jnp.asarray(img), jnp.asarray(img2)
    u1, _ = horn_schunck(a, b, HornSchunckConfig(alpha=0.5, iters=300, levels=1))
    u3, _ = horn_schunck(a, b, HornSchunckConfig(alpha=0.5, iters=300, levels=3))
    err1 = abs(float(np.median(np.asarray(u1)[24:-24, 24:-24])) - 3.0)
    err3 = abs(float(np.median(np.asarray(u3)[24:-24, 24:-24])) - 3.0)
    assert err3 < err1 / 2, (err1, err3)
