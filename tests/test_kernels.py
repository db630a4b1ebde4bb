"""Pallas fused-LK kernel tests.

On CPU the kernel runs in Mosaic interpret mode (skipped if unsupported);
on a real TPU (bench environment, not CI) the kernel is verified
bit-identical to the jnp path — see the session verification protocol in
.claude/skills/verify. Here we check the kernel against the jnp oracle on a
grid of awkward shapes (round-up rows/cols, tiny, batched).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optical_flow_tpu.flow.lk import lucas_kanade_jnp


def _pallas_interpret(a, b):
    from jax.experimental.pallas import tpu as pltpu

    from optical_flow_tpu.kernels.lk_kernel import lucas_kanade_pallas

    with pltpu.force_tpu_interpret_mode():
        return lucas_kanade_pallas(a, b)


on_tpu = jax.default_backend() == "tpu"


@pytest.mark.parametrize(
    "shape",
    [(64, 128), (37, 53), (96, 200), (3, 40, 64)],
)
def test_pallas_matches_jnp(shape):
    rng = np.random.RandomState(5)
    a = jnp.asarray(rng.rand(*shape).astype(np.float32))
    b = jnp.asarray(rng.rand(*shape).astype(np.float32))
    u0, v0 = lucas_kanade_jnp(a, b)
    try:
        if on_tpu:
            from optical_flow_tpu.kernels.lk_kernel import lucas_kanade_pallas

            u1, v1 = lucas_kanade_pallas(a, b)
        else:
            u1, v1 = _pallas_interpret(a, b)
    except NotImplementedError as e:  # interpret-mode gaps on this jax build
        pytest.skip(f"pallas interpret unsupported here: {e}")
    if on_tpu:
        # bit-identical on hardware (same ops, same order)
        np.testing.assert_array_equal(np.asarray(u0, np.float32), np.asarray(u1))
        np.testing.assert_array_equal(np.asarray(v0, np.float32), np.asarray(v1))
    else:
        # CPU interpret mode rounds differently (fma/fusion) — ~1 ulp
        np.testing.assert_allclose(np.asarray(u0, np.float32), np.asarray(u1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(v0, np.float32), np.asarray(v1), atol=1e-5)


def test_degenerate_level_returns_zeros():
    from optical_flow_tpu.kernels.lk_kernel import lucas_kanade_pallas

    a = jnp.ones((2, 2), jnp.float32)
    u, v = lucas_kanade_pallas(a, a)
    np.testing.assert_array_equal(np.asarray(u), 0)
    np.testing.assert_array_equal(np.asarray(v), 0)


class TestPyrDownPallas:
    """Fused pyr_down band kernel (kernels/pyrdown_kernel.py): poly row
    pass + matmul column pass in one VMEM visit. On hardware it is the
    'mxu' semantics (f32 roundoff vs the bit-pinned poly path); here the
    interpret-mode run is checked against both XLA forms."""

    @pytest.mark.parametrize(
        "shape",
        [(64, 96), (2, 256, 256), (1, 135, 271), (41, 130)],
    )
    def test_matches_xla_paths(self, shape):
        from optical_flow_tpu.ops.pyramid import pyr_down

        rng = np.random.RandomState(9)
        x = jnp.asarray((rng.rand(*shape) * 255).astype(np.float32))
        poly = np.asarray(pyr_down(x))
        mxu = np.asarray(pyr_down(x, impl="mxu"))
        try:
            if on_tpu:
                got = np.asarray(pyr_down(x, impl="pallas"))
            else:
                from jax.experimental.pallas import tpu as pltpu

                from optical_flow_tpu.kernels.pyrdown_kernel import (
                    pyr_down_pallas,
                )

                with pltpu.force_tpu_interpret_mode():
                    got = np.asarray(pyr_down_pallas(x))
        except NotImplementedError as e:
            pytest.skip(f"pallas interpret unsupported here: {e}")
        assert got.shape == poly.shape
        np.testing.assert_allclose(got, mxu, atol=2e-4)
        np.testing.assert_allclose(got, poly, atol=2e-3)

    def test_degenerate_falls_back_to_poly(self):
        from optical_flow_tpu.ops.pyramid import pyr_down

        x = jnp.asarray(np.random.RandomState(3).rand(3, 7).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(pyr_down(x, impl="pallas")), np.asarray(pyr_down(x))
        )

    def test_gaussian_pyramid_plumbs_pallas(self):
        from jax.experimental.pallas import tpu as pltpu

        from optical_flow_tpu.ops.pyramid import gaussian_pyramid

        rng = np.random.RandomState(7)
        x = jnp.asarray((rng.rand(64, 64) * 255).astype(np.float32))
        pa = gaussian_pyramid(x, 3)
        try:
            if on_tpu:
                pb = gaussian_pyramid(x, 3, impl="pallas")
            else:
                with pltpu.force_tpu_interpret_mode():
                    pb = gaussian_pyramid(x, 3, impl="pallas")
        except NotImplementedError as e:
            pytest.skip(f"pallas interpret unsupported here: {e}")
        for a, b in zip(pa, pb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
