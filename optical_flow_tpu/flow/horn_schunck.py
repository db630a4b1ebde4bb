"""Horn-Schunck variational dense flow.

Not present in the reference (BASELINE.md names it as the extension
target beyond pyramidal LK): the global-smoothness counterpart to LK's
local window solve, minimizing

    E(u, v) = sum (fx u + fy v + ft)^2 + alpha^2 (|grad u|^2 + |grad v|^2)

via Jacobi iterations

    u <- ubar - fx (fx ubar + fy vbar + ft) / (alpha^2 + fx^2 + fy^2)

with the classic weighted neighbour average. TPU-native structure: the
iteration is a `lax.fori_loop` of pure stencil+elementwise steps (one fused
XLA loop body, flow fields stay on-chip); gradients reuse the
reference-faithful fx/fy/ft ops so LK and HS are directly comparable; a
coarse-to-fine wrapper shares the pyramid/warp machinery.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from optical_flow_tpu.ops.gradients import spatio_temporal_gradients
from optical_flow_tpu.ops.pad import pad_last2
from optical_flow_tpu.ops.pyramid import gaussian_pyramid, max_pyramid_levels, pyr_up
from optical_flow_tpu.ops.warp import symmetric_warp


@dataclasses.dataclass(frozen=True)
class HornSchunckConfig:
    alpha: float = 1.0  # smoothness weight
    iters: int = 100  # Jacobi iterations per level
    levels: Optional[int] = 1  # None -> max_pyramid_levels


def _neighbor_avg(x):
    """HS weighted average: 1/6 edge + 1/12 diagonal neighbours
    (REFLECT_101 border, consistent with the other stencils here)."""
    p = pad_last2(x, 1, 1, 1, 1, mode="reflect")
    edge = (
        p[..., :-2, 1:-1] + p[..., 2:, 1:-1] + p[..., 1:-1, :-2] + p[..., 1:-1, 2:]
    )
    diag = p[..., :-2, :-2] + p[..., :-2, 2:] + p[..., 2:, :-2] + p[..., 2:, 2:]
    return edge / 6.0 + diag / 12.0


@partial(jax.jit, static_argnames=("iters",))
def _hs_level(img1, img2, u0, v0, alpha, iters: int):
    fx, fy, ft = spatio_temporal_gradients(img1, img2)
    denom = alpha * alpha + fx * fx + fy * fy

    def body(_, uv):
        u, v = uv
        ub = _neighbor_avg(u)
        vb = _neighbor_avg(v)
        r = (fx * ub + fy * vb + ft) / denom
        return ub - fx * r, vb - fy * r

    return lax.fori_loop(0, iters, body, (u0, v0))


def horn_schunck(
    img1,
    img2,
    config: HornSchunckConfig = HornSchunckConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense HS flow on (..., H, W) images; returns (u, v).

    With levels > 1, runs coarse-to-fine with the same symmetric half-flow
    warping as the LK controller.
    """
    levels = config.levels or max_pyramid_levels(img1.shape)
    if levels > max_pyramid_levels(img1.shape):
        raise ValueError(
            f"levels={levels} too deep for {img1.shape[-2]}x{img1.shape[-1]} "
            f"(max {max_pyramid_levels(img1.shape)}: pyr_up only inverts "
            f"even-sized pyr_down levels)"
        )
    alpha = jnp.asarray(config.alpha, img1.dtype)
    if levels <= 1:
        z = jnp.zeros_like(img1)
        return _hs_level(img1, img2, z, z, alpha, config.iters)

    pyr1 = gaussian_pyramid(img1, levels)
    pyr2 = gaussian_pyramid(img2, levels)
    upu = upv = None
    for i in range(levels - 1, -1, -1):
        z = jnp.zeros_like(pyr1[i])
        u, v = _hs_level(pyr1[i], pyr2[i], z, z, alpha, config.iters)
        if i != levels - 1:
            u = u + upu
            v = v + upv
        if i == 0:
            return u, v
        upu = pyr_up(u)
        upv = pyr_up(v)
        pyr1[i - 1], pyr2[i - 1] = symmetric_warp(pyr1[i - 1], pyr2[i - 1], upu, upv)
    raise AssertionError("unreachable")
