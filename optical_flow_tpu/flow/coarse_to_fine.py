"""Coarse-to-fine pyramidal flow controller (reference C9).

Reference loop (LKof.cpp:191-228, SerialPyr.cpp:157-194), for level
i = levels-1 .. 0:
  (a) dense LK at level i -> (tmpu, tmpv);
  (b) if not coarsest: tmpu += upu, tmpv += upv (upsampled coarser flow);
  (c) if i == 0: emit (tmpu, tmpv) and stop;
  (d) upu = pyrUp(tmpu) — flow values are deliberately NOT doubled
      (a quirk of the reference carried into every variant);
  (e) warp both level i-1 images half-way toward each other along
      (upu, upv) and replace them in the pyramid.

The reference mutates the pyramids in place, and pyramid level 0 aliases the
caller's images (getGaussianPyramid pushes the input Mat header,
LKof.cpp:182), so the caller's images end up warped. Here the controller is
functional; `coarse_to_fine_with_images` additionally returns the warped
finest-level images for callers that rely on that aliasing (the video loop
keeps the warped diff as the next prevDiff, ParallelVideoPyr.cpp:841).

Shapes are static per level, so under `jax.jit` the Python loop unrolls into
one fused program; all levels of one frame pair compile into a single XLA
executable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from optical_flow_tpu.config import FlowConfig
from optical_flow_tpu.flow.lk import lucas_kanade
from optical_flow_tpu.ops.pyramid import gaussian_pyramid, max_pyramid_levels, pyr_up
from optical_flow_tpu.ops.warp import symmetric_warp


def coarse_to_fine_with_images(
    img1,
    img2,
    levels: Optional[int] = None,
    *,
    config: FlowConfig = FlowConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pyramidal LK; returns (u, v, warped_img1, warped_img2).

    warped_img1/2 are the finest-level images after the last warp — what the
    reference leaves in the caller's Mats via in-place pyramid mutation.
    """
    if levels is None:
        levels = config.levels or max_pyramid_levels(img1.shape)
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    max_levels = max_pyramid_levels(img1.shape)
    if levels > max_levels:
        # pyr_up(ceil(n/2)) only matches n when n is even, so depth is
        # bounded by the 2-adic valuation (the reference's getMaxLayer).
        raise ValueError(
            f"levels={levels} too deep for {img1.shape[-2]}x{img1.shape[-1]} "
            f"(max {max_levels}, LKof.cpp:230-249 getMaxLayer)"
        )
    pyr1 = gaussian_pyramid(img1, levels)
    pyr2 = gaussian_pyramid(img2, levels)

    upu = upv = None
    for i in range(levels - 1, -1, -1):
        u, v = lucas_kanade(pyr1[i], pyr2[i], impl=config.impl)
        if i != levels - 1:
            u = u + upu
            v = v + upv
        if i == 0:
            return u, v, pyr1[0], pyr2[0]
        upu = pyr_up(u)  # NOTE: no *2 on flow, faithful to the reference
        upv = pyr_up(v)
        wu, wv = upu, upv
        if config.warp_clamp is not None:
            wu = jnp.clip(wu, -config.warp_clamp, config.warp_clamp)
            wv = jnp.clip(wv, -config.warp_clamp, config.warp_clamp)
        pyr1[i - 1], pyr2[i - 1] = symmetric_warp(
            pyr1[i - 1], pyr2[i - 1], wu, wv, quantize=config.quantize_warp
        )
    # levels == 0 can't happen (max_pyramid_levels >= 1); single level returns above
    raise AssertionError("unreachable")


def coarse_to_fine(
    img1,
    img2,
    levels: Optional[int] = None,
    *,
    config: FlowConfig = FlowConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pyramidal dense LK flow; returns (u, v)."""
    u, v, _, _ = coarse_to_fine_with_images(img1, img2, levels, config=config)
    return u, v
