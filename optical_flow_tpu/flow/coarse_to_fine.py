"""Coarse-to-fine pyramidal flow controller (reference C9).

Reference loop (LKof.cpp:191-228, SerialPyr.cpp:157-194), for level
i = levels-1 .. 0:
  (a) dense LK at level i -> (tmpu, tmpv);
  (b) if not coarsest: tmpu += upu, tmpv += upv (upsampled coarser flow);
  (c) if i == 0: emit (tmpu, tmpv) and stop;
  (d) upu = pyrUp(tmpu) — flow values are deliberately NOT doubled
      (a quirk of the reference carried into every variant);
  (e) warp both level i-1 images along (upu, upv) and replace them in the
      pyramid (the reference's map construction drives the frames APART —
      see FlowConfig.mode for the displacement-true 'corrected' variant).

The reference mutates the pyramids in place, and pyramid level 0 aliases the
caller's images (getGaussianPyramid pushes the input Mat header,
LKof.cpp:182), so the caller's images end up warped. Here the controller is
functional; `coarse_to_fine_with_images` additionally returns the warped
finest-level images for callers that rely on that aliasing (the video loop
keeps the warped diff as the next prevDiff, ParallelVideoPyr.cpp:841).

The level loop itself lives in flow/pyramid_loop.py, shared with the
mesh-sharded controller. Shapes are static per level, so under `jax.jit`
the loop unrolls into one fused program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from optical_flow_tpu.config import FlowConfig
from optical_flow_tpu.flow.lk import lucas_kanade
from optical_flow_tpu.flow.pyramid_loop import run_pyramid
from optical_flow_tpu.ops.pyramid import gaussian_pyramid, max_pyramid_levels
from optical_flow_tpu.ops.warp import symmetric_warp


def resolve_warp_impl(config: FlowConfig):
    """(impl, max_disp) for symmetric_warp from a FlowConfig.

    'shift' needs a bounded displacement: half the clamped flow, +1 for
    fixed-point rounding slack.
    """
    import jax

    impl = config.warp_impl
    if impl == "auto":
        # shift_sep: O(clamp) separable decomposition — measured equal EPE
        # to the exact form (flow fields are window-averaged smooth, and
        # the pyramid's residual solves absorb the tiny separability
        # error); 2.33 -> 0.57 ms/frame at 1080^2 vs the exact 'shift'.
        impl = (
            "shift_sep"
            if (config.warp_clamp is not None and jax.default_backend() == "tpu")
            else "gather"
        )
    if impl in ("shift", "shift_sep"):
        if config.warp_clamp is None:
            raise ValueError(f"warp_impl={impl!r} requires warp_clamp (bounded reach)")
        if impl == "shift_sep":
            # flow-space quantization keeps |d| <= clamp/2 exactly — no
            # fixed-point rounding slack needed (ops/warp.py quantize_disp)
            return impl, int(-(-config.warp_clamp // 2))
        return impl, int(-(-config.warp_clamp // 2)) + 1
    if impl != "gather":
        raise ValueError(
            f"warp_impl must be 'gather', 'shift', 'shift_sep' or 'auto', got {impl!r}"
        )
    return "gather", 0


def _validate_levels(levels: Optional[int], shape, config: FlowConfig) -> int:
    if levels is None:
        levels = config.levels or max_pyramid_levels(shape)
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    max_levels = max_pyramid_levels(shape)
    if levels > max_levels:
        # pyr_up(ceil(n/2)) only matches n when n is even, so depth is
        # bounded by the 2-adic valuation (the reference's getMaxLayer).
        raise ValueError(
            f"levels={levels} too deep for {shape[-2]}x{shape[-1]} "
            f"(max {max_levels}, LKof.cpp:230-249 getMaxLayer)"
        )
    return levels


def _resolve_warp_solve(config: FlowConfig, warp_impl: str, max_disp: int, solve, warp):
    """Fused warp+LK callable for run_pyramid, or None.

    Applies on the TPU production path only: pallas LK + the separable
    quantized shift warp with a clamp (the fused kernel implements exactly
    that composition; kernels/warp_lk_kernel.py). Shapes the band kernel
    can't tile fall back to the unfused pair per level.
    """
    from optical_flow_tpu.flow.lk import _use_pallas

    if not (
        _use_pallas(config.impl)
        and warp_impl == "shift_sep"
        and config.quantize_warp
        and config.warp_clamp is not None
    ):
        return None
    from optical_flow_tpu.kernels.warp_lk_kernel import warp_lk_band, warp_lk_pallas

    clamp = float(config.warp_clamp)

    def warp_solve(i, a, b, wu, wv):
        # (wu, wv) arrive already clamped/negated by the loop; the kernel's
        # own clip is idempotent on them, so negate=False + same clamp
        # reproduces the unfused composition bit-for-bit.
        if warp_lk_band(a.shape[-2], a.shape[-1], max_disp) is None:
            w1, w2 = warp(i, a, b, wu, wv)
            return solve(i, w1, w2)
        return warp_lk_pallas(a, b, wu, wv, max_disp=max_disp, clamp=clamp, negate=False)

    return warp_solve


def _resolve_level_step(config: FlowConfig, warp_impl: str, max_disp: int, warp_solve):
    """Fully-fused inter-level callable for run_pyramid, or None.

    Corrected-mode production path only: one Pallas call computes
    upsample+double+clamp+negate+warp+LK+accumulate per level
    (kernels/warp_lk_kernel.py::pyrup_warp_lk_pallas) — the XLA-side
    pyr_up interleave relayouts disappear. Shapes the kernel can't tile
    fall back to the unfused upsample + (possibly fused) warp+solve with
    identical arithmetic to the loop's own inter-level path.
    """
    if warp_solve is None or config.mode != "corrected":
        return None
    from optical_flow_tpu.kernels.warp_lk_kernel import (
        pyrup_warp_lk_pallas,
        warp_lk_band,
    )
    from optical_flow_tpu.ops.pyramid import pyr_up_cols_first

    clamp = float(config.warp_clamp)

    def level_step(i, a, b, uc, vc):
        H, W = a.shape[-2], a.shape[-1]
        if (
            warp_lk_band(H, W, max_disp, pyrup=True) is not None
            and H % 2 == 0
            and W % 2 == 0
            and uc.shape[-2] * 2 == H
            and uc.shape[-1] * 2 == W
        ):
            return pyrup_warp_lk_pallas(
                a, b, uc, vc, max_disp=max_disp, clamp=clamp
            )
        upu = 2.0 * pyr_up_cols_first(uc)
        upv = 2.0 * pyr_up_cols_first(vc)
        wu = -jnp.clip(upu, -clamp, clamp)
        wv = -jnp.clip(upv, -clamp, clamp)
        du, dv = warp_solve(i, a, b, wu, wv)
        return du + upu, dv + upv

    return level_step


def coarse_to_fine_pyramids(
    pyr1,
    pyr2,
    *,
    config: FlowConfig = FlowConfig(),
    _need_images: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pyramidal LK over PREBUILT Gaussian pyramids (lists/tuples, level 0
    finest). Streaming video reuses each frame's pyramid for two
    consecutive pairs (pipeline/video.py), and batched mode solves N-2
    pairs from N single pyramids — `coarse_to_fine` is this plus
    `gaussian_pyramid` on both images.
    """
    if len(pyr1) != len(pyr2):
        raise ValueError(f"pyramid depths differ: {len(pyr1)} vs {len(pyr2)}")

    def solve(_i, a, b):
        return lucas_kanade(a, b, impl=config.impl)

    warp_impl, max_disp = resolve_warp_impl(config)

    def warp(_i, a, b, u, v):
        return symmetric_warp(
            a, b, u, v, quantize=config.quantize_warp, impl=warp_impl, max_disp=max_disp
        )

    warp_solve = _resolve_warp_solve(config, warp_impl, max_disp, solve, warp)
    level_step = _resolve_level_step(config, warp_impl, max_disp, warp_solve)
    return run_pyramid(
        list(pyr1), list(pyr2), solve, warp, config,
        warp_solve=warp_solve, level_step=level_step, need_images=_need_images,
    )


def coarse_to_fine_with_images(
    img1,
    img2,
    levels: Optional[int] = None,
    *,
    config: FlowConfig = FlowConfig(),
    _need_images: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pyramidal LK; returns (u, v, warped_img1, warped_img2).

    warped_img1/2 are the finest-level images after the last LEVEL warp —
    what the reference leaves in the caller's Mats via in-place pyramid
    mutation. Caveat (round-5 review): with `level_iters > 1` the extra
    refinement passes re-warp the ORIGINAL frames and discard the
    results, so the returned images reflect the first finest-level warp
    only (and with levels == 1 no warp at all). The reference has no
    level_iters, so the in-place contract is defined by the single-pass
    semantics; consumers of the warped frames (faithful_prev_diff) use
    reference mode, which rejects level_iters > 1.
    """
    levels = _validate_levels(levels, img1.shape, config)
    pyr1 = gaussian_pyramid(img1, levels, impl=config.pyr_impl)
    pyr2 = gaussian_pyramid(img2, levels, impl=config.pyr_impl)
    return coarse_to_fine_pyramids(
        pyr1, pyr2, config=config, _need_images=_need_images
    )


def coarse_to_fine(
    img1,
    img2,
    levels: Optional[int] = None,
    *,
    config: FlowConfig = FlowConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pyramidal dense LK flow; returns (u, v)."""
    u, v, _, _ = coarse_to_fine_with_images(
        img1, img2, levels, config=config, _need_images=False
    )
    return u, v
