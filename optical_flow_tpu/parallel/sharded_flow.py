"""Sharded coarse-to-fine pyramidal flow.

Parallel decomposition (the TPU answer to the reference's OpenMP pyramid,
ParallelBasicPyr.cpp:587-703 / SURVEY.md P1-P3):

- frame axis: batches of frame pairs are pure data parallelism,
- fine pyramid levels: the LK solve (the dominant cost, 5 window sums +
  solve per pixel) runs spatially tiled via `sharded_lucas_kanade` with
  exact 2-px halo exchange,
- fine-level warps: when `config.warp_clamp` bounds the flow, the remap
  runs spatially tiled too (`sharded_symmetric_warp` — zero-border halo of
  width ceil(clamp/2)+1, global-coordinate quantization for bit-exactness),
- coarse levels and the remaining glue (pyrDown/pyrUp, unclamped warps):
  run as global XLA ops. Under `jit` over the mesh, XLA lays them out from
  the operand shardings and inserts the needed collectives; the coarse
  levels are tiny (a 1080^2 frame's level-3 is 135^2) so replication there
  is the right call, not a compromise.

A level is tiled when its size divides the spatial mesh and tiles stay
>= MIN_TILE; otherwise it runs globally. Results are bit-identical to the
unsharded controller (tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax.sharding import Mesh

from optical_flow_tpu.config import FlowConfig
from optical_flow_tpu.flow.lk import lucas_kanade
from optical_flow_tpu.ops.pyramid import gaussian_pyramid, max_pyramid_levels, pyr_up
from optical_flow_tpu.ops.warp import symmetric_warp
from optical_flow_tpu.parallel.mesh import AXIS_COLS, AXIS_ROWS
from optical_flow_tpu.parallel.sharded_lk import sharded_lucas_kanade

MIN_TILE = 32  # don't spatially tile levels smaller than this per chip


def _tileable(shape, rows_n: int, cols_n: int, min_tile: int) -> bool:
    H, W = shape[-2], shape[-1]
    return (
        H % rows_n == 0
        and W % cols_n == 0
        and H // rows_n >= min_tile
        and W // cols_n >= min_tile
    )


def sharded_coarse_to_fine(
    img1,
    img2,
    mesh: Mesh,
    levels: Optional[int] = None,
    *,
    config: FlowConfig = FlowConfig(),
    min_tile: int = MIN_TILE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pyramidal dense LK with fine-level solves tiled over the mesh.

    img1/img2: (H, W) or (B, H, W) with B sharded over 'frames'.
    Semantics identical to flow.coarse_to_fine (same reference quirks:
    flow not doubled on pyrUp, symmetric half-flow warps).
    """
    rows_n = mesh.shape[AXIS_ROWS]
    cols_n = mesh.shape[AXIS_COLS]
    if levels is None:
        levels = config.levels or max_pyramid_levels(img1.shape)
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    if levels > max_pyramid_levels(img1.shape):
        raise ValueError(
            f"levels={levels} too deep for {img1.shape[-2]}x{img1.shape[-1]} "
            f"(max {max_pyramid_levels(img1.shape)})"
        )
    pyr1 = gaussian_pyramid(img1, levels)
    pyr2 = gaussian_pyramid(img2, levels)

    upu = upv = None
    for i in range(levels - 1, -1, -1):
        if _tileable(pyr1[i].shape, rows_n, cols_n, min_tile):
            u, v = sharded_lucas_kanade(pyr1[i], pyr2[i], mesh, impl=config.impl)
        else:
            u, v = lucas_kanade(pyr1[i], pyr2[i], impl=config.impl)
        if i != levels - 1:
            u = u + upu
            v = v + upv
        if i == 0:
            return u, v
        upu = pyr_up(u)  # flow deliberately NOT doubled (reference quirk)
        upv = pyr_up(v)
        wu, wv = upu, upv
        if config.warp_clamp is not None:
            wu = jnp.clip(wu, -config.warp_clamp, config.warp_clamp)
            wv = jnp.clip(wv, -config.warp_clamp, config.warp_clamp)
        halo_k = (
            None
            if config.warp_clamp is None
            else int(-(-config.warp_clamp // 2)) + 1
        )
        if (
            halo_k is not None
            and _tileable(pyr1[i - 1].shape, rows_n, cols_n, min_tile)
            # the warp halo must fit within one neighbour tile
            and halo_k
            <= min(pyr1[i - 1].shape[-2] // rows_n, pyr1[i - 1].shape[-1] // cols_n)
        ):
            from optical_flow_tpu.parallel.sharded_warp import sharded_symmetric_warp

            pyr1[i - 1], pyr2[i - 1] = sharded_symmetric_warp(
                pyr1[i - 1], pyr2[i - 1], wu, wv, mesh, config.warp_clamp,
                quantize=config.quantize_warp,
            )
        else:
            pyr1[i - 1], pyr2[i - 1] = symmetric_warp(
                pyr1[i - 1], pyr2[i - 1], wu, wv, quantize=config.quantize_warp
            )
    raise AssertionError("unreachable")
