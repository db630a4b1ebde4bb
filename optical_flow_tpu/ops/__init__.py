"""L0/L1: dense-array ops with OpenCV-faithful numerics.

These are the building blocks the reference gets from OpenCV (filter2D,
pyrDown/pyrUp, remap, Sobel, GaussianBlur, morphology, resize, cvtColor,
normalize — SURVEY.md L0) plus its own flow kernels (get_fx/fy/ft,
get_Sum9_Mat — SURVEY.md L1), re-implemented as pure jnp functions. Every op
preserves the input dtype, is shape-static and jit-friendly, and is verified
against an OpenCV oracle in tests/.
"""

from optical_flow_tpu.ops.gradients import spatio_temporal_gradients
from optical_flow_tpu.ops.window import sum3x3_interior
from optical_flow_tpu.ops.solve import solve_lk_2x2, safe_divide
from optical_flow_tpu.ops.pyramid import (
    pyr_down,
    pyr_up,
    gaussian_pyramid,
    max_pyramid_levels,
)
from optical_flow_tpu.ops.warp import (
    remap_bilinear,
    symmetric_warp,
)

__all__ = [
    "spatio_temporal_gradients",
    "sum3x3_interior",
    "solve_lk_2x2",
    "safe_divide",
    "pyr_down",
    "pyr_up",
    "gaussian_pyramid",
    "max_pyramid_levels",
    "remap_bilinear",
    "symmetric_warp",
]
