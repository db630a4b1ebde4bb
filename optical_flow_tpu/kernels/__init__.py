"""Pallas TPU kernels for the hot path.

The reference's hot loops (SURVEY.md section 3: get_Sum9_Mat x5, filter2D x6,
per-pixel solve) all fuse into a single VMEM pass here: one kernel computes
gradients -> products -> 3x3 window sums -> 2x2 Cramer solve per row-band,
reading each input pixel once from HBM and writing only (u, v).
"""

from optical_flow_tpu.kernels.lk_kernel import lucas_kanade_pallas
from optical_flow_tpu.kernels.warp_lk_kernel import (
    pyrup_warp_lk_pallas,
    warp_lk_band,
    warp_lk_pallas,
)

__all__ = [
    "lucas_kanade_pallas",
    "pyrup_warp_lk_pallas",
    "warp_lk_band",
    "warp_lk_pallas",
]
