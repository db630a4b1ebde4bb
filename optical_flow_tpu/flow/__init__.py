"""L2/L3: dense Lucas–Kanade solver and coarse-to-fine pyramid controller."""

from optical_flow_tpu.flow.lk import lucas_kanade
from optical_flow_tpu.flow.coarse_to_fine import (
    coarse_to_fine,
    coarse_to_fine_with_images,
)

__all__ = ["lucas_kanade", "coarse_to_fine", "coarse_to_fine_with_images"]
