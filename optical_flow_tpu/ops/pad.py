"""Padding helpers for the last two (spatial) axes.

OpenCV's default border for filtering is BORDER_REFLECT_101
(``gfedcb|abcdefgh|gfedcba`` — the edge pixel is not repeated), which is
numpy/jnp ``mode='reflect'``. All ops here operate on arrays shaped
``(..., H, W)``; leading axes are batch.
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_last2(x, top: int, bottom: int, left: int, right: int, mode: str = "reflect"):
    """Pad the trailing two axes only."""
    widths = [(0, 0)] * (x.ndim - 2) + [(top, bottom), (left, right)]
    return jnp.pad(x, widths, mode=mode)
