"""Per-pixel 2x2 structure-tensor (Cramer) solve (reference C7 tail).

From LKof.cpp:170-174:

    det = S(fx^2)*S(fy^2) - S(fx*fy)^2
    u   = (S(fx*fy)*S(fy*ft) - S(fy^2)*S(fx*ft)) / det
    v   = (S(fx*ft)*S(fx*fy) - S(fx^2)*S(fy*ft)) / det

with OpenCV ``cv::divide`` semantics: anything divided by 0 is 0 (this is
what masks the singular structure tensors on the zero border ring and in
textureless regions — a critical parity detail).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def safe_divide(num, den):
    """num / den with den == 0 -> 0 (cv::divide semantics).

    Only zero denominators are masked; nonfinite inputs propagate, exactly
    as they would through cv::divide.
    """
    ok = den != 0
    return jnp.where(ok, num, 0) / jnp.where(ok, den, 1)


def solve_lk_2x2(sfx2, sfy2, sfxfy, sfxft, sfyft) -> Tuple[jnp.ndarray, jnp.ndarray]:
    det = sfx2 * sfy2 - sfxfy * sfxfy
    u = safe_divide(sfxfy * sfyft - sfy2 * sfxft, det)
    v = safe_divide(sfxft * sfxfy - sfx2 * sfyft, det)
    return u, v
