"""Image loading helpers.

OpenCV's ``imread(path, 0)`` decodes JPEG and converts to gray with the
fixed-point BT.601 weights ((R*4899 + G*9617 + B*1868 + 8192) >> 14). JPEG
decoding itself must also match libjpeg output; PIL uses libjpeg too, so
PIL-decode + fixed-point gray reproduces cv2.imread(path, 0) exactly for
baseline JPEGs. We prefer cv2 when present (same library the reference
linked), else PIL.
"""

from __future__ import annotations

import numpy as np


def bgr_to_gray_u8(bgr: np.ndarray) -> np.ndarray:
    """OpenCV CV_BGR2GRAY on uint8: fixed-point BT.601 with 15-bit
    coefficients (R 9798, G 19235, B 3735) — verified exact vs cv2 5.0."""
    b = bgr[..., 0].astype(np.int64)
    g = bgr[..., 1].astype(np.int64)
    r = bgr[..., 2].astype(np.int64)
    return ((r * 9798 + g * 19235 + b * 3735 + (1 << 14)) >> 15).astype(np.uint8)


def imread_gray(path) -> np.ndarray:
    from optical_flow_tpu.utils.compat import warm_compile_client

    warm_compile_client()  # before cv2's codec libraries load (see compat.py)
    try:
        import cv2

        img = cv2.imread(str(path), 0)
        if img is None:
            raise FileNotFoundError(path)
        return img
    except ImportError:
        from PIL import Image

        rgb = np.asarray(Image.open(path).convert("RGB"))
        return bgr_to_gray_u8(rgb[..., ::-1])
