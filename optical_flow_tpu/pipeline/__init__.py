"""Video/gesture application pipeline (reference L4).

The reference's flagship program is a webcam gesture tracker
(ParallelVideoPyr.cpp:730-905): per frame it preprocesses (resize, blur,
gray, temporal diff, threshold, Sobel, morphology — C11), runs pyramidal LK
on consecutive preprocessed frames, and detects a moving hand from the flow
magnitude (C12). Here that is a jitted per-step function plus a host-side
frame loop, with optional frame batching (DP over time).
"""

from optical_flow_tpu.pipeline.preprocess import (
    dilate3x3,
    erode3x3,
    gaussian_blur,
    preprocess_frame,
    resize_cubic,
    sobel3,
    temporal_diff,
    threshold_tozero,
)
from optical_flow_tpu.pipeline.gesture import GestureResult, detect_gesture
from optical_flow_tpu.pipeline.video import VideoPipeline

__all__ = [
    "GestureResult",
    "VideoPipeline",
    "detect_gesture",
    "dilate3x3",
    "erode3x3",
    "gaussian_blur",
    "preprocess_frame",
    "resize_cubic",
    "sobel3",
    "temporal_diff",
    "threshold_tozero",
]
