"""Serving-layer overhead on hardware: direct VideoPipeline.push loop vs
the same frames through FlowServer/FlowClient over localhost TCP.

Both loops run the identical compiled pipeline on the identical frames,
so the delta is exactly the serving layer (socket framing + JSON + the
per-frame device->host sync the serving contract requires). On the
tunneled dev box the absolute fps is tunnel-bound; the OVERHEAD
(ms/frame) is the honest, transferable number.

Prints one JSON line:
  {"direct_fps":..., "served_fps":..., "overhead_ms_per_frame":...,
   "proc": [h, w], "frames": N}
"""

import json
import time

import numpy as np

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from optical_flow_tpu.utils.compat import enable_persistent_cache

enable_persistent_cache()

from optical_flow_tpu.config import VideoConfig
from optical_flow_tpu.pipeline.serve import FlowClient, FlowServer
from optical_flow_tpu.pipeline.video import VideoPipeline

H = W = 256
PROC = (256, 256)
N = 60


def frames():
    r = np.random.RandomState(5)
    base = (r.rand(H, W, 3) * 255).astype(np.uint8)
    return [np.roll(base, 3 * i, axis=1) for i in range(N)]


def main():
    fs = frames()

    # direct loop (warm first)
    pipe = VideoPipeline(VideoConfig.fast(size=PROC))
    for f in fs[:4]:
        r = pipe.push(f)
    if r is not None:
        int(r.gesture.votes)  # force the device sync the server also pays
    pipe.reset()
    t0 = time.perf_counter()
    for f in fs:
        r = pipe.push(f)
        if r is not None:
            int(r.gesture.votes)
    direct_s = time.perf_counter() - t0

    srv = FlowServer(port=0)
    srv.start_background()
    try:
        with FlowClient(srv.address) as c:  # warm the pooled pipeline
            c.start_stream(H, W, proc_size=PROC)
            for f in fs[:4]:
                c.push(f)
            c.end_stream()
        with FlowClient(srv.address) as c:
            hello = c.start_stream(H, W, proc_size=PROC)
            assert hello["ok"] and hello["pooled"], hello
            t0 = time.perf_counter()
            for f in fs:
                c.push(f)
            served_s = time.perf_counter() - t0
            c.end_stream()
    finally:
        srv.shutdown()

    print(
        json.dumps(
            {
                "direct_fps": round(N / direct_s, 2),
                "served_fps": round(N / served_s, 2),
                "overhead_ms_per_frame": round(
                    (served_s - direct_s) / N * 1e3, 3
                ),
                "proc": list(PROC),
                "frames": N,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
