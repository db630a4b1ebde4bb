"""Host-loop decomposition diagnostic (VERDICT r4 #1).

The round-4 artifact's legs contradict its own e2e measurements in BOTH
directions: gray e2e (47.19 fps) EXCEEDS its claimed H2D ceiling (35.5),
and BGR e2e (1.35 fps) is 9x BELOW its slowest leg (11.8). This script
measures each leg honestly so BENCH_r05's decomposition predicts the
measured e2e numbers:

1. SUSTAINED pipelined device_put bandwidth at the REAL chunk shapes
   (gray + BGR, several chunk sizes) — queue many puts, drain once.
   The old probe drained each buffer synchronously, paying a full
   tunnel round-trip per buffer, so it understated bandwidth.
2. A per-leg profile of ONE steady-state BGR chunk iteration inside the
   real run_chunked loop: decode+stack span, device_put-to-ready span,
   dispatch span, sync span — finds the missing 9x.

Run on the TPU host: python scripts/tpu_host_loop_diag.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from optical_flow_tpu.utils.compat import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402


def sustained_h2d_mbps(shape, n_bufs=8):
    """Pipelined H2D: queue n_bufs device_puts back to back, drain ONCE
    at the end. This is what the prefetch thread actually does (puts are
    async; the queue keeps the link busy), unlike the old per-buffer
    drain which serialized a round trip into every transfer."""
    xs = [np.random.randint(0, 255, shape, np.uint8) for _ in range(n_bufs)]
    # warm: one put + drain
    a = jax.device_put(xs[0])
    a.block_until_ready()
    float(np.asarray(a.ravel()[0]))
    t0 = time.perf_counter()
    arrs = [jax.device_put(x) for x in xs]
    for a in arrs:
        a.block_until_ready()
    # force REAL completion of the last buffer (tunnel acks early)
    float(np.asarray(arrs[-1].ravel()[-1]))
    dt = time.perf_counter() - t0
    total_mb = sum(x.nbytes for x in xs) / 1e6
    return total_mb / dt


def serial_h2d_mbps(shape, n_bufs=4):
    """The OLD probe's formulation: drain every buffer with a fetch."""
    xs = [np.random.randint(0, 255, shape, np.uint8) for _ in range(n_bufs)]
    a = jax.device_put(xs[0])
    float(np.asarray(a.ravel()[0]))
    t0 = time.perf_counter()
    for x in xs:
        a = jax.device_put(x)
        float(np.asarray(a.ravel()[0]))
    dt = time.perf_counter() - t0
    return sum(x.nbytes for x in xs) / 1e6 / dt


def _bench_clip(size=(720, 1280), frames=240):
    """Same synthetic clip the bench builds (bench.py _bench_clip)."""
    clip = os.path.join("/tmp", f"oft_bench_clip_{size[0]}p_{frames}.mp4")
    if os.path.exists(clip):
        return clip
    import cv2

    H, W = size
    r = np.random.RandomState(0)
    basef = (r.rand(H, W, 3) * 60 + 60).astype(np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    wtr = cv2.VideoWriter(
        clip + ".tmp.mp4", cv2.VideoWriter_fourcc(*"mp4v"), 30, (W, H)
    )
    if not wtr.isOpened():
        # never rename a headerless stub into the shared cache path —
        # bench.py keys its clip cache on existence alone
        raise RuntimeError("no mp4 encoder available")
    for t in range(frames):
        f = np.roll(basef, 2 * t, axis=1)
        cxb, cyb = (100 + 3 * t) % W, (200 + 2 * t) % H
        blob = np.exp(-(((xx - cxb) ** 2 + (yy - cyb) ** 2) / (2 * 60.0 ** 2)))
        wtr.write(np.clip(f + blob[..., None] * 160, 0, 255).astype(np.uint8))
    wtr.release()
    os.rename(clip + ".tmp.mp4", clip)
    return clip


def profile_bgr_chunk_loop(chunk=16, max_frames=96, gray=False):
    """Per-leg spans of the real chunked host loop, one dict per chunk."""
    from optical_flow_tpu.config import VideoConfig
    from optical_flow_tpu.io.video_reader import read_frames
    from optical_flow_tpu.pipeline.video import VideoPipeline

    clip = _bench_clip()
    pipe = VideoPipeline(VideoConfig.fast())

    spans = []
    carry = None
    frames = read_frames(clip, max_frames=max_frames, gray=gray)
    it = iter(frames)
    done = False
    while not done:
        t0 = time.perf_counter()
        buf = []
        for _ in range(chunk):
            try:
                buf.append(np.ascontiguousarray(next(it)))
            except StopIteration:
                done = True
                break
        if len(buf) < chunk:
            break
        stacked = np.stack(buf)
        t_decode = time.perf_counter() - t0

        t0 = time.perf_counter()
        dev = jax.device_put(stacked)
        dev.block_until_ready()
        t_put_ack = time.perf_counter() - t0
        t0 = time.perf_counter()
        # force REAL arrival: fetch one byte back
        float(np.asarray(dev.ravel()[-1:])[0])
        t_put_drain = time.perf_counter() - t0

        t0 = time.perf_counter()
        if carry is None:
            res, carry = pipe._chunk_first(dev)
        else:
            res, carry = pipe._chunk_step(carry, dev)
        t_dispatch = time.perf_counter() - t0

        t0 = time.perf_counter()
        float(np.asarray(res.u[..., :1, :1]).ravel()[0])
        t_sync = time.perf_counter() - t0

        spans.append(
            {
                "decode_s": round(t_decode, 3),
                "put_ack_s": round(t_put_ack, 3),
                "put_drain_s": round(t_put_drain, 3),
                "dispatch_s": round(t_dispatch, 3),
                "sync_s": round(t_sync, 3),
                "total_s": round(
                    t_decode + t_put_ack + t_put_drain + t_dispatch + t_sync, 3
                ),
            }
        )
    return spans


def main():
    out = {"device": str(jax.devices()[0])}

    shapes = {
        "gray_chunk16_720p": ((16, 720, 1280), 6),
        "bgr_frame_720p": ((720, 1280, 3), 6),
        "bgr_chunk4_720p": ((4, 720, 1280, 3), 4),
        "bgr_chunk16_720p": ((16, 720, 1280, 3), 3),
    }
    if not os.environ.get("SKIP_H2D"):
        out["h2d_sustained_mbps"] = {}
        for k, (s, n) in shapes.items():
            out["h2d_sustained_mbps"][k] = round(sustained_h2d_mbps(s, n), 1)
            print(json.dumps({k: out["h2d_sustained_mbps"][k]}), flush=True)
        out["h2d_serial_mbps_oldprobe"] = round(
            serial_h2d_mbps((16, 720, 1280, 3), 2), 1
        )

        print(json.dumps(out, indent=2), flush=True)

    out["bgr_chunk_spans"] = profile_bgr_chunk_loop(max_frames=64, gray=False)
    print(json.dumps({"bgr_chunk_spans": out["bgr_chunk_spans"]}, indent=2),
          flush=True)
    out["gray_chunk_spans"] = profile_bgr_chunk_loop(max_frames=64, gray=True)
    print(json.dumps({"gray_chunk_spans": out["gray_chunk_spans"]}, indent=2),
          flush=True)

    with open("/tmp/host_loop_diag.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
