"""Stream a video (file, camera, or pipe source) to a running FlowServer.

The serving counterpart of the reference's live loop
(ParallelVideoPyr.cpp:730-905): the server process owns the device and
keeps the compiled pipeline hot; this client just decodes and ships
frames, printing one JSON line per result.

Start a server first:
    python -m optical_flow_tpu serve --port 7070
then:
    python examples/serve_stream.py --input testdata-or-video.mp4 \
        --host 127.0.0.1 --port 7070 --frames 32
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from optical_flow_tpu.io.video_reader import read_frames
from optical_flow_tpu.pipeline.serve import FlowClient


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="video file, device:N, or pipe:WxH[@FPS]:PATH")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7070)
    ap.add_argument("--unix", default=None)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--size", type=int, default=256,
                    help="server-side processing size")
    ap.add_argument("--preset", default="fast", choices=["fast", "faithful"])
    args = ap.parse_args()

    address = args.unix if args.unix else (args.host, args.port)
    client = None
    n = 0
    for frame in read_frames(args.input, max_frames=args.frames):
        if client is None:
            client = FlowClient(address)
            hello = client.start_stream(
                frame.shape[0], frame.shape[1],
                channels=frame.shape[2] if frame.ndim == 3 else 1,
                preset=args.preset, proc_size=(args.size, args.size),
            )
            print(json.dumps(hello), flush=True)
        print(json.dumps(client.push(frame)), flush=True)
        n += 1
    if client is not None:
        print(json.dumps(client.end_stream()), flush=True)
        client.close()
    if n == 0:
        sys.exit("no frames decoded")


if __name__ == "__main__":
    main()
