"""Sharded-fused pyramid on the real chip: correctness + device-span cost.

VERDICT r2 missing #2's done-criterion: the corrected-mode sharded fine
levels must execute the fused Pallas kernel, with a device-span check on
a 1x1x1 mesh within ~15% of the unsharded fused path (the tile is the
whole frame, so any overhead is pure sharding machinery: halo exchange
no-ops, scalar-prefetch origin, shard_map plumbing).

Also asserts bit-identity between the sharded and unsharded outputs on
the production config (the CPU suite pins this per-tile and per-level;
this is the compiled-on-hardware confirmation).

Run directly on the chip: python scripts/tpu_sharded_fused_check.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optical_flow_tpu.utils.compat import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from optical_flow_tpu.config import FlowConfig
from optical_flow_tpu.flow.coarse_to_fine import coarse_to_fine
from optical_flow_tpu.parallel import flow_mesh
from optical_flow_tpu.parallel.sharded_flow import sharded_coarse_to_fine


def sync(x):
    return float(np.asarray(x[..., :1, :1]).ravel()[0])


def main():
    print(f"device: {jax.devices()[0]}")
    mesh = flow_mesh(frames=1, rows=1, cols=1)
    H = W = 1080
    levels = 4
    cfg = FlowConfig(
        impl="auto", levels=levels, mode="corrected", warp_clamp=8.0,
        warp_impl="auto",
    )
    r = np.random.RandomState(0)
    base = (r.rand(H, W) * 2040.0).astype(np.float32)
    m = (r.rand(H, W) < 0.15).astype(np.float32)
    img1 = jnp.asarray(base * m)
    img2 = jnp.asarray(np.roll(base * m, 2, axis=-1))

    un = jax.jit(lambda a, b: coarse_to_fine(a, b, levels, config=cfg))
    sh = jax.jit(
        lambda a, b: sharded_coarse_to_fine(
            a, b, mesh, levels, config=cfg, min_tile=32
        )
    )

    u0, v0 = un(img1, img2)
    u1, v1 = sh(img1, img2)
    du = float(jnp.max(jnp.abs(u0 - u1)))
    dv = float(jnp.max(jnp.abs(v0 - v1)))
    print(f"max |sharded - unsharded|: u {du:.3e}  v {dv:.3e}")
    assert du == 0.0 and dv == 0.0, "sharded != unsharded on hardware"

    # NOTE: measure with use-once inputs for real numbers; identical
    # repeated dispatch here is fine for a RATIO of two same-shaped
    # programs both hitting the dispatch cache equally — but prefer
    # bench.py for absolute fps claims.
    def measure(fn, name):
        def mk(seed):
            rr = np.random.RandomState(seed)
            bb = (rr.rand(H, W) * 2040.0).astype(np.float32)
            mm = (rr.rand(H, W) < 0.15).astype(np.float32)
            return jnp.asarray(bb * mm), jnp.asarray(np.roll(bb * mm, 2, -1))

        iters = 20
        pairs = [mk(s) for s in range(3 + iters)]
        jax.block_until_ready(pairs)
        for p in pairs[:3]:
            sync(fn(*p)[0])
        import glob
        import gzip
        import json

        trace_dir = f"/tmp/sfc_trace_{name}"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            outs = [fn(*p) for p in pairs[3:]]
            sync(outs[-1][0])
        files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
        with gzip.open(files[0]) as f:
            tr = json.load(f)
        tot = sum(
            e.get("dur", 0)
            for e in tr.get("traceEvents", [])
            if e.get("ph") == "X" and e.get("name", "").startswith("jit_")
        )
        ms = tot / iters / 1e3
        print(f"{name:10s} {ms:7.3f} ms/frame (device spans)")
        return ms

    t_un = measure(un, "unsharded")
    t_sh = measure(sh, "sharded")
    ratio = t_sh / t_un
    print(f"sharded/unsharded device-time ratio: {ratio:.3f}")
    assert ratio < 1.15, f"sharded 1x1x1 overhead {ratio:.2f}x exceeds 15%"
    print("SHARDED FUSED CHECK OK")


if __name__ == "__main__":
    main()
