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


def multi_tile_origin_sweep():
    """VERDICT r3 #3: execute the ACTUAL per-tile fused program with >1
    tile on the one available chip. shard_map cannot make a 2x2 mesh from
    one device, so this drives warp_lk_pallas (and the fused inter-level
    pyrup variant) directly over a 2x2 grid of halo-extracted tiles with
    real global origins — the exact tensors sharded_warp_lk feeds each
    shard (zero-border halos, origin scalar-prefetch, global dims) — and
    asserts BIT-identity of every tile against the full-frame kernel,
    compiled by Mosaic on hardware (the CPU suite runs these same feeds
    only in interpret mode). Covers origins (0,0), (0,W/2), (H/2,0),
    (H/2,W/2).
    """
    from optical_flow_tpu.kernels.warp_lk_kernel import (
        pyrup_coarse_halo,
        pyrup_warp_lk_pallas,
        warp_lk_pallas,
    )

    results = {}
    C, clamp = 8, 8.0
    halo = C + 2

    # ---- warp+LK tile mode at the flagship geometry (1080^2, 540 tiles)
    H = W = 1080
    th, tw = H // 2, W // 2
    r = np.random.RandomState(3)
    img1 = (r.rand(H, W) * 255).astype(np.float32)
    img2 = np.roll(img1, 2, axis=1) + r.rand(H, W).astype(np.float32)
    u = np.clip(r.randn(H, W) * 3, -clamp, clamp).astype(np.float32)
    v = np.clip(r.randn(H, W) * 3, -clamp, clamp).astype(np.float32)

    full = jax.jit(
        lambda a, b, uu, vv: warp_lk_pallas(
            a, b, uu, vv, max_disp=C, clamp=clamp, negate=False
        )
    )
    u0, v0 = full(*(jnp.asarray(x) for x in (img1, img2, u, v)))
    u0, v0 = np.asarray(u0), np.asarray(v0)

    def ext(x, r0, c0):
        # zero-border halo extension: exactly exchange_halo(border='zero')
        # materialized from the full frame (the shard_map feed is pinned
        # against this construction in tests/test_parallel.py)
        p = np.zeros((H + 2 * halo, W + 2 * halo), np.float32)
        p[halo : halo + H, halo : halo + W] = x
        return jnp.asarray(p[r0 : r0 + th + 2 * halo, c0 : c0 + tw + 2 * halo])

    tile_fn = jax.jit(
        lambda a, b, uu, vv, org: warp_lk_pallas(
            a, b, uu, vv, max_disp=C, clamp=clamp, negate=False,
            halo=halo, origin=(org[0], org[1]), global_hw=(H, W),
        )
    )
    worst = 0.0
    for ti in range(2):
        for tj in range(2):
            r0, c0 = ti * th, tj * tw
            du, dv = tile_fn(
                ext(img1, r0, c0), ext(img2, r0, c0),
                ext(u, r0, c0), ext(v, r0, c0),
                jnp.asarray([r0, c0], jnp.int32),
            )
            derr = max(
                float(np.max(np.abs(np.asarray(du) - u0[r0:r0 + th, c0:c0 + tw]))),
                float(np.max(np.abs(np.asarray(dv) - v0[r0:r0 + th, c0:c0 + tw]))),
            )
            print(f"warp_lk tile origin ({r0},{c0}): max|tile-full| = {derr:.3e}")
            worst = max(worst, derr)
    assert worst == 0.0, f"warp_lk multi-tile mismatch on hardware: {worst}"
    results["warp_lk_1080_2x2_max_abs_diff"] = worst

    # ---- fused inter-level (pyrUp+warp+LK) tile mode; th % 8 == 0
    H2 = W2 = 1024
    th2, tw2 = H2 // 2, W2 // 2
    Hc, Wc = H2 // 2, W2 // 2
    hc, wc = th2 // 2, tw2 // 2
    ocr = pyrup_coarse_halo(C)
    img1b = (r.rand(H2, W2) * 255).astype(np.float32)
    img2b = np.roll(img1b, 2, axis=1) + r.rand(H2, W2).astype(np.float32)
    ucb = (r.randn(Hc, Wc) * 2).astype(np.float32)
    vcb = (r.randn(Hc, Wc) * 2).astype(np.float32)

    fullp = jax.jit(
        lambda a, b, uu, vv: pyrup_warp_lk_pallas(
            a, b, uu, vv, max_disp=C, clamp=clamp
        )
    )
    up0, vp0 = fullp(*(jnp.asarray(x) for x in (img1b, img2b, ucb, vcb)))
    up0, vp0 = np.asarray(up0), np.asarray(vp0)

    def pyrup_ext_full(x):
        # full-frame padflow central block: cv::pyrUp's asymmetric border
        # one sample deep, zeros beyond (tests/test_pyrup_warp_lk.py)
        buf = np.zeros((Hc + 2 * ocr, Wc + 4), np.float32)
        buf[ocr : ocr + Hc, 2 : 2 + Wc] = x
        buf[ocr - 1, 2 : 2 + Wc] = x[1]
        buf[ocr + Hc, 2 : 2 + Wc] = x[Hc - 1]
        strip = buf[ocr - 1 : ocr + Hc + 1, 2 : 2 + Wc]
        buf[ocr - 1 : ocr + Hc + 1, 1] = strip[:, 1]
        buf[ocr - 1 : ocr + Hc + 1, 2 + Wc] = strip[:, Wc - 1]
        return buf

    ue, ve = pyrup_ext_full(ucb), pyrup_ext_full(vcb)

    def ext2(x, r0, c0):
        p = np.zeros((H2 + 2 * halo, W2 + 2 * halo), np.float32)
        p[halo : halo + H2, halo : halo + W2] = x
        return jnp.asarray(p[r0 : r0 + th2 + 2 * halo, c0 : c0 + tw2 + 2 * halo])

    tilep = jax.jit(
        lambda a, b, uu, vv, org: pyrup_warp_lk_pallas(
            a, b, uu, vv, max_disp=C, clamp=clamp,
            halo=halo, origin=(org[0], org[1]), global_hw=(H2, W2),
        )
    )
    worst2 = 0.0
    for ti in range(2):
        for tj in range(2):
            r0, c0 = ti * th2, tj * tw2
            cr0, cc0 = ti * hc, tj * wc
            du, dv = tilep(
                ext2(img1b, r0, c0), ext2(img2b, r0, c0),
                jnp.asarray(ue[cr0 : cr0 + hc + 2 * ocr, cc0 : cc0 + wc + 4]),
                jnp.asarray(ve[cr0 : cr0 + hc + 2 * ocr, cc0 : cc0 + wc + 4]),
                jnp.asarray([r0, c0], jnp.int32),
            )
            derr = max(
                float(np.max(np.abs(np.asarray(du) - up0[r0:r0 + th2, c0:c0 + tw2]))),
                float(np.max(np.abs(np.asarray(dv) - vp0[r0:r0 + th2, c0:c0 + tw2]))),
            )
            print(f"pyrup_warp_lk tile origin ({r0},{c0}): max|tile-full| = {derr:.3e}")
            worst2 = max(worst2, derr)
    assert worst2 == 0.0, f"pyrup multi-tile mismatch on hardware: {worst2}"
    results["pyrup_warp_lk_1024_2x2_max_abs_diff"] = worst2
    print("MULTI-TILE ORIGIN SWEEP OK (8 tiles, all bit-identical)")
    return results


def main():
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--multi-tile", action="store_true",
        help="run ONLY the 2x2 multi-tile origin sweep (VERDICT r3 #3)",
    )
    ap.add_argument("--artifact", default=None, help="write results JSON here")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}")
    if args.multi_tile:
        res = multi_tile_origin_sweep()
        if args.artifact:
            res["device"] = str(jax.devices()[0])
            with open(args.artifact, "w") as f:
                json.dump(res, f, indent=1)
        return
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
