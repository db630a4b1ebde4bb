"""Compile-and-run the fused kernels over a shape grid on the REAL TPU.

Mosaic lowering failures (zero-width slices, tile-alignment, VMEM
overflow) are invisible to interpret-mode CI — the W=128-multiple
zero-width-reflect-slice bug compiled nowhere but hardware. Run this as
part of the verify protocol after touching kernels/.

Exit 0 = every shape compiled and executed finitely.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from optical_flow_tpu.utils.compat import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from optical_flow_tpu.flow.lk import lucas_kanade
from optical_flow_tpu.ops.pyramid import pyr_down
from optical_flow_tpu.kernels.warp_lk_kernel import (
    pyrup_warp_lk_pallas,
    warp_lk_band,
    warp_lk_pallas,
)

# sweep the geometry classes: W % 128 == 0, W < 128, odd W, H % 8 != 0,
# tall bands, multi-band, batch, and the production ladder
SHAPES = [
    (64, 128), (64, 256), (448, 640), (56, 64), (50, 40), (61, 37),
    (122, 40), (128, 130), (1024, 40), (200, 200), (400, 400),
    (1080, 1080), (540, 540), (270, 270), (16, 1280),
]

rc = 0
for H, W in SHAPES:
    r = np.random.RandomState(0)
    a = jnp.asarray(r.rand(H, W).astype(np.float32))
    b = jnp.asarray(np.roll(np.asarray(a), 1, -1))
    u = jnp.asarray((r.rand(H, W) * 4 - 2).astype(np.float32))
    band = warp_lk_band(H, W, 4)
    try:
        ul, vl = lucas_kanade(a, b, impl="pallas")
        ok_lk = bool(jnp.isfinite(ul).all())
    except Exception as e:
        ok_lk = f"FAIL {str(e)[:80]}"
    try:
        pd = pyr_down(a, impl="pallas")
        pd_ref = pyr_down(a, impl="mxu")
        ok_pd = bool(
            jnp.isfinite(pd).all()
            and jnp.abs(pd - pd_ref).max() < 1e-3
        )
    except Exception as e:
        ok_pd = f"FAIL {str(e)[:80]}"
    if band is None:
        print(f"{H}x{W}: band=None lk={ok_lk} (warp kernels skipped)")
        continue
    try:
        du, dv = warp_lk_pallas(a, b, u, u, max_disp=4, clamp=8.0)
        ok_w = bool(jnp.isfinite(du).all())
    except Exception as e:
        ok_w = f"FAIL {str(e)[:80]}"
    ok_p = "skip(odd)"
    if H % 2 == 0 and W % 2 == 0:
        uc = jnp.asarray((r.rand(H // 2, W // 2) * 4 - 2).astype(np.float32))
        try:
            uo, vo = pyrup_warp_lk_pallas(a, b, uc, uc, max_disp=4, clamp=8.0)
            ok_p = bool(jnp.isfinite(uo).all())
        except Exception as e:
            ok_p = f"FAIL {str(e)[:80]}"
    # TILE MODE (round 3): halo-extended inputs + scalar-prefetch origin.
    # Run the top-left tile of a 2x2 grid and pin bit-identity against the
    # full-frame kernel's region — the property the sharded pyramid
    # rests on, now proven ON HARDWARE per geometry class.
    ok_t = "skip"
    th, tw = H // 2, W // 2
    halo = 4 + 2
    if H % 2 == 0 and W % 2 == 0 and warp_lk_band(th, tw, 4) is not None \
            and halo <= min(th, tw):
        try:
            pad = np.zeros((H + 2 * halo, W + 2 * halo), np.float32)

            def ext(x, r0, c0):
                pp = pad.copy()
                pp[halo:halo + H, halo:halo + W] = np.asarray(x)
                return jnp.asarray(
                    pp[r0:r0 + th + 2 * halo, c0:c0 + tw + 2 * halo]
                )

            du_t, dv_t = warp_lk_pallas(
                ext(a, 0, 0), ext(b, 0, 0), ext(u, 0, 0), ext(u, 0, 0),
                max_disp=4, clamp=8.0, halo=halo, origin=(0, 0),
                global_hw=(H, W),
            )
            same = np.array_equal(np.asarray(du_t), np.asarray(du)[:th, :tw])
            ok_t = bool(same and jnp.isfinite(du_t).all())
        except Exception as e:
            ok_t = f"FAIL {str(e)[:80]}"
    line = (f"{H}x{W} band={band}: lk={ok_lk} pyrdown={ok_pd} "
            f"warp_lk={ok_w} pyrup={ok_p} tile={ok_t}")
    print(line, flush=True)
    if "FAIL" in line or "False" in line:
        rc = 1
sys.exit(rc)
