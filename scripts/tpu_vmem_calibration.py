"""Measure the fused warp+LK kernels' TRUE scoped-VMEM cost per band row.

The Mosaic compiler's actual scoped allocation for kernels/warp_lk_kernel
is 1.4-2.7x the analytic buffer estimate, with a width-dependent shape no
multiplicative factor captures (round-4 finding: fresh compiles of bands
the old estimator chose OOM the 16 MiB scoped limit — masked by the
persistent compile cache serving executables built under older tooling).

This probe forces an over-large band at every padded-width class
(Wc = round_up(W, 128), the only width the kernel sees) and reads the
compiler's ACTUAL allocation out of the OOM error message. Per-row cost
grows (mildly) with rows, so a per-row figure measured at LARGE rows is a
safe upper bound for smaller bands. Results are baked into
warp_lk_tiling's _VMEM_PER_ROW tables; re-run after a jax/libtpu upgrade
and refresh the tables if the numbers moved.

Run directly on the chip: python scripts/tpu_vmem_calibration.py
"""

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# a fresh cache dir: every probe must reach the compiler, not the cache
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/vmem_calibration_cache"

import jax
import jax.numpy as jnp

import optical_flow_tpu.kernels.warp_lk_kernel as K

# rows chosen to overshoot 16M comfortably at every width (~20-30M)
TARGET_BYTES = 24 << 20


def probe(kind: str, W: int, band: int):
    H = 2 * band  # Hp = H exactly: two bands, no pad rows
    r = np.random.RandomState(0)
    img1 = jnp.asarray((r.rand(H, W) * 255).astype(np.float32))
    img2 = jnp.asarray((r.rand(H, W) * 255).astype(np.float32))
    uc = jnp.asarray((r.randn(H // 2, W // 2) * 2).astype(np.float32))
    u = jnp.asarray(np.clip(r.randn(H, W) * 3, -8, 8).astype(np.float32))
    orig = K.warp_lk_tiling
    K.warp_lk_tiling = lambda h, w, c, pyrup=False, _b=band: (2 * _b, _b)
    try:
        if kind == "plain":
            out = jax.jit(
                lambda a, b, c_, d: K.warp_lk_pallas(
                    a, b, c_, d, max_disp=8, clamp=8.0, negate=False
                )
            )(img1, img2, u, u)
        else:
            out = jax.jit(
                lambda a, b, c_, d: K.pyrup_warp_lk_pallas(
                    a, b, c_, d, max_disp=8, clamp=8.0
                )
            )(img1, img2, uc, uc)
        float(np.asarray(out[0][:1, :1])[0, 0])
        return None, band + 24  # fits: need a bigger band to read the size
    except Exception as e:  # noqa: BLE001 - compile OOM carries the number
        m = re.search(r"size ([0-9.]+)M", str(e))
        if m is None:
            raise
        rows = band + 24  # 2R at max_disp=8
        return float(m.group(1)) * (1 << 20) / rows, rows
    finally:
        K.warp_lk_tiling = orig


def main():
    print(f"device: {jax.devices()[0]}")
    results = {}
    for kind in ("pyrup", "plain"):
        results[kind] = {}
        for Wc in range(256, 2049, 128):
            W = Wc  # any W with this Wc sees identical buffer geometry
            # initial band guess from the analytic estimate x typical factor
            Wp = Wc + 128
            analytic = 4 * (4 * Wp + Wp // 2 + 16 * (Wc + 4))
            guess = analytic * (2.1 if kind == "pyrup" else 1.45)
            band = max(48, int(TARGET_BYTES / guess - 24) // 8 * 8)
            per_row, rows = probe(kind, W, band)
            while per_row is None:  # fit: double the band until it OOMs
                band *= 2
                per_row, rows = probe(kind, W, band)
            results[kind][Wc] = per_row
            print(
                f"{kind} Wc={Wc} (rows {rows}): {per_row / 1024:.1f} KB/row",
                flush=True,
            )
    print("\n_VMEM_PER_ROW tables (bytes/row, paste into warp_lk_kernel.py):")
    for kind, tab in results.items():
        rows = ", ".join(f"{wc}: {int(v)}" for wc, v in sorted(tab.items()))
        print(f"  '{kind}': {{{rows}}}")


if __name__ == "__main__":
    main()
