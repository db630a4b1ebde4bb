#!/bin/bash
# One orchestrated hardware session: run this as soon as the TPU runtime
# responds (see the wedge notes in .claude/skills/verify). Ordered so the
# most important artifacts land first if the chip wedges again mid-way:
#
#   1. bench.py            — fresh headline measurement + re-warms the
#                            persistent cache for the CURRENT kernels
#                            (the round-3 kernel refactor invalidated the
#                            cached bench programs)
#   2. kernel shapes check — Mosaic lowering of all three Pallas kernels
#                            across shape-geometry classes (invisible to
#                            interpret-mode CI)
#   3. sharded fused check — sharded == unsharded bit-identity compiled
#                            on hardware + 1x1x1-mesh device-span ratio
#   4. pyr_down shootout   — polyphase vs MXU banded-matmul decimation
#   5. interleave timing   — transpose-sandwich cost (the gate for the
#                            parity-split rewrite, ROADMAP)
#
# Each step gets its own timeout and log; a hung step is killed and the
# session continues (logs under /tmp/tpu_session_*).

set -u
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "/tmp/tpu_session_${name}.log" 2>&1
  local rc=$?
  tail -5 "/tmp/tpu_session_${name}.log" | grep -v WARNING
  echo "--- $name rc=$rc"
}

# shapes FIRST: the round-3 kernel refactor (scalar-prefetch grids, tile
# modes) must prove it lowers before bench commits to a fresh compile of
# the same programs (a lowering failure would burn bench's watchdog)
run shapes       900 python scripts/tpu_kernel_shapes_check.py
# bench grew host-loop + roofline + sweep companions in round 5: a full
# healthy run is ~25-40 min on the tunnel
run bench       3000 python bench.py
run shardedfused 900 python scripts/tpu_sharded_fused_check.py
run multitile    900 python scripts/tpu_sharded_fused_check.py --multi-tile --artifact MULTITILE_SWEEP.json
run hostloop    1200 python scripts/tpu_host_loop_diag.py
run pyrdown      900 python scripts/tpu_pyrdown_experiments.py
run interleave   600 python scripts/tpu_interleave_poc.py --time
run sparselk     900 python scripts/tpu_sparse_lk_check.py
run viba         900 python scripts/tpu_vi_ba_check.py
run serve        600 python scripts/tpu_serve_check.py
run vpurate      600 python scripts/tpu_vpu_rate_probe.py
run resize       900 python scripts/tpu_resize_experiments.py
echo "=== session done; logs in /tmp/tpu_session_*.log ==="
echo "After a jax/libtpu UPGRADE also run: python scripts/tpu_vmem_calibration.py"
echo "(refresh _VMEM_PER_ROW in kernels/warp_lk_kernel.py + a fresh-cache"
echo " compile sweep — the compile cache can mask bands that no longer fit;"
echo " see ROADMAP.md round-4 note)"
