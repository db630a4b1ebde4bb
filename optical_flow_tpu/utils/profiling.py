"""Timing and profiling harness (reference C18 analogue).

The reference instruments with gettimeofday printf timers around each
algorithm segment (ParallelVideoPyr.cpp:37-42, serial.cpp:204-261). Here:

- `Timer`: wall-clock segment timer; pass the segment's outputs via
  `sync=` to block_until_ready them at segment end so the measurement
  covers COMPLETED device work — without it (the default) a segment
  around jitted code measures async dispatch only;
- `device_loop_time`: robust per-call device timing — runs the function in
  an on-device fori_loop with perturbed inputs (the tunnel runtime caches
  repeated identical dispatches, so naive repeat-timing lies);
- `trace`: context manager around jax.profiler for xprof dumps;
- `flow_roofline`: bytes/flops model for the fused LK level against peak
  HBM bandwidth — the speed-of-light target the Pallas kernel chases.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


@dataclass
class Timer:
    """Named segment timers: with t.segment('solve'): ..."""

    segments: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def segment(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.segments[name] = self.segments.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.segments.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {1e3 * total:9.3f} ms total  {1e3 * total / n:9.3f} ms/call x{n}")
        return "\n".join(lines)


def device_loop_time(fn: Callable, args, iters: int = 30) -> float:
    """Seconds per call of fn(*args), measured as an on-device loop.

    fn must take arrays and return arrays; the first argument is perturbed
    per iteration to defeat dispatch-level caching, and outputs are reduced
    to a scalar so nothing leaves the device between iterations.
    """

    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(a[0] + i * jnp.float32(1e-7), *a[1:])
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    jax.block_until_ready(loop(*args))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(loop(*args))
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/optical_flow_tpu_trace"):
    """jax.profiler trace context; view with xprof/tensorboard."""
    with jax.profiler.trace(log_dir):
        yield log_dir


def device_seconds_from_trace(trace_dir: str, fn_name: str,
                              expected_calls: int) -> Optional[float]:
    """Sum device-span durations of a jitted program from a jax.profiler
    trace directory; None if the trace is unusable (caller falls back to
    wall clock). The ONE copy of the trace-event summer bench.py and the
    scripts/tpu_*.py probes share."""
    import glob
    import gzip
    import json

    try:
        files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
        if not files:
            return None
        total_us = 0.0
        calls = 0
        for path in files:
            with gzip.open(path) as f:
                tr = json.load(f)
            for e in tr.get("traceEvents", []):
                n = e.get("name", "")
                if e.get("ph") == "X" and n.startswith("jit_") and fn_name in n:
                    total_us += e.get("dur", 0)
                    calls += 1
        if calls < expected_calls:  # trace missed executions
            return None
        return total_us / 1e6
    except Exception:
        return None


def stage_roofline(
    bytes_moved: float,
    flops: float,
    measured_us: float,
    *,
    hbm_gbps: float = 819.0,
    practical_vpu_tflops: float = 1.0,
) -> Dict[str, float]:
    """Achieved-vs-ceiling fractions for one pipeline stage (VERDICT r4 #2).

    bytes_moved: the stage's HBM floor — the bytes that MUST cross HBM if
    XLA fused the whole stage perfectly (stage inputs + stage outputs;
    internal temporaries assumed VMEM-resident). flops: estimated VPU
    flops. measured_us: the stage's measured device time.

    Returns the two ceilings (sol_hbm_us, sol_vpu_us) and the achieved
    fractions pct_of_hbm_roofline / pct_of_practical_vpu (100 = the stage
    runs AT that ceiling; both are lower bounds on true efficiency when
    the floor under-counts unavoidable traffic). `bound` names the larger
    ceiling — the one worth optimizing against."""
    t_mem_us = bytes_moved / (hbm_gbps * 1e3)
    t_vpu_us = flops / (practical_vpu_tflops * 1e6)
    measured_us = max(measured_us, 1e-9)
    return {
        "measured_us": round(measured_us, 2),
        "sol_hbm_us": round(t_mem_us, 2),
        "sol_vpu_us": round(t_vpu_us, 2),
        "pct_of_hbm_roofline": round(100.0 * t_mem_us / measured_us, 1),
        "pct_of_practical_vpu": round(100.0 * t_vpu_us / measured_us, 1),
        "bound": "memory" if t_mem_us >= t_vpu_us else "compute",
    }


def io_bytes(fn, *args) -> int:
    """HBM floor of a jittable stage: input bytes + output bytes (via
    jax.eval_shape — no execution). The perfect-fusion lower bound
    `stage_roofline` consumes."""
    import numpy as np

    out = jax.eval_shape(fn, *args)
    leaves = jax.tree_util.tree_leaves(args) + jax.tree_util.tree_leaves(out)
    return int(
        sum(
            np.prod(l.shape) * np.dtype(l.dtype).itemsize
            for l in leaves
            if hasattr(l, "shape")
        )
    )


def flow_roofline(
    h: int,
    w: int,
    *,
    hbm_gbps: float = 819.0,  # v5e; v5p ~2765
    vpu_tflops: float = 3.9,  # nominal packed f32 elementwise peak
    practical_vpu_tflops: float = 1.0,  # measured on shifted-stencil kernels
) -> Dict[str, float]:
    """Speed-of-light model for one fused dense-LK level.

    HBM traffic: 2 image reads + 2 flow writes, 4 B/px each (everything
    else stays in VMEM). Compute: ~70 VPU flops/px (gradients 20, products
    5, window sums 30, solve ~15).

    Two compute ceilings are reported: the nominal packed-VPU peak, and a
    PRACTICAL rate measured on this codebase's kernels — shifted-operand
    stencil chains sustain ~0.9-1.0 f32 Tflop/s on v5e (LK kernel: 85 us
    at ~70 ops/px; fused warp+LK: 229 us at ~174 ops/px — both within
    ~15% of 1 Tflop/s), well under the nominal peak. Treat `sol_*` (built
    on the practical rate) as the realistic target; `sol_nominal_us` is
    the aspirational number that would require Mosaic to pack the
    shifted-slice arithmetic as densely as plain elementwise chains.
    """
    px = h * w
    bytes_moved = 16.0 * px
    flops = 70.0 * px
    t_mem = bytes_moved / (hbm_gbps * 1e9)
    t_nominal = flops / (vpu_tflops * 1e12)
    t_compute = flops / (practical_vpu_tflops * 1e12)
    t = max(t_mem, t_compute)
    return {
        "bytes": bytes_moved,
        "flops": flops,
        "t_mem_us": 1e6 * t_mem,
        "t_compute_us": 1e6 * t_compute,
        "sol_nominal_us": 1e6 * max(t_mem, t_nominal),
        "sol_us": 1e6 * t,
        "sol_fps": 1.0 / t,
        "bound": "memory" if t_mem >= t_compute else "compute",
    }
