"""The bench's host-loop reconciliation gate (bench.py) — the logic that
declares the perf artifact's decomposition coherent. Unit-tested here
with synthetic legs so a regression in the gate math can't silently
bless (or damn) future artifacts."""

import importlib.util
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_mod", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_reconcile_producer_bound_coheres():
    bench = _load_bench()
    host_loop = {
        "legs_bgr": {
            "decode_s_per_chunk": 0.05,
            "h2d_s_per_chunk": 1.20,
            "compute_sync_s_per_chunk": 0.04,
            "chunk_period_s_median": 1.26,
        },
        "e2e_wall_clock_fps": 12.6,
    }
    rec = bench.reconcile_host_loop(host_loop, chunk=16)["bgr"]
    assert rec["bound"] == "producer(decode+h2d)"
    assert rec["coheres_within_25pct"] is True
    # predicted = 16 / (0.05 + 1.20); measured median = 16 / 1.26
    assert abs(rec["predicted_fps"] - 16 / 1.25) < 0.05
    assert abs(rec["median_over_predicted"] - (1.25 / 1.26)) < 0.02


def test_reconcile_flags_incoherent_legs():
    bench = _load_bench()
    host_loop = {
        "legs_gray": {
            "decode_s_per_chunk": 0.02,
            "h2d_s_per_chunk": 1.00,
            "compute_sync_s_per_chunk": 0.03,
            # median chunk period contradicts the legs by 2x
            "chunk_period_s_median": 0.50,
        },
        "e2e_wall_clock_fps_gray_decode": 32.0,
    }
    rec = bench.reconcile_host_loop(host_loop, chunk=16)["gray"]
    assert rec["coheres_within_25pct"] is False
    assert rec["median_over_predicted"] > 1.9


def test_reconcile_consumer_bound():
    bench = _load_bench()
    host_loop = {
        "legs_bgr": {
            "decode_s_per_chunk": 0.01,
            "h2d_s_per_chunk": 0.02,
            "compute_sync_s_per_chunk": 0.50,
            "chunk_period_s_median": 0.52,
        },
        "e2e_wall_clock_fps": 30.0,
    }
    rec = bench.reconcile_host_loop(host_loop, chunk=16)["bgr"]
    assert rec["bound"] == "consumer(compute+sync)"
    assert rec["coheres_within_25pct"] is True


def test_reconcile_skips_missing_modes():
    bench = _load_bench()
    assert bench.reconcile_host_loop({}) == {}
