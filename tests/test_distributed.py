"""Distributed scaffolding + failure-guard tests (single process, 8 virtual
devices — the wire-free slice of the multi-host path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optical_flow_tpu.parallel.distributed import (
    global_flow_mesh,
    host_local_frames,
    make_global_batch,
)
from optical_flow_tpu.parallel.mesh import AXIS_FRAMES
from optical_flow_tpu.utils.guard import FlowGuard, NumericalFailure, StallFailure


def test_global_mesh_covers_all_devices():
    mesh = global_flow_mesh()
    assert mesh.size == len(jax.devices())
    assert set(mesh.axis_names) == {"frames", "rows", "cols"}


def test_host_local_frames_partition():
    frames = [np.full((2, 2), i) for i in range(10)]
    mine = list(host_local_frames(frames, process_id=1, process_count=3))
    assert [int(f[0, 0]) for f in mine] == [1, 4, 7]


def test_make_global_batch_sharded_over_frames():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = global_flow_mesh(frames=4, rows=2, cols=1)
    local = [np.random.rand(16, 16).astype(np.float32) for _ in range(4)]
    arr = make_global_batch(local, mesh)
    assert arr.shape == (4, 16, 16)
    np.testing.assert_array_equal(np.asarray(arr), np.stack(local))


def test_two_process_runtime():
    """The REAL multi-host path: two OS processes, each with 4 virtual CPU
    devices, joined by `jax.distributed.initialize` over a localhost
    coordinator. Exercises initialize_distributed / global_flow_mesh /
    host_local_frames / make_global_batch with process_count()==2 plus a
    sharded LK step and a cross-process psum (VERDICT r1 item 4 — this
    code had never executed with >1 process before)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(worker))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed workers timed out; partial: {outs}")
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} rc={rc}\nstdout:\n{out}\nstderr:\n{err[-4000:]}"
        assert f"WORKER_OK {pid}" in out, (out, err[-4000:])


def test_guard_detects_nan():
    g = FlowGuard()
    g.check(jnp.ones((8, 8)))  # clean
    with pytest.raises(NumericalFailure):
        g.check(jnp.asarray([[1.0, np.nan], [0.0, 1.0]]))


def test_guard_detects_inf():
    g = FlowGuard()
    with pytest.raises(NumericalFailure):
        g.check(jnp.asarray([np.inf, 1.0]))


def test_guard_stall_watchdog():
    g = FlowGuard(stall_timeout_s=0.01)
    import time

    time.sleep(0.05)
    with pytest.raises(StallFailure):
        g.check_stalled()
    g.heartbeat()
    g.check_stalled()  # no raise after heartbeat


def test_guard_watchdog_thread_interrupts():
    import time

    g = FlowGuard(stall_timeout_s=0.05)
    stop = g.start_watchdog(poll_s=0.05)
    try:
        with pytest.raises(KeyboardInterrupt):
            time.sleep(2.0)  # no heartbeats -> watchdog interrupts main
    finally:
        stop()


def test_guard_watchdog_stops_cleanly():
    g = FlowGuard(stall_timeout_s=60.0)
    stop = g.start_watchdog(poll_s=0.05)
    stop()  # no interrupt, no exception
