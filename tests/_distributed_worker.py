"""Worker process for the real multi-process distributed test.

Launched (twice) by tests/test_distributed.py::test_two_process_runtime.
Each process owns 4 virtual CPU devices; together they form the 8-device
global runtime the single-process tests emulate. This executes the
multi-host path the reference never had (SURVEY.md P5):
`jax.distributed.initialize` -> global mesh -> per-host frame IO ->
`make_array_from_process_local_data` -> a sharded flow step + collectives.

Usage: python _distributed_worker.py <coordinator> <num_procs> <process_id>
Prints "WORKER_OK <pid>" on success; any assertion kills the exit code.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from optical_flow_tpu.parallel.distributed import (
        global_flow_mesh,
        host_local_frames,
        initialize_distributed,
        make_global_batch,
    )

    initialize_distributed(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 4 * num_procs, len(jax.devices())
    assert len(jax.local_devices()) == 4

    # Global mesh over every device of every process; frames ride the
    # cross-process axis so only frame-parallel work crosses the wire.
    mesh = global_flow_mesh(frames=num_procs * 2, rows=2, cols=1)

    # Deterministic "video": every host generates the same stream, then
    # keeps its round-robin share (host_local_frames) — the distributed
    # IO contract (each host runs its own decoder over the same file).
    r = np.random.RandomState(42)
    all_frames = [r.rand(64, 128).astype(np.float64) for _ in range(num_procs * 4)]
    local = list(
        host_local_frames(iter(all_frames), process_id=pid, process_count=num_procs)
    )
    assert len(local) == 4  # stream frames pid, pid+P, pid+2P, pid+3P
    assert np.array_equal(local[0], all_frames[pid])

    # Assemble global sharded batches from per-host shards: this host's
    # local pairs are (local[0], local[2]) and (local[1], local[3]).
    img1 = make_global_batch(local[:2], mesh)
    img2 = make_global_batch(local[2:], mesh)
    assert img1.shape == (num_procs * 2, 64, 128)

    from optical_flow_tpu.flow.lk import lucas_kanade_jnp
    from optical_flow_tpu.parallel.sharded_lk import sharded_lucas_kanade

    u, v = sharded_lucas_kanade(img1, img2, mesh)

    # Which global batch rows did THIS host's local rows land on? Derive
    # from the assembled array itself rather than assuming device order.
    my_rows = sorted({s.index[0].start for s in img1.addressable_shards})
    assert len(my_rows) == 2, my_rows
    # Oracle: unsharded single-process LK on this host's own pairs; each
    # host checks its addressable shards — bit-identity across the
    # process boundary, the same claim the 1-process tests make.
    oracle = {
        b: lucas_kanade_jnp(jnp.asarray(local[li]), jnp.asarray(local[li + 2]))
        for li, b in enumerate(my_rows)
    }
    checked = 0
    for shard_u, shard_v in zip(u.addressable_shards, v.addressable_shards):
        bsl, rsl, csl = shard_u.index
        for b in range(bsl.start or 0, bsl.stop if bsl.stop else u.shape[0]):
            ou, ov = oracle[b]
            np.testing.assert_array_equal(
                np.asarray(shard_u.data)[b - (bsl.start or 0)],
                np.asarray(ou)[rsl, csl],
            )
            np.testing.assert_array_equal(
                np.asarray(shard_v.data)[b - (bsl.start or 0)],
                np.asarray(ov)[rsl, csl],
            )
            checked += 1
    assert checked >= 2, checked

    # A cross-process collective: global mean of u via psum over the full
    # mesh (the reduction pattern the distributed BA Schur solve uses).
    # The mean is order-invariant, so every host can compute the oracle
    # over the whole stream without knowing the global row order.
    from functools import partial
    from jax.sharding import PartitionSpec as P

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("frames", "rows", None),
        out_specs=P(),
    )
    def global_mean(x):
        s = jnp.sum(x)
        s = jax.lax.psum(s, ("frames", "rows"))  # cols=1 in this mesh
        return (s / (u.shape[0] * u.shape[1] * u.shape[2]))[None]

    gm = float(np.asarray(jax.jit(global_mean)(u))[0])
    acc = []
    for p in range(num_procs):
        for li in range(2):
            a = jnp.asarray(all_frames[p + num_procs * li])
            bb = jnp.asarray(all_frames[p + num_procs * (li + 2)])
            acc.append(np.mean(np.asarray(lucas_kanade_jnp(a, bb)[0])))
    assert abs(gm - float(np.mean(acc))) < 1e-9, (gm, float(np.mean(acc)))

    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
