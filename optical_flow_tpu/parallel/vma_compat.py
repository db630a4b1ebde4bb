"""Version gate for the shard_map varying-mesh-axes (vma) checker.

JAX 0.9's shard_map vma checker rejects `pallas_call` outputs: the call's
out_shape carries no varying-mesh-axes annotation, so an output produced
per-tile from sharded inputs fails the `out_specs` variance check even
though every element is owner-computed from owner-held data (halo-free
stencils / pre-exchanged halos; observed on TPU 2026-08-19, ROADMAP.md
round-3 hardware notes — invisible on the CPU CI path where impl resolves
to jnp).

Instead of a blanket `check_vma=False` (VERDICT r3 weak #4: the workaround
would silently outlive the bug and suppress a real checker), this module
probes the installed JAX once — tracing a minimal pallas_call-under-
shard_map repro with the checker ON — and disables the checker only while
the probe still fails. The day upstream annotates pallas_call outputs, the
probe passes and every shard_map in parallel/ gets the checker back
automatically. Both branches are pinned by tests/test_parallel.py::
test_vma_gate_tracks_installed_jax.
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=1)
def vma_accepts_pallas() -> bool:
    """True when the installed JAX's vma checker accepts pallas_call
    outputs under shard_map (i.e. the upstream bug is fixed).

    The failure is a trace-time check, so the probe only traces
    (eval_shape) — no kernel executes and no backend compile happens.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.sharding import Mesh, PartitionSpec as P

    def _copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def _body(x):
        return pl.pallas_call(
            _copy_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=True,
        )(x)

    try:
        mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
        fn = jax.shard_map(
            _body, mesh=mesh, in_specs=P("x"), out_specs=P("x")
        )  # checker ON (default)
        jax.eval_shape(fn, jnp.zeros((8, 128), jnp.float32))
        return True
    except Exception:
        return False


def vma_kwargs() -> dict:
    """shard_map keyword overrides for bodies that call pallas_call.

    {} (checker on) when the installed JAX accepts pallas_call outputs;
    {"check_vma": False} only while the upstream bug reproduces.
    """
    return {} if vma_accepts_pallas() else {"check_vma": False}
