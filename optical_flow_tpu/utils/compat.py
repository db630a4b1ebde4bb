"""Environment compatibility shims.

warm_compile_client(): the TPU runtime's compile path lazily initializes
native state on the FIRST jit compilation; if video-codec shared libraries
(libavcodec — loaded by `import cv2` or our native decoder) are already in
the process at that point, the initialization deadlocks (observed on the
axon/v5e runtime: every thread parked on futexes, compile never returns;
warming one compile first makes all later compiles safe, including with
open captures). Every decoder entry point in this package calls this
before touching codec libraries. Idempotent, ~0.5 s once, no-op off-TPU
and no-op if jax was never imported.
"""

from __future__ import annotations

import os
import sys

_warmed = False
_cache_enabled = False


def cache_dir() -> str:
    """The persistent compile-cache directory enable_persistent_cache
    uses (env override, else <repo>/.xla_cache) — the ONE resolution both
    the cache setup and any cache-contents probe (bench.py) must share."""
    return os.environ.get(
        "OPTICAL_FLOW_TPU_CACHE",
        os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            ".xla_cache",
        ),
    )


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache so repeated runs (bench,
    CLI, tests on TPU) reuse compiled executables instead of re-compiling.

    On the tunneled TPU runtime the remote compile service can wedge
    machine-wide after killed/hung compiles; a persistent cache makes bench
    re-runs immune to that failure mode (every program compiled once
    before is served from disk). Harmless elsewhere. Call BEFORE the first
    jit compilation. Returns the cache dir (or None if jax is unavailable).
    """
    global _cache_enabled
    if path is None:
        path = cache_dir()
    if _cache_enabled:
        return path
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default thresholds skip small programs; cache everything — the
        # wedge failure mode doesn't care how trivial the compile is
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _cache_enabled = True
        return path
    except Exception:
        return None


def warm_compile_client() -> None:
    global _warmed
    if _warmed:
        return
    # _warmed is set at the SUCCESS exits below, not here: a failed TPU
    # probe must not permanently disable the deadlock protection for the
    # rest of the process (round-5 review — the operator frees the
    # device, retries, and the no-op warmup would let the first real
    # compile hit exactly the futex deadlock this function prevents)
    jax = sys.modules.get("jax")
    if jax is None:
        # jax not imported yet: importing codecs first is fine as long as
        # jax's first compile happens... before codec threads? Empirically
        # the deadlock needs the codec LIBRARIES loaded, so warm defensively.
        try:
            import jax  # noqa: F811
        except Exception:
            _warmed = True  # no jax at all: nothing to ever warm
            return
    # On a WEDGED TPU runtime, even jax.default_backend() (device
    # acquisition) hangs forever, futex-parked in C where signals can't
    # reach — and this function runs at every decoder entry point, so a
    # wedged chip would turn "read a video" into a silent hang. Decide
    # from CONFIG/ENV (no backend touch) whether a TPU could be in play,
    # and if so probe the runtime in a SUBPROCESS (killable) first,
    # failing fast with a pointer to the CPU backend.
    cfg_plat = str(getattr(jax.config, "jax_platforms", None) or "")
    env_plat = os.environ.get("JAX_PLATFORMS", "")
    chosen = cfg_plat or env_plat
    cpu_only = chosen != "" and not any(
        p in chosen for p in ("tpu", "axon")
    ) and "cpu" in chosen
    if cpu_only:
        _warmed = True
        return  # CPU-forced (tests, --cpu): nothing to warm, nothing to hang
    try:
        if os.environ.get("OPTICAL_FLOW_SKIP_TPU_PROBE") != "1":
            import subprocess

            enable_persistent_cache()  # the probe compiles through disk too
            code = (
                "from optical_flow_tpu.utils.compat import "
                "enable_persistent_cache; enable_persistent_cache(); "
                "import jax, jax.numpy as jnp; "
                "print(float(jnp.sum(jnp.ones((8, 128)))))"
            )
            try:
                subprocess.run(
                    [sys.executable, "-c", code], timeout=120, check=True,
                    capture_output=True,
                    cwd=os.path.dirname(
                        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                    ),
                )
            except Exception as e:
                # surface the probe's own stderr: "wedged runtime" (hang)
                # and "device held by another process" (error) need
                # different operator responses
                probe_err = ""
                stderr = getattr(e, "stderr", None)
                if stderr:
                    tail = stderr.decode("utf-8", "replace").strip().splitlines()
                    probe_err = " Probe stderr tail: " + " | ".join(tail[-3:])
                raise RuntimeError(
                    "TPU runtime unresponsive (device acquisition or compile "
                    "hung in a probe subprocess) — decoding would deadlock "
                    "this process. Use the CPU backend "
                    "(jax.config.update('jax_platforms', 'cpu') or --cpu) "
                    "until the runtime recovers." + probe_err
                ) from e
        if jax.default_backend() != "tpu":
            _warmed = True
            return
        import jax.numpy as jnp

        # a computation unlikely to be cache-hit from user code
        jax.jit(lambda x: (x * 1.0000001 + 0.0000002).sum())(
            jnp.full((3, 3), 0.123456)
        ).block_until_ready()
        _warmed = True
    except RuntimeError:
        raise  # the unresponsive-runtime error must reach the user
    except Exception:
        _warmed = True  # warming is best-effort; never block IO on it
