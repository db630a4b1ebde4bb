"""Process-kill chaos test: SIGKILL the streaming pipeline mid-stream and
verify checkpoint resume reproduces the uninterrupted run bit for bit
(VERDICT r1 item 9 — extends test_checkpoint.py's in-process resume to a
real crash)."""

import os
import signal
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_chaos_worker.py")


def _run_worker(workdir, *extra, wait_for=None, timeout=240):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(WORKER))
    p = subprocess.Popen(
        [sys.executable, WORKER, str(workdir), *extra],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=env,
    )
    if wait_for is None:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err[-3000:]}"
        return out
    # stream stdout until the marker, then SIGKILL — the crash lands at a
    # deterministic point but the process gets no chance to clean up
    lines = []
    for line in p.stdout:
        lines.append(line)
        if wait_for in line:
            os.kill(p.pid, signal.SIGKILL)
            break
    else:
        p.kill()
        pytest.fail(f"marker {wait_for!r} never appeared:\n{''.join(lines)}")
    p.wait(timeout=30)
    assert p.returncode == -signal.SIGKILL
    return "".join(lines)


def _collect(workdir):
    out = {}
    for name in sorted(os.listdir(workdir)):
        if name.startswith("flow_") and name.endswith(".npz"):
            with np.load(os.path.join(workdir, name)) as z:
                out[name] = (z["u"].copy(), z["v"].copy())
    return out


def test_sigkill_resume_bit_identical(tmp_path):
    clean = tmp_path / "clean"
    chaos = tmp_path / "chaos"
    clean.mkdir()
    chaos.mkdir()

    # uninterrupted reference run
    out = _run_worker(clean)
    assert "STREAM_DONE" in out
    ref = _collect(clean)
    assert len(ref) == 7  # 9 frames, 2 warm-up

    # crashed run: SIGKILL right after frame 4's checkpoint
    _run_worker(chaos, "--kill-after", "4", wait_for="READY_TO_DIE")
    partial = _collect(chaos)
    assert 0 < len(partial) < len(ref)

    # resume from the checkpoint left by the corpse
    out = _run_worker(chaos, "--resume")
    assert "RESUMED_AT 5" in out and "STREAM_DONE" in out
    resumed = _collect(chaos)

    assert set(resumed) == set(ref)
    for name in ref:
        np.testing.assert_array_equal(resumed[name][0], ref[name][0], err_msg=name)
        np.testing.assert_array_equal(resumed[name][1], ref[name][1], err_msg=name)


def test_sigkill_during_warmup_resumes(tmp_path):
    """Crash before any flow result exists (warm-up frames only): resume
    must still reproduce the full run."""
    chaos = tmp_path / "chaos"
    chaos.mkdir()
    _run_worker(chaos, "--kill-after", "1", wait_for="READY_TO_DIE")
    assert _collect(chaos) == {}
    out = _run_worker(chaos, "--resume")
    assert "RESUMED_AT 2" in out and "STREAM_DONE" in out
    assert len(_collect(chaos)) == 7

    clean = chaos.parent / "clean2"
    clean.mkdir()
    _run_worker(clean)
    ref = _collect(clean)
    resumed = _collect(chaos)
    for name in ref:
        np.testing.assert_array_equal(resumed[name][0], ref[name][0], err_msg=name)
