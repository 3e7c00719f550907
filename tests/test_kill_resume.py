"""Kill-and-resume: a training process SIGKILLed mid-run resumes from its
periodic checkpoint to a bit-identical final trajectory (VERDICT r2 task 2).

The reference loses everything on preemption — it can only restart from a
previous COMPLETED run's pickle, without optimizer state
(reference models/train_bear_net.py:113-118)."""

import os
import signal
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
CHILD = os.path.join(HERE, "_kill_child.py")


def _run_child(ckpt_dir, out_npz, kill):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # the child needs no virtual device mesh
    return subprocess.run(
        [sys.executable, CHILD, str(ckpt_dir), str(out_npz), str(int(kill))],
        env=env, capture_output=True, text=True, timeout=600,
    )


@pytest.mark.slow
def test_sigkill_then_resume_bit_identical(tmp_path):
    # Uninterrupted reference run (own checkpoint dir).
    d_ref = tmp_path / "ref"
    d_ref.mkdir()
    ref_npz = tmp_path / "ref.npz"
    p = _run_child(d_ref, ref_npz, kill=False)
    assert p.returncode == 0, p.stderr[-2000:]

    # Killed run: dies by real SIGKILL mid-stream.
    d = tmp_path / "ck"
    d.mkdir()
    out_npz = tmp_path / "out.npz"
    p = _run_child(d, out_npz, kill=True)
    assert p.returncode == -signal.SIGKILL, (p.returncode, p.stderr[-2000:])
    assert not out_npz.exists()  # it really died before finishing
    state_file = d / "train_state.pickle"
    assert state_file.exists()  # ...but after durable checkpoints

    # Resume in a fresh process from the on-disk state only.
    p = _run_child(d, out_npz, kill=False)
    assert p.returncode == 0, p.stderr[-2000:]

    ref = np.load(ref_npz)
    got = np.load(out_npz)
    assert set(ref.files) == set(got.files)
    for k in ref.files:
        if k == "losses":
            continue  # resumed losses cover only post-kill applies
        np.testing.assert_array_equal(ref[k], got[k], err_msg=k)
    # The resumed loss tail equals the uninterrupted run's tail exactly.
    n = len(got["losses"])
    assert 0 < n < len(ref["losses"])
    np.testing.assert_array_equal(ref["losses"][-n:], got["losses"])
