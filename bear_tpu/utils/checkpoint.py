"""Checkpointing with the reference's directory contract.

The reference saves ``{out_folder}/config.cfg`` + ``{out_folder}/results.pickle``
containing ``{'params': [tf.Variable, ...]}`` (train_bear_net.py:147-149) and
rehydrates with change_scope_params (bear_net.py:103-143). We keep the same
directory layout so load_bear-style consumers work, with params as plain
numpy arrays (framework-neutral, no TF), and additionally checkpoint the
optimizer state + step — which the reference loses on restart (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import os
import pickle
from typing import List, Optional

import numpy as np


def save_results(out_folder: str, params_list: List[np.ndarray], extra: Optional[dict] = None):
    """Write results.pickle with the reference's {'params': [...]} schema."""
    payload = {"params": [np.asarray(p) for p in params_list]}
    if extra:
        payload.update(extra)
    path = os.path.join(out_folder, "results.pickle")
    _atomic_pickle(path, payload)
    return path


def _atomic_pickle(path: str, payload) -> None:
    # Atomic replace: a crash mid-dump must not destroy the previous good
    # checkpoint (open('wb') truncates immediately). The tmp name is unique
    # PER PROCESS: in multi-process CLI runs every rank writes the shared
    # out_folder, and a shared tmp name would let rank B truncate rank A's
    # in-flight inode and install a corrupt file (or crash rank A's
    # os.replace with FileNotFoundError).
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        with open(tmp, "wb") as fh:
            pickle.dump(payload, fh)
        os.replace(tmp, path)
    finally:
        with contextlib.suppress(FileNotFoundError):
            if os.path.exists(tmp):
                os.remove(tmp)


def load_results(path_or_dir: str) -> dict:
    """Load a results.pickle (path to the file or its directory)."""
    path = path_or_dir
    if os.path.isdir(path):
        path = os.path.join(path, "results.pickle")
    with open(path, "rb") as fh:
        return pickle.load(fh)


def load_params_list(path_or_dir: str) -> List[np.ndarray]:
    results = load_results(path_or_dir)
    return [np.asarray(p) for p in results["params"]]


# --- mid-run training state (periodic checkpoints) -------------------------
#
# The reference can only restart from a previous COMPLETED run's pickle
# (train_bear_net.py:113-118, losing optimizer state); a preempted multi-hour
# run loses everything. train/train_streaming checkpoint
# {params, opt_state, applies_done} here every N blocks so a killed run
# resumes to a bit-identical trajectory.

TRAIN_STATE_FILE = "train_state.pickle"


def save_train_state(out_dir: str, state: dict) -> str:
    """Atomically write a mid-run training-state dict (host/numpy trees:
    callers convert device arrays before handing off). Keys used by the
    trainers: 'params' (list, params_to_list order), 'opt_state' (pytree),
    'applies_done' (int optimizer applies completed)."""
    path = os.path.join(out_dir, TRAIN_STATE_FILE)
    _atomic_pickle(path, state)
    return path


def load_train_state(out_dir: str) -> Optional[dict]:
    """Load a mid-run training state, or None when no checkpoint exists
    (a fresh run)."""
    path = os.path.join(out_dir, TRAIN_STATE_FILE)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fh:
        return pickle.load(fh)


def clear_train_state(out_dir: str) -> None:
    """Remove a completed run's mid-run state (the final results.pickle is
    the durable artifact; a stale train_state would make a RE-run with the
    same out_dir silently resume instead of starting fresh). Tolerates a
    concurrent remove: in multi-process CLI runs every rank clears the shared
    out_folder, so another rank may win the race between exists and remove."""
    path = os.path.join(out_dir, TRAIN_STATE_FILE)
    with contextlib.suppress(FileNotFoundError):
        os.remove(path)
