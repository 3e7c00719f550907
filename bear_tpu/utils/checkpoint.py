"""Checkpointing with the reference's directory contract.

The reference saves ``{out_folder}/config.cfg`` + ``{out_folder}/results.pickle``
containing ``{'params': [tf.Variable, ...]}`` (train_bear_net.py:147-149) and
rehydrates with change_scope_params (bear_net.py:103-143). We keep the same
directory layout so load_bear-style consumers work, with params as plain
numpy arrays (framework-neutral, no TF), and additionally checkpoint the
optimizer state + step — which the reference loses on restart (SURVEY.md §5).
"""

from __future__ import annotations

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
    # Atomic replace: a crash mid-dump must not destroy the previous good
    # checkpoint (open('wb') truncates immediately).
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(payload, fh)
    os.replace(tmp, path)
    return path


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
