"""Shared scaffolding for the config-driven training CLIs
(train_bear_net / train_bear_ref): restart loading and results writing."""

from __future__ import annotations

import json
import os

import numpy as np


def load_restart(run):
    """(params_restart, opt_state_restart) from the run's restart config."""
    if not run.restart:
        return None, None
    from bear_tpu.utils.checkpoint import load_results

    results_prev = load_results(run.restart_path)
    params = [np.asarray(p) for p in results_prev["params"]]
    return params, results_prev.get("opt_state")


def write_eval_results(config, out_folder, prefix, out):
    """Write the 9 evaluation metrics into the config's [results] section
    (the reference's key schema, train_bear_net.py:162-195)."""
    (ll_ear, ll_ar, ll_van, perp_ear, perp_ar, perp_van, acc_ear, acc_ar, acc_van) = out
    config["results"][f"{prefix}perplex_BEAR"] = str(float(perp_ear))
    config["results"][f"{prefix}perplex_AR"] = str(float(perp_ar))
    config["results"][f"{prefix}perplex_BMM"] = json.dumps(np.asarray(perp_van).tolist())
    config["results"][f"{prefix}loglikelihood_BEAR"] = str(float(ll_ear))
    config["results"][f"{prefix}loglikelihood_AR"] = str(float(ll_ar))
    config["results"][f"{prefix}loglikelihood_BMM"] = json.dumps(np.asarray(ll_van).tolist())
    config["results"][f"{prefix}accuracy_BEAR"] = str(float(acc_ear))
    config["results"][f"{prefix}accuracy_AR"] = str(float(acc_ar))
    config["results"][f"{prefix}accuracy_BMM"] = json.dumps(np.asarray(acc_van).tolist())
    write_config(config, out_folder)


def write_config(config, out_folder):
    with open(os.path.join(out_folder, "config.cfg"), "w") as cw:
        config.write(cw)


def enable_compilation_cache(cache_dir: str | None = None):
    """Enable jax's persistent compilation cache (opt-in via argument or the
    BEAR_TPU_COMPILE_CACHE env var). Production counting/training jobs
    compile multi-minute XLA programs (the all-lags sorted counting kernel
    in particular); the cache makes restarts and repeated runs start in
    seconds. Safe no-op if the backend does not support it."""
    cache_dir = cache_dir or os.environ.get("BEAR_TPU_COMPILE_CACHE")
    if not cache_dir:
        return False
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
