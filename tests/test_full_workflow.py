"""The canonical end-to-end user journey from the reference docs
(usage.rst): raw sequence files -> summarize CLI -> count TSVs -> config-
driven training CLI -> results, entirely through the public entry points."""

import configparser
import os

import numpy as np
import pytest

from bear_tpu.counting.summarize import build_parser, main as summarize_main

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_summarize_then_train(tmp_path):
    from bear_tpu.models import train_bear_net

    rng = np.random.default_rng(11)
    # Two read files in one group; enough structure to train on.
    for fi in range(2):
        with open(tmp_path / f"reads_{fi}.fq", "w") as fh:
            for si in range(30):
                seq = "".join(rng.choice(list("ACGT"), 40))
                fh.write(f"@r{fi}_{si}\n{seq}\n+\n{'F'*40}\n")
    csv = tmp_path / "infiles.csv"
    csv.write_text("".join(f"{tmp_path}/reads_{fi}.fq,0,fq\n" for fi in range(2)))

    # Stage 1: summarize CLI.
    out_prefix = str(tmp_path / "counts" / "run")
    os.makedirs(tmp_path / "counts")
    args = build_parser().parse_args([str(csv), out_prefix, "-l", "4"])
    summarize_main(args)
    produced = [f for f in os.listdir(tmp_path / "counts") if "lag_4" in f]
    assert produced

    # Stage 2: train via the config CLI on the lag-4 output.
    config = configparser.ConfigParser()
    config.read_dict(
        {
            "general": {
                "out_folder": str(tmp_path / "model") + "*",
                "seed": "0",
                "precision": "float64",
            },
            "data": {
                "files_path": str(tmp_path / "counts"),
                "start_token": "run_lag_4",
                "sparse": "False",
                "num_ds": "1",
                "alphabet": "dna",
                "train_column": "0",
                "test_column": "0",
                "reference_column": "0",
            },
            "hyperp": {"lag": "4"},
            "train": {
                "train": "True",
                "epochs": "20",
                "batch_size": "512",
                "optimizer_name": "Adam",
                "learning_rate": "0.01",
                "train_ar": "False",
                "accumulation_steps": "1",
                "cache": "True",
                "restart": "False",
                "restart_path": "x",
            },
            "test": {"test": "True", "train_test": "True", "van_reg": "[1.0]"},
            "model": {"ar_func_name": "linear", "af_kwargs": "{}"},
            "results": {},
        }
    )
    exit_code, ll_van, perp_van = train_bear_net.main(config)
    assert exit_code == 1
    assert np.isfinite(ll_van).all()
    assert float(config["results"]["h"]) > 0
    # BEAR conditioned on its own training data must beat the prior-only AR.
    assert float(config["results"]["heldout_perplex_bear"]) <= float(
        config["results"]["heldout_perplex_ar"]
    )

    # Stage 3: score sequences against the trained model directory.
    from bear_tpu.inference import get_bear_probs_seqs

    out_dir = config["results"]["out_folder"]
    scores = get_bear_probs_seqs(out_dir, ["ACGTACGT"], 0, mc_samples=8)
    assert scores.shape[0] == 1 and np.isfinite(scores).all()


@pytest.mark.slow
def test_genome_example_small_smoke(tmp_path):
    # The genome-scale end-to-end example at CPU-friendly settings (also
    # pins the make_ar_func_cnn filter_width<=lag guard: lag 6 < the
    # example's default filter width 8 used to die in init()).
    import subprocess
    import sys

    # Drop PYTHONPATH too: a dev-environment sitecustomize (axon tunnel)
    # there overrides JAX_PLATFORMS=cpu and routes the subprocess to the
    # remote TPU, where queue delays blow the timeout; the example inserts
    # its own repo path.
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PYTHONPATH")}
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "genome_lag13.py"),
         "--genome-mb", "0.02", "--coverage", "2", "--lag", "6",
         "--epochs", "2", "--batch-size", "4096"],
        env=env, capture_output=True, text=True, timeout=500,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert "heldout perplexity" in p.stdout
