"""Scoring CLI (bear-tpu-score): variants/seqs subcommands and the device
SNV route (BearServer.from_model_dir), all through the public entry point.

The reference exposes scoring only as a library (get_var_probs.py); these
tests pin the CLI contract and its parity with that library path.
"""

import configparser
import os

import numpy as np
import pytest

from bear_tpu.inference.score_cli import main as score_main


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """A tiny trained linear BEAR model dir (lag 2, float64)."""
    from bear_tpu.counting.summarize import build_parser, main as summarize_main
    from bear_tpu.models import train_bear_net

    tmp_path = tmp_path_factory.mktemp("snvmodel")
    rng = np.random.default_rng(3)
    with open(tmp_path / "reads.fq", "w") as fh:
        for si in range(25):
            seq = "".join(rng.choice(list("ACGT"), 30))
            fh.write(f"@r{si}\n{seq}\n+\n{'F'*30}\n")
    csv = tmp_path / "infiles.csv"
    csv.write_text(f"{tmp_path}/reads.fq,0,fq\n")
    os.makedirs(tmp_path / "counts")
    args = build_parser().parse_args(
        [str(csv), str(tmp_path / "counts" / "run"), "-l", "2"]
    )
    summarize_main(args)

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
                "start_token": "run_lag_2",
                "sparse": "False",
                "num_ds": "1",
                "alphabet": "dna",
                "train_column": "0",
                "test_column": "0",
                "reference_column": "0",
            },
            "hyperp": {"lag": "2"},
            "train": {
                "train": "True",
                "epochs": "5",
                "batch_size": "64",
                "optimizer_name": "Adam",
                "learning_rate": "0.01",
                "train_ar": "False",
                "accumulation_steps": "1",
                "cache": "True",
                "restart": "False",
                "restart_path": "x",
            },
            "test": {"test": "False", "train_test": "False", "van_reg": "[1.0]"},
            "model": {"ar_func_name": "linear", "af_kwargs": "{}"},
            "results": {},
        }
    )
    train_bear_net.main(config)
    return config["results"]["out_folder"]


def test_snv_cli_matches_get_bear_probs(model_dir, capsys):
    # The device route's MAP deltas equal the analysis path's BEAR column.
    from bear_tpu.inference import get_bear_probs

    wt = "ACGTACGTTG"
    snvs = ["A0C", "G2T", "T3A", "G9A"]
    rc = score_main(["snv", model_dir, wt] + snvs)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "variant\tBEAR"
    got = {row.split("\t")[0]: float(row.split("\t")[1]) for row in out[1:]}
    assert list(got) == snvs

    want = get_bear_probs(model_dir, wt, np.array(snvs), 0, get_map=True)
    # get_map column order: AR first, then BEAR, then BMM vans.
    for i, v in enumerate(snvs):
        np.testing.assert_allclose(got[v], want[i, 1], rtol=1e-4, atol=1e-5)


def test_snv_cli_all_grid(model_dir, capsys):
    wt = "ACGTAC"
    rc = score_main(["snv", model_dir, wt, "--all"])
    assert rc == 0
    rows = capsys.readouterr().out.strip().splitlines()[1:]
    assert len(rows) == len(wt) * 3  # every position x 3 alternates
    labels = [r.split("\t")[0] for r in rows]
    assert f"{wt[0]}0C" in labels and all(l[0] != l[-1] for l in labels)
    vals = np.array([float(r.split("\t")[1]) for r in rows])
    assert np.isfinite(vals).all()


def test_snv_cli_sampled_runs(model_dir, capsys):
    rc = score_main(
        ["snv", model_dir, "ACGTAC", "A0G", "--sample", "--mc-samples", "3"]
    )
    assert rc == 0
    rows = capsys.readouterr().out.strip().splitlines()[1:]
    assert len(rows) == 1 and np.isfinite(float(rows[0].split("\t")[1]))


def test_snv_cli_rejects_bad_variants(model_dir):
    with pytest.raises(SystemExit):
        score_main(["snv", model_dir, "ACGTAC", "C0T"])  # wt mismatch
    with pytest.raises(SystemExit):
        score_main(["snv", model_dir, "ACGTAC", "AC0GT"])  # not an SNV
    with pytest.raises(SystemExit):
        score_main(["snv", model_dir, "ACGTAC"])  # nothing to score


def test_variants_and_seqs_subcommands(model_dir, capsys):
    rc = score_main(
        ["variants", model_dir, "ACGTACGT", "A0C", "G2T", "--map"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("target\tAR\tBEAR")
    assert len(out) == 3
    host_bear = {
        r.split("\t")[0]: float(r.split("\t")[2]) for r in out[1:]
    }

    # The batched device route (--device, handles indels too) gives the
    # same BEAR MAP deltas as the host path.
    rc = score_main(
        ["variants", model_dir, "ACGTACGT", "A0C", "G2T", "GT2CA",
         "T3", "--map", "--device"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "target\tBEAR"
    dev = {r.split("\t")[0]: float(r.split("\t")[1]) for r in out[1:]}
    assert len(dev) == 4 and np.isfinite(list(dev.values())).all()
    for v in ("A0C", "G2T"):
        np.testing.assert_allclose(dev[v], host_bear[v], rtol=1e-4, atol=1e-5)

    rc = score_main(["seqs", model_dir, "ACGTACGT", "TTTT", "--map"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3
    bear_col = out[0].split("\t").index("BEAR")
    vals = [float(r.split("\t")[bear_col]) for r in out[1:]]
    assert all(np.isfinite(v) and v < 0 for v in vals)


def test_table_from_dataset_roundtrip():
    # Densifying a counter's own dataset reproduces its table exactly.
    from bear_tpu.counting.engine import ReadChunk, TransitionCounter
    from bear_tpu.inference import table_from_dataset

    rng = np.random.default_rng(7)
    lag = 3
    mat = rng.integers(0, 4, (60, 20)).astype(np.int8)
    tc = TransitionCounter(lags=[lag], n_groups=1)
    tc.add_chunk(
        ReadChunk(mat, np.full(60, 20, np.int32), np.zeros(60, np.int32),
                  np.ones(60, bool), np.zeros(60, np.int32))
    )
    ds = tc.to_dataset(lag)
    table = table_from_dataset(ds, lag)
    np.testing.assert_array_equal(table, np.asarray(tc.tables[lag][0]))


def test_table_from_dataset_lag_mismatch():
    from bear_tpu.counting.engine import ReadChunk, TransitionCounter
    from bear_tpu.inference import table_from_dataset

    tc = TransitionCounter(lags=[2], n_groups=1)
    mat = np.zeros((4, 8), np.int8)
    tc.add_chunk(
        ReadChunk(mat, np.full(4, 8, np.int32), np.zeros(4, np.int32),
                  np.ones(4, bool), np.zeros(4, np.int32))
    )
    with pytest.raises(ValueError, match="lag"):
        table_from_dataset(tc.to_dataset(2), 3)


def test_snv_cli_sampled_std_column(model_dir, capsys):
    assert score_main(["snv", model_dir, "ACGTAC", "A0G", "--sample",
                       "--mc-samples", "5", "--std"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "variant\tBEAR\tmc_std"
    fields = out[1].split("\t")
    assert len(fields) == 3 and float(fields[2]) >= 0.0


def test_snv_cli_std_requires_sample(model_dir):
    with pytest.raises(SystemExit):
        score_main(["snv", model_dir, "ACGTAC", "A0G", "--std"])
