"""Utils coverage: config parsing semantics, metrics writer, stage timer,
multihost single-process no-ops."""

import configparser
import pytest
import json
import os

import numpy as np

from bear_tpu.utils import MetricsWriter, RunConfig, StageTimer
from bear_tpu.utils.checkpoint import load_results, save_results
from bear_tpu.parallel import multihost


def _base_config():
    config = configparser.ConfigParser()
    config.read_dict(
        {
            "general": {"out_folder": "TEST", "seed": "10", "precision": "float32"},
            "data": {
                "files_path": "TEST", "start_token": "TEST", "sparse": "False",
                "num_ds": "3", "alphabet": "dna", "train_column": "0",
                "test_column": "1", "reference_column": "2",
            },
            "hyperp": {"lag": "5"},
            "train": {
                "train": "True", "epochs": "10", "batch_size": "1500",
                "optimizer_name": "Adam", "learning_rate": "0.01",
                "train_ar": "True", "accumulation_steps": "1", "cache": "True",
                "restart": "False", "restart_path": "x",
            },
            "test": {"test": "True", "train_test": "True", "van_reg": "[0.1, 1.0]"},
            "model": {"ar_func_name": "linear", "af_kwargs": "{}"},
            "results": {},
        }
    )
    return config


def test_config_batch_and_epoch_semantics():
    run = RunConfig.from_configparser(_base_config())
    # fractional batch size (reference train_bear_net.py:56-60)
    run.batch_size_raw = 0.5
    assert run.resolve_batch_size(1000) == 500
    run.batch_size_raw = 64
    assert run.resolve_batch_size(1000) == 64
    # 's'-suffixed step-count epochs (reference train_bear_net.py:61-65)
    run.epochs_raw = "100s"
    assert run.resolve_epochs(1000, 100) == 100 // (1 + 1000 // 100) + 1
    run.epochs_raw = "7"
    assert run.resolve_epochs(1000, 100) == 7


def test_config_star_out_folder(tmp_path):
    run = RunConfig.from_configparser(_base_config())
    run.out_folder = str(tmp_path / "fixed") + "*"
    out = run.resolve_out_folder()
    assert out == str(tmp_path / "fixed")
    assert os.path.isdir(out)


def test_metrics_writer_and_stage_timer(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.scalar("elbo", 1.5, step=3)
    timer = StageTimer(writer=w)
    with timer.stage("phase_a"):
        pass
    w.flush()
    lines = [json.loads(l) for l in open(w.path)]
    assert lines[0] == {**lines[0], "tag": "elbo", "value": 1.5, "step": 3}
    assert any(l["tag"] == "stage_seconds/phase_a" for l in lines)
    assert "phase_a" in timer.report()


def test_checkpoint_roundtrip_with_extras(tmp_path):
    params = [np.zeros(()), np.ones((2, 3))]
    save_results(str(tmp_path), params, extra={"opt_state": {"count": np.int32(5)}})
    loaded = load_results(str(tmp_path))
    np.testing.assert_array_equal(loaded["params"][1], params[1])
    assert loaded["opt_state"]["count"] == 5


def test_multihost_single_process_noops():
    multihost.initialize()
    assert multihost.host_shard([1, 2, 3]) == [1, 2, 3]
    assert multihost.host_shard([1, 2, 3, 4], process_id=1, process_count=2) == [2, 4]
    from bear_tpu.counting import TransitionCounter

    tc = TransitionCounter(lags=[2])
    multihost.allreduce_tables(tc)  # no-op at process_count == 1


@pytest.mark.slow
def test_metrics_writer_tensorboard(tmp_path):
    # Opt-in TensorBoard tee: event files appear alongside scalars.jsonl.
    from bear_tpu.utils.metrics import MetricsWriter

    w = MetricsWriter(str(tmp_path), tensorboard=True)
    w.scalar("elbo", 1.5, step=1)
    w.scalar("elbo", 2.5, step=2)
    w.close()
    assert (tmp_path / "scalars.jsonl").exists()
    tb_dir = tmp_path / "tb"
    assert tb_dir.exists() and any(
        f.name.startswith("events") for f in tb_dir.iterdir()
    )
