"""End-to-end CLI run with the TEST config, cross-checked against an
independent BMM-likelihood computation — mirrors reference tests/test_run.py."""

import configparser
import os

import numpy as np
import pytest

from bear_tpu.data import bmm_likelihood, load_dense
from bear_tpu.ops.distributions import EPSILON

CFG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bear_tpu",
    "models",
    "config_files",
    "bear_test.cfg",
)


def test_run_net(tmp_path):
    from bear_tpu.models import train_bear_net
    from bear_tpu.utils.config import bundled_ysd1_path

    config = configparser.ConfigParser()
    config.read(CFG)
    config["general"]["out_folder"] = str(tmp_path) + "*"
    exit_code, ll_van, perp_van = train_bear_net.main(config)
    assert exit_code == 1

    # Independent BMM cross-check (reference test_run.py:21-30).
    ds = load_dense(bundled_ysd1_path(), "dna", 3)
    alpha = np.array([0.1, 1.0, 10.0]) + EPSILON
    calc = np.asarray(bmm_likelihood(ds.counts, alpha))
    train_liks = calc[0]
    np.testing.assert_allclose(train_liks, ll_van, rtol=1e-6)
    np.testing.assert_allclose(
        np.exp(-train_liks / np.sum(ds.counts[:, 0, :])), perp_van, rtol=1e-6
    )

    # Output contract: config.cfg + results.pickle in the out dir.
    out = config["results"]["out_folder"]
    assert os.path.exists(os.path.join(out, "config.cfg"))
    assert os.path.exists(os.path.join(out, "results.pickle"))
    assert "heldout_perplex_BEAR" in config["results"]

    # Restartability: params round-trip through the results.pickle.
    from bear_tpu.utils.checkpoint import load_params_list

    params = load_params_list(out)
    assert len(params) == 2  # h_signed + linear matrix
    assert params[1].shape == (5, 5, 5)


def test_run_restart(tmp_path):
    from bear_tpu.models import train_bear_net

    config = configparser.ConfigParser()
    config.read(CFG)
    config["general"]["out_folder"] = str(tmp_path / "first") + "*"
    train_bear_net.main(config)
    first_out = config["results"]["out_folder"]

    config2 = configparser.ConfigParser()
    config2.read(CFG)
    config2["general"]["out_folder"] = str(tmp_path / "second") + "*"
    config2["train"]["restart"] = "True"
    config2["train"]["restart_path"] = first_out
    exit_code, *_ = train_bear_net.main(config2)
    assert exit_code == 1


def test_run_net_bfloat16_compute(tmp_path):
    # Mixed-precision CLI run ([model] compute_precision = bfloat16): the AR
    # net computes in bf16, master weights/likelihood stay float32; results
    # must be finite and the BMM column (bf16-independent) must still match
    # the independent computation exactly.
    from bear_tpu.models import train_bear_net
    from bear_tpu.utils.config import bundled_ysd1_path

    config = configparser.ConfigParser()
    config.read(CFG)
    config["general"]["out_folder"] = str(tmp_path) + "*"
    config["general"]["precision"] = "float32"
    config["model"]["compute_precision"] = "bfloat16"
    exit_code, ll_van, _ = train_bear_net.main(config)
    assert exit_code == 1
    assert np.isfinite(float(config["results"]["h"]))
    assert np.isfinite(float(config["results"]["heldout_perplex_BEAR"]))

    ds = load_dense(bundled_ysd1_path(), "dna", 3)
    alpha = np.array([0.1, 1.0, 10.0]) + EPSILON
    calc = np.asarray(bmm_likelihood(ds.counts, alpha))
    np.testing.assert_allclose(calc[0], ll_van, rtol=1e-4)


@pytest.mark.slow
def test_run_net_data_parallel_config(tmp_path):
    # [train] data_parallel = True shards the CLI run over all local devices
    # (8 virtual CPU devices in CI); results must match the single-device run
    # exactly (shard invariance at the CLI level).
    import jax
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from bear_tpu.models import train_bear_net

    def run(dp, sub):
        config = configparser.ConfigParser()
        config.read(CFG)
        config["general"]["out_folder"] = str(tmp_path / sub) + "*"
        config["train"]["data_parallel"] = dp
        train_bear_net.main(config)
        return config

    c1 = run("False", "single")
    c8 = run("True", "mesh")
    np.testing.assert_allclose(
        float(c8["results"]["h"]), float(c1["results"]["h"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(c8["results"]["heldout_perplex_BEAR"]),
        float(c1["results"]["heldout_perplex_BEAR"]), rtol=1e-6)


@pytest.mark.slow
def test_run_net_streaming_matches_in_memory(tmp_path):
    # [train] streaming = True: per-file shard streaming through the CLI
    # produces the same learned h as the in-memory path when the shard
    # batches match (single file here -> identical batch composition).
    from bear_tpu.models import train_bear_net

    def run(streaming, out):
        config = configparser.ConfigParser()
        config.read(CFG)
        config["general"]["out_folder"] = str(out) + "*"
        if streaming:
            config["train"]["streaming"] = "True"
        code = train_bear_net.main(config)
        return config, (code[0] if isinstance(code, tuple) else code)

    cfg_mem, rc1 = run(False, tmp_path / "mem")
    cfg_str, rc2 = run(True, tmp_path / "str")
    assert rc1 == rc2 == 1
    h_mem = float(cfg_mem["results"]["h"])
    h_str = float(cfg_str["results"]["h"])
    np.testing.assert_allclose(h_str, h_mem, rtol=1e-12)
    # heldout metrics written in streaming mode too (eval loads on demand)
    assert "heldout_perplex_BEAR" in cfg_str["results"]


def test_run_net_streaming_composes_dp_and_acc(tmp_path):
    # [train] streaming + data_parallel + accumulation_steps compose at the
    # CLI level (VERDICT r2 task 1; the reference composes exactly this:
    # MirroredStrategy over a streamed dataset, bear_net.py:246,273) and
    # match the in-memory data-parallel accumulate run exactly.
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from bear_tpu.models import train_bear_net

    def run(streaming, out):
        config = configparser.ConfigParser()
        config.read(CFG)
        config["general"]["out_folder"] = str(out) + "*"
        config["train"]["data_parallel"] = "True"
        config["train"]["accumulation_steps"] = "2"
        config["train"]["epochs"] = "4"  # the TEST config's one batch/epoch
        # gives 2 accumulation groups over 4 epochs
        if streaming:
            config["train"]["streaming"] = "True"
        code = train_bear_net.main(config)
        return config

    cfg_mem = run(False, tmp_path / "mem")
    cfg_str = run(True, tmp_path / "str")
    np.testing.assert_allclose(float(cfg_str["results"]["h"]),
                               float(cfg_mem["results"]["h"]), rtol=1e-10)
    np.testing.assert_allclose(
        float(cfg_str["results"]["heldout_perplex_BEAR"]),
        float(cfg_mem["results"]["heldout_perplex_BEAR"]), rtol=1e-10)


@pytest.mark.slow
def test_run_net_checkpoint_every_and_shuffle(tmp_path):
    # [train] checkpoint_every leaves no stale mid-run state after a
    # completed run and reproduces the plain trajectory; [train] shuffle
    # trains to a comparable fit.
    from bear_tpu.models import train_bear_net
    from bear_tpu.utils.checkpoint import load_train_state

    def run(out, **keys):
        config = configparser.ConfigParser()
        config.read(CFG)
        config["general"]["out_folder"] = str(out) + "*"
        for k, v in keys.items():
            config["train"][k] = v
        train_bear_net.main(config)
        return config

    plain = run(tmp_path / "plain")
    ck = run(tmp_path / "ck", checkpoint_every="3")
    np.testing.assert_allclose(float(ck["results"]["h"]),
                               float(plain["results"]["h"]), rtol=1e-12)
    assert load_train_state(str(tmp_path / "ck")) is None  # cleared when done
    sh = run(tmp_path / "sh", shuffle="True")
    np.testing.assert_allclose(float(sh["results"]["h"]),
                               float(plain["results"]["h"]), rtol=0.5)


def test_run_net_attention_and_serve(tmp_path):
    # The attention AR (bear_tpu extension) end to end through the config
    # CLI, then served from the resulting model directory.
    from bear_tpu.inference.serving import BearServer
    from bear_tpu.models import train_bear_net

    config = configparser.ConfigParser()
    config.read(CFG)
    config["general"]["out_folder"] = str(tmp_path) + "*"
    config["general"]["precision"] = "float32"
    config["model"]["ar_func_name"] = "attention"
    config["model"]["af_kwargs"] = (
        '{"d_model": 16, "num_heads": 2, "mlp_width": 32}')
    train_bear_net.main(config)
    assert np.isfinite(float(config["results"]["h"]))
    assert np.isfinite(float(config["results"]["heldout_perplex_BEAR"]))
    srv = BearServer.from_model_dir(config["results"]["out_folder"])
    s = srv.score(["TTTAT", "ACGTA"])
    assert np.isfinite(np.asarray(s)).all()
