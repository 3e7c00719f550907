"""Reference-guided BEAR: Jukes-Cantor smoothing contract, ref AR mixture,
training end-to-end, and the CLI run with BMM cross-check
(mirrors reference tests/test_run.py::test_run_ref)."""

import configparser
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bear_tpu.models import bear_ref, bear_net
from bear_tpu.models.ar_funcs import make_ar_func_stop, make_ar_func_linear
from bear_tpu.ops import alphabets
from bear_tpu.ops.distributions import EPSILON


def test_counts_to_probs_jukes_cantor():
    # Pure reference counts, tau -> inf: uniform over residues, 0 stop.
    ref = jnp.asarray(np.array([[10.0, 0.0, 0.0, 0.0, 0.0]]))
    ref = np.asarray(bear_ref.prepare_ref_counts(ref, 4, jnp.float64))
    out = np.asarray(bear_ref.counts_to_probs(jnp.asarray(ref), 50.0, 4))
    np.testing.assert_allclose(out[0, :4], 0.25, rtol=1e-6)
    assert out[0, 4] == 0.0
    # tau -> 0: exact normalized reference.
    out = np.asarray(bear_ref.counts_to_probs(jnp.asarray(ref), 0.0, 4))
    np.testing.assert_allclose(out[0, 0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[0].sum(), 1.0, rtol=1e-6)


def test_ref_ar_func_mixture():
    ar = bear_ref.make_ref_ar_func(3, 4, make_ar_func_stop, dtype=jnp.float64)
    params = ar.init(jax.random.key(0))
    assert len(params) == 2  # tau_signed, net_weight_signed (+0 for stop net)
    np.testing.assert_allclose(float(params[0]), np.log(1 / 30))
    np.testing.assert_allclose(float(params[1]), -np.log(100))
    codes = np.zeros((2, 3), np.int8)
    oh = alphabets.one_hot(codes, 5, jnp.float64)
    ref = bear_ref.prepare_ref_counts(
        jnp.asarray(np.array([[5.0, 0, 0, 0, 0], [0, 5.0, 0, 0, 0]])), 4, jnp.float64
    )
    probs = np.asarray(ar.apply(params, oh, ref))
    # nu = 1/100: stop net contributes nu/(1+nu) to the stop bucket.
    nu = 1 / 100
    np.testing.assert_allclose(probs[:, 4], nu / (1 + nu), rtol=1e-6)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-6)
    # Residue mass follows the JC-smoothed reference.
    tau = 1 / 30
    jc = np.asarray(bear_ref.counts_to_probs(ref, tau, 4))
    np.testing.assert_allclose(probs[:, :4], jc[:, :4] / (1 + nu), rtol=1e-6)


def test_ref_train_learns():
    rng = np.random.default_rng(0)
    n = 64
    codes = rng.integers(0, 4, (n, 3)).astype(np.int8)
    counts = rng.poisson(10.0, (n, 5)).astype(np.float64)
    ref_col = counts + rng.poisson(1.0, (n, 5))
    res = bear_ref.train(
        codes,
        counts,
        ref_col,
        num_kmers=n,
        net_func_factory=make_ar_func_stop,
        batch_size=32,
        epochs=40,
        learning_rate=0.05,
        train_ar=False,
        dtype=jnp.float64,
    )
    assert res.losses[-1] < res.losses[0]
    assert 0.0 < bear_ref.error_rate(res.params) < 1.0
    assert bear_ref.stop_rate_inverse(res.params) > 1.0


def test_ref_padded_batches_stay_finite():
    # Regression: batch padding introduces all-zero reference rows; the JC
    # normalization must not emit NaN into gradients or eval likelihoods.
    rng = np.random.default_rng(1)
    n = 10  # batch_size 16 > n forces padded rows
    codes = rng.integers(0, 4, (n, 3)).astype(np.int8)
    counts = np.stack([rng.poisson(5.0, (n, 5)), rng.poisson(5.0, (n, 5)),
                       rng.poisson(5.0, (n, 5))], axis=1).astype(np.float64)
    res = bear_ref.train(
        codes, counts[:, 0], counts[:, 2], num_kmers=n,
        net_func_factory=make_ar_func_stop, batch_size=16, epochs=2,
        learning_rate=0.01, train_ar=True, dtype=jnp.float64,
    )
    assert np.all(np.isfinite([np.asarray(p) for p in res.params_list[1:]][0]))
    ar = bear_ref.make_ref_ar_func(3, 4, make_ar_func_stop, dtype=jnp.float64)
    out = bear_ref.evaluation(
        codes, counts, 0, 1, 2, "dna", 1.0, ar, res.params["ar"],
        np.array([1.0]), batch_size=16, dtype=jnp.float64,
    )
    assert np.isfinite(out[0]) and np.isfinite(out[3])


def test_run_ref_cli(tmp_path):
    from bear_tpu.models import train_bear_ref
    from bear_tpu.data import bmm_likelihood, load_dense
    from bear_tpu.utils.config import bundled_ysd1_path

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bear_tpu", "models", "config_files", "bear_test.cfg",
    )
    config = configparser.ConfigParser()
    config.read(cfg_path)
    config["general"]["out_folder"] = str(tmp_path) + "*"
    exit_code, ll_van, perp_van = train_bear_ref.main(config)
    assert exit_code == 1
    assert "error_rate" in config["results"]
    assert "stop_rate" in config["results"]

    ds = load_dense(bundled_ysd1_path(), "dna", 3)
    alpha = np.array([0.1, 1.0, 10.0]) + EPSILON
    calc = np.asarray(bmm_likelihood(ds.counts, alpha))
    np.testing.assert_allclose(calc[0], ll_van, rtol=1e-6)
    np.testing.assert_allclose(
        np.exp(-calc[0] / np.sum(ds.counts[:, 0, :])), perp_van, rtol=1e-6
    )


def test_ref_train_bfloat16_compute():
    # Mixed precision threads through to the inner g net of the ref mixture
    # (the JC mixture itself stays full precision); trajectory must track the
    # float32 run closely.
    from bear_tpu.models.ar_funcs import make_ar_func_cnn

    rng = np.random.default_rng(4)
    n = 96
    codes = rng.integers(0, 4, (n, 6)).astype(np.int8)
    counts = rng.poisson(8.0, (n, 5)).astype(np.float32)
    ref_col = counts + rng.poisson(1.0, (n, 5))

    def run(cd):
        return bear_ref.train(
            codes, counts, ref_col, num_kmers=n,
            net_func_factory=make_ar_func_cnn,
            af_kwargs={"filter_width": 3, "num_filters": 8},
            batch_size=48, epochs=25, learning_rate=0.02,
            dtype=jnp.float32, compute_dtype=cd, seed=2,
        )

    r32, r16 = run(None), run(jnp.bfloat16)
    assert np.isfinite(r16.losses).all()
    assert r16.losses[-1] < r16.losses[0]
    np.testing.assert_allclose(r16.losses[-1], r32.losses[-1], rtol=1e-2)


def test_load_bear_rejects_ref_model_dir(tmp_path):
    # load_bear would silently mis-wire a ref checkpoint ([tau, nu] + net
    # params) into the plain AR layout; it must refuse with a clear message.
    import pytest

    from bear_tpu.inference.scoring import load_bear
    from bear_tpu.models import train_bear_ref

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bear_tpu", "models", "config_files", "bear_test.cfg",
    )
    config = configparser.ConfigParser()
    config.read(cfg_path)
    config["general"]["out_folder"] = str(tmp_path) + "*"
    train_bear_ref.main(config)
    out = config["results"]["out_folder"]
    with pytest.raises(ValueError, match="bear_ref"):
        load_bear(out)


def test_counts_to_probs_zero_rows_and_emulation_safe_floor():
    # Regression: zero-padded batch rows divide by a floor that must SURVIVE
    # TPU's double-float32 f64 emulation (finfo(f64).tiny = 2.2e-308
    # underflows to 0 there -> 0/0 = NaN at step 0 of every f64 ref-BEAR
    # run). The floor must round-trip through float32 as a positive number,
    # and zero rows must produce finite JC-uniform probabilities.
    import inspect

    import jax.numpy as jnp

    for dtype in (jnp.float32, jnp.float64):
        zero = jnp.zeros((3, 5), dtype)
        out = np.asarray(bear_ref.counts_to_probs(zero, jnp.asarray(1/30, dtype), 4))
        assert np.isfinite(out).all()
        assert (out >= 0).all()
    # The actual floor constant used is f32-representable (the emulation
    # invariant; reading the source keeps this from silently regressing).
    src = inspect.getsource(bear_ref.counts_to_probs)
    assert "float32).tiny" in src and "ref_counts.dtype).tiny" not in src


def test_ref_train_streaming_matches_concat():
    # Reference-guided shard streaming follows the concat trajectory exactly
    # when batch composition matches.
    from bear_tpu.models.ar_funcs import make_ar_func_stop

    rng = np.random.default_rng(9)
    lag, n, bsz = 4, 64, 16
    codes = rng.integers(0, 4, (n, lag)).astype(np.int8)
    counts = rng.poisson(6.0, (n, 5)).astype(np.float64)
    ref_col = (counts + rng.poisson(1.0, (n, 5))).astype(np.float64)

    concat = bear_ref.train(
        codes, counts, ref_col, num_kmers=n,
        net_func_factory=make_ar_func_stop, af_kwargs={},
        batch_size=bsz, epochs=4, learning_rate=0.02, seed=5,
        dtype=jnp.float64)

    def shards():
        for s0 in range(0, n, 32):
            yield (codes[s0:s0 + 32], counts[s0:s0 + 32],
                   ref_col[s0:s0 + 32])

    streamed = bear_ref.train_streaming(
        shards, n, make_ar_func_stop, {}, lag=lag, batch_size=bsz,
        epochs=4, learning_rate=0.02, seed=5, dtype=jnp.float64,
        block_steps=3)
    np.testing.assert_array_equal(concat.losses, streamed.losses)
    for a, b in zip(concat.params_list, streamed.params_list):
        np.testing.assert_array_equal(a, b)

def test_ref_evaluation_streaming_matches_in_memory():
    # Streamed reference-guided evaluation (per-shard JC stop-strip prep)
    # equals the in-memory result to summation reassociation.
    import jax
    import jax.numpy as jnp

    from bear_tpu.models import bear_ref
    from bear_tpu.models.ar_funcs import make_ar_func_stop

    rng = np.random.default_rng(9)
    lag, n = 3, 96
    codes = rng.integers(0, 4, (n, lag)).astype(np.int8)
    counts = rng.poisson(5.0, (n, 3, 5)).astype(np.float64)
    ar = bear_ref.make_ref_ar_func(lag, 4, make_ar_func_stop,
                                   dtype=jnp.float64)
    params = [np.asarray(p) for p in ar.init(jax.random.key(0))]
    van = [0.5]
    kw = dict(dtype=jnp.float64, seed=3, batch_size=16)

    want = bear_ref.evaluation(codes, counts, 0, 1, 2, "dna", 0.2, ar,
                               params, van, **kw)

    def shards():  # batch-aligned split
        yield codes[:32], counts[:32]
        yield codes[32:], counts[32:]

    got = bear_ref.evaluation_streaming(shards, 0, 1, 2, "dna", 0.2, ar,
                                        params, van, block_steps=2, **kw)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_run_ref_cli_streaming(tmp_path):
    # [train] streaming = True through the reference-guided CLI: streamed
    # training AND streamed evaluation produce the in-memory results.
    from bear_tpu.models import train_bear_ref

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bear_tpu", "models", "config_files", "bear_test.cfg",
    )

    def run(streaming, out):
        config = configparser.ConfigParser()
        config.read(cfg_path)
        config["general"]["out_folder"] = str(out) + "*"
        if streaming:
            config["train"]["streaming"] = "True"
        code = train_bear_ref.main(config)
        return config

    mem = run(False, tmp_path / "mem")
    st = run(True, tmp_path / "str")
    np.testing.assert_allclose(float(st["results"]["h"]),
                               float(mem["results"]["h"]), rtol=1e-12)
    np.testing.assert_allclose(
        float(st["results"]["heldout_perplex_BEAR"]),
        float(mem["results"]["heldout_perplex_BEAR"]), rtol=1e-9)
    assert "error_rate" in st["results"]
