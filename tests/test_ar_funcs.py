import jax
import jax.numpy as jnp
import pytest
import numpy as np

from bear_tpu.models import make_ar_func_cnn, make_ar_func_linear, make_ar_func_stop
from bear_tpu.ops import alphabets


def _onehot_batch(n=7, lag=5, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 5, size=(n, lag)).astype(np.int8)
    return alphabets.one_hot(codes, 5, jnp.float32)


def test_linear_shapes_and_normalization():
    ar = make_ar_func_linear(5, 4)
    params = ar.init(jax.random.key(0))
    assert len(params) == 1 and params[0].shape == (5, 5, 5)
    # init scale: each [j,:,l] column block l2-normalized over axis 1 then 0.05.
    norms = np.linalg.norm(np.asarray(params[0]), axis=1)
    np.testing.assert_allclose(norms, 0.05, rtol=1e-5)
    probs = ar.apply(params, _onehot_batch())
    assert probs.shape == (7, 5)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_cnn_shapes_param_order():
    ar = make_ar_func_cnn(5, 4, filter_width=3, num_filters=8, kmer_layer1_width=16)
    params = ar.init(jax.random.key(0))
    # Reference param order (ar_funcs.py:98-99).
    shapes = [p.shape for p in params]
    assert shapes == [
        (3, 5, 8),   # filters
        (3, 8),      # intercept0 (conv_len = 5-3+1 = 3)
        (3, 8, 16),  # weights1
        (16,),       # intercept1
        (16, 5),     # weights2
        (5,),        # intercept2
        (3, 8),      # scale0
        (16,),       # scale1
    ]
    probs = ar.apply(params, _onehot_batch())
    assert probs.shape == (7, 5)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_cnn_conv_matches_manual():
    # Single-filter conv: check VALID semantics against a manual computation.
    ar = make_ar_func_cnn(4, 4, filter_width=2, num_filters=1, kmer_layer1_width=2)
    params = ar.init(jax.random.key(1))
    x = _onehot_batch(n=2, lag=4, seed=1)
    filters = np.asarray(params[0])  # [2, 5, 1]
    xin = np.asarray(x)
    manual = np.zeros((2, 3, 1))
    for b in range(2):
        for w in range(3):
            manual[b, w, 0] = np.sum(xin[b, w : w + 2] * filters[:, :, 0])
    conv = jax.lax.conv_general_dilated(
        x, jnp.asarray(filters), (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
    )
    np.testing.assert_allclose(np.asarray(conv), manual, rtol=1e-5, atol=1e-6)


def test_stop():
    ar = make_ar_func_stop(5, 4)
    assert ar.init(jax.random.key(0)) == []
    probs = ar.apply([], _onehot_batch())
    assert probs.shape == (7, 5)
    np.testing.assert_array_equal(np.asarray(probs)[:, -1], 1.0)
    np.testing.assert_array_equal(np.asarray(probs)[:, :-1], 0.0)


@pytest.mark.slow
def test_attention_shapes_and_training():
    from bear_tpu.models.ar_funcs import make_ar_func_attention
    from bear_tpu.models import bear_net

    ar = make_ar_func_attention(6, 4, d_model=32, num_heads=2, mlp_width=64)
    params = ar.init(jax.random.key(0))
    assert len(params) == 10
    probs = ar.apply(params, _onehot_batch(n=9, lag=6))
    assert probs.shape == (9, 5)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (64, 6)).astype(np.int8)
    counts = rng.poisson(5.0, (64, 5)).astype(np.float64)
    res = bear_net.train(
        codes, counts, num_kmers=64, ar_func=ar, batch_size=32, epochs=20,
        learning_rate=0.01, train_ar=True,
    )
    assert res.losses[-1] < res.losses[0]
    assert np.isfinite(res.losses).all()


def test_attention_position_sensitivity():
    # The attention AR must distinguish contexts with the SAME letter multiset
    # and the SAME final token once positional embeddings are nonzero (they
    # init to zeros and train; perturb them here to test the architecture's
    # capacity rather than the init).
    from bear_tpu.models.ar_funcs import make_ar_func_attention

    ar = make_ar_func_attention(4, 4, d_model=32, num_heads=2)
    params = ar.init(jax.random.key(1))
    params[1] = 0.5 * jax.random.normal(jax.random.key(2), params[1].shape)
    from bear_tpu.ops import alphabets

    a = alphabets.one_hot_kmers(np.array(["ACGT"]), "dna", jnp.float32)
    b = alphabets.one_hot_kmers(np.array(["CAGT"]), "dna", jnp.float32)
    pa = np.asarray(ar.apply(params, a))
    pb = np.asarray(ar.apply(params, b))
    assert not np.allclose(pa, pb)
    # And at zero pos init the model is indeed multiset-invariant given the
    # last token (documents the init-time symmetry).
    params0 = ar.init(jax.random.key(1))
    np.testing.assert_allclose(
        np.asarray(ar.apply(params0, a)), np.asarray(ar.apply(params0, b)), rtol=1e-5
    )


def test_apply_is_jittable_and_differentiable():
    ar = make_ar_func_linear(3, 4)
    params = ar.init(jax.random.key(0))
    x = _onehot_batch(n=4, lag=3)

    @jax.jit
    def loss(p):
        return jnp.sum(jnp.log(ar.apply(p, x) + 1e-7))

    g = jax.grad(loss)(params)
    assert g[0].shape == (3, 5, 5)
    assert np.all(np.isfinite(np.asarray(g[0])))


@pytest.mark.slow
def test_apply_codes_matches_apply():
    # The flat-one-hot fast path must agree with the one-hot apply for every
    # AR function that provides it (bit-compatible up to reassociation).
    import jax
    import jax.numpy as jnp
    from bear_tpu.models.ar_funcs import AR_FUNCS
    from bear_tpu.ops import alphabets

    rng = np.random.default_rng(5)
    lag, A = 7, 4
    codes = jnp.asarray(rng.integers(0, A, (64, lag)).astype(np.int8))
    for name in ("linear", "cnn", "stop", "attention"):
        for dtype, tol in ((jnp.float32, 1e-5), (jnp.float64, 1e-12)):
            kwargs = {"filter_width": 3, "num_filters": 8} if name == "cnn" else {}
            if name == "attention":
                kwargs = {"d_model": 16, "num_heads": 2, "mlp_width": 32}
            ar = AR_FUNCS[name](lag, A, **kwargs, dtype=dtype)
            if ar.apply_codes is None:
                continue
            params = ar.init(jax.random.key(1))
            oh = alphabets.one_hot(codes, A + 1, dtype)
            a = np.asarray(jax.jit(ar.apply)(params, oh))
            b = np.asarray(jax.jit(ar.apply_codes)(params, codes))
            np.testing.assert_allclose(a, b, rtol=tol, atol=tol, err_msg=name)
            assert b.shape == (64, A + 1)


def test_apply_codes_leading_dims():
    # apply_codes must handle extra leading dims like apply does.
    import jax
    import jax.numpy as jnp
    from bear_tpu.models.ar_funcs import make_ar_func_cnn

    rng = np.random.default_rng(6)
    codes = jnp.asarray(rng.integers(0, 4, (3, 16, 6)).astype(np.int8))
    ar = make_ar_func_cnn(6, 4, filter_width=3, num_filters=8)
    params = ar.init(jax.random.key(0))
    out = jax.jit(ar.apply_codes)(params, codes)
    assert out.shape == (3, 16, 5)
    from bear_tpu.ops import alphabets
    oh = alphabets.one_hot(codes, 5, jnp.float32)
    np.testing.assert_allclose(np.asarray(ar.apply(params, oh)),
                               np.asarray(out), rtol=1e-6, atol=1e-6)


def test_compute_dtype_bfloat16_close_to_full_precision():
    # Mixed precision: bfloat16 compute must (a) return float32 probabilities
    # that sum to 1 exactly as a float32 softmax does, (b) stay close to the
    # full-precision forward, (c) keep gradients in the master dtype.
    from bear_tpu.models.ar_funcs import AR_FUNCS

    rng = np.random.default_rng(7)
    lag, A = 7, 4
    codes = jnp.asarray(rng.integers(0, A, (64, lag)).astype(np.int8))
    for name in ("linear", "cnn", "attention"):
        kwargs = {"filter_width": 3, "num_filters": 8} if name == "cnn" else {}
        if name == "attention":
            kwargs = {"d_model": 16, "num_heads": 2, "mlp_width": 32}
        ar32 = AR_FUNCS[name](lag, A, **kwargs, dtype=jnp.float32)
        ar16 = AR_FUNCS[name](lag, A, **kwargs, dtype=jnp.float32,
                              compute_dtype=jnp.bfloat16)
        params = ar32.init(jax.random.key(1))
        p32 = np.asarray(jax.jit(ar32.apply_codes)(params, codes))
        p16j = jax.jit(ar16.apply_codes)(params, codes)
        assert p16j.dtype == jnp.float32, name
        p16 = np.asarray(p16j)
        np.testing.assert_allclose(p16.sum(-1), 1.0, rtol=1e-5, err_msg=name)
        # bf16 has ~2-3 significant digits; probabilities are O(0.2) here.
        np.testing.assert_allclose(p16, p32, atol=0.03, err_msg=name)
        # Both one-hot and codes paths agree under mixed precision too.
        from bear_tpu.ops import alphabets
        oh = alphabets.one_hot(codes, A + 1, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(jax.jit(ar16.apply)(params, oh)), p16, atol=0.02,
            err_msg=name)

        def loss(p):
            return jnp.sum(jnp.log(ar16.apply_codes(p, codes) + 1e-7))

        g = jax.jit(jax.grad(loss))(params)
        for gp, pp in zip(g, params):
            assert gp.dtype == pp.dtype, name
            assert np.all(np.isfinite(np.asarray(gp))), name


def test_compute_dtype_trains():
    # A short bfloat16-compute training run must move the loss like the
    # float32 run does (same data, same protocol).
    from bear_tpu.models import bear_net
    from bear_tpu.models.ar_funcs import make_ar_func_cnn

    rng = np.random.default_rng(8)
    codes = rng.integers(0, 4, (128, 6)).astype(np.int8)
    counts = rng.poisson(4.0, (128, 5)).astype(np.float32)

    def run(compute_dtype):
        ar = make_ar_func_cnn(6, 4, filter_width=3, num_filters=8,
                              compute_dtype=compute_dtype)
        return bear_net.train(
            codes, counts, num_kmers=128, ar_func=ar, batch_size=64,
            epochs=30, learning_rate=0.01, seed=3,
        )

    r32, r16 = run(None), run(jnp.bfloat16)
    assert np.isfinite(r16.losses).all()
    assert r16.losses[-1] < r16.losses[0]
    # Final losses agree to ~1% relative (the objectives differ only by
    # bf16 rounding inside the AR network).
    np.testing.assert_allclose(r16.losses[-1], r32.losses[-1], rtol=1e-2)
