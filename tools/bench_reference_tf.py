"""Measure the reference baseline: YSD1 lag-5 training steps/s in TensorFlow.

The upstream reference (debbiemarkslab/BEAR) pins tensorflow_probability==0.11.1
and a tensorflow-io nightly (requirements.txt:11-12); neither is installed
here and installs are not possible, so the reference cannot run verbatim.
This tool is the next-honest thing: the SAME training computation the
reference's hot loop performs — linear AR softmax (ar_funcs.py:23-46),
Dirichlet-multinomial-perm log-likelihood (core.py:73-74: the TFP
DirichletMultinomial.log_prob minus log_combinations reduces to the lgamma
form evaluated here), ELBO scaling num_kmers/batch (bear_net.py:187-191),
gradient on h_signed only (the published BEAR protocol trains with
train_ar=False), Adam lr 0.01, float64 (bear_test.cfg precision), batch
1500 on the 1365-row bundled YSD1 counts (one optimizer step per epoch) —
built as a tf.function graph exactly as bear_net.py:284-291 compiles its
distributed step.

The measurement is GENEROUS to the reference: the tf.data CsvDataset +
tensorflow-io JSON decode input pipeline and the MirroredStrategy
replica/reduce machinery are excluded (data is pre-staged as constants), so
the measured steps/s is an upper bound on what the full reference achieves
on this host. Parity cross-check: run with --full to execute the whole
10000-step protocol and verify the learned h lands on the published 0.0433.

Writes BASELINE_MEASURED.json next to bench.py; bench.py prefers it over the
prose-derived estimate (docs/usage.rst:236 "a few minutes" ≈ 55 steps/s).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def reference_importable():
    """Can the actual reference stack run? Record the attempt either way."""
    notes = {}
    try:
        import tensorflow as tf  # noqa: F401

        notes["tensorflow"] = tf.__version__
    except ImportError as e:
        notes["tensorflow"] = f"unavailable: {e}"
    for mod in ("tensorflow_probability", "tensorflow_io"):
        try:
            m = __import__(mod)
            notes[mod] = getattr(m, "__version__", "present")
        except ImportError as e:
            notes[mod] = f"unavailable: {e}"
    return notes


def measure(full: bool = False, steps: int = 600, warmup: int = 20,
            dtype: str = "float64"):
    import tensorflow as tf

    from bear_tpu.data import load_dense
    from bear_tpu.utils.config import bundled_ysd1_path

    np_dtype = np.dtype(dtype)
    tf_dtype = tf.float64 if dtype == "float64" else tf.float32
    ds = load_dense(bundled_ysd1_path(), "dna", 3, dtype=np_dtype)
    B, lag, A1 = ds.num_kmers, ds.lag, 5
    # One-hot exactly as the reference maps it (core.py:156-174): '[' is the
    # last input column; training uses the train count column.
    onehot = np.zeros((B, lag, A1), dtype=np_dtype)
    idx = np.asarray(ds.codes, dtype=np.int64)
    for j in range(lag):
        onehot[np.arange(B), j, idx[:, j]] = 1.0
    counts = np.asarray(ds.counts[:, 0], dtype=np_dtype)

    onehot_t = tf.constant(onehot)
    counts_t = tf.constant(counts)
    num_kmers = float(B)
    # batch 1500 > 1365 rows: each optimizer step sees the whole file, and
    # the unbiased ELBO scale num_kmers/actual_batch is exactly 1.
    batch = float(B)
    eps = tf.constant(1e-7, tf_dtype)  # reference bear_net.py:43 epsilon

    # Linear AR init: the SAME seed-10 parameters the repo's train() draws
    # (the optimal h depends on the fixed AR function, so the --full h-parity
    # check needs the identical init, not merely the identical init scheme).
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from bear_tpu.models import get_ar_func

    ar = get_ar_func("linear", lag, A1 - 1, dtype=jnp.float64)
    (w,) = ar.init(jax.random.key(10))
    W = tf.Variable(np.asarray(w, dtype=np_dtype), dtype=tf_dtype)
    h_signed = tf.Variable(tf.zeros((), tf_dtype))
    # BEAR empirical Bayes trains the embedded AR f JOINTLY with h
    # (reference bear_net.py:146-197: the tape covers all params; train_ar
    # only switches the objective to the point-AR likelihood).
    variables = [W, h_signed]
    opt = tf.keras.optimizers.Adam(learning_rate=0.01)

    @tf.function
    def train_step():
        with tf.GradientTape() as tape:
            h = tf.exp(h_signed)
            logits = tf.einsum("bjk,jkl->bl", onehot_t, W)
            f = tf.nn.softmax(logits)
            alpha = f / h + eps
            ll = tf.reduce_sum(
                tf.math.lgamma(alpha + counts_t) - tf.math.lgamma(alpha), -1
            ) - (
                tf.math.lgamma(tf.reduce_sum(alpha, -1)
                               + tf.reduce_sum(counts_t, -1))
                - tf.math.lgamma(tf.reduce_sum(alpha, -1))
            )
            loss = -(num_kmers / batch) * tf.reduce_sum(ll)
        grads = tape.gradient(loss, variables)
        opt.apply_gradients(zip(grads, variables))
        return loss

    loss = train_step()  # build + compile the graph
    for _ in range(warmup - 1):
        loss = train_step()
    n = 10000 if full else steps
    t0 = time.perf_counter()
    for _ in range(n):
        loss = train_step()
    dt = time.perf_counter() - t0
    out = dict(
        steps_per_sec=n / dt,
        measured_steps=n,
        seconds=dt,
        final_loss=float(loss),
        h=float(np.exp(h_signed.numpy())),
        threads=os.cpu_count(),
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="run the whole 10000-step protocol (h parity check)")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json"))
    args = ap.parse_args()

    notes = reference_importable()
    record = {
        "metric": "ysd1_lag5_train_steps_per_sec",
        "source": "measured: reference-equivalent TF graph on this host's CPU "
                  "(TFP/tf-io unavailable; DM-perm lgamma formula inlined; "
                  "input pipeline and MirroredStrategy overhead excluded — "
                  "upper bound on the true reference)",
        "reference_stack": notes,
        "protocol": "YSD1 lag-5, float64, Adam lr 0.01, batch 1500 "
                    "(1365 rows = 1 step/epoch), train_ar=False",
    }
    try:
        record.update(measure(full=args.full, steps=args.steps))
    except Exception as e:
        record["error"] = repr(e)
    # Same graph at float32, so the dtype asymmetry of the headline
    # multiplier (f32-on-TPU numerator vs the f64-protocol TF denominator)
    # is measured, not argued: both denominators live in this file.
    try:
        record["float32"] = measure(full=False, steps=args.steps,
                                    dtype="float32")
    except Exception as e:
        record["float32"] = {"error": repr(e)}
    with open(args.out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
