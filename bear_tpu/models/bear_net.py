"""BEAR / AR model training, evaluation and h-scan.

Re-design of the reference's bear_model/bear_net.py for TPU:

- No distribution objects or tf.Variables: the model is a params pytree
  ``{"h_signed": scalar, "ar": [arrays]}`` and a handful of pure functions.
- No MirroredStrategy (reference bear_net.py:246): data parallelism is a
  ``jax.sharding.Mesh`` — batches are sharded over the ``data`` axis and XLA
  inserts the psum for the (replicated) gradients, the TPU-native equivalent
  of the reference's NCCL all-reduce (bear_net.py:290-291).
- No per-batch Python dispatch in the hot loop: when the collapsed count
  dataset fits on device (it always does up to lag ~13 — see SURVEY.md §7),
  the entire training run is ONE jitted ``lax.scan`` over steps, with k-mer
  codes kept as int8 and one-hot built on the fly in-register (20x less HBM
  traffic than storing one-hot).
- Gradient accumulation (reference bear_net.py:259-261, 296-315) is an inner
  scan summing grads over ``acc_steps`` before each optimizer apply.

Semantics parity notes:
- loss = -(num_kmers / actual_batch_size) * sum counts_log_prob
  (reference bear_net.py:187-191); the *actual* (unpadded) batch size is used
  for the final partial batch, like the reference's dynamic shape.
- A trailing group of fewer than acc_steps batches is accumulated but never
  applied in the reference (bear_net.py:301); here it is simply dropped —
  identical effect on the parameters.
- The reference's ``epochs`` argument to train() is unused (callers pre-repeat
  the dataset, train_bear_net.py:87); here ``epochs`` actually repeats.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bear_tpu.ops import alphabets
from bear_tpu.ops.distributions import (
    EPSILON,
    dirichlet_multinomial_perm_logpmf,
    ml_output_dm,
    ml_output_mult,
    multinomial_perm_logpmf,
)
from bear_tpu.models.ar_funcs import ARFunc


# --- model core -----------------------------------------------------------


def bear_log_prob(counts, ar_probs, h, condition=None):
    """BEAR marginal likelihood of transition counts.

    concentrations = ar_probs / h + condition + eps
    (reference bear_net.py:43); condition=None means prior (0), a count tensor
    means the posterior predictive.
    """
    conc = ar_probs / h + EPSILON
    if condition is not None:
        conc = conc + condition
    return dirichlet_multinomial_perm_logpmf(counts, conc)


def ar_log_prob(counts, ar_probs):
    """Point-AR likelihood: multinomial with probs = ar + eps
    (reference bear_net.py:68)."""
    return multinomial_perm_logpmf(counts, ar_probs + EPSILON)


def init_params(key, ar_func: ARFunc, dtype=jnp.float32):
    """h_signed = log h, init 0 (reference bear_net.py:73-100) + AR params."""
    return {"h_signed": jnp.zeros((), dtype=dtype), "ar": ar_func.init(key)}


def params_to_list(params) -> List[np.ndarray]:
    """Flatten to the reference's checkpoint order [h_signed] + ar_params
    (reference bear_net.py:99)."""
    return [np.asarray(params["h_signed"])] + [np.asarray(p) for p in params["ar"]]


def params_from_list(lst, dtype=jnp.float32):
    """Inverse of params_to_list — the reference's change_scope_params
    rehydration (bear_net.py:103-143)."""
    return {
        "h_signed": jnp.asarray(lst[0], dtype=dtype),
        "ar": [jnp.asarray(p, dtype=dtype) for p in lst[1:]],
    }


_OPTAX_NAMES = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "adamax": optax.adamax,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
    "nadam": optax.nadam,
    "adadelta": optax.adadelta,
    "lion": optax.lion,
}


def make_optimizer(optimizer_name: str, learning_rate: float):
    """Optimizer by (Keras-style) name. eps=1e-7 where supported, matching
    tf.keras defaults (the reference resolves names via tf.keras.optimizers,
    bear_net.py:264)."""
    name = optimizer_name.lower()
    if name not in _OPTAX_NAMES:
        raise ValueError(f"unknown optimizer {optimizer_name!r}")
    factory = _OPTAX_NAMES[name]
    try:
        return factory(learning_rate, eps=1e-7)
    except TypeError:
        return factory(learning_rate)


# --- training -------------------------------------------------------------


@dataclass
class TrainResult:
    params: dict
    losses: np.ndarray  # positive loss (-ELBO) at each optimizer apply
    opt_state: object = None  # final optimizer state (the reference loses
    # this across restarts; pass back as opt_state_restart to resume exactly)

    @property
    def elbos(self) -> np.ndarray:
        """ELBO estimates per apply — the reference's loss_save contract
        (bear_net.py:307), what its loss.png plots."""
        return -self.losses

    @property
    def h(self) -> float:
        return float(np.exp(np.asarray(self.params["h_signed"])))

    @property
    def params_list(self) -> List[np.ndarray]:
        return params_to_list(self.params)


def _stack_batches(codes, counts, batch_size, pad_multiple=1):
    """Stack a dataset into [n_steps, B, ...] with zero padding (zero-count
    rows contribute exactly 0 likelihood and gradient). Returns stacked codes,
    counts, and the actual size of each step's batch.

    Accepts host (numpy) or device (jax.Array) inputs; device inputs are
    padded/reshaped on device — the counting engine's to_device_dataset
    handoff never round-trips through the host."""
    n = codes.shape[0]
    if n == 0:
        raise ValueError(
            "empty dataset: no k-mer rows to train/evaluate on (the ELBO "
            "scale num_kmers/batch would divide by zero)"
        )
    # Delegating per-array to _stack_one keeps the padding geometry in ONE
    # place: ref_counts stacked separately (bear_ref) must align step-for-
    # step with codes/counts, so the rounding lives only in _stack_one.
    bsz, n_steps = _stack_geometry(n, batch_size, pad_multiple)
    sizes = np.minimum(np.full(n_steps, bsz), n - bsz * np.arange(n_steps))
    return (
        _stack_one(codes, batch_size, pad_multiple),
        _stack_one(counts, batch_size, pad_multiple),
        sizes.astype(np.dtype(counts.dtype)),
    )


def _stack_geometry(n: int, batch_size, pad_multiple=1):
    """(rounded batch size, step count) shared by every stacked array."""
    bsz = int(batch_size)
    if pad_multiple > 1:
        bsz = ((bsz + pad_multiple - 1) // pad_multiple) * pad_multiple
    return bsz, max(1, -(-n // bsz))


def _stack_one(arr, batch_size, pad_multiple=1):
    """Pad/stack ONE array to [n_steps, B, ...] (the single home of the
    batch-stacking geometry; _stack_batches delegates here)."""
    n = arr.shape[0]
    bsz, n_steps = _stack_geometry(n, batch_size, pad_multiple)
    padded = n_steps * bsz
    if isinstance(arr, jax.Array):
        arr_p = jnp.pad(arr, ((0, padded - n),) + ((0, 0),) * (arr.ndim - 1))
    else:
        arr_p = np.zeros((padded,) + arr.shape[1:], dtype=arr.dtype)
        arr_p[:n] = arr
    return arr_p.reshape(n_steps, bsz, *arr.shape[1:])


def _make_grad_and_accumulate(ar_func, num_kmers, train_ar, A1, dtype,
                              acc_steps):
    """The ELBO loss gradient and the acc_steps accumulation, shared
    VERBATIM by train() and train_streaming(): the concat==streamed
    bit-parity contract (CLAUDE.md invariants) requires the two compiled
    programs to stay structurally aligned, so this math has exactly one
    home.

    Returns (grad_fn, accumulate) where accumulate(one_step_k, zero_grads)
    runs one optimizer apply's worth of gradient work: at acc_steps == 1 it
    is one_step_k(0) with NO accumulation machinery in the compiled program
    (the 0+grads / loss/1 identities are exact but shift XLA's fusion
    choices by ulps — and a length-1 inner scan measured ~4x the whole
    step's cost on v5e for small protocols, PERF.md); otherwise an inner
    scan accumulates acc_steps gradient sums (the reference's accumulator
    variables, bear_net.py:259-261, 296-315)."""

    def loss_fn(p, codes_b, counts_b, ref_b, actual_size):
        if ref_b is not None:
            oh = alphabets.one_hot(codes_b, A1, dtype)
            ar_probs = ar_func.apply(p["ar"], oh, ref_b)
        elif ar_func.apply_codes is not None:
            # Flat-one-hot fast path: avoids the [.., lag, A1] layout whose
            # 5-wide minor dim tiles to 128 lanes (see ARFunc.apply_codes).
            ar_probs = ar_func.apply_codes(p["ar"], codes_b)
        else:
            oh = alphabets.one_hot(codes_b, A1, dtype)
            ar_probs = ar_func.apply(p["ar"], oh)
        if train_ar:
            ll = ar_log_prob(counts_b, ar_probs)
        else:
            ll = bear_log_prob(counts_b, ar_probs, jnp.exp(p["h_signed"]))
        return -(num_kmers / actual_size) * jnp.sum(ll)

    grad_fn = jax.value_and_grad(loss_fn)

    def accumulate(one_step_k, zero_grads):
        if acc_steps == 1:
            loss_sum, grads = one_step_k(0)
        else:
            def inner(inner_carry, k):
                acc, loss_sum = inner_carry
                loss, grads = one_step_k(k)
                return (jax.tree.map(jnp.add, acc, grads),
                        loss_sum + loss), None

            (grads, loss_sum), _ = jax.lax.scan(
                inner, (zero_grads, jnp.zeros((), dtype)),
                jnp.arange(acc_steps),
            )
        return loss_sum, grads

    return grad_fn, accumulate


def _cast_float_tree(tree, dtype):
    """Cast a pytree's floating leaves to the training dtype (integer leaves
    — optimizer step counters — keep their dtype)."""
    return jax.tree.map(
        lambda x: jnp.asarray(
            x, dtype=dtype if np.issubdtype(np.asarray(x).dtype, np.floating)
            else None),
        tree,
    )


def _load_resume_state(checkpoint_dir, params, opt_state, dtype):
    """Resume (params, opt_state, applies_done) from a mid-run checkpoint
    when one exists in checkpoint_dir; multi-process consistency enforced
    either way (see _check_resume_consistent)."""
    applies_done = 0
    if checkpoint_dir is not None:
        from bear_tpu.utils.checkpoint import load_train_state

        state = load_train_state(checkpoint_dir)
        if state is not None:
            params = params_from_list(state["params"], dtype=dtype)
            opt_state = _cast_float_tree(state["opt_state"], dtype)
            applies_done = int(state["applies_done"])
        _check_resume_consistent(applies_done)
    return params, opt_state, applies_done


def _host_tree(tree):
    """Pytree -> host numpy, safe for multi-process GLOBAL arrays: params
    and optimizer state are replicated, so any one addressable shard holds
    the full value (np.asarray alone raises on non-fully-addressable
    arrays)."""
    def leaf(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    return jax.tree.map(leaf, tree)


def _check_resume_consistent(applies_done: int):
    """Multi-process resume sanity: every process must see the SAME
    checkpoint (a host-local checkpoint_dir written only by process 0 would
    silently fork the ranks' trajectories)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    seen = np.asarray(
        multihost_utils.process_allgather(np.int64(applies_done))
    ).reshape(-1)
    if not np.all(seen == seen[0]):
        raise RuntimeError(
            f"checkpoint resume state differs across processes "
            f"(applies_done per rank: {seen.tolist()}); checkpoint_dir "
            "must be a path every process can read — use a shared "
            "filesystem or replicate the checkpoint to every host"
        )


# Flatten batch stacks at rest once the TPU tile padding of the [B, width]
# minor dims would waste more than this many bytes (see train/evaluation).
FLAT_AT_REST_MIN_WASTE = 128 << 20

# Accumulate evaluation()/h_scan() metrics across batches in float64 (when
# x64 is enabled) regardless of compute dtype. Module-level so the precision
# test can reproduce the pre-round-5 f32-carry behavior; never disable this
# in production — at genome-scale log-lik magnitudes the f32 carry absorbs
# per-batch increments (VERDICT r4).
_METRIC_ACC_F64 = True


def _use_flat_at_rest(stacked_shape, itemsize: int) -> bool:
    steps, bsz, width = stacked_shape
    if width >= 128:
        return False
    tiled = steps * bsz * 128 * itemsize
    compact = steps * bsz * width * itemsize
    return tiled - compact > FLAT_AT_REST_MIN_WASTE


def _flat_prep(stacked: dict, probe_shape, itemsize: int):
    """Shared flat-at-rest mechanism for train/evaluation.

    stacked: name -> [steps, B, width] array (or None). When the probe
    array's tile-padding waste crosses the threshold, every array is stored
    flat ([steps, B*width], compact in HBM) and the returned ``at(arr, idx,
    width)`` indexer reshapes each step's batch back inside the jitted scan.
    """
    flat = _use_flat_at_rest(probe_shape, itemsize)
    bsz = probe_shape[1]
    out = {
        k: None if a is None else (a.reshape(a.shape[0], -1) if flat else a)
        for k, a in stacked.items()
    }

    def at(arr, idx, width):
        b = jax.lax.dynamic_index_in_dim(arr, idx, keepdims=False)
        return b.reshape(bsz, width) if flat else b

    return out, at


def train(
    codes,
    counts,
    num_kmers,
    ar_func: ARFunc,
    *,
    alphabet: str = "dna",
    batch_size: int,
    epochs: int = 1,
    learning_rate: float = 0.01,
    optimizer_name: str = "Adam",
    train_ar: bool = False,
    acc_steps: int = 1,
    params_restart: Optional[list] = None,
    seed: int = 0,
    dtype=jnp.float32,
    mesh=None,
    writer=None,
    ref_counts=None,
    opt_state_restart=None,
    shuffle: bool = False,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    unroll: int = 1,
) -> TrainResult:
    """Train a BEAR (empirical-Bayes h) or AR (max-likelihood) model.

    Parameters
    ----------
    codes : [N, lag] int8 integer-coded k-mers (host array).
    counts : [N, alphabet_size+1] transition counts for the training column.
    num_kmers : total k-mer count for the unbiased ELBO scale
        (reference bear_net.py:190).
    train_ar : train the point AR likelihood instead of the BEAR marginal
        (reference bear_net.py:182-186).
    mesh : optional jax.sharding.Mesh with a 'data' axis for multi-chip
        data parallelism.
    writer : optional metrics writer with a ``scalar(tag, value, step)``
        method (see bear_tpu.utils.metrics).
    ref_counts : optional [N, alphabet_size+1] per-k-mer reference transition
        counts, passed as a second argument to ar_func.apply — the
        reference-guided BEAR variant (see bear_tpu.models.bear_ref).
    shuffle : permute the k-mer order once before batching (seeded by
        ``seed``) — replaces the reference workflow's external ``shuf`` step
        on unshuffled summarize output (docs/usage.rst:192-196).
    checkpoint_dir : when set with checkpoint_every > 0, run the scan in
        chunks of ``checkpoint_every`` optimizer applies, atomically
        checkpointing {params, opt_state, applies_done} between chunks, and
        RESUME from an existing checkpoint in that directory — a killed run
        replays to a bit-identical final trajectory (the scan sequence is a
        pure function of the apply index). Only process 0 writes. The
        reference can only restart from a COMPLETED run's pickle
        (train_bear_net.py:113-118).
    """
    A1 = alphabets.alphabet_size(alphabet) + 1
    key = jax.random.key(seed)
    if params_restart is not None:
        params = params_from_list(params_restart, dtype=dtype)
    else:
        params = init_params(key, ar_func, dtype=dtype)
    # Normalize every parameter to the training dtype (an AR function built
    # with a different dtype would otherwise leak it into the optimizer state
    # and break restart dtype stability).
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), params)

    optimizer = make_optimizer(optimizer_name, learning_rate)
    if opt_state_restart is not None:
        opt_state = _cast_float_tree(opt_state_restart, dtype)
    else:
        opt_state = optimizer.init(params)

    params, opt_state, applies_done = _load_resume_state(
        checkpoint_dir, params, opt_state, dtype)

    if isinstance(codes, jax.Array):
        # Device dataset (counting-engine handoff): stays on device.
        counts = jnp.asarray(counts, dtype=dtype)
        if ref_counts is not None:
            ref_counts = jnp.asarray(ref_counts, dtype=dtype)
        if shuffle:
            perm = jnp.asarray(np.random.default_rng(seed).permutation(len(codes)))
            codes, counts = codes[perm], counts[perm]
            if ref_counts is not None:
                ref_counts = ref_counts[perm]
    else:
        codes = np.asarray(codes)
        counts = np.asarray(counts, dtype=np.dtype(dtype))
        if ref_counts is not None:
            ref_counts = np.asarray(ref_counts, dtype=np.dtype(dtype))
        if shuffle:
            perm = np.random.default_rng(seed).permutation(len(codes))
            codes, counts = codes[perm], counts[perm]
            if ref_counts is not None:
                ref_counts = ref_counts[perm]

    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
    codes_s, counts_s, sizes = _stack_batches(codes, counts, batch_size, n_dev)
    ref_s = None
    if ref_counts is not None:
        ref_s = _stack_one(ref_counts, batch_size, n_dev)
    steps_per_epoch = codes_s.shape[0]
    total_steps = steps_per_epoch * int(epochs)
    n_apply = total_steps // int(acc_steps)
    if n_apply == 0:
        raise ValueError("fewer total steps than acc_steps; nothing to train")

    num_kmers = jnp.asarray(num_kmers, dtype=dtype)
    grad_fn, accumulate = _make_grad_and_accumulate(
        ar_func, num_kmers, train_ar, A1, dtype, acc_steps)

    # Large batch stacks live at rest FLAT as [steps, B*width]: a
    # [steps, B, 5] array tiles its (B, 5) minor dims to (B, 128) in HBM —
    # 25x padded for counts, ~10x for codes. The per-step reshape back to
    # [B, width] costs one relayout copy per step (~0.2 ms at B=32k), so
    # small datasets keep the tiled layout and skip it (_flat_prep).
    lag_w, counts_w = codes_s.shape[2], counts_s.shape[2]
    stacked, at_batch = _flat_prep(
        {"codes": codes_s, "counts": counts_s, "ref": ref_s},
        counts_s.shape, np.dtype(dtype).itemsize,
    )
    codes_s, counts_s, ref_s = stacked["codes"], stacked["counts"], stacked["ref"]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from bear_tpu.parallel.mesh import put_global

        # Flat sharding over 'data' stays row-aligned: B is padded to a
        # multiple of the mesh size, so each device's contiguous span is
        # whole rows times the row width. put_global handles meshes that
        # span multiple processes (each host holds the full replicated
        # dataset and contributes only its addressable shards).
        batch_sharding = NamedSharding(mesh, P(None, "data"))
        codes_s = put_global(codes_s, batch_sharding)
        counts_s = put_global(counts_s, batch_sharding)
        if ref_s is not None:
            ref_s = put_global(ref_s, batch_sharding)
    else:
        codes_s = jnp.asarray(codes_s)
        counts_s = jnp.asarray(counts_s)
        if ref_s is not None:
            ref_s = jnp.asarray(ref_s)
    sizes = jnp.asarray(sizes)

    zero_grads = jax.tree.map(jnp.zeros_like, params)

    # The whole run is one scan over optimizer applies; each apply holds an
    # inner scan accumulating acc_steps gradient sums (the reference's
    # accumulator variables, bear_net.py:259-261, 296-315) — except at
    # acc_steps == 1, where the inner scan would be pure per-iteration
    # overhead: a nested length-1 scan (plus the 0+grads identity) measured
    # ~4x the whole step's cost on v5e for small protocols (PERF.md).
    # The data stacks enter run() as ARGUMENTS, not closure constants:
    # multi-process global arrays may not be closed over, and as args large
    # stacks are never re-embedded into the program per trace.
    # The apply ids also enter as an argument so the checkpointed mode can
    # run the SAME scan in chunks — each apply is a pure function of its
    # index, so a chunked (or resumed) run replays bit-identically.
    def run(p, o, codes_s, counts_s, ref_s, sizes, apply_ids):
        def one_step(p, idx):
            return grad_fn(
                p,
                at_batch(codes_s, idx, lag_w),
                at_batch(counts_s, idx, counts_w),
                None if ref_s is None else at_batch(ref_s, idx, counts_w),
                sizes[idx],
            )

        def apply_step(carry, apply_idx):
            p, o = carry
            start = apply_idx * acc_steps
            loss_sum, grads = accumulate(
                lambda k: one_step(p, (start + k) % steps_per_epoch),
                zero_grads,
            )
            updates, o = optimizer.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            # ELBO estimate recorded at each apply (reference bear_net.py:303-307).
            return (p, o), -loss_sum / acc_steps

        return jax.lax.scan(apply_step, (p, o), apply_ids, unroll=unroll)

    run = jax.jit(run)
    start_apply = applies_done
    if checkpoint_dir is not None and int(checkpoint_every) > 0:
        from bear_tpu.utils.checkpoint import save_train_state

        is_proc0 = jax.process_index() == 0
        ce = int(checkpoint_every)
        elbo_parts = []
        for a0 in range(applies_done, n_apply, ce):
            a1 = min(a0 + ce, n_apply)
            (params, opt_state), e = run(
                params, opt_state, codes_s, counts_s, ref_s, sizes,
                jnp.arange(a0, a1),
            )
            elbo_parts.append(np.asarray(e))
            applies_done = a1
            if is_proc0:
                save_train_state(checkpoint_dir, {
                    "params": params_to_list(_host_tree(params)),
                    "opt_state": _host_tree(opt_state),
                    "applies_done": applies_done,
                })
        elbos = (np.concatenate(elbo_parts) if elbo_parts
                 else np.zeros(0, np.dtype(dtype)))
    else:
        (params, opt_state), elbos = run(
            params, opt_state, codes_s, counts_s, ref_s, sizes,
            jnp.arange(applies_done, n_apply),
        )
        elbos = np.asarray(elbos)
    if writer is not None:
        for i, e in enumerate(elbos):
            writer.scalar("elbo", float(e),
                          step=(start_apply + i + 1) * acc_steps)
    return TrainResult(
        params=jax.tree.map(lambda x: np.asarray(x), params),
        losses=-elbos,
        opt_state=jax.tree.map(lambda x: np.asarray(x), opt_state),
    )


def _shards_takes_epoch(shards) -> bool:
    """Whether a shards callable accepts an epoch argument (the hook for
    per-epoch shard-ORDER shuffling — the caller decides the order, e.g.
    permuting its file list; see train_bear_net's streaming path)."""
    import inspect

    try:
        return len(inspect.signature(shards).parameters) >= 1
    except (TypeError, ValueError):
        return False


def train_streaming(
    shards,
    num_kmers,
    ar_func: ARFunc,
    *,
    alphabet: str = "dna",
    batch_size: int,
    epochs: int = 1,
    learning_rate: float = 0.01,
    optimizer_name: str = "Adam",
    train_ar: bool = False,
    params_restart: Optional[list] = None,
    opt_state_restart=None,
    seed: int = 0,
    dtype=jnp.float32,
    writer=None,
    block_steps: int = 64,
    mesh=None,
    acc_steps: int = 1,
    shuffle: bool = False,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1,
) -> TrainResult:
    """Shard-streamed training: host/device memory bounded by ONE shard.

    ``train()`` stacks the whole dataset on device; for beyond-RAM corpora
    (the reference streams shards with tf.data interleave,
    dataloader.py:6-50 / train_bear_net.py:79-86) this variant consumes an
    iterator of shards instead. The stream of batches (batches never span
    shard boundaries) is grouped into optimizer applies of ``acc_steps``
    batches each — accumulation groups DO span shard boundaries, exactly as
    the reference accumulates consecutive batches of its interleaved stream
    (bear_net.py:296-315) — and the applies run through a fixed-geometry
    jitted block of ``block_steps`` applies: ONE compilation regardless of
    shard count or ragged tails (padded applies are skipped with lax.cond,
    leaving params and optimizer state untouched, so the trajectory equals
    the concat-loaded one whenever the batch composition matches).

    Parameters
    ----------
    shards : callable returning an iterable of (codes, counts) pairs — e.g.
        ``lambda: (load_dense(f, ...).train_pair(col) for f in files)``. It
        is re-invoked once per epoch; a callable accepting one argument is
        passed the epoch number (the hook for per-epoch shard-order
        shuffling). Each shard's final batch may be partial. A third element
        per shard carries prepared reference counts for the reference-guided
        model (see bear_ref.train_streaming).
    num_kmers : global k-mer count across ALL shards (the unbiased ELBO
        scale must see the full corpus).
    mesh : optional jax.sharding.Mesh with a ``data`` axis: each block's
        batch rows are sharded over it (multi-process capable via
        put_global) and XLA inserts the gradient psum — streaming and data
        parallelism compose, matching the reference's
        MirroredStrategy-over-streamed-dataset (bear_net.py:246, 273).
    acc_steps : gradient-accumulation group size; a trailing group of fewer
        than acc_steps batches is dropped (``train()`` parity).
    shuffle : permute rows WITHIN each shard per epoch (seeded by
        (seed, epoch, stream position)); combine with an epoch-aware
        ``shards`` callable for shard-order shuffling.
    checkpoint_dir : when set, atomically checkpoint {params, opt_state,
        applies_done} there every ``checkpoint_every`` optimizer APPLIES —
        the same unit as ``train()``; the cadence rounds UP to whole
        ``block_steps`` blocks, the granularity streaming executes at —
        plus once at completion, and RESUME from an existing checkpoint:
        the stream is fast-forwarded past the applies already done (shards
        before the resume point are loaded but not computed on), giving a
        bit-identical final trajectory after a kill. Only process 0 writes
        in multi-process runs.
    """
    # Same UNIT as train() (applies), executed at block granularity.
    _ck_blocks = max(1, -(-int(checkpoint_every) // int(block_steps)))
    A1 = alphabets.alphabet_size(alphabet) + 1
    key = jax.random.key(seed)
    if params_restart is not None:
        params = params_from_list(params_restart, dtype=dtype)
    else:
        params = init_params(key, ar_func, dtype=dtype)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), params)

    optimizer = make_optimizer(optimizer_name, learning_rate)
    if opt_state_restart is not None:
        opt_state = _cast_float_tree(opt_state_restart, dtype)
    else:
        opt_state = optimizer.init(params)

    params, opt_state, applies_done = _load_resume_state(
        checkpoint_dir, params, opt_state, dtype)

    num_kmers = jnp.asarray(num_kmers, dtype=dtype)
    acc_steps = int(acc_steps)
    K = int(block_steps)
    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
    # Batch rows pad to a mesh multiple so the flat [.., B*width] sharding
    # stays row-aligned (same geometry as train()).
    bsz = -(-int(batch_size) // n_dev) * n_dev

    grad_fn, accumulate = _make_grad_and_accumulate(
        ar_func, num_kmers, train_ar, A1, dtype, acc_steps)
    meta = {}  # lag_w / with_ref, set by the first shard of the stream
    zero_grads = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def run_block(p, o, codes_blk, counts_blk, ref_blk, sizes_blk,
                  valid_blk):
        lag_w, with_ref = meta["lag_w"], meta["with_ref"]

        def apply_step(carry, idx):
            p, o = carry

            def do(po):
                p, o = po

                def one_step(k):
                    return grad_fn(
                        p,
                        codes_blk[idx, k].reshape(bsz, lag_w),
                        counts_blk[idx, k].reshape(bsz, A1),
                        None if not with_ref
                        else ref_blk[idx, k].reshape(bsz, A1),
                        sizes_blk[idx, k],
                    )

                loss_sum, grads = accumulate(one_step, zero_grads)
                updates, o = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), -loss_sum / acc_steps

            def skip(po):
                # Padded apply: a true no-op — params AND optimizer state
                # (step counters, moments) must not advance.
                return po, jnp.zeros((), dtype)

            (p, o), elbo = jax.lax.cond(valid_blk[idx], do, skip, (p, o))
            return (p, o), elbo

        return jax.lax.scan(apply_step, (p, o), jnp.arange(K))

    takes_epoch = _shards_takes_epoch(shards)

    def batch_stream():
        """Flat stream over epochs/shards of per-batch flat rows:
        (codes_flat, counts_flat, ref_flat|None, actual_size)."""
        pos = 0  # position in the stream: the in-shard shuffle seed index
        for epoch in range(int(epochs)):
            it = shards(epoch) if takes_epoch else shards()
            for shard in it:
                codes = np.asarray(shard[0])
                counts = np.asarray(shard[1], dtype=np.dtype(dtype))
                ref = np.asarray(shard[2], dtype=np.dtype(dtype)) \
                    if len(shard) > 2 else None
                if "with_ref" not in meta:
                    meta["with_ref"] = ref is not None
                elif meta["with_ref"] != (ref is not None):
                    raise ValueError("all shards must agree on carrying "
                                     "reference counts")
                if shuffle:
                    perm = np.random.default_rng(
                        [seed, epoch, pos]).permutation(len(codes))
                    codes, counts = codes[perm], counts[perm]
                    if ref is not None:
                        ref = ref[perm]
                pos += 1
                codes_s, counts_s, sizes = _stack_batches(codes, counts, bsz)
                if "lag_w" not in meta:
                    meta["lag_w"] = codes_s.shape[2]
                elif codes_s.shape[2] != meta["lag_w"]:
                    raise ValueError(
                        f"shard lag {codes_s.shape[2]} != first shard's "
                        f"{meta['lag_w']}"
                    )
                ref_s = None
                if ref is not None:
                    ref_s = _stack_one(ref, bsz)
                for t in range(codes_s.shape[0]):
                    yield (codes_s[t].reshape(-1), counts_s[t].reshape(-1),
                           None if ref_s is None else ref_s[t].reshape(-1),
                           sizes[t])

    def group_stream():
        """Accumulation groups of acc_steps consecutive batches (groups span
        shard boundaries); the trailing partial group is dropped — identical
        effect on the parameters as train()/the reference (bear_net.py:301)."""
        pending = []
        for b in batch_stream():
            pending.append(b)
            if len(pending) == acc_steps:
                yield pending
                pending = []

    is_proc0 = jax.process_index() == 0

    def save_state(applies):
        if checkpoint_dir is None or not is_proc0:
            return
        from bear_tpu.utils.checkpoint import save_train_state

        save_train_state(checkpoint_dir, {
            "params": params_to_list(_host_tree(params)),
            "opt_state": _host_tree(opt_state),
            "applies_done": int(applies),
        })

    put = jnp.asarray
    put_dummy = jnp.asarray  # the width-1 ref placeholder cannot be sharded
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from bear_tpu.parallel.mesh import put_global

        # Blocks are [K, acc, B*width] flat: sharding the last axis over
        # 'data' splits whole rows (B is a mesh multiple — see bsz above).
        batch_sharding = NamedSharding(mesh, P(None, None, "data"))
        repl_sharding = NamedSharding(mesh, P())
        put = lambda a: put_global(a, batch_sharding)  # noqa: E731
        put_dummy = lambda a: put_global(a, repl_sharding)  # noqa: E731

    elbo_parts = []
    blocks_done = 0
    applies_seen = 0  # groups consumed from the stream (incl. skipped resume)
    cb = nb = rb = sb = vb = None  # block staging buffers, fresh per block
    n_in_block = 0

    def alloc_block(first_group):
        nonlocal cb, nb, rb, sb, vb
        w_codes = first_group[0][0].shape[0]
        w_counts = first_group[0][1].shape[0]
        w_ref = (first_group[0][2].shape[0] if meta["with_ref"] else 1)
        cb = np.zeros((K, acc_steps, w_codes), first_group[0][0].dtype)
        nb = np.zeros((K, acc_steps, w_counts), first_group[0][1].dtype)
        rb = np.zeros((K, acc_steps, w_ref), np.dtype(dtype))
        sb = np.ones((K, acc_steps), np.dtype(dtype))  # pads: no 0-div
        vb = np.zeros(K, dtype=bool)

    def flush_block():
        nonlocal params, opt_state, blocks_done, applies_done
        nonlocal n_in_block, cb, nb, rb, sb, vb
        n = n_in_block
        if n == 0:
            return
        (params, opt_state), elbos = run_block(
            params, opt_state, put(cb), put(nb),
            put(rb) if meta["with_ref"] else put_dummy(rb),
            jnp.asarray(sb), jnp.asarray(vb),
        )
        elbo_parts.append(np.asarray(elbos)[:n])
        applies_done += n
        blocks_done += 1
        n_in_block = 0
        cb = nb = rb = sb = vb = None  # fresh buffers next block: never
        # mutate host memory a device transfer may still alias
        if checkpoint_dir is not None and blocks_done % _ck_blocks == 0:
            save_state(applies_done)

    for group in group_stream():
        applies_seen += 1
        if applies_seen <= applies_done:
            continue  # resume fast-forward: already applied before the kill
        if cb is None:
            alloc_block(group)
        i = n_in_block
        for k, (c, n_, r, s) in enumerate(group):
            cb[i, k], nb[i, k] = c, n_
            if r is not None:
                rb[i, k] = r
            sb[i, k] = s
        vb[i] = True
        n_in_block += 1
        if n_in_block == K:
            flush_block()
    flush_block()

    if "lag_w" not in meta:
        raise ValueError("shards() yielded no shards")
    if applies_seen == 0:
        raise ValueError("fewer total batches than acc_steps; nothing to train")
    save_state(applies_done)
    start_apply = applies_done - sum(len(e) for e in elbo_parts)
    elbos = np.concatenate(elbo_parts) if elbo_parts else np.zeros(0)
    if writer is not None:
        for i, e in enumerate(elbos):
            writer.scalar("elbo", float(e),
                          step=(start_apply + i + 1) * acc_steps)
    return TrainResult(
        params=jax.tree.map(lambda x: np.asarray(x), params),
        losses=-elbos,
        opt_state=jax.tree.map(lambda x: np.asarray(x), opt_state),
    )


# --- evaluation -----------------------------------------------------------


def _evaluation_step(
    counts_test, ar_probs, h, van_reg, key, counts_train=None, dtype=jnp.float32
):
    """Per-batch metrics for the three simultaneous model readings — BEAR
    posterior predictive, point AR, and vanilla BMM with a vector of priors
    (reference bear_net.py:323-371).

    h may be a scalar or a vector [H] (h_scan, reference bear_net.py:516-529).
    Returns sums to be accumulated: (ll_ear, ll_arm, ll_van[V], correct_ear,
    correct_arm, correct_van[V], total_len).
    """
    A1 = counts_test.shape[-1]
    h = jnp.asarray(h, dtype=dtype)
    h_b = h.reshape(h.shape + (1, 1))  # broadcast against [B, A1]
    total_test = jnp.sum(counts_test, axis=-1)

    if counts_train is not None:
        van_condition = counts_train[:, None, :] + van_reg[:, None]
        cond_ear = counts_train
    else:
        van_condition = van_reg[:, None] * jnp.ones((1, A1), dtype=dtype)
        cond_ear = None

    conc_ear = ar_probs / h_b + EPSILON
    if cond_ear is not None:
        conc_ear = conc_ear + cond_ear
    ll_ear_per = dirichlet_multinomial_perm_logpmf(counts_test, conc_ear)
    ll_ear = jnp.sum(ll_ear_per, axis=-1)

    probs_arm = ar_probs + EPSILON
    ll_arm = jnp.sum(multinomial_perm_logpmf(counts_test, probs_arm))

    conc_van = van_condition + EPSILON
    ll_van = jnp.sum(
        dirichlet_multinomial_perm_logpmf(counts_test[:, None, :], conc_van), axis=0
    )

    k_ear, k_arm, k_van = jax.random.split(key, 3)
    ml_ear = ml_output_dm(conc_ear, k_ear)
    ml_arm = ml_output_mult(probs_arm, k_arm)
    ml_van = ml_output_dm(conc_van, k_van)
    rng_idx = jnp.arange(A1, dtype=dtype)
    oh_ear = (ml_ear[..., None] == rng_idx).astype(dtype)
    oh_arm = (ml_arm[..., None] == rng_idx).astype(dtype)
    oh_van = (ml_van[..., None] == rng_idx).astype(dtype)

    correct_ear = jnp.sum(jnp.sum(counts_test * oh_ear, axis=-1), axis=-1)
    correct_arm = jnp.sum(counts_test * oh_arm)
    correct_van = jnp.sum(jnp.sum(counts_test[:, None, :] * oh_van, axis=0), axis=-1)
    total_len = jnp.sum(counts_test)
    return ll_ear, ll_arm, ll_van, correct_ear, correct_arm, correct_van, total_len


def evaluation(
    codes,
    counts,
    ds_loc_train,
    ds_loc_test,
    alphabet,
    h,
    ar_func: ARFunc,
    ar_params,
    van_reg,
    *,
    batch_size: int = 1 << 14,
    dtype=jnp.float32,
    seed: int = 0,
    mesh=None,
    ref_counts=None,
):
    """Evaluate a trained BEAR/AR/BMM model (reference bear_net.py:387-463).

    ds_loc_train = -1 disables conditioning on training counts (prior mode).

    Returns the reference's 9-tuple:
    (ll_ear, ll_arm, ll_van, perp_ear, perp_arm, perp_van,
     acc_ear, acc_arm, acc_van) with van entries vectors over van_reg.

    Metric accumulation across batches runs in float64 (when x64 is
    enabled) regardless of the compute ``dtype``: at genome-scale log-lik
    magnitudes (~1e9) float32 ulps are ~64, so an f32 scan carry would
    absorb per-batch increments — the same fix evaluation_streaming's host
    partials received (reference evaluation computes in f64 by default,
    bear_net.py:387-463). Per-batch compute stays in ``dtype``.
    """
    A1 = alphabets.alphabet_size(alphabet) + 1
    use_train = ds_loc_train >= 0
    if isinstance(codes, jax.Array):
        counts = jnp.asarray(counts, dtype=dtype)
        if ref_counts is not None:
            ref_counts = jnp.asarray(ref_counts, dtype=dtype)
    else:
        codes = np.asarray(codes)
        counts = np.asarray(counts, dtype=np.dtype(dtype))
        if ref_counts is not None:
            ref_counts = np.asarray(ref_counts, dtype=np.dtype(dtype))
    counts_test = counts[:, ds_loc_test, :]
    counts_train = counts[:, ds_loc_train, :] if use_train else None
    van_reg = jnp.asarray(np.asarray(van_reg), dtype=dtype)
    h_arr = jnp.asarray(h, dtype=dtype)

    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
    codes_s, counts_test_s, _ = _stack_batches(codes, counts_test, batch_size, n_dev)
    if use_train:
        counts_train_s = _stack_one(counts_train, batch_size, n_dev)
    ref_s = None
    if ref_counts is not None:
        ref_s = _stack_one(ref_counts, batch_size, n_dev)

    # Flat at-rest batch storage for large stacks (see train/_flat_prep).
    lag_w, counts_w = codes_s.shape[2], counts_test_s.shape[2]
    stacked, at_batch = _flat_prep(
        {
            "codes": codes_s,
            "test": counts_test_s,
            "train": counts_train_s if use_train else None,
            "ref": ref_s,
        },
        counts_test_s.shape, np.dtype(dtype).itemsize,
    )
    codes_s, counts_test_s = stacked["codes"], stacked["test"]
    counts_train_s, ref_s = stacked["train"], stacked["ref"]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from bear_tpu.parallel.mesh import put_global

        sh = NamedSharding(mesh, P(None, "data"))
        codes_s = put_global(codes_s, sh)
        counts_test_s = put_global(counts_test_s, sh)
        if use_train:
            counts_train_s = put_global(counts_train_s, sh)
        if ref_s is not None:
            ref_s = put_global(ref_s, sh)
    else:
        # Device arrays up front: numpy stacks would otherwise be captured
        # as jit closure CONSTANTS (re-embedded per trace; multi-GB at
        # genome scale) — train() does the same.
        codes_s = jnp.asarray(codes_s)
        counts_test_s = jnp.asarray(counts_test_s)
        if use_train:
            counts_train_s = jnp.asarray(counts_train_s)
        if ref_s is not None:
            ref_s = jnp.asarray(ref_s)

    base_key = jax.random.key(seed)

    # Data stacks are jit ARGUMENTS (multi-process global arrays may not be
    # closed over; also avoids re-embedding large stacks as constants).
    def run(codes_s, counts_test_s, counts_train_s, ref_s):
        def batch_metrics(step):
            codes_b = at_batch(codes_s, step, lag_w)
            ct_b = at_batch(counts_test_s, step, counts_w)
            tr_b = (
                at_batch(counts_train_s, step, counts_w) if use_train else None
            )
            if ref_s is not None:
                oh = alphabets.one_hot(codes_b, A1, dtype)
                ref_b = at_batch(ref_s, step, counts_w)
                ar_probs = ar_func.apply(ar_params, oh, ref_b)
            elif ar_func.apply_codes is not None:
                ar_probs = ar_func.apply_codes(ar_params, codes_b)
            else:
                oh = alphabets.one_hot(codes_b, A1, dtype)
                ar_probs = ar_func.apply(ar_params, oh)
            return _evaluation_step(
                ct_b,
                ar_probs,
                h_arr,
                van_reg,
                jax.random.fold_in(base_key, step),
                counts_train=tr_b,
                dtype=dtype,
            )

        def body(carry, step):
            out = batch_metrics(step)
            # Promote per-batch metrics into the (f64) carry dtype — the
            # batch compute itself stays in `dtype` (see docstring).
            return jax.tree.map(
                lambda c, o: c + o.astype(c.dtype), carry, out
            ), None

        def acc_dtype(d):
            if (
                _METRIC_ACC_F64
                and jnp.issubdtype(d, jnp.floating)
                and jax.config.jax_enable_x64
            ):
                return jnp.float64
            return d

        zeros = jax.tree.map(
            lambda s: jnp.zeros(s.shape, acc_dtype(s.dtype)),
            jax.eval_shape(batch_metrics, 0),
        )
        carry, _ = jax.lax.scan(body, zeros, jnp.arange(codes_s.shape[0]))
        return carry

    run = jax.jit(run)
    ll_ear, ll_arm, ll_van, c_ear, c_arm, c_van, total = run(
        codes_s, counts_test_s, counts_train_s, ref_s
    )
    return (
        np.asarray(ll_ear),
        np.asarray(ll_arm),
        np.asarray(ll_van),
        np.asarray(jnp.exp(-ll_ear / total)),
        np.asarray(jnp.exp(-ll_arm / total)),
        np.asarray(jnp.exp(-ll_van / total)),
        np.asarray(c_ear / total),
        np.asarray(c_arm / total),
        np.asarray(c_van / total),
    )


def evaluation_streaming(
    shards,
    ds_loc_train,
    ds_loc_test,
    alphabet,
    h,
    ar_func: ARFunc,
    ar_params,
    van_reg,
    *,
    batch_size: int = 1 << 14,
    dtype=jnp.float32,
    seed: int = 0,
    block_steps: int = 32,
    mesh=None,
):
    """Shard-streamed evaluation: memory bounded by one shard.

    The evaluation metrics are pure per-k-mer sums, so shard boundaries
    cannot change them (up to float reassociation and per-batch argmax
    tie-break keys). Same contract and 9-tuple as ``evaluation``; ``shards``
    is a callable returning an iterable of (codes, counts[N, num_ds, A+1])
    pairs, consumed once — an optional third element per shard carries
    PREPARED reference counts [N, A+1] for the reference-guided model
    (see bear_ref.evaluation_streaming). Batches stream through one
    fixed-geometry jitted block (single compilation); the tie-break key is
    folded on the GLOBAL batch index so an aligned shard split reproduces
    the in-memory result up to summation reassociation across block
    partials. ``mesh`` (a Mesh with a 'data' axis) shards each block's
    batch rows over the devices — streamed evaluation composes with data
    parallelism like train_streaming; XLA reduces the metric sums.
    """
    A1 = alphabets.alphabet_size(alphabet) + 1
    use_train = ds_loc_train >= 0
    van_reg = jnp.asarray(np.asarray(van_reg), dtype=dtype)
    h_arr = jnp.asarray(h, dtype=dtype)
    base_key = jax.random.key(seed)
    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
    bsz = -(-int(batch_size) // n_dev) * n_dev
    K = int(block_steps)
    lag_w = None
    with_ref = None  # set by the first shard

    put = jnp.asarray
    put_small = jnp.asarray
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from bear_tpu.parallel.mesh import put_global

        # Blocks are [K, B*width] flat; B is a mesh multiple, so sharding
        # the last axis over 'data' splits whole rows.
        batch_sharding = NamedSharding(mesh, P(None, "data"))
        repl = NamedSharding(mesh, P())
        put = lambda a: put_global(a, batch_sharding)  # noqa: E731
        put_small = lambda a: put_global(a, repl)  # noqa: E731

    @jax.jit
    def run_block(codes_blk, test_blk, train_blk, ref_blk, valid_blk, step0):
        def batch_metrics(k):
            codes_b = codes_blk[k].reshape(bsz, lag_w)
            ct_b = test_blk[k].reshape(bsz, A1)
            tr_b = train_blk[k].reshape(bsz, A1) if use_train else None
            if with_ref:
                oh = alphabets.one_hot(codes_b, A1, dtype)
                ar_probs = ar_func.apply(ar_params, oh,
                                         ref_blk[k].reshape(bsz, A1))
            elif ar_func.apply_codes is not None:
                ar_probs = ar_func.apply_codes(ar_params, codes_b)
            else:
                oh = alphabets.one_hot(codes_b, A1, dtype)
                ar_probs = ar_func.apply(ar_params, oh)
            return _evaluation_step(
                ct_b, ar_probs, h_arr, van_reg,
                jax.random.fold_in(base_key, step0 + k),
                counts_train=tr_b, dtype=dtype,
            )

        zeros = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(batch_metrics, 0),
        )

        def body(carry, k):
            out = jax.lax.cond(valid_blk[k], batch_metrics,
                               lambda _: zeros, k)
            return jax.tree.map(jnp.add, carry, out), None

        carry, _ = jax.lax.scan(body, zeros, jnp.arange(K))
        return carry

    totals = None
    step = 0
    for shard in shards():
        codes, counts = shard[0], shard[1]
        ref = shard[2] if len(shard) > 2 else None
        if with_ref is None:
            with_ref = ref is not None
        elif with_ref != (ref is not None):
            raise ValueError("all shards must agree on carrying reference "
                             "counts")
        counts = np.asarray(counts, dtype=np.dtype(dtype))
        counts_test = counts[:, ds_loc_test, :]
        codes_s, test_s, _ = _stack_batches(np.asarray(codes), counts_test,
                                            bsz)
        if lag_w is None:
            lag_w = codes_s.shape[2]
        elif codes_s.shape[2] != lag_w:
            raise ValueError(
                f"shard lag {codes_s.shape[2]} != first shard's {lag_w}"
            )
        train_s = (_stack_one(counts[:, ds_loc_train, :], bsz)
                   if use_train else None)
        ref_s = (_stack_one(np.asarray(ref, dtype=np.dtype(dtype)), bsz)
                 if with_ref else None)
        steps = codes_s.shape[0]
        codes_f = codes_s.reshape(steps, -1)
        test_f = test_s.reshape(steps, -1)
        train_f = train_s.reshape(steps, -1) if use_train else None
        ref_f = ref_s.reshape(steps, -1) if with_ref else None
        for s0 in range(0, steps, K):
            n = min(K, steps - s0)
            cb = np.zeros((K, codes_f.shape[1]), codes_f.dtype)
            tb = np.zeros((K, test_f.shape[1]), test_f.dtype)
            rb = (np.zeros((K, train_f.shape[1]), train_f.dtype)
                  if use_train else np.zeros((K, 1), np.dtype(dtype)))
            fb = (np.zeros((K, ref_f.shape[1]), ref_f.dtype)
                  if with_ref else np.zeros((K, 1), np.dtype(dtype)))
            vb = np.zeros(K, dtype=bool)
            cb[:n], tb[:n] = codes_f[s0:s0 + n], test_f[s0:s0 + n]
            if use_train:
                rb[:n] = train_f[s0:s0 + n]
            if with_ref:
                fb[:n] = ref_f[s0:s0 + n]
            vb[:n] = True
            out = run_block(put(cb), put(tb),
                            put(rb) if use_train else put_small(rb),
                            put(fb) if with_ref else put_small(fb),
                            put_small(np.asarray(vb)),
                            jnp.int32(step + s0))
            # Host accumulation is float64 regardless of the device metric
            # dtype: at genome-scale log-lik magnitudes (~1e9) float32 ulps
            # are ~64, so f32 block partials would drift from the in-memory
            # result by more than summation reassociation (VERDICT r3).
            # _host_tree owns the multi-process non-addressable-leaf rule.
            out = jax.tree.map(
                lambda x: np.asarray(x, dtype=np.float64), _host_tree(out))
            totals = out if totals is None else jax.tree.map(
                np.add, totals, out)
        step += steps
    if totals is None:
        raise ValueError("shards() yielded no shards")
    ll_ear, ll_arm, ll_van, c_ear, c_arm, c_van, total = totals
    return (
        ll_ear, ll_arm, ll_van,
        np.exp(-ll_ear / total), np.exp(-ll_arm / total),
        np.exp(-ll_van / total),
        c_ear / total, c_arm / total, c_van / total,
    )


def h_scan(
    codes,
    counts,
    ds_loc_train,
    ds_loc_test,
    alphabet,
    h_values,
    ar_func: ARFunc,
    ar_params,
    **kwargs,
):
    """Evaluate BEAR at a vector of h simultaneously
    (reference bear_net.py:465-531). Returns (ll_ear[H], perp_ear[H], acc_ear[H])."""
    out = evaluation(
        codes,
        counts,
        ds_loc_train,
        ds_loc_test,
        alphabet,
        np.asarray(h_values),
        ar_func,
        ar_params,
        van_reg=np.ones(1),
        **kwargs,
    )
    ll_ear, _, _, perp_ear, _, _, acc_ear, _, _ = out
    return ll_ear, perp_ear, acc_ear


def h_scan_streaming(
    shards,
    ds_loc_train,
    ds_loc_test,
    alphabet,
    h_values,
    ar_func: ARFunc,
    ar_params,
    **kwargs,
):
    """Shard-streamed h_scan: the paper's model-selection tool (reference
    bear_net.py:465-531, docs/usage.rst:269-282) with memory bounded by one
    shard — the vector-h broadcast rides evaluation_streaming's block
    machinery unchanged (metrics are pure per-k-mer sums, so shard
    boundaries cannot move them). Same contract/returns as ``h_scan``;
    ``shards`` as in ``evaluation_streaming``."""
    out = evaluation_streaming(
        shards,
        ds_loc_train,
        ds_loc_test,
        alphabet,
        np.asarray(h_values),
        ar_func,
        ar_params,
        van_reg=np.ones(1),
        **kwargs,
    )
    ll_ear, _, _, perp_ear, _, _, acc_ear, _, _ = out
    return ll_ear, perp_ear, acc_ear
