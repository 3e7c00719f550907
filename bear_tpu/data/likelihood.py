"""Whole-dataset BMM (vanilla-BEAR) marginal likelihood.

Replaces the reference's MirroredStrategy-distributed reduction
(bear_model/dataloader.py:111-147) with a single jitted scan over count
batches; pass ``mesh=`` (a Mesh with a ``data`` axis) to shard each batch's
k-mer rows across devices — XLA inserts the psum for the row reduction, the
TPU-native analog of the reference's strategy.reduce(SUM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bear_tpu.ops.distributions import bmm_marginal_logpmf


# Module-level jit: the cache keys on argument shapes/dtypes, so repeated
# bmm_likelihood calls (a prior sweep is this function's main use) reuse one
# compilation. A per-call @jax.jit closure retraced — and REMOTELY recompiled,
# minutes over the tunnel — on every invocation.
@jax.jit
def _bmm_step(batch, alpha_j):
    return bmm_marginal_logpmf(batch, alpha_j)


def bmm_likelihood(counts, alpha, batch_size: int = 1 << 16, mesh=None):
    """Exact BMM marginal likelihood of a dataset for a vector of priors.

    Parameters
    ----------
    counts : [num_kmers, num_ds, alphabet_size+1] array (host or device).
    alpha : [num_alpha] symmetric Dirichlet concentrations.
    batch_size : k-mer rows per device step (bounds device memory).
    mesh : optional jax.sharding.Mesh with a ``data`` axis; each batch's
        row dimension is sharded over it (reference parity:
        dataloader.py:140-147 distributes this same reduction).

    Returns
    -------
    [num_ds, num_alpha] log-likelihoods (matches reference
    dataloader.bmm_likelihood's output shape).
    """
    if not isinstance(counts, jax.Array):
        counts = np.asarray(counts)
    alpha_j = jnp.asarray(alpha)

    n_dev = 1
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(np.prod(list(mesh.shape.values())))
        batch_sharding = NamedSharding(mesh, P("data"))
        # Row batches must split evenly across the data axis; zero-padded
        # rows contribute exactly 0 to the sum, so rounding up is exact.
        batch_size = -(-batch_size // n_dev) * n_dev

    def _put(batch):
        if batch_sharding is None:
            return jnp.asarray(batch)
        from bear_tpu.parallel.mesh import put_global

        return put_global(np.asarray(batch), batch_sharding)

    # Host-side batching keeps memory bounded for genome-scale datasets; the
    # cross-batch accumulation is float64 on the host so evidence totals stay
    # exact even when device compute is float32 (x64 off). The tail batch is
    # zero-padded to a fixed shape (zero count rows contribute exactly 0) so
    # the whole call uses ONE compilation.
    total = np.zeros((counts.shape[1], np.shape(alpha)[0]), dtype=np.float64)
    n = counts.shape[0]
    # Single-batch datasets still pad to a mesh multiple so the sharding
    # divides; multi-batch ones pad the tail to the (mesh-multiple) batch_size.
    single_target = -(-max(n, 1) // n_dev) * n_dev
    for start in range(0, n, batch_size):
        batch = counts[start : start + batch_size]
        want = batch_size if n > batch_size else single_target
        if batch.shape[0] < want:
            pad = want - batch.shape[0]
            batch = (
                jnp.pad(batch, ((0, pad), (0, 0), (0, 0)))
                if isinstance(batch, jax.Array)
                else np.pad(batch, ((0, pad), (0, 0), (0, 0)))
            )
        total += np.asarray(_bmm_step(_put(batch), alpha_j), dtype=np.float64)
    return total
