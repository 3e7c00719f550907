"""bear_tpu: a TPU-native (JAX/XLA/Pallas) framework for Bayesian embedded
autoregressive (BEAR) models over biological sequences.

Re-designed from scratch for TPU hardware with the capabilities of
debbiemarkslab/BEAR (Amin, Weinstein & Marks, NeurIPS 2021):

- ``bear_tpu.ops``      — pure-function probability core (Dirichlet-multinomial
  marginal likelihoods, log-gamma sampling, k-mer integer codecs) and Pallas
  kernels for the hot paths.
- ``bear_tpu.data``     — host-side loaders for the reference's dense/sparse
  transition-count TSV formats, emitting integer-coded k-mer batches.
- ``bear_tpu.models``   — embedded AR functions (linear/CNN/stop/attention,
  optional bfloat16 mixed precision), BEAR/AR training (empirical-Bayes h),
  evaluation, h-scan, the reference-guided variant (bear_ref), vBEAR
  (variational posterior over h), and BMM-marginal lag selection.
- ``bear_tpu.parallel`` — device-mesh utilities: data-parallel training and
  sharded count tensors via jax.sharding + psum collectives.
- ``bear_tpu.counting`` — the TPU-native k-mer counting engine replacing
  KMC + summarize.py: streaming read encoding on the host, rolling-code
  transition extraction + scatter-add on device, all-reduce merges.
- ``bear_tpu.inference``— posterior-predictive scoring of variants and
  sequences, and Gumbel-max sequence generation (assembly).
- ``bear_tpu.utils``    — config front-end (reference-compatible .cfg files),
  checkpointing, metrics writers.
"""

__version__ = "0.1.0"
