"""Probability core, codecs, and device kernels."""

from bear_tpu.ops import alphabets, distributions, loggamma
from bear_tpu.ops.alphabets import (
    alphabet_size,
    decode_kmers,
    encode_kmers,
    input_letters,
    one_hot,
    one_hot_kmers,
    output_letters,
)
from bear_tpu.ops.distributions import (
    EPSILON,
    bmm_marginal_logpmf,
    dirichlet_multinomial_perm_logpmf,
    log_combinations,
    ml_output_dm,
    ml_output_mult,
    multinomial_perm_logpmf,
)
from bear_tpu.ops.loggamma import log_gamma, log_gamma_pdf, sample_dirichlet_log
