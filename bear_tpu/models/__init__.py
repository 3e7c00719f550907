"""Model layer: AR functions, BEAR/AR training, evaluation, reference-guided variant."""

from bear_tpu.models.ar_funcs import (
    AR_FUNCS,
    ARFunc,
    get_ar_func,
    make_ar_func_attention,
    make_ar_func_cnn,
    make_ar_func_linear,
    make_ar_func_stop,
)
from bear_tpu.models import bear_net
from bear_tpu.models.vbear import VBearResult, train_variational_h
from bear_tpu.models.lag_selection import LagSelection, select_lag
