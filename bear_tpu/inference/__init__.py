"""Inference/application layer: posterior-predictive scoring and assembly."""

from bear_tpu.inference.assemble import assemble_no_ends
from bear_tpu.inference.serving import (
    BearServer,
    contexts_to_rows,
    table_from_dataset,
)
from bear_tpu.inference.scoring import (
    DatasetCounter,
    TableCounter,
    get_bear_probs,
    get_bear_probs_seqs,
    get_pdf,
    load_bear,
    parse_var,
)
