"""Config front-end, checkpointing, metrics."""

from bear_tpu.utils.config import RunConfig, bundled_ysd1_path
from bear_tpu.utils.checkpoint import load_params_list, load_results, save_results
from bear_tpu.utils.metrics import MetricsWriter, save_loss_curve
from bear_tpu.utils.profiling import StageTimer, trace
