"""Scalar metrics writer.

The reference logs one TensorBoard scalar ('elbo') per accumulation step
(bear_net.py:303-305). TF isn't a dependency here; scalars always go to a
JSONL file (works with any dashboard, trivially greppable). Real TensorBoard
event files are additionally written when requested — ``tensorboard=True``
or env ``BEAR_TPU_TENSORBOARD=1`` — via torch's SummaryWriter (opt-in: the
torch import costs seconds per CLI run and most runs never open TB).
"""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    """Append-only scalars.jsonl writer with the writer.scalar(tag, value, step)
    interface used by bear_net.train; optionally tees to TensorBoard."""

    def __init__(self, out_folder: str, filename: str = "scalars.jsonl",
                 tensorboard: bool | None = None):
        os.makedirs(out_folder, exist_ok=True)
        self.path = os.path.join(out_folder, filename)
        self._fh = open(self.path, "a")
        if tensorboard is None:
            tensorboard = os.environ.get("BEAR_TPU_TENSORBOARD", "") == "1"
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(out_folder, "tb"))
            except Exception:
                self._tb = None  # jsonl still written

    def scalar(self, tag: str, value: float, step: int):
        self._fh.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step), "time": time.time()}
            )
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def flush(self):
        self._fh.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        # Idempotent: the CLIs close eagerly after training AND in a
        # try/finally that also covers eval-only and exception paths.
        if not self._fh.closed:
            self._fh.close()
        if self._tb is not None:
            self._tb.close()
            self._tb = None


def save_loss_curve(losses, out_folder: str, filename: str = "loss.png"):
    """Loss-curve png (reference train_bear_net.py:128-134); no-op if
    matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
    except Exception:
        return None
    plt.figure(figsize=[10, 10])
    plt.xlabel("steps", fontsize=30)
    plt.ylabel("loss", fontsize=30)
    plt.plot(losses)
    plt.tight_layout()
    path = os.path.join(out_folder, filename)
    plt.savefig(path, dpi=200)
    plt.close()
    return path
