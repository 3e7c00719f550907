"""Scalar metrics writer.

The reference logs one TensorBoard scalar ('elbo') per accumulation step
(bear_net.py:303-305). TF isn't a dependency here; scalars go to a JSONL file
(works with any dashboard, trivially greppable) and, when TensorBoard's
tensorboardX/flax writers are available, can be tee'd there by the caller.
"""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    """Append-only scalars.jsonl writer with the writer.scalar(tag, value, step)
    interface used by bear_net.train."""

    def __init__(self, out_folder: str, filename: str = "scalars.jsonl"):
        os.makedirs(out_folder, exist_ok=True)
        self.path = os.path.join(out_folder, filename)
        self._fh = open(self.path, "a")

    def scalar(self, tag: str, value: float, step: int):
        self._fh.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step), "time": time.time()}
            )
            + "\n"
        )

    def flush(self):
        self._fh.flush()

    def close(self):
        self._fh.close()


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
