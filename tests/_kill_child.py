"""Child process for the kill-and-resume test (test_kill_resume.py).

Usage: python tests/_kill_child.py CKPT_DIR OUT_NPZ KILL

Trains a small streamed BEAR run with per-block checkpointing into CKPT_DIR.
With KILL=1 the shard stream SIGKILLs the process (a real, unclean death —
no finally blocks, no atexit) when epoch 0 asks for shard 2, i.e. after the
first two shards' applies were checkpointed. With KILL=0 the run resumes
from whatever train_state.pickle is in CKPT_DIR (or starts fresh) and writes
the final params to OUT_NPZ.
"""

import os
import signal
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bear_tpu.models import get_ar_func  # noqa: E402
from bear_tpu.models.bear_net import train_streaming  # noqa: E402

LAG, BSZ, N, SEED = 3, 8, 128, 7  # 4 shards x 4 batches, 2 epochs


def make_data():
    rng = np.random.default_rng(SEED)
    codes = rng.integers(0, 4, (N, LAG)).astype(np.int8)
    counts = rng.poisson(4.0, (N, 5)).astype(np.float64)
    return codes, counts


def main():
    ckpt_dir, out_npz, kill = sys.argv[1], sys.argv[2], int(sys.argv[3])
    codes, counts = make_data()

    def shards(epoch):
        for i, s0 in enumerate(range(0, N, 32)):
            if kill and epoch == 0 and i == 2:
                os.kill(os.getpid(), signal.SIGKILL)  # unclean death
            yield codes[s0:s0 + 32], counts[s0:s0 + 32]

    ar = get_ar_func("linear", LAG, 4, dtype=jnp.float64)
    res = train_streaming(
        shards, num_kmers=N, ar_func=ar, batch_size=BSZ, epochs=2,
        learning_rate=0.02, seed=0, dtype=jnp.float64, block_steps=1,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    np.savez(out_npz, *[np.asarray(p) for p in res.params_list],
             losses=res.losses)


if __name__ == "__main__":
    main()
