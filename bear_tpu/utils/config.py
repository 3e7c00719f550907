"""Reference-compatible config front-end.

The reference drives everything from configparser INI files with sections
[general] [data] [hyperp] [train] [test] [model] [results]
(bear_model/models/config_files/*.cfg; parsing at train_bear_net.py:29-118).
We keep the same file format and key names — a user's existing .cfg runs
unchanged — backed here by a typed dataclass.

Reference semantics preserved:
- out_folder 'TEST' -> package-local out_data/logs/<timestamp>
  (train_bear_net.py:32-34); trailing '*' -> use path literally, mkdir -p
  (:35-37); otherwise out_folder/logs/<timestamp> (:38-40).
- files_path 'TEST' -> the bundled YSD1 counts (:49-51).
- batch_size <= 1 -> fraction of num_kmers (:56-60).
- epochs with trailing 's' -> step count converted to epochs (:61-65).
"""

from __future__ import annotations

import configparser
import datetime
import json
import os
from dataclasses import dataclass, field
from typing import Optional

DEFAULT_REFERENCE_PATH = os.environ.get("BEAR_REFERENCE_PATH", "/root/reference")

_FIXTURES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "fixtures",
)


def _fixture_path(name: str) -> str:
    """Path to a vendored parity data fixture (bear_tpu/data/fixtures/ —
    public data shipped in-package, same contract as the reference's
    bear_model/data/). Falls back to the reference checkout only if the
    vendored copy is missing (e.g. a stripped install)."""
    vendored = os.path.join(_FIXTURES_DIR, name)
    if os.path.exists(vendored):
        return vendored
    return os.path.join(DEFAULT_REFERENCE_PATH, "bear_model", "data", name)


def bundled_ysd1_path() -> str:
    """Bundled YSD1 phage lag-5 transition counts (the published-table parity
    fixture; reference data/ysd1_lag_5_file_0_preshuf.tsv)."""
    return _fixture_path("ysd1_lag_5_file_0_preshuf.tsv")


def bundled_sparse_path() -> str:
    """Bundled sparse-format toy counts (reference
    data/ex_seqs_kmap_for_var_pred.csv)."""
    return _fixture_path("ex_seqs_kmap_for_var_pred.csv")


@dataclass
class RunConfig:
    # [general]
    out_folder: str
    seed: int
    precision: str
    # [data]
    files_path: str
    start_token: str
    sparse: bool
    num_ds: int
    alphabet: str
    train_column: int
    test_column: int
    reference_column: int
    # [hyperp]
    lag: int
    # [train]
    train: bool
    epochs_raw: str
    batch_size_raw: float
    optimizer_name: str
    learning_rate: float
    train_ar: bool
    accumulation_steps: int
    cache: bool  # the reference's tf.data .cache() knob. In-memory runs
    # always cache (the dataset lives on device), so it only matters for
    # STREAMING runs, where True (the reference default) caches each
    # shard's parsed arrays as .npz in the out folder — epochs >= 2 ingest
    # at disk speed instead of the ~1 Mrows/s TSV parse
    # (data.load_files_cached).
    restart: bool
    restart_path: str
    # [test]
    test: bool
    train_test: bool
    van_reg: list
    # [model]
    ar_func_name: str
    af_kwargs: dict = field(default_factory=dict)
    # optional [model] compute_precision: '' (full precision, default) or
    # 'bfloat16' — run the AR network's forward pass in bfloat16 on the MXU
    # while master weights, likelihood, and softmax stay in `precision`
    # (bear_tpu extension; the reference has no mixed-precision mode).
    compute_precision: str = ""
    # optional [train] data_parallel: 'True' shards batches over ALL local
    # devices (a data_parallel_mesh; XLA inserts the gradient psum) — the
    # CLI equivalent of passing mesh= to bear_net.train (bear_tpu extension;
    # the reference's MirroredStrategy had no config surface).
    data_parallel: bool = False
    # optional [train] streaming: 'True' feeds training shard-by-shard
    # (bear_net.train_streaming) so host/device memory is bounded by one
    # count file — the beyond-RAM analog of the reference's tf.data
    # interleave streaming (dataloader.py:6-50). Composes with
    # data_parallel and accumulation_steps.
    streaming: bool = False
    # optional [train] shuffle: 'True' shuffles the k-mer order per run
    # (in-memory: one seeded permutation; streaming: per-epoch file order +
    # in-shard permutation) — replaces the reference workflow's external
    # ``shuf`` step on unshuffled summarize output (docs/usage.rst:192-196).
    shuffle: bool = False
    # optional [train] checkpoint_every: > 0 checkpoints
    # {params, opt_state, applies_done} into the out folder every N
    # optimizer applies (streaming rounds the cadence UP to whole blocks,
    # its execution granularity) and RESUMES from an existing mid-run
    # checkpoint there. Point out_folder at the interrupted run's literal
    # directory (trailing '*') to resume it. The reference can only restart
    # from a completed run's pickle (train_bear_net.py:113-118).
    checkpoint_every: int = 0

    @classmethod
    def from_configparser(cls, config: configparser.ConfigParser) -> "RunConfig":
        g, d, hp = config["general"], config["data"], config["hyperp"]
        tr, te, mo = config["train"], config["test"], config["model"]
        return cls(
            out_folder=g["out_folder"],
            seed=int(g["seed"]),
            precision=g["precision"],
            files_path=d["files_path"],
            start_token=d["start_token"],
            sparse=d["sparse"] == "True",
            num_ds=int(d["num_ds"]),
            alphabet=d["alphabet"],
            train_column=int(d["train_column"]),
            test_column=int(d["test_column"]),
            reference_column=int(d.get("reference_column", "-1")),
            lag=int(hp["lag"]),
            train=tr["train"] == "True",
            epochs_raw=tr["epochs"],
            batch_size_raw=float(tr["batch_size"]),
            optimizer_name=tr["optimizer_name"],
            learning_rate=float(tr["learning_rate"]),
            train_ar=tr["train_ar"] == "True",
            accumulation_steps=int(tr["accumulation_steps"]),
            cache=tr.get("cache", "True") == "True",
            restart=tr.get("restart", "False") == "True",
            restart_path=tr.get("restart_path", ""),
            data_parallel=tr.get("data_parallel", "False") == "True",
            streaming=tr.get("streaming", "False") == "True",
            shuffle=tr.get("shuffle", "False") == "True",
            checkpoint_every=int(tr.get("checkpoint_every", "0")),
            test=te["test"] == "True",
            train_test=te["train_test"] == "True",
            van_reg=json.loads(te["van_reg"]),
            ar_func_name=mo["ar_func_name"],
            af_kwargs=json.loads(mo["af_kwargs"]),
            compute_precision=mo.get("compute_precision", ""),
        )

    @classmethod
    def read(cls, path: str) -> tuple["RunConfig", configparser.ConfigParser]:
        config = configparser.ConfigParser()
        if not config.read(path):
            # configparser.read silently ignores unreadable files; the
            # resulting KeyError('general') would hide the real problem
            raise FileNotFoundError(f"config file not found/unreadable: {path}")
        if "results" not in config:
            config["results"] = {}
        return cls.from_configparser(config), config

    def resolve_out_folder(self, package_root: Optional[str] = None) -> str:
        time_stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        if self.out_folder == "TEST":
            package_root = package_root or os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            )
            out = os.path.join(package_root, "models", "out_data", "logs", time_stamp)
        elif self.out_folder.endswith("*"):
            out = self.out_folder[:-1]
        else:
            out = os.path.join(self.out_folder, "logs", time_stamp)
        os.makedirs(out, exist_ok=True)
        return out

    def resolve_files(self) -> list[str]:
        if self.files_path == "TEST":
            return [bundled_ysd1_path()]
        from bear_tpu.data import discover_files

        return discover_files(self.files_path, self.start_token)

    def resolve_batch_size(self, num_kmers: int) -> int:
        b = self.batch_size_raw
        return int(num_kmers * b) if b <= 1 else int(b)

    def resolve_epochs(self, num_kmers: int, batch_size: int) -> int:
        if self.epochs_raw.endswith("s"):
            return int(self.epochs_raw[:-1]) // (1 + num_kmers // batch_size) + 1
        return int(self.epochs_raw)

    def dtype(self):
        import jax
        import jax.numpy as jnp

        if self.precision == "float64":
            jax.config.update("jax_enable_x64", True)
            if jax.default_backend() == "tpu":
                import warnings

                warnings.warn(
                    "precision=float64 on TPU runs in emulated (double-"
                    "float32) arithmetic: parity-exact on the published "
                    "YSD1 protocols (linear h 0.04326, reference-BEAR "
                    "h 0.014197 / stop rate 149.5 measured on v5e) but "
                    "several times slower than float32, and constants below "
                    "float32's exponent range underflow to 0. float32 "
                    "reproduces the published table at full speed.",
                    stacklevel=2,
                )
            return jnp.float64
        return jnp.float32

    def compute_dtype(self):
        """Optional mixed-precision compute dtype for the AR network
        ([model] compute_precision); None means compute in ``precision``."""
        import jax.numpy as jnp

        if self.compute_precision in ("", "none"):
            return None
        if self.compute_precision == "bfloat16":
            return jnp.bfloat16
        if self.compute_precision == "float32":
            return jnp.float32
        raise ValueError(
            f"unknown compute_precision {self.compute_precision!r} "
            "(expected '', 'bfloat16' or 'float32')"
        )
