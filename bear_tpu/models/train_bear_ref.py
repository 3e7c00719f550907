"""Config-driven runner for reference-guided BEAR/AR models.

``python -m bear_tpu.models.train_bear_ref config.cfg``

Same contract as the reference's bear_model/models/train_bear_ref.py: trains
with the reference-count column, writes ``h``, ``error_rate`` and
``stop_rate`` diagnostics plus the 9 evaluation metrics into the out-dir
config's [results] section (reference train_bear_ref.py:142-213).
"""

from __future__ import annotations

import argparse
import configparser
import os

import numpy as np

from bear_tpu.data import count_kmers, load_files
from bear_tpu.models import bear_net, bear_ref
from bear_tpu.models.ar_funcs import AR_FUNCS
from bear_tpu.utils import MetricsWriter, RunConfig, save_loss_curve, save_results
from bear_tpu.utils.cli_common import (
    enable_compilation_cache,
    load_restart,
    write_config,
    write_eval_results,
)


def main(config: configparser.ConfigParser, mesh=None):
    enable_compilation_cache()
    run = RunConfig.from_configparser(config)
    out_folder = run.resolve_out_folder()
    dtype = run.dtype()
    writer = MetricsWriter(out_folder)
    try:
        return _main(config, mesh, run, out_folder, dtype, writer)
    finally:
        writer.close()  # idempotent; covers eval-only and exception paths


def _main(config, mesh, run, out_folder, dtype, writer):
    if mesh is None and run.data_parallel:
        from bear_tpu.parallel import data_parallel_mesh

        mesh = data_parallel_mesh()  # all local devices; XLA inserts psum

    files = run.resolve_files()
    num_kmers = count_kmers(files, header=run.sparse)
    batch_size = run.resolve_batch_size(num_kmers)
    epochs = run.resolve_epochs(num_kmers, batch_size)
    streaming = run.streaming and run.train
    ds = None
    if not run.streaming:
        ds = load_files(files, run.alphabet, run.num_ds, sparse=run.sparse)
    print("data_loaded")

    # Streaming runs re-ingest every shard every epoch; honor the
    # reference's [train] cache knob with a parsed-shard .npz cache in the
    # out folder (load_files_cached) so epochs >= 2 skip the TSV parse.
    from bear_tpu.data import load_files_cached

    shard_cache = os.path.join(out_folder, "shard_cache") if run.cache \
        else None

    def _load_shard(f):
        return load_files_cached([f], run.alphabet, run.num_ds,
                                 sparse=run.sparse, cache_dir=shard_cache)

    def _eval_shards():
        for f in files:
            d = _load_shard(f)
            yield d.codes, d.counts

    result_file = os.path.join(out_folder, "results.pickle")
    config["results"]["out_folder"] = out_folder
    config["results"]["file"] = result_file
    write_config(config, out_folder)

    ds_loc = run.train_column
    ds_loc_ref = run.reference_column
    from bear_tpu.ops import alphabets as _alph

    A = _alph.alphabet_size(run.alphabet)
    net_factory = AR_FUNCS[run.ar_func_name]
    ar_func = bear_ref.make_ref_ar_func(
        run.lag, A, net_factory, run.af_kwargs, dtype=dtype,
        compute_dtype=run.compute_dtype(),
    )

    params_restart, opt_state_restart = load_restart(run)

    ckpt = dict(checkpoint_dir=out_folder,
                checkpoint_every=run.checkpoint_every) \
        if run.checkpoint_every > 0 else {}
    common_train = dict(
        alphabet=run.alphabet,
        dtype=dtype,
        compute_dtype=run.compute_dtype(),
        batch_size=batch_size,
        epochs=epochs,
        learning_rate=run.learning_rate,
        optimizer_name=run.optimizer_name,
        train_ar=run.train_ar,
        acc_steps=run.accumulation_steps,
        params_restart=params_restart,
        opt_state_restart=opt_state_restart,
        seed=run.seed,
        mesh=mesh,
        shuffle=run.shuffle,
        writer=writer,
        **ckpt,
    )
    if run.train and streaming:
        def shards(epoch=0):
            order = list(range(len(files)))
            if run.shuffle:
                np.random.default_rng([run.seed, epoch]).shuffle(order)
            for fi in order:
                d = _load_shard(files[fi])
                yield d.codes, d.counts[:, ds_loc], d.counts[:, ds_loc_ref]

        result = bear_ref.train_streaming(
            shards,
            num_kmers,
            net_factory,
            run.af_kwargs,
            lag=run.lag,
            **common_train,
        )
        writer.close()
        params = result.params
        opt_state = result.opt_state
        save_loss_curve(result.elbos, out_folder)
    elif run.train:
        result = bear_ref.train(
            ds.codes,
            ds.counts[:, ds_loc],
            ds.counts[:, ds_loc_ref],
            num_kmers,
            net_factory,
            run.af_kwargs,
            lag=run.lag,
            **common_train,
        )
        writer.close()
        params = result.params
        opt_state = result.opt_state
        save_loss_curve(result.elbos, out_folder)
    else:
        assert run.restart, "train=False requires restart=True"
        params = bear_net.params_from_list(params_restart, dtype=dtype)
        opt_state = opt_state_restart

    h = float(np.exp(np.asarray(params["h_signed"])))
    config["results"]["h"] = str(h)
    config["results"]["error_rate"] = str(bear_ref.error_rate(params))
    config["results"]["stop_rate"] = str(bear_ref.stop_rate_inverse(params))
    write_config(config, out_folder)

    save_results(
        out_folder, bear_net.params_to_list(params), extra={"opt_state": opt_state}
    )
    if run.checkpoint_every > 0:
        from bear_tpu.utils.checkpoint import clear_train_state

        clear_train_state(out_folder)

    van_reg = np.array(run.van_reg)


    def _evaluate(train_loc, test_loc):
        if run.streaming:
            # Shard-streamed reference-guided evaluation: memory stays
            # bounded by one file (metrics are pure sums).
            return bear_ref.evaluation_streaming(
                _eval_shards, train_loc, test_loc, ds_loc_ref, run.alphabet,
                h, ar_func, params["ar"], van_reg, dtype=dtype, seed=run.seed,
                mesh=mesh,
            )
        return bear_ref.evaluation(
            ds.codes, ds.counts, train_loc, test_loc, ds_loc_ref,
            run.alphabet, h, ar_func, params["ar"], van_reg,
            dtype=dtype, seed=run.seed, mesh=mesh,
        )

    if run.test:
        out = _evaluate(ds_loc, run.test_column)
        write_eval_results(config, out_folder, "heldout_", out)

    if run.train_test:
        out = _evaluate(-1, ds_loc)
        write_eval_results(config, out_folder, "", out)
        return 1, np.asarray(out[2]), np.asarray(out[5])

    return 1


def cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("configPath")
    args = parser.parse_args()

    config = configparser.ConfigParser()
    config.read(args.configPath)
    if "results" not in config:
        config["results"] = {}

    main(config)


if __name__ == "__main__":
    cli()
