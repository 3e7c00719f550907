"""Multi-host (N-process) end-to-end BEAR training harness.

The full pod-scale workflow the reference cannot do (it is single-host
MirroredStrategy only, SURVEY.md §1):

- each host streams + counts its shard of the input files locally
  (multihost.host_shard + TransitionCounter),
- exact global count tables are merged once with an int64 allgather+sum
  (multihost.allreduce_tables) — every host now holds the replicated
  dataset (small by design: BEAR collapses genomes to k-mer statistics),
- training runs data-parallel over the GLOBAL mesh spanning every host's
  devices (bear_net.train(mesh=...); XLA inserts the gradient psum over
  ICI/DCN),
- evaluation runs over the same mesh; rank agreement on the learned h is
  verified with a process allgather (the global program is identical on
  every host, so the results must match bit for bit).

Run (single machine, N processes standing in for N hosts; on a real pod
slice give each host its real coordinator address and process id):

    python examples/multihost_train.py --nproc 2 --lag 5
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

try:  # run as a script (python examples/multihost_train.py)
    from _common import free_port, worker_env
except ImportError:  # imported as a package module (tests)
    from examples._common import free_port, worker_env


def make_synthetic(workdir: str, n_files: int, reads_per_file: int,
                   read_len: int, seed: int = 0) -> str:
    """Write n_files synthetic fastqs + an input CSV; return the CSV path.

    Groups alternate per file: group 0 is the training column, group 1 the
    heldout test column (the reference's train/test count-column layout,
    train_bear_net.py:49-56).
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    # A biased source so there is structure to learn: AR(1)-ish transitions.
    trans = rng.dirichlet(np.full(4, 0.5), size=4)
    cum = np.cumsum(trans, axis=1)  # [4, 4] cumulative rows
    csv = os.path.join(workdir, "inputs.csv")
    with open(csv, "w") as out:
        for fi in range(n_files):
            path = os.path.join(workdir, f"reads_{fi}.fq")
            # Vectorized Markov rollout across all reads of the file: one
            # uniform draw per base, advanced per position via the
            # cumulative transition rows (no per-base Python RNG calls).
            u = rng.random((reads_per_file, read_len))
            codes = np.empty((reads_per_file, read_len), np.int64)
            codes[:, 0] = rng.integers(0, 4, size=reads_per_file)
            for j in range(1, read_len):
                codes[:, j] = (u[:, j:j + 1] > cum[codes[:, j - 1]]).sum(1)
            with open(path, "wb") as fh:
                qual = b"F" * read_len
                for ri, row in enumerate(lut[codes]):
                    fh.write(b"@r%d\n%s\n+\n%s\n" % (ri, row.tobytes(), qual))
            out.write(f"{path},{fi % 2},fq\n")
    return csv


def worker(args) -> None:
    # jax.distributed must come before any other JAX call.
    from bear_tpu.parallel import multihost

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.nproc, process_id=args.pid)

    import numpy as np

    from bear_tpu.counting import engine, fastx
    from bear_tpu.counting.summarize import iter_chunks
    from bear_tpu.models import bear_net, get_ar_func
    from bear_tpu.parallel import mesh as pmesh

    # ---- count locally, merge globally -------------------------------
    entries = fastx.read_input_csv(args.csv)
    mine = multihost.host_shard(entries)
    n_groups = max(group for _, group, _ in entries) + 1
    counter = engine.TransitionCounter(lags=[args.lag], n_groups=n_groups)
    t0 = time.time()
    for chunk in iter_chunks(mine, counter.max_lag):
        counter.add_chunk(chunk)
    multihost.allreduce_tables(counter)
    count_s = time.time() - t0
    ds = counter.to_dataset(args.lag)

    # ---- train data-parallel over the global mesh --------------------
    mesh = pmesh.data_parallel_mesh()  # every device of every host
    ar = get_ar_func("linear", args.lag, 4)
    t0 = time.time()
    if args.streaming:
        # Streaming + DP compose (bear_net.train_streaming mesh=): the
        # device never holds the full stacked dataset — batches flow
        # through fixed-geometry blocks, each sharded over every host's
        # devices. Here the stream is row-ranges of the merged table; in a
        # beyond-RAM run it would be per-file count shards
        # (load_dense(...).train_pair per file).
        n = len(ds.codes)
        shard_rows = max(args.batch_size, -(-n // 8))

        def shards():
            for s0 in range(0, n, shard_rows):
                yield (ds.codes[s0:s0 + shard_rows],
                       ds.counts[s0:s0 + shard_rows, 0].astype(np.float32))

        res = bear_net.train_streaming(
            shards, n, ar, batch_size=args.batch_size, epochs=args.epochs,
            learning_rate=0.01, seed=args.seed, mesh=mesh, block_steps=16,
        )
    else:
        res = bear_net.train(
            ds.codes, ds.counts[:, 0].astype(np.float32), len(ds.codes), ar,
            batch_size=args.batch_size, epochs=args.epochs,
            learning_rate=0.01, seed=args.seed, mesh=mesh,
        )
    train_s = time.time() - t0
    # With a single count group (e.g. a user CSV where every file is group 0)
    # there is no heldout column: evaluate the training column in prior mode
    # (ds_loc_train=-1, the reference's train_test protocol) and say so.
    heldout = n_groups > 1
    ev = bear_net.evaluation(
        ds.codes, ds.counts.astype(np.float32),
        0 if heldout else -1, 1 if heldout else 0, "dna",
        res.h, ar, [np.asarray(p) for p in res.params["ar"]],
        np.array([1.0], np.float32), mesh=mesh,
    )
    perp_bear = float(np.asarray(ev[3]))
    perp_label = "heldout" if heldout else "train-as-test (prior)"

    # ---- every rank must have learned the identical model ------------
    from jax.experimental import multihost_utils

    h_all = np.asarray(
        multihost_utils.process_allgather(np.float64(res.h))
    ).reshape(-1)
    assert np.all(h_all == h_all[0]), f"rank h mismatch: {h_all}"

    if args.bench and args.pid == 0:
        # Machine-readable scaling record (the training leg of
        # BASELINE.json's 1-host/N-host axis); a pod run is the same
        # invocation with real coordinator/process ids.
        import json

        steps = len(res.losses)
        line = "BENCH " + json.dumps({
            "bench": "multihost_train",
            "hosts": args.nproc,
            "devices": jax.device_count(),
            "lag": args.lag,
            "kmers": len(ds.codes),
            "streaming": bool(args.streaming),
            "count_merge_seconds": round(count_s, 3),
            "train_seconds": round(train_s, 3),
            "steps_per_sec": round(steps / max(train_s, 1e-9), 2),
            "kmers_per_sec": round(
                steps * args.batch_size / max(train_s, 1e-9)),
            "h": float(res.h),
            "bear_perplexity": perp_bear,
        })
        # ONE write syscall incl. the newline: all ranks share stdout, and
        # print()'s separate payload/end writes let another rank's line
        # splice in between, corrupting the machine-readable record.
        sys.stdout.write(line + "\n")
        sys.stdout.flush()
    if args.pid == 0:
        print(f"[rank 0] hosts={args.nproc} devices={jax.device_count()} "
              f"lag={args.lag} kmers={len(ds.codes)}")
        print(f"[rank 0] count+merge {count_s:.2f}s, train {train_s:.2f}s "
              f"({len(res.losses) / max(train_s, 1e-9):.0f} steps/s)")
        print(f"[rank 0] learned h={res.h:.5f} {perp_label} BEAR perplexity="
              f"{perp_bear:.4f}; h identical on all {args.nproc} ranks")
    print(f"[rank {args.pid}] OK h={res.h!r}")


def launch(args) -> int:
    workdir = args.workdir or os.path.join("/tmp", f"bear_mht_{os.getpid()}")
    os.makedirs(workdir, exist_ok=True)
    csv = args.csv or make_synthetic(
        workdir, n_files=max(args.nproc * 2, 4),
        reads_per_file=args.reads_per_file, read_len=args.read_len)
    port = free_port()
    env = worker_env(cpu=args.cpu, cpu_devices=2)
    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           "--csv", csv, "--lag", str(args.lag), "--nproc", str(args.nproc),
           "--epochs", str(args.epochs), "--batch-size", str(args.batch_size),
           "--seed", str(args.seed),
           "--coordinator", f"127.0.0.1:{port}",
           "--cpu" if args.cpu else "--no-cpu"]
    if args.streaming:
        cmd.append("--streaming")
    if args.bench:
        cmd.append("--bench")
    procs = [subprocess.Popen(cmd + ["--pid", str(i)], env=env)
             for i in range(args.nproc)]
    try:
        codes = [p.wait(timeout=args.timeout) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return 0 if all(c == 0 for c in codes) else 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--nproc", type=int, default=2,
                    help="number of host processes to launch")
    ap.add_argument("--lag", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--csv", default=None,
                    help="FILE,GROUP,TYPE input csv (default: synthetic reads)")
    ap.add_argument("--reads-per-file", type=int, default=2000)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--streaming", action="store_true",
                    help="train via bear_net.train_streaming(mesh=...): "
                         "shard-streamed batches over the global mesh, "
                         "device memory bounded by one block")
    ap.add_argument("--cpu", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="run on host CPU devices (default; --no-cpu keeps "
                         "each host's own accelerators, for real pod runs)")
    ap.add_argument("--bench", action="store_true",
                    help="emit one 'BENCH {json}' line from rank 0 with "
                         "count/merge/train timings and steps/s (the "
                         "1-host/N-host scaling record)")
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--coordinator", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--pid", type=int, default=0, help=argparse.SUPPRESS)
    args = ap.parse_args(argv)
    if args.worker:
        worker(args)
        return 0
    return launch(args)


if __name__ == "__main__":
    sys.exit(main())
