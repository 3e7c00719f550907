"""Multi-host (N-process) streamed k-mer counting harness.

Demonstrates and measures the pod-scale counting workflow (SURVEY.md §5
"distributed communication backend"; the reference is single-host only):

- each host/process streams its shard of the input FILES (multihost.host_shard),
- counts locally on its own devices (TransitionCounter — same kernel as the
  single-chip path),
- merges exact global tables with one int64 allgather+sum per flush
  (multihost.allreduce_tables),
- rank 0 validates against the expected transition total and reports
  aggregate throughput.

Run (single machine, N processes standing in for N hosts; on a real pod
slice give each host its real coordinator address and process id):

    python examples/multihost_counting.py --nproc 4 --lag 5

With --csv the harness counts your own FILE,GROUP,TYPE input set instead of
the synthetic reads (gzip inputs welcome).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

try:  # run as a script (python examples/multihost_counting.py)
    from _common import free_port, worker_env
except ImportError:  # imported as a package module (tests)
    from examples._common import free_port, worker_env


def make_synthetic(workdir: str, n_files: int, reads_per_file: int,
                   read_len: int, seed: int = 0) -> str:
    """Write n_files synthetic fastqs + an input CSV; return the CSV path."""
    import numpy as np

    rng = np.random.default_rng(seed)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    csv = os.path.join(workdir, "inputs.csv")
    with open(csv, "w") as out:
        for fi in range(n_files):
            path = os.path.join(workdir, f"reads_{fi}.fq")
            codes = rng.integers(0, 4, size=(reads_per_file, read_len))
            with open(path, "wb") as fh:
                qual = b"F" * read_len
                for ri, row in enumerate(lut[codes]):
                    fh.write(b"@r%d\n%s\n+\n%s\n" % (ri, row.tobytes(), qual))
            out.write(f"{path},{fi % 2},fq\n")  # two count groups
    return csv


def worker(args) -> None:
    # jax.distributed must come before any other JAX call.
    from bear_tpu.parallel import multihost

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.nproc, process_id=args.pid)

    from bear_tpu.counting import engine, fastx
    from bear_tpu.counting.summarize import iter_chunks

    entries = fastx.read_input_csv(args.csv)
    mine = multihost.host_shard(entries)
    n_groups = max(group for _, group, _ in entries) + 1  # global, all ranks
    counter = engine.TransitionCounter(lags=range(1, args.lag + 1),
                                       n_groups=n_groups)
    stats = {"bases": 0, "reads": 0}
    t0 = time.time()
    for chunk in iter_chunks(mine, counter.max_lag, stats=stats):
        counter.add_chunk(chunk)
    count_s = time.time() - t0
    t0 = time.time()
    multihost.allreduce_tables(counter)
    merge_s = time.time() - t0

    # Count conservation: at every lag each read of length n emits n+1
    # transitions (n next-base + 1 stop), short reads included.
    g_bases, g_reads = multihost.allreduce_sum_i64(
        [stats["bases"], stats["reads"]]
    )
    expected = int(g_bases + g_reads)
    counter.validate(expected_transitions=expected)

    totals = {l: int(t.sum()) for l, t in counter.tables.items()}
    if args.bench:
        # BASELINE.json's scaling axis ("k-mers/s at 1 chip, 1 host, and
        # N>=2 hosts") as ONE machine-readable line: per-host and aggregate
        # counting rates. A pod run is this same invocation with real
        # coordinator/process ids per host.
        import json

        import numpy as np
        from jax.experimental import multihost_utils

        per_rank = np.asarray(multihost_utils.process_allgather(
            np.asarray([stats["bases"], stats["reads"], count_s], np.float64)
        )).reshape(args.nproc, 3)
        rank_tps = [
            float((b + r) / max(t, 1e-9)) for b, r, t in per_rank
        ]
        if args.pid == 0:
            line = "BENCH " + json.dumps({
                "bench": "multihost_counting",
                "hosts": args.nproc,
                "lags": f"1..{args.lag}",
                "global_transitions_per_lag": expected,
                "per_host_transitions_per_sec": [round(x) for x in rank_tps],
                "aggregate_transitions_per_sec": round(
                    float(per_rank[:, :2].sum())
                    / max(float(per_rank[:, 2].max()), 1e-9)),
                "per_host_bases": [int(b) for b in per_rank[:, 0]],
                "count_seconds": [round(float(t), 3) for t in per_rank[:, 2]],
                "merge_seconds": round(merge_s, 3),
            })
            # ONE write syscall incl. the newline: all ranks share stdout, and
            # print()'s separate payload/end writes let another rank's line
            # splice in between, corrupting the machine-readable record.
            sys.stdout.write(line + "\n")
            sys.stdout.flush()
    if args.pid == 0:
        print(f"[rank 0] hosts={args.nproc} lags=1..{args.lag} "
              f"global transitions={sum(totals.values())} "
              f"(= {expected}/lag, conservation verified)")
        print(f"[rank 0] local count {count_s:.2f}s, table merge {merge_s:.2f}s")
        print(f"[rank 0] local feed {stats['bases'] / max(count_s, 1e-9) / 1e6:.1f} "
              f"Mbases/s; aggregate ~{args.nproc}x with balanced shards")
    print(f"[rank {args.pid}] OK totals={totals}")


def launch(args) -> int:
    workdir = args.workdir or os.path.join("/tmp", f"bear_mh_{os.getpid()}")
    os.makedirs(workdir, exist_ok=True)
    csv = args.csv or make_synthetic(
        workdir, n_files=max(args.nproc * 2, 4),
        reads_per_file=args.reads_per_file, read_len=args.read_len)
    port = free_port()
    env = worker_env(cpu=args.cpu)
    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           "--csv", csv, "--lag", str(args.lag), "--nproc", str(args.nproc),
           "--coordinator", f"127.0.0.1:{port}",
           "--cpu" if args.cpu else "--no-cpu"]
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
    # signal-killed workers have NEGATIVE returncodes; any nonzero is failure
    return 0 if all(c == 0 for c in codes) else 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--nproc", type=int, default=2,
                    help="number of host processes to launch")
    ap.add_argument("--lag", type=int, default=5)
    ap.add_argument("--csv", default=None,
                    help="FILE,GROUP,TYPE input csv (default: synthetic reads)")
    ap.add_argument("--reads-per-file", type=int, default=20000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--cpu", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="run on host CPU devices (default; --no-cpu keeps "
                         "each host's own accelerators, for real pod runs)")
    ap.add_argument("--bench", action="store_true",
                    help="emit one 'BENCH {json}' line from rank 0 with "
                         "per-host and aggregate transitions/s (the "
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
