"""Summarization CLI: sequence files -> per-lag transition-count TSVs.

Drop-in replacement for the reference's ``python summarize.py`` (CLI contract
at summarize.py:666-695), with the KMC subprocess pipeline replaced by the
on-device counting engine. Same inputs (csv of FILE,GROUP,TYPE rows), same
outputs (``{out_prefix}_lag_{l}_file_{b}.tsv`` with rows
``kmer\\t[[group0 counts],...]``; reverse pass writes ``{out_prefix}_rev_*``),
same flags where meaningful:

-l      max lag (default 10)
-nf     skip the forward pass
-r      additionally run a reverse-complement pass (counts fwd+rc)
-mf     max output chunk size in GB -> number of shard files
-mk/-p/-t/-s12/-s3  accepted for compatibility; no-ops (no KMC, no temp
        files, no multi-stage restart — counting is a single streaming pass)
--ambig {a,skip}  ambiguous bases: fold to A (reference-compatible default,
        summarize.py:69-70) or drop every transition whose window crosses
        one (new capability — neither the reference nor KMC handles N)

Deviation from the reference (deliberate): counts above 2^32 do not clamp
(KMC's 4-billion cutoff, summarize.py:66-67).
"""

from __future__ import annotations

import argparse
import datetime
import os

import numpy as np

from bear_tpu.counting import engine, fastx
from bear_tpu.ops.alphabets import alphabet_size as _alphabet_size


def iter_chunks(entries, max_lag: int, batch_size: int = 1024,
                segment_len: int = 1 << 16, reverse: bool = False,
                alphabet: str = "dna", stats: dict | None = None,
                ambig: str = "a"):
    """Yield ReadChunks over FILE,GROUP,TYPE ``entries`` — the one place that
    routes files between the native parser and the Python fallback.

    Native-capable files (DNA, and gzip only when the lib links zlib) go
    through the C++ parse + vectorized chunk packing per file; everything
    else is batched through ONE Python-reader stream so small files share
    padded chunks. ``stats`` (optional dict) accumulates ``bases``/``reads``
    across all files.

    ambig: "a" folds unknown bases to A/residue-0 (reference-compatible,
    summarize.py:69-70); "skip" drops every transition whose window crosses
    an ambiguous base (engine.split_ambiguous semantics — a correctness
    capability neither the reference nor KMC has).
    """
    if ambig not in ("a", "skip"):
        raise ValueError(f"ambig must be 'a' or 'skip', got {ambig!r}")
    skip_ambig = ambig == "skip"
    native = fastx._native() if alphabet == "dna" else None
    if native is not None and skip_ambig and not getattr(native, "_has_parse2", False):
        native = None  # stale .so without the ambiguity-marking encoder
    from bear_tpu.ops import alphabets as _alpha

    ambig_code = len(_alpha.residues(alphabet))
    native_entries, fallback = [], []
    for entry in entries:
        path, _, _ = entry
        if native is not None and (
            native.supports_gzip or not fastx.is_gzip(path)
        ):
            native_entries.append(entry)
        else:
            fallback.append(entry)
    if native_entries:
        # Depth-1 prefetch: the NEXT file parses (C++, GIL released — gzip
        # inflate included) while this file's chunks pack and dispatch, so
        # parse latency hides behind device work. Holds at most two files'
        # codes in host RAM.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(native.parse, native_entries[0][0],
                              native_entries[0][2], skip_ambig)
            for i, (path, group, ftype) in enumerate(native_entries):
                codes_flat, offsets = fut.result()
                if i + 1 < len(native_entries):
                    fut = pool.submit(native.parse, native_entries[i + 1][0],
                                      native_entries[i + 1][2], skip_ambig)
                if stats is not None:
                    stats["bases"] = stats.get("bases", 0) + len(codes_flat)
                    stats["reads"] = stats.get("reads", 0) + len(offsets) - 1
                    if skip_ambig:
                        stats["ambig"] = stats.get("ambig", 0) + int(
                            np.count_nonzero(codes_flat == ambig_code)
                        )
                yield from engine.chunks_from_packed(
                    codes_flat, offsets, group, max_lag,
                    batch_size, segment_len, reverse=reverse,
                    ambig_code=ambig_code if skip_ambig else None,
                )
    if fallback:
        def _stream():
            for arr, group in fastx.stream_encoded(fallback, alphabet,
                                                   ambig=skip_ambig):
                if stats is not None:
                    stats["bases"] = stats.get("bases", 0) + len(arr)
                    stats["reads"] = stats.get("reads", 0) + 1
                    if skip_ambig:
                        stats["ambig"] = stats.get("ambig", 0) + int(
                            np.count_nonzero(arr == ambig_code)
                        )
                yield arr, group

        stream = _stream()
        if skip_ambig:
            stream = engine.split_ambiguous(stream, ambig_code)
        yield from engine.chunk_reads(
            stream, max_lag, batch_size, segment_len, reverse=reverse,
        )


def run_counting(
    input_csv: str,
    lags,
    reverse: bool = False,
    batch_size: int = 1024,
    segment_len: int = 1 << 16,
    method: str = "auto",
    kmer_shards: int = 1,
    alphabet: str = "dna",
    checkpoint: str | None = None,
    stats: dict | None = None,
    ambig: str = "a",
    passes: int = 1,
    data_shards: int = 1,
):
    """Count transitions for all requested lags over the input file set.
    Returns an engine.TransitionCounter, or a
    parallel.counting.KmerShardedTransitionCounter when kmer_shards > 1
    (same add_chunk/nonzero_rows/to_dataset/export_tsv/validate surface;
    dense ``.tables`` only where host-feasible).

    method: counting kernel — 'auto' (sorted MXU histograms on TPU, XLA
    scatter elsewhere), 'sorted', or 'scatter' (engine.TransitionCounter).
    kmer_shards: >1 shards the count tables over that many devices along a
    'kmer' mesh axis (tensor parallelism) — required for lag 14-15 tables
    beyond one chip's HBM/int32 range.
    alphabet: 'dna' (default), 'rna', or 'prot' — protein counting is a
    capability the reference's DNA-only KMC pipeline lacks.
    checkpoint: optional path; counts checkpoint after every completed
    input file and a re-run resumes from the last finished file (elastic
    recovery for genome-scale jobs — the reference can only restart whole
    summarize stages, summarize.py -s12/-s3). Atomic (write + rename).
    ambig: "a" (default) folds unknown bases to A (reference-compatible);
    "skip" drops transitions whose window crosses an ambiguous base.
    passes: >1 counts in that many sequential row-range passes on ONE
    device, re-streaming the input each pass — lag 14-15 tables beyond one
    chip's HBM without a multi-device mesh (the single-machine analog of
    KMC's bounded-RAM disk passes). Mutually exclusive with kmer_shards.
    data_shards: >1 shards chunk ROWS over that many devices on a 'data'
    mesh axis for the sparse-first counter (lags beyond the dense range) —
    the data-parallel scale-out of the one counter with no lag ceiling.
    Dense-range lags scale with kmer_shards/passes instead.
    """
    if reverse and alphabet not in ("dna", "rna"):
        raise ValueError("-r (reverse complement) requires a 4-letter alphabet")
    if data_shards > 1 and (passes > 1 or kmer_shards > 1):
        raise ValueError(
            "--data-shards is mutually exclusive with --passes and "
            "--kmer-shards (row-parallel vs table-split scaling)"
        )
    entries = fastx.read_input_csv(input_csv)
    n_groups = max(group for _, group, _ in entries) + 1
    # Reverse-complement counting happens in the read stream (each read also
    # emitted as its RC before segmentation) so arbitrarily long contigs work;
    # the counter itself stays forward-only.
    if passes > 1:
        if kmer_shards > 1:
            raise ValueError("--passes and --kmer-shards are mutually "
                             "exclusive (row-split in time vs over devices)")
        if checkpoint is not None:
            raise ValueError("--checkpoint is not supported with --passes "
                             "(each pass re-reads every file)")
        from bear_tpu.counting.multipass import count_multipass

        first_pass = [True]

        def factory():
            # Parse/read stats cover ONE traversal (every pass re-reads the
            # same bytes; accumulating would overstate the input size).
            s = stats if first_pass and first_pass.pop() else None
            return iter_chunks(entries, max(lags), batch_size, segment_len,
                               reverse=reverse, alphabet=alphabet,
                               stats=s, ambig=ambig)

        return count_multipass(
            factory, lags=lags, n_groups=n_groups, passes=passes,
            method=method, alphabet=alphabet,
        )
    if kmer_shards > 1:
        import jax
        from jax.sharding import Mesh
        from bear_tpu.parallel.counting import KmerShardedTransitionCounter

        devs = jax.devices()
        if len(devs) < kmer_shards:
            raise ValueError(
                f"--kmer-shards {kmer_shards} needs that many devices; "
                f"have {len(devs)}"
            )
        mesh = Mesh(np.array(devs[:kmer_shards]), ("kmer",))
        counter = KmerShardedTransitionCounter(
            mesh, lags=lags, n_groups=n_groups, method=method,
            alphabet=alphabet,
        )
    elif _alphabet_size(alphabet) ** max(lags) > np.iinfo(np.int32).max:
        # Beyond the dense-table int32 range (DNA lag >= 16, protein >= 8):
        # the sparse-first counter buffers packed key halves on device and
        # sort-consolidates per window — the KMC design, on device. Shares
        # the KmerSharded host surface incl. save/load_state, so the
        # file-granular checkpoint path below works unchanged.
        from bear_tpu.counting.sparse import SparseTransitionCounter

        mesh = None
        if data_shards > 1:
            import jax
            from jax.sharding import Mesh

            devs = jax.devices()
            if len(devs) < data_shards:
                raise ValueError(
                    f"--data-shards {data_shards} needs that many devices; "
                    f"have {len(devs)}"
                )
            mesh = Mesh(np.array(devs[:data_shards]), ("data",))
        counter = SparseTransitionCounter(
            lags=lags, n_groups=n_groups, alphabet=alphabet, mesh=mesh,
        )
    elif data_shards > 1:
        raise ValueError(
            "--data-shards applies to sparse-first counting (DNA lag >= 16 "
            "/ protein lag >= 8); dense-range lags scale with --kmer-shards "
            "or --passes"
        )
    else:
        counter = engine.TransitionCounter(
            lags=lags, n_groups=n_groups, method=method, alphabet=alphabet
        )
    if checkpoint is None:
        for chunk in iter_chunks(entries, counter.max_lag, batch_size,
                                 segment_len, reverse=reverse,
                                 alphabet=alphabet, stats=stats,
                                 ambig=ambig):
            counter.add_chunk(chunk)
        return counter

    import json

    ckpt = checkpoint if checkpoint.endswith(".npz") else checkpoint + ".npz"
    files_json = ckpt + ".files.json"
    done: set[str] = set()
    if os.path.exists(ckpt) and os.path.exists(files_json):
        if not isinstance(counter, engine.TransitionCounter):
            # Sharded/sparse counter: restore counts into the counter built
            # above (its instance load_state validates lags/groups/reverse/
            # alphabet; for the sharded one the mesh is runtime state).
            counter.load_state(ckpt)
        else:
            counter = engine.TransitionCounter.load_state(ckpt)
            if (tuple(counter.lags) != tuple(sorted(set(int(l) for l in lags)))
                    or counter.n_groups != n_groups
                    or counter.reverse != reverse
                    or counter.alphabet != alphabet):
                raise ValueError(
                    f"checkpoint {ckpt} was written with different counting "
                    "parameters (lags/groups/reverse/alphabet); delete it or "
                    "use a fresh path"
                )
        with open(files_json) as fh:
            done = set(json.load(fh))
        print(f"resuming from {ckpt}: {len(done)} files already counted")
        if stats is not None and done:
            stats["partial"] = True  # resumed: stats won't cover old files
    for entry in entries:
        if entry[0] in done:
            continue
        # One file per stream: the file is the resume unit.
        for chunk in iter_chunks([entry], counter.max_lag, batch_size,
                                 segment_len, reverse=reverse,
                                 alphabet=alphabet, stats=stats,
                                 ambig=ambig):
            counter.add_chunk(chunk)
        done.add(entry[0])
        tmp = ckpt + ".tmp"
        counter.save_state(tmp)  # save_state appends .npz
        os.replace(tmp + ".npz", ckpt)
        tmp_json = files_json + ".tmp"
        with open(tmp_json, "w") as fh:
            json.dump(sorted(done), fh)
        os.replace(tmp_json, files_json)
    return counter


def compute_n_bin_bits(total_rows: int, n_groups: int, mf_gb: float) -> int:
    """Shard-count heuristic analogous to summarize.py:594-598: rows are
    ~64 bytes each in TSV form."""
    approx_bytes = total_rows * n_groups * 32
    return int(max(np.ceil(np.log2(max(approx_bytes / (mf_gb * 1e9), 1))), 0))


def run(args) -> int:
    print("Counting...", datetime.datetime.now())
    ckpt = getattr(args, "checkpoint", None)
    if ckpt and args.r:
        ckpt += "_rev"  # the reverse pass is a separate counting job
    stats = {"bases": 0, "reads": 0}
    ambig = getattr(args, "ambig", "a")
    counter = run_counting(args.file, lags=range(1, args.l + 1), reverse=args.r,
                           method=args.method, kmer_shards=args.kmer_shards,
                           alphabet=args.alphabet, checkpoint=ckpt, stats=stats,
                           ambig=ambig, passes=getattr(args, "passes", 1),
                           data_shards=getattr(args, "data_shards", 1))
    if stats.get("ambig"):
        print(f"ambig=skip: {stats['ambig']} ambiguous bases; transitions "
              "whose window crosses one were dropped")
    # Count conservation: every read of length n emits n+1 transitions at
    # every lag (x2 with -r). Skipped after a checkpoint resume (this run's
    # stats don't cover the previously counted files) and in ambig=skip mode
    # (per-lag totals legitimately differ once windows are dropped).
    if not stats.get("partial") and not stats.get("ambig"):
        # -r doubles counts in the READ STREAM (each read also emitted as its
        # RC); the counter itself stays forward-only, so scale here.
        expected = (stats["bases"] + stats["reads"]) * (2 if args.r else 1)
        counter.validate(expected_transitions=expected)
        print(f"Counted {stats['reads']} reads / {stats['bases']} bases "
              f"({stats['bases'] + stats['reads']} transitions per lag"
              f"{' x2 rc' if args.r else ''}; conservation verified)")
    print("Writing...", datetime.datetime.now())
    # one dense-table scan per lag: reuse the rows for both the shard-count
    # heuristic and the export itself
    rows_by_lag = {l: counter.nonzero_rows(l) for l in counter.lags}
    total_rows = sum(len(r) for r in rows_by_lag.values())
    n_bin_bits = compute_n_bin_bits(total_rows, counter.n_groups, args.mf)
    for l in counter.lags:
        counter.export_tsv(args.out_prefix, l, n_bin_bits,
                           shuffle=args.shuffle, rows=rows_by_lag[l])
    print("Finished.", datetime.datetime.now())
    return 2**n_bin_bits


def main(args):
    """Forward pass, then optional reverse pass with ``_rev`` prefix
    (reference summarize.py:648-663)."""
    from bear_tpu.utils.cli_common import enable_compilation_cache

    enable_compilation_cache()
    n_bins = None
    n_bins_rev = None
    store_r = args.r
    args.r = False
    if not args.nf:
        n_bins = run(args)
    if store_r:
        args.r = True
        args.out_prefix += "_rev"
        n_bins_rev = run(args)
    return n_bins, n_bins_rev


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Extract k-mer transition-count summary statistics for BEAR training."
    )
    parser.add_argument("file", help="Input csv of FILE,GROUP,TYPE rows.")
    parser.add_argument("out_prefix", help="Prefix for output files.")
    parser.add_argument("-l", default=10, type=int, help="Maximum lag.")
    parser.add_argument("-mk", default=12, type=float, help="(compat; unused — no KMC)")
    parser.add_argument("-mf", default=0.1, type=float, help="Max output chunk size (GB).")
    parser.add_argument("-p", default="", help="(compat; unused — no KMC binaries)")
    parser.add_argument("-nf", action="store_true", default=False, help="Skip forward pass.")
    parser.add_argument("-r", action="store_true", default=False, help="Also run reverse-complement pass.")
    parser.add_argument("-pr", action="store_true", default=False, help="(compat; all lags always counted)")
    parser.add_argument("-t", default="tmp/", help="(compat; unused — no temp files)")
    parser.add_argument("-s12", action="store_true", default=False, help="(compat; unused)")
    parser.add_argument("--ambig", choices=["a", "skip"], default="a",
                        help="Ambiguous bases (N): fold to A (reference-"
                             "compatible default) or skip every transition "
                             "whose window crosses one (new capability; "
                             "neither the reference nor KMC handles N).")
    parser.add_argument("-s3", action="store_true", default=False, help="(compat; unused)")
    parser.add_argument(
        "--shuffle", action="store_true", default=False,
        help="Shuffle output rows (replaces the tutorial's external shuf step).",
    )
    parser.add_argument(
        "--method", default="auto", choices=("auto", "sorted", "scatter"),
        help="Counting kernel: sorted MXU histograms (TPU) or XLA scatter.",
    )
    parser.add_argument(
        "--alphabet", default="dna", choices=("dna", "rna", "prot"),
        help="Residue alphabet (protein counting: beyond the reference's "
             "DNA-only KMC pipeline).",
    )
    parser.add_argument(
        "--kmer-shards", default=1, type=int, dest="kmer_shards",
        help="Shard count tables over this many devices (tensor parallelism;"
             " needed for lag 14-15 tables beyond one chip).",
    )
    parser.add_argument(
        "--checkpoint", default=None,
        help="Checkpoint counts after every completed input file; a re-run "
             "with the same flag resumes from the last finished file "
             "(elastic recovery the reference's -s12/-s3 stage restarts "
             "cannot do).",
    )
    parser.add_argument(
        "--data-shards", default=1, type=int, dest="data_shards",
        help="Shard chunk rows over this many devices (data parallelism) "
             "for sparse-first counting at lags beyond the dense range "
             "(DNA >= 16 / protein >= 8) — the scale-out of the counter "
             "with no lag ceiling.",
    )
    parser.add_argument(
        "--passes", default=1, type=int,
        help="Count in this many sequential row-range passes on one device, "
             "re-reading the input each pass (lag 14-15 tables beyond one "
             "chip's HBM without a mesh — the single-machine analog of "
             "KMC's bounded-RAM disk passes).",
    )
    return parser


def cli():
    main(build_parser().parse_args())


if __name__ == "__main__":
    cli()
