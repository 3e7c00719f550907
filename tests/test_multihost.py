"""Real multi-process test of the multi-host helpers: two jax.distributed
processes shard reads, count locally, and all-reduce to identical exact
global tables."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    from bear_tpu.parallel import multihost
    import jax
    jax.config.update("jax_platforms", "cpu")
    multihost.initialize(coordinator_address=f"127.0.0.1:{{port}}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    from bear_tpu.counting import TransitionCounter, chunk_reads, fastx
    seqs_all = ["ACGTACGT", "TTTTCGCA", "GGGCATAT", "ACACACAC"]
    mine = multihost.host_shard(seqs_all)
    assert 0 < len(mine) < len(seqs_all)  # really sharded
    tc = TransitionCounter(lags=[2], n_groups=1)
    for chunk in chunk_reads(((fastx.encode_seq(s), 0) for s in mine), 2):
        tc.add_chunk(chunk)
    multihost.allreduce_tables(tc)
    total = int(tc.tables[2].sum())
    expected = sum(len(s) + 1 for s in seqs_all)
    assert total == expected, (total, expected)
    print(f"proc {{pid}} OK")
    """
).format(repo=REPO)


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(sys.platform != "linux", reason="process test, linux only")
def test_two_process_allreduce(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=120)[0].decode() for p in procs]
    finally:
        for p in procs:  # no orphaned workers on timeout/port races
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "OK" in out, out


SPARSE_WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    from bear_tpu.parallel import multihost
    import jax
    jax.config.update("jax_platforms", "cpu")
    multihost.initialize(coordinator_address=f"127.0.0.1:{{port}}",
                         num_processes=nproc, process_id=pid)
    import numpy as np
    from jax.sharding import Mesh
    from bear_tpu.counting import TransitionCounter, chunk_reads, fastx
    from bear_tpu.parallel.counting import KmerShardedTransitionCounter
    seqs_all = ["ACGTACGTAA", "TTTTCGCATT", "GGGCATATCC", "ACACACACGG",
                "CGCGCGTATA"]
    mine = multihost.host_shard(seqs_all)
    # per-host TP counter over this host's single local cpu device
    mesh = Mesh(np.array(jax.local_devices()[:1]), ("kmer",))
    tc = KmerShardedTransitionCounter(mesh, lags=[3], n_groups=1)
    # streaming: merge after the first half, then after the rest, then a
    # repeated merge — the delta protocol must never double-count
    half = len(mine) // 2 or 1
    for chunk in chunk_reads(((fastx.encode_seq(s), 0) for s in mine[:half]), 3):
        tc.add_chunk(chunk)
    multihost.allreduce_tables(tc)
    for chunk in chunk_reads(((fastx.encode_seq(s), 0) for s in mine[half:]), 3):
        tc.add_chunk(chunk)
    multihost.allreduce_tables(tc)
    multihost.allreduce_tables(tc)
    # every host must now hold the exact global counts
    single = TransitionCounter(lags=[3], n_groups=1)
    for chunk in chunk_reads(((fastx.encode_seq(s), 0) for s in seqs_all), 3):
        single.add_chunk(chunk)
    np.testing.assert_array_equal(tc.tables[3], single.tables[3])
    print(f"proc {{pid}} OK")
    """
).format(repo=REPO)


@pytest.mark.skipif(sys.platform != "linux", reason="process test, linux only")
def test_two_process_sparse_allreduce(tmp_path):
    worker = tmp_path / "sparse_worker.py"
    worker.write_text(SPARSE_WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=120)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "OK" in out, out


IDEMPOTENT_WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    from bear_tpu.parallel import multihost
    import jax
    jax.config.update("jax_platforms", "cpu")
    multihost.initialize(coordinator_address=f"127.0.0.1:{{port}}",
                         num_processes=nproc, process_id=pid)
    multihost.initialize(coordinator_address=f"127.0.0.1:{{port}}",
                         num_processes=nproc, process_id=pid)  # no-op repeat
    import numpy as np
    from bear_tpu.counting import TransitionCounter, chunk_reads, fastx
    batch1 = ["ACGTACGT", "TTTTCGCA"]
    batch2 = ["GGGCATAT", "ACACACAC"]
    mine1 = multihost.host_shard(batch1)
    mine2 = multihost.host_shard(batch2)
    tc = TransitionCounter(lags=[2], n_groups=1)
    for chunk in chunk_reads(((fastx.encode_seq(s), 0) for s in mine1), 2):
        tc.add_chunk(chunk)
    multihost.allreduce_tables(tc)          # streaming merge #1
    for chunk in chunk_reads(((fastx.encode_seq(s), 0) for s in mine2), 2):
        tc.add_chunk(chunk)
    multihost.allreduce_tables(tc)          # streaming merge #2
    multihost.allreduce_tables(tc)          # repeated call: must not double
    total = int(tc.tables[2].sum())
    expected = sum(len(s) + 1 for s in batch1 + batch2)
    assert total == expected, (total, expected)
    print(f"proc {{pid}} OK")
    """
).format(repo=REPO)


@pytest.mark.skipif(sys.platform != "linux", reason="process test, linux only")
def test_streaming_allreduce_idempotent(tmp_path):
    worker = tmp_path / "idem_worker.py"
    worker.write_text(IDEMPOTENT_WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=120)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "OK" in out, out


@pytest.mark.skipif(sys.platform != "linux", reason="process test, linux only")
def test_multihost_counting_example():
    # The user-facing N-host harness end to end (2 procs, tiny synthetic set).
    import examples.multihost_counting as mh

    assert mh.main(["--nproc", "2", "--lag", "2",
                    "--reads-per-file", "50", "--read-len", "30"]) == 0
