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
@pytest.mark.slow
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


TRAIN_WORKER = textwrap.dedent(
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
    assert jax.device_count() == 2 * nproc  # 2 local cpu devices per host
    import numpy as np
    from bear_tpu.counting import TransitionCounter, chunk_reads, fastx
    from bear_tpu.parallel import mesh as pmesh
    from bear_tpu.models import bear_net, get_ar_func

    # Deterministic global work list; group is assigned BEFORE sharding so
    # every host agrees on the (sequence, dataset-column) pairing.
    rng = np.random.default_rng(7)
    seqs = ["".join(rng.choice(list("ACGT"), size=rng.integers(15, 30)))
            for _ in range(40)]
    pairs = [(s, i % 2) for i, s in enumerate(seqs)]
    mine = multihost.host_shard(pairs)
    assert 0 < len(mine) < len(pairs)
    tc = TransitionCounter(lags=[3], n_groups=2)
    for chunk in chunk_reads(((fastx.encode_seq(s), g) for s, g in mine), 3):
        tc.add_chunk(chunk)
    multihost.allreduce_tables(tc)   # every host now holds the global table
    ds = tc.to_dataset(3)
    mesh = pmesh.data_parallel_mesh()  # global mesh over BOTH hosts' devices
    ar = get_ar_func("linear", 3, 4)
    res = bear_net.train(
        ds.codes, ds.counts[:, 0].astype(np.float32), len(ds.codes), ar,
        batch_size=64, epochs=50, learning_rate=0.05, seed=11, mesh=mesh,
    )
    ev = bear_net.evaluation(
        ds.codes, ds.counts.astype(np.float32), 0, 1, "dna", res.h, ar,
        [np.asarray(p) for p in res.params["ar"]],
        np.array([1.0], np.float32), mesh=mesh,
    )
    print("RESULT", repr(float(res.h)), repr(float(res.losses[-1])),
          repr(float(ev[0])), flush=True)
    print(f"proc {{pid}} OK")
    """
).format(repo=REPO)


@pytest.mark.skipif(sys.platform != "linux", reason="process test, linux only")
@pytest.mark.slow
def test_two_process_training(tmp_path):
    """count -> allreduce -> data-parallel train/eval over a GLOBAL 2-process
    mesh: both processes must agree bit-for-bit (same global computation) and
    match a single-process run of the identical protocol."""
    worker = tmp_path / "train_worker.py"
    worker.write_text(TRAIN_WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = []
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "OK" in out, out
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        results.append([float(x) for x in line.split()[1:]])
    # Both processes ran the same global program on the same global arrays.
    assert results[0] == results[1], results

    # Single-process oracle: identical data and protocol, no mesh. Different
    # device count changes reduction order/padding, hence the tolerance.
    import numpy as np
    from bear_tpu.counting import TransitionCounter, chunk_reads, fastx
    from bear_tpu.models import bear_net, get_ar_func

    rng = np.random.default_rng(7)
    seqs = ["".join(rng.choice(list("ACGT"), size=rng.integers(15, 30)))
            for _ in range(40)]
    tc = TransitionCounter(lags=[3], n_groups=2)
    for chunk in chunk_reads(
        ((fastx.encode_seq(s), i % 2) for i, s in enumerate(seqs)), 3
    ):
        tc.add_chunk(chunk)
    ds = tc.to_dataset(3)
    ar = get_ar_func("linear", 3, 4)
    res = bear_net.train(
        ds.codes, ds.counts[:, 0].astype(np.float32), len(ds.codes), ar,
        batch_size=64, epochs=50, learning_rate=0.05, seed=11,
    )
    ev = bear_net.evaluation(
        ds.codes, ds.counts.astype(np.float32), 0, 1, "dna", res.h, ar,
        [np.asarray(p) for p in res.params["ar"]],
        np.array([1.0], np.float32),
    )
    expected = [float(res.h), float(res.losses[-1]), float(ev[0])]
    np.testing.assert_allclose(results[0], expected, rtol=5e-3)


@pytest.mark.skipif(sys.platform != "linux", reason="process test, linux only")
def test_multihost_counting_example():
    # The user-facing N-host harness end to end (2 procs, tiny synthetic set).
    import examples.multihost_counting as mh

    assert mh.main(["--nproc", "2", "--lag", "2",
                    "--reads-per-file", "50", "--read-len", "30"]) == 0


@pytest.mark.skipif(sys.platform != "linux", reason="process test, linux only")
def test_multihost_counting_bench_json():
    # --bench emits one machine-readable 'BENCH {json}' line from rank 0
    # with sane per-host and aggregate counting rates (the 1-host/N-host
    # scaling record of BASELINE.json).
    import json

    script = os.path.join(REPO, "examples", "multihost_counting.py")
    for attempt in range(2):
        r = subprocess.run(
            [sys.executable, script, "--nproc", "2", "--lag", "2", "--bench",
             "--reads-per-file", "60", "--read-len", "30"],
            capture_output=True, text=True, timeout=600,
            env={**os.environ, "PYTHONPATH": REPO + os.pathsep
                 + os.environ.get("PYTHONPATH", "")},
        )
        if r.returncode == 0:
            break
        # free_port() is bind-probe-then-close: under parallel test load a
        # concurrently launched distributed group can reclaim the probed
        # coordinator port before our workers bind it. One relaunch picks a
        # fresh port; a REAL harness bug fails both attempts.
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("BENCH ")]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0][len("BENCH "):])
    assert rec["bench"] == "multihost_counting"
    assert rec["hosts"] == 2
    assert len(rec["per_host_transitions_per_sec"]) == 2
    assert all(x > 0 for x in rec["per_host_transitions_per_sec"])
    assert rec["aggregate_transitions_per_sec"] > 0
    # 4 files x 60 reads x (30 bases + 1 stop) transitions per lag
    assert rec["global_transitions_per_lag"] == 4 * 60 * 31


@pytest.mark.skipif(sys.platform != "linux", reason="process test, linux only")
@pytest.mark.slow
def test_multihost_train_example():
    # The user-facing N-host count->merge->train harness (2 procs).
    import examples.multihost_train as mh

    assert mh.main(["--nproc", "2", "--lag", "3", "--reads-per-file", "200",
                    "--read-len", "50", "--epochs", "8", "--bench"]) == 0


@pytest.mark.slow
def test_multihost_train_example_streaming():
    # Streaming + data-parallel over the 2-process global mesh
    # (train_streaming mesh=; VERDICT r2 task 1's multi-host leg).
    import examples.multihost_train as mh

    assert mh.main(["--nproc", "2", "--lag", "3", "--reads-per-file", "200",
                    "--read-len", "50", "--epochs", "8", "--streaming"]) == 0


CKPT_WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    mode = sys.argv[4]; ckdir = sys.argv[5]
    from bear_tpu.parallel import multihost
    import jax
    jax.config.update("jax_platforms", "cpu")
    multihost.initialize(coordinator_address=f"127.0.0.1:{{port}}",
                         num_processes=nproc, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from bear_tpu.models import get_ar_func
    from bear_tpu.models.bear_net import train_streaming

    rng = np.random.default_rng(7)
    n, lag, bsz = 64, 3, 8
    codes = rng.integers(0, 4, (n, lag)).astype(np.int8)
    counts = rng.poisson(4.0, (n, 5)).astype(np.float64)

    def shards():
        yield codes[:32], counts[:32]
        yield codes[32:], counts[32:]

    mesh = Mesh(np.array(jax.devices()), ("data",))
    ar = get_ar_func("linear", lag, 4, dtype=jnp.float64)
    kw = dict(num_kmers=n, ar_func=ar, batch_size=bsz, epochs=2,
              learning_rate=0.02, seed=0, dtype=jnp.float64, block_steps=2,
              mesh=mesh)
    if mode == "diverged":
        # Rank-local checkpoint dirs: rank 0 holds a mid-run state, rank 1
        # nothing -> the resume consistency check must abort BOTH ranks.
        my_dir = os.path.join(ckdir, f"rank{{pid}}")
        os.makedirs(my_dir, exist_ok=True)
        if pid == 0:
            from bear_tpu.utils.checkpoint import save_train_state
            from bear_tpu.models.bear_net import init_params, params_to_list
            import optax
            p = init_params(jax.random.key(0), ar, dtype=jnp.float64)
            save_train_state(my_dir, {{
                "params": params_to_list(p),
                "opt_state": optax.adam(0.02, eps=1e-7).init(p),
                "applies_done": 4,
            }})
        try:
            train_streaming(shards, checkpoint_dir=my_dir, **kw)
        except RuntimeError as e:
            assert "differs across processes" in str(e), e
            print(f"proc {{pid}} OK (aborted)")
        else:
            raise AssertionError("divergent resume was not detected")
    else:
        # Shared checkpoint dir: train, then resume-after-complete returns
        # the identical final params on every rank.
        res = train_streaming(shards, checkpoint_dir=ckdir, **kw)
        res2 = train_streaming(shards, checkpoint_dir=ckdir, **kw)
        for a, b in zip(res.params_list, res2.params_list):
            np.testing.assert_array_equal(a, b)
        from jax.experimental import multihost_utils
        h_all = np.asarray(multihost_utils.process_allgather(
            np.float64(res.h))).reshape(-1)
        assert np.all(h_all == h_all[0]), h_all
        print(f"proc {{pid}} OK h={{res.h!r}}")
    """
).format(repo=REPO)


@pytest.mark.skipif(sys.platform != "linux", reason="process test, linux only")
@pytest.mark.slow
@pytest.mark.parametrize("mode", ["shared", "diverged"])
def test_two_process_streaming_checkpoint(tmp_path, mode):
    # Multi-process checkpointing safety: a SHARED checkpoint dir trains,
    # checkpoints (rank 0 only writes), and resumes identically on every
    # rank; rank-LOCAL dirs with divergent state abort both ranks instead
    # of silently forking trajectories (bear_net._check_resume_consistent).
    worker = tmp_path / "ck_worker.py"
    worker.write_text(CKPT_WORKER)
    ckdir = tmp_path / "ck"
    ckdir.mkdir()
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), mode,
             str(ckdir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=180)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "OK" in out, out


SPARSE_FIRST_WORKER = textwrap.dedent(
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
    from bear_tpu.counting import chunk_reads, fastx
    from bear_tpu.counting.sparse import SparseTransitionCounter
    rng = np.random.default_rng(21)
    seqs_all = ["".join(rng.choice(list("ACGT"), 40)) for _ in range(6)]
    mine = multihost.host_shard(seqs_all)
    # The flagship lag >= 16 counter itself (not the kmer-sharded dense
    # one): its windowed device-buffer drain must interact correctly with
    # the delta-baseline allreduce protocol — tiny device_buffer forces
    # several window drains between and ACROSS the allreduce points.
    tc = SparseTransitionCounter(lags=[17], n_groups=1, device_buffer=128)
    half = len(mine) // 2 or 1
    for chunk in chunk_reads(((fastx.encode_seq(s), 0) for s in mine[:half]), 17):
        tc.add_chunk(chunk)
    multihost.allreduce_tables(tc)
    for chunk in chunk_reads(((fastx.encode_seq(s), 0) for s in mine[half:]), 17):
        tc.add_chunk(chunk)
    multihost.allreduce_tables(tc)
    multihost.allreduce_tables(tc)  # repeated merge: no double-count
    single = SparseTransitionCounter(lags=[17], n_groups=1)
    for chunk in chunk_reads(((fastx.encode_seq(s), 0) for s in seqs_all), 17):
        single.add_chunk(chunk)
    rows = single.nonzero_rows(17)
    np.testing.assert_array_equal(tc.nonzero_rows(17), rows)
    np.testing.assert_array_equal(tc.counts_for_rows(17, rows),
                                  single.counts_for_rows(17, rows))
    tc.validate(expected_transitions=sum(len(s) + 1 for s in seqs_all))
    print(f"proc {{pid}} OK")
    """
).format(repo=REPO)


@pytest.mark.skipif(sys.platform != "linux", reason="process test, linux only")
@pytest.mark.slow
def test_two_process_sparse_first_counter_allreduce(tmp_path):
    worker = tmp_path / "sparse_first_worker.py"
    worker.write_text(SPARSE_FIRST_WORKER)
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
        outs = [p.communicate(timeout=180)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "OK" in out, out
