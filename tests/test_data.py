"""Data-layer parity: dense/sparse loaders against the vendored parity
fixtures (golden values from reference tests/test_dataloader.py:20-32) and the
BMM likelihood against the closed-form numpy recomputation."""

import filecmp

import numpy as np
import pytest
from scipy.special import loggamma

from bear_tpu.data import bmm_likelihood, load_dense, load_sparse
from bear_tpu.utils.config import bundled_sparse_path, bundled_ysd1_path
from tests.conftest import REFERENCE_DATA, reference_data_available

import os


def test_vendored_fixtures_match_reference_mount():
    # Cross-check: the vendored copies must stay byte-identical to the
    # upstream-packaged data whenever the reference checkout is mounted.
    if not reference_data_available():
        pytest.skip("reference mount not present (vendored copies are "
                    "authoritative on their own)")
    for name in ("ysd1_lag_5_file_0_preshuf.tsv",
                 "ex_seqs_kmap_for_var_pred.csv"):
        from tests.conftest import FIXTURES_DATA

        assert filecmp.cmp(os.path.join(FIXTURES_DATA, name),
                           os.path.join(REFERENCE_DATA, name),
                           shallow=False), f"{name} drifted from upstream"


def test_dense_loader_ysd1_golden():
    ds = load_dense(bundled_ysd1_path(), "dna", 3)
    assert ds.num_kmers == 1365
    assert ds.lag == 5
    assert ds.counts.shape == (1365, 3, 5)
    # First three rows (golden values, reference test_dataloader.py:25-30).
    np.testing.assert_array_equal(ds.kmers[:3], ["TAATC", "CGGTC", "ACGCT"])
    want = [
        [[14837, 15127, 22260, 16279, 446], [5029, 5095, 7408, 5487, 134], [16, 16, 23, 17, 0]],
        [[61890, 729, 39733, 35956, 1017], [20524, 239, 13199, 12046, 309], [69, 0, 45, 39, 0]],
        [[13965, 23135, 73870, 37045, 1035], [4705, 7591, 24532, 12305, 385], [14, 25, 81, 39, 0]],
    ]
    np.testing.assert_array_equal(ds.counts[:3], np.array(want, dtype=np.float64))
    assert ds.counts.dtype == np.float64


def test_sparse_loader_toy():
    ds = load_sparse(bundled_sparse_path(), "dna", 1)
    # Sequences were TTTAT, TTCTT, TTTTT, TTTTT: check a known row.
    # 'TTT' appears with transitions A (1, from TTTAT) + T (4) + stop (2).
    row = ds.counts[ds.kmers == "TTT"][0, 0]
    np.testing.assert_array_equal(row, [1, 0, 0, 4, 2])
    row = ds.counts[ds.kmers == "[[T"][0, 0]
    np.testing.assert_array_equal(row, [0, 0, 0, 4, 0])


def test_bmm_likelihood_vs_numpy():
    ds = load_dense(bundled_ysd1_path(), "dna", 3)
    counts = ds.counts
    alpha = np.array([0.1, 1.0, 10.0])
    want = np.sum(
        (
            np.sum(loggamma(counts[:, :, None, :] + alpha[:, None]), axis=-1)
            - loggamma(np.sum(counts[:, :, None, :] + alpha[:, None], axis=-1))
        )
        - (
            np.sum(loggamma(0 * counts[:, :, None, :] + alpha[:, None]), axis=-1)
            - loggamma(np.sum(0 * counts[:, :, None, :] + alpha[:, None], axis=-1))
        ),
        axis=0,
    )
    got = np.asarray(bmm_likelihood(counts, alpha, batch_size=400))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bmm_likelihood_mesh_matches_single_device():
    # The mesh path (reference parity: dataloader.py:140-147 distributes
    # this reduction) shards batch rows over the data axis; zero-pad rows
    # contribute exactly 0, so 8-device == 1-device exactly.
    from bear_tpu.parallel.mesh import data_parallel_mesh

    ds = load_dense(bundled_ysd1_path(), "dna", 3)
    alpha = np.array([0.1, 1.0, 10.0])
    one = np.asarray(bmm_likelihood(ds.counts, alpha, batch_size=400))
    mesh = data_parallel_mesh(8)
    # batch_size=399 exercises the round-up-to-mesh-multiple path; the
    # single-batch (n <= batch_size) geometry is covered by the full-size
    # call below.
    eight = np.asarray(
        bmm_likelihood(ds.counts, alpha, batch_size=399, mesh=mesh))
    np.testing.assert_allclose(eight, one, rtol=1e-12, atol=0)
    # Full-size call: single padded batch (n <= batch_size geometry); batch
    # boundaries differ from `one`, so only reassociation-level agreement.
    whole = np.asarray(bmm_likelihood(ds.counts, alpha, mesh=mesh))
    np.testing.assert_allclose(whole, one, rtol=1e-9)


def test_batches_iteration():
    from bear_tpu.data import CountDataset

    n = 10
    ds = CountDataset(
        kmers=np.array(["AAA"] * n),
        codes=np.zeros((n, 3), np.int8),
        counts=np.ones((n, 1, 5)),
        alphabet="dna",
    )
    batches = list(ds.batches(4))
    assert [len(b[0]) for b in batches] == [4, 4, 2]
    batches = list(ds.batches(4, epochs=2, drop_remainder=True))
    assert [len(b[0]) for b in batches] == [4, 4, 4, 4]


def test_load_dense_crlf_and_trailing_blank(tmp_path):
    # Windows-edited file with CRLF endings and a trailing blank line.
    p = tmp_path / "crlf.tsv"
    p.write_bytes(b"AC\t[[1,2,3,4,5]]\r\nGT\t[[6,7,8,9,10]]\r\n\r\n")
    ds = load_dense(str(p), "dna", 1)
    assert list(ds.kmers) == ["AC", "GT"]
    np.testing.assert_array_equal(ds.counts[1, 0], [6, 7, 8, 9, 10])


def test_load_dense_ragged_rows_rejected(tmp_path):
    # Rows with compensating wrong field counts must NOT silently shift
    # counts across k-mers (fast-path integrity check -> fallback raises).
    p = tmp_path / "ragged.tsv"
    p.write_text("AC\t[[1,2,3,4]]\nGT\t[[5,6,7,8,9,10]]\n")
    with pytest.raises(Exception):
        load_dense(str(p), "dna", 1)


def test_load_files_empty_list_raises():
    import pytest
    from bear_tpu.data import load_files

    with pytest.raises(ValueError, match="no count files"):
        load_files([], "dna", 1)


def _native_tsv_available():
    try:
        from bear_tpu.counting.fastx import _native

        lib = _native()
        return lib is not None and lib._has_tsv
    except Exception:
        return False


@pytest.mark.skipif(not _native_tsv_available(),
                    reason="native TSV parser not built (no compiler)")
def test_load_dense_native_matches_numpy(tmp_path):
    # The C++ one-pass parser must agree with the NumPy path byte-for-byte
    # on every regular-format wrinkle: headers, CRLF, blank lines, float
    # counts, '['-padded contexts, multiple groups.
    p = tmp_path / "mix.tsv"
    p.write_bytes(
        b"kmer\tcounts\n"                                # header
        b"ACG\t[[1,2,3,4,5],[0,0,1,0,2]]\r\n"            # CRLF
        b"\n"                                            # blank line
        b"[AC\t[[9,8,7,6,5],[1,1,1,1,1]]\n"              # '['-padded context
        b"GGT\t[[0.5,2,3,4,5],[1e2,0,0,0,3]]\n"          # float + exponent
    )
    a = load_dense(str(p), "dna", 2, header=True, native=True)
    b = load_dense(str(p), "dna", 2, header=True, native=False)
    assert list(a.kmers) == list(b.kmers)
    np.testing.assert_array_equal(a.codes, b.codes)
    np.testing.assert_array_equal(a.counts, b.counts)
    assert a.counts[2, 0, 0] == 0.5 and a.counts[2, 1, 0] == 100.0


@pytest.mark.skipif(not _native_tsv_available(),
                    reason="native TSV parser not built (no compiler)")
def test_load_dense_native_fixture_parity():
    fx = bundled_ysd1_path()
    a = load_dense(fx, "dna", 3, native=True)
    b = load_dense(fx, "dna", 3, native=False)
    assert list(a.kmers) == list(b.kmers)
    np.testing.assert_array_equal(a.codes, b.codes)
    np.testing.assert_array_equal(a.counts, b.counts)


@pytest.mark.skipif(not _native_tsv_available(),
                    reason="native TSV parser not built (no compiler)")
def test_load_dense_native_rejects_irregular(tmp_path):
    # Ragged contexts route to the Python fallback, which '['-pads them —
    # the native path must not mis-parse them as fixed-width.
    p = tmp_path / "ragged_ctx.tsv"
    p.write_text("C\t[[1,2,3,4,5]]\nGT\t[[6,7,8,9,10]]\n")
    ds = load_dense(str(p), "dna", 1)  # auto: native fails -> fallback
    assert list(ds.kmers) == ["[C", "GT"]
    # Wrong field counts must raise through every path (no silent shifts).
    q = tmp_path / "ragged_fields.tsv"
    q.write_text("AC\t[[1,2,3,4]]\nGT\t[[5,6,7,8,9,10]]\n")
    with pytest.raises(Exception):
        load_dense(str(q), "dna", 1, native=True)


@pytest.mark.skipif(not _native_tsv_available(),
                    reason="native TSV parser not built (no compiler)")
def test_load_dense_native_gzip(tmp_path):
    # New capability over the NumPy path: .tsv.gz reads transparently when
    # the native library is built against zlib.
    from bear_tpu.counting.fastx import _native

    lib = _native()
    if not lib.supports_gzip:
        pytest.skip("native library built without zlib")
    import gzip

    p = tmp_path / "counts.tsv.gz"
    with gzip.open(p, "wb") as fh:
        fh.write(b"AC\t[[1,2,3,4,5]]\nGT\t[[6,7,8,9,10]]\n")
    ds = load_dense(str(p), "dna", 1, native=True)
    assert list(ds.kmers) == ["AC", "GT"]
    np.testing.assert_array_equal(ds.counts[1, 0], [6, 7, 8, 9, 10])


def test_load_dense_native_missing_file():
    with pytest.raises(FileNotFoundError):
        load_dense("/nonexistent/never.tsv", "dna", 1)


def test_load_files_cached_roundtrip_and_invalidation(tmp_path):
    # The streaming CLIs' parsed-shard cache: first load parses + writes a
    # per-file .npz; a second load hits the cache byte-identically; editing
    # the source invalidates (new size/mtime -> new hash -> reparse).
    import os
    import time

    from bear_tpu.data import load_files, load_files_cached

    src = tmp_path / "shard.tsv"
    src.write_text("AC\t[[1,2,3,4,5],[0,0,1,0,2]]\n"
                   "GT\t[[6,7,8,9,10],[1,1,1,1,1]]\n")
    cache = tmp_path / "cache"
    direct = load_files([str(src)], "dna", 2)
    ds1 = load_files_cached([str(src)], "dna", 2, cache_dir=str(cache))
    entries = os.listdir(cache)
    assert len(entries) == 1 and entries[0].endswith(".npz")
    np.testing.assert_array_equal(ds1.codes, direct.codes)
    np.testing.assert_array_equal(ds1.counts, direct.counts)
    np.testing.assert_array_equal(ds1.kmers, direct.kmers)

    # Cache hit: poison the source WITHOUT changing size/mtime — the cached
    # arrays must come back (proving the parse was skipped).
    st = os.stat(src)
    # same BYTE LENGTH as the original content, different counts
    src.write_text("AC\t[[5,4,3,2,1],[2,0,1,0,0]]\n"
                   "GT\t[[9,8,7,6,11],[1,1,1,1,1]]\n")
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns))
    ds2 = load_files_cached([str(src)], "dna", 2, cache_dir=str(cache))
    np.testing.assert_array_equal(ds2.counts, direct.counts)

    # Invalidation: a real edit (new mtime) reparses.
    time.sleep(0.01)
    src.write_text("AA\t[[5,5,5,5,5],[2,2,2,2,2]]\n")
    ds3 = load_files_cached([str(src)], "dna", 2, cache_dir=str(cache))
    assert list(ds3.kmers) == ["AA"]
    assert len(os.listdir(cache)) == 2  # old entry remains, new one added

    # cache_dir=None is plain load_files.
    ds4 = load_files_cached([str(src)], "dna", 2, cache_dir=None)
    np.testing.assert_array_equal(ds4.counts, ds3.counts)
