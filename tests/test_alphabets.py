import numpy as np
import jax.numpy as jnp

from bear_tpu.ops import alphabets


def test_encode_decode_roundtrip():
    kmers = np.array(["ACGTT", "[[ACG", "TTTTT"])
    codes = alphabets.encode_kmers(kmers, "dna")
    assert codes.shape == (3, 5)
    np.testing.assert_array_equal(codes[0], [0, 1, 2, 3, 3])
    np.testing.assert_array_equal(codes[1], [4, 4, 0, 1, 2])
    np.testing.assert_array_equal(alphabets.decode_kmers(codes, "dna"), kmers)


def test_one_hot_matches_reference_column_order():
    # '[' occupies the LAST input column (reference core.py:142-147).
    oh = np.asarray(alphabets.one_hot_kmers(np.array(["A[", "T["]), "dna", jnp.float32))
    assert oh.shape == (2, 2, 5)
    np.testing.assert_array_equal(oh[0, 0], [1, 0, 0, 0, 0])
    np.testing.assert_array_equal(oh[0, 1], [0, 0, 0, 0, 1])
    np.testing.assert_array_equal(oh[1, 0], [0, 0, 0, 1, 0])


def test_output_symbols():
    codes = alphabets.encode_output_symbols(np.array(["A", "T", "]"]), "dna")
    np.testing.assert_array_equal(codes, [0, 3, 4])


def test_protein_alphabet():
    assert alphabets.alphabet_size("prot") == 20
    codes = alphabets.encode_kmers(np.array(["ARV["]), "prot")
    np.testing.assert_array_equal(codes[0], [0, 1, 19, 20])


def test_bytes_input():
    codes = alphabets.encode_kmers(np.array([b"ACG"]), "dna")
    np.testing.assert_array_equal(codes[0], [0, 1, 2])


def test_encode_kmers_rejects_ragged_lengths():
    # Silent truncation regression: mixed-length k-mers must raise, whichever
    # element comes first.
    import pytest

    for kmers in (["AC", "ACG"], ["ACG", "AC"]):
        with pytest.raises(ValueError, match="same length"):
            alphabets.encode_kmers(kmers, "dna")
