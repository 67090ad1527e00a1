"""Native C++ data path (phyloio.so): FASTA parsing + pattern compression
must agree exactly with the pure-Python/numpy implementations."""
import numpy as np
import pytest

from phylo_utils_tpu.io import (
    CompressedAlignment,
    compress_patterns,
    load_compressed,
    read_fasta,
)

native = pytest.importorskip("phylo_utils_tpu.native")


def test_compress_chars_matches_numpy_unique():
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("acgtACGT-N?ry"), size=307)) for _ in range(13)]
    chars, uniq, s2p, counts = native.compress_chars_native(seqs)
    ref = np.array(
        [np.frombuffer(s.upper().encode(), dtype=np.uint8) for s in seqs]
    )
    assert (chars == ref).all()
    assert (uniq[:, s2p] == ref).all()          # reconstruction
    assert counts.sum() == 307
    u_np = np.unique(ref.T, axis=0)
    assert uniq.shape[1] == u_np.shape[0]       # same pattern count


def test_compress_rejects_ragged():
    with pytest.raises(ValueError):
        native.compress_chars_native(["ACGT", "ACG"])


def test_fasta_matrix_native(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_text(
        ">seq_one some description\nacgtAC\nGT\n\n>seq_two\nACGTTGCA\n"
        ">seq_three\nAG-N?CGA\n"
    )
    names, matrix = native.read_fasta_matrix_native(str(fa))
    assert names == ["seq_one", "seq_two", "seq_three"]
    got = {n: bytes(matrix[i]).decode() for i, n in enumerate(names)}
    want = {k: v.upper() for k, v in read_fasta(str(fa)).items()}
    assert got == want


def test_fasta_matrix_native_ragged_raises(tmp_path):
    fa = tmp_path / "bad.fa"
    fa.write_text(">a\nACGT\n>b\nACG\n")
    with pytest.raises(ValueError):
        native.read_fasta_matrix_native(str(fa))


def test_load_compressed_equals_python_path(tmp_path):
    rng = np.random.default_rng(1)
    fa = tmp_path / "big.fa"
    with open(fa, "w") as f:
        for i in range(9):
            f.write(f">t{i}\n")
            # low-cardinality columns so compression actually collapses
            f.write("".join(rng.choice(list("AC"), size=400)) + "\n")
    ca_native = load_compressed(str(fa))
    ca_python = compress_patterns(read_fasta(str(fa)))
    assert isinstance(ca_native, CompressedAlignment)
    assert ca_native.names == ca_python.names
    assert ca_native.n_patterns == ca_python.n_patterns < 400
    exp_n = ca_native.partials[:, ca_native.site_to_pattern]
    exp_p = ca_python.partials[:, ca_python.site_to_pattern]
    np.testing.assert_array_equal(exp_n, exp_p)
    assert ca_native.weights.sum() == ca_python.weights.sum() == 400
