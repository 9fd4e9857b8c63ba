"""Unit tests for k-mer packing / canonicalization (host + device)."""

import numpy as np
import pytest

from kallisto_tpu.index.kmers import (
    canonicalize,
    kmer_to_string,
    pack_kmers,
    revcomp_kmers,
    string_to_kmer,
)
from kallisto_tpu.io.fastx import encode_seqs


def brute_revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


@pytest.mark.parametrize("k", [3, 5, 15, 31])
def test_revcomp_roundtrip(k):
    rng = np.random.default_rng(0)
    for _ in range(20):
        s = "".join(rng.choice(list("ACGT"), size=k))
        km = np.array([string_to_kmer(s)], np.uint64)
        rc = revcomp_kmers(km, k)
        assert kmer_to_string(int(rc[0]), k) == brute_revcomp(s)


def test_pack_kmers_values_and_validity():
    codes, _ = encode_seqs(["ACGTNACGTACG"])
    km, valid = pack_kmers(codes[0], 4)
    # windows overlapping the N (index 4) are invalid
    assert valid.tolist() == [True, False, False, False, False, True, True, True, True]
    assert int(km[0]) == string_to_kmer("ACGT")
    assert int(km[5]) == string_to_kmer("ACGT")


def test_canonicalize_min_of_pair():
    k = 7
    s = "GATTACA"
    km = np.array([string_to_kmer(s)], np.uint64)
    canon, fw = canonicalize(km, k)
    rc = string_to_kmer(brute_revcomp(s))
    assert int(canon[0]) == min(string_to_kmer(s), rc)
    assert bool(fw[0]) == (string_to_kmer(s) <= rc)


def test_device_matches_host_kmerization():
    import jax.numpy as jnp

    from kallisto_tpu.ops.pseudoalign import rolling_canonical_kmers

    rng = np.random.default_rng(1)
    k = 31
    seqs = [
        "".join(rng.choice(list("ACGTN"), size=rng.integers(31, 120), p=[0.24] * 4 + [0.04]))
        for _ in range(16)
    ]
    codes, lens = encode_seqs(seqs)
    canon_d, fw_d, valid_d = rolling_canonical_kmers(
        jnp.asarray(codes), jnp.asarray(lens), k
    )
    canon_d = np.asarray(canon_d)
    valid_d = np.asarray(valid_d)
    for i, s in enumerate(seqs):
        km, valid = pack_kmers(codes[i], k)
        canon, _ = canonicalize(km, k)
        W = len(s) - k + 1
        np.testing.assert_array_equal(valid_d[i, :W], valid[:W])
        np.testing.assert_array_equal(
            canon_d[i, :W][valid[:W]], canon[:W][valid[:W]].astype(np.int64)
        )
