"""Index construction tests: structure invariants + reference build stats."""

import numpy as np

from kallisto_tpu.index import build_index, load_index, save_index
from kallisto_tpu.index.kmers import canonicalize, pack_kmers
from kallisto_tpu.index.sanitize import sanitize_transcripts
from kallisto_tpu.io.fastx import BASE_CODE
from kallisto_tpu.utils.mt19937 import MT19937


def test_mt19937_matches_std():
    # first outputs of std::mt19937(42)
    g = MT19937(42)
    assert [g() for _ in range(5)] == [
        1608637542, 3421126067, 4083286876, 787846414, 3143890026,
    ]


def test_reference_build_stats(test_index):
    # reference build on the same FASTA: 21 contigs, 22118 k-mers
    # (kallisto 0.51.1 stderr on test/transcripts.fasta.gz)
    assert test_index.num_trans == 14
    assert test_index.num_unitigs == 21
    assert test_index.num_kmers == 22118
    assert int(test_index.unitig_nkmers.sum()) == test_index.num_kmers


def test_blocks_tile_unitigs(test_index):
    idx = test_index
    for u in range(idx.num_unitigs):
        sel = idx.block_uid == u
        starts = idx.block_start[sel]
        ends = idx.block_end[sel]
        order = np.argsort(starts)
        starts, ends = starts[order], ends[order]
        assert starts[0] == 0
        assert ends[-1] == idx.unitig_nkmers[u]
        assert (starts[1:] == ends[:-1]).all()


def test_every_kmer_maps_to_covering_block(test_index):
    idx = test_index
    b = idx.kmer_block
    assert (b >= 0).all()
    assert (idx.block_start[b] <= idx.kmer_pos).all()
    assert (idx.kmer_pos < idx.block_end[b]).all()
    assert (idx.block_uid[b] == idx.kmer_uid).all()


def test_ec_rows_sorted_unique(test_index):
    idx = test_index
    for r in range(idx.num_ec_rows):
        row = idx.ec_row(r)
        assert (np.diff(row) > 0).all()
        assert row.shape[0] >= 1


def test_unitig_sequences_contain_their_kmers(test_index):
    idx = test_index
    k = idx.k
    # unitig sequences re-k-merized must land back on the same unitig ids
    for u in range(idx.num_unitigs):
        seq = idx.unitig_seq[idx.unitig_seq_off[u] : idx.unitig_seq_off[u + 1]]
        km, valid = pack_kmers(seq, k)
        assert valid.all()
        canon, _ = canonicalize(km, k)
        pos = np.searchsorted(idx.kmer_keys, canon)
        assert (idx.kmer_keys[pos] == canon).all()
        assert (idx.kmer_uid[pos] == u).all()
        np.testing.assert_array_equal(
            idx.kmer_pos[pos], np.arange(km.shape[0], dtype=np.int32)
        )


def test_transcript_kmers_all_indexed(data_dir, test_index):
    import os

    idx = test_index
    san = sanitize_transcripts([os.path.join(data_dir, "transcripts.fasta.gz")])
    for s in san.seqs:
        codes = BASE_CODE[np.frombuffer(s.encode(), np.uint8)]
        km, valid = pack_kmers(codes, idx.k)
        canon, _ = canonicalize(km[valid], idx.k)
        pos = np.searchsorted(idx.kmer_keys, canon)
        assert (idx.kmer_keys[pos] == canon).all()


def test_index_save_load_roundtrip(tmp_path, test_index):
    p = str(tmp_path / "test.npz")
    save_index(test_index, p)
    loaded = load_index(p)
    assert loaded.k == test_index.k
    assert loaded.target_names == test_index.target_names
    for f in ("kmer_keys", "kmer_block", "block_ec", "ec_ptr", "ec_tx", "bp_pos"):
        np.testing.assert_array_equal(getattr(loaded, f), getattr(test_index, f))


def test_make_unique_and_duplicate_error(tmp_path):
    import gzip
    import pytest

    from kallisto_tpu.index.sanitize import DuplicateNameError

    fa = tmp_path / "dup.fasta"
    fa.write_text(">a\n" + "ACGT" * 20 + "\n>a\n" + "TTTTGGGGCCCCAAAA" * 4 + "\n")
    with pytest.raises(DuplicateNameError):
        build_index([str(fa)], k=7)
    idx = build_index([str(fa)], k=7, make_unique=True)
    assert idx.target_names == ["a", "a_1"]


def test_sanitize_rules(tmp_path):
    fa = tmp_path / "san.fasta"
    polya = "ACGTACGTACGTACGTACGTACGTACGTACG" + "A" * 12
    fa.write_text(
        ">u_to_t desc here\nACGUACGU\n"
        f">polya\n{polya}\n"
        ">lower\nacgtn\n"
    )
    san = sanitize_transcripts([str(fa)])
    assert san.names == ["u_to_t", "polya", "lower"]
    assert san.seqs[0] == "ACGTACGT"
    assert san.n_u == 2
    # poly-A tail fully stripped, original length recorded
    assert san.seqs[1] == "ACGTACGTACGTACGTACGTACGTACGTACG"
    assert san.lens[1] == len(polya)
    assert san.n_polya_clipped == 1
    # 'n' replaced via mt19937(42): first draw 1608637542 & 3 == 2 -> 'G'
    assert san.seqs[2] == "ACGTG"
    assert san.n_non_nucl == 1


def test_inspect_reference_field_parity(tmp_path, data_dir, test_index, capsys):
    """`inspect` prints the reference's stdout field set byte-for-byte
    (reference: InspectIndex, src/Inspect.h:120-140; pinned against
    /tmp/refbuild's output on the bundled transcriptome)."""
    import contextlib
    import io as _io

    from kallisto_tpu.index import save_index
    from kallisto_tpu.cli import main

    p = str(tmp_path / "idx.npz")
    save_index(test_index, p)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["inspect", p])
    assert buf.getvalue() == (
        "[inspect] Index version number = 13\n"
        "[inspect] number of unitigs = 21\n"
        "[inspect] minimizer length = 23\n"
        "[inspect] max EC size = 3\n"
        "[inspect] number of ECs discarded = 0\n"
    )
