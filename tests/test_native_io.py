"""Native C++ FASTQ reader: byte-exact parity with the Python path.

The native runtime (kallisto_tpu/native/ktio.cpp) replaces the reference's
kseq + zlib streaming readers (reference: src/kseq.h,
src/ProcessReads.cpp:3128-3267); its packed output must match
pack_codes_host over the Python reader exactly.
"""

import gzip
import os

import numpy as np
import pytest

from kallisto_tpu import native
from kallisto_tpu.io.fastx import (
    _read_batch_to_packed,
    single_batches,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native IO library unavailable (g++/zlib missing)")


def _native_stream(path, batch_reads, keep_names=False, k=31):
    r = native.NativeFastqReader(
        path, batch_reads, pad_to=8, min_len=k, keep_names=keep_names
    )
    out = []
    try:
        while True:
            b = r.next_batch()
            if b is None:
                return out
            out.append(b)
    finally:
        r.close()


def _concat(batches):
    Lp = max(b.Lp for b in batches)
    pk = np.concatenate(
        [np.pad(b.packed, ((0, 0), (0, Lp // 4 - b.packed.shape[1]))) for b in batches]
    )
    nm = np.concatenate(
        [
            np.pad(
                b.nmask,
                ((0, 0), (0, Lp // 8 - b.nmask.shape[1])),
                constant_values=255,
            )
            for b in batches
        ]
    )
    lens = np.concatenate([b.lens for b in batches])
    names = None
    if batches[0].names is not None:
        names = [n for b in batches for n in b.names]
    return pk, nm, lens, names


@pytest.mark.parametrize(
    "fname", ["reads_1.fastq.gz", "reads_2.fastq.gz", "sc_reads_1.fastq.gz"]
)
def test_native_matches_python(lib_ok, fname):
    path = os.path.join(DATA, fname)
    nb = _native_stream(path, 3000, keep_names=True)
    pb = [
        _read_batch_to_packed(rb, k=31)
        for rb in single_batches(path, 3000, keep_names=True)
    ]
    npk, nnm, nl, nn = _concat(nb)
    ppk, pnm, pl, pn = _concat(pb)
    W = min(npk.shape[1], ppk.shape[1])  # batching differs near EOF
    assert np.array_equal(nl, pl)
    assert np.array_equal(npk[:, :W], ppk[:, :W])
    assert np.array_equal(nnm[:, : W // 2], pnm[:, : W // 2])
    # names come from the python reader with keep_names
    pn2 = [n for rb in single_batches(path, 3000, keep_names=True) for n in rb.names]
    assert nn == pn2


def test_native_strict_batching(lib_ok):
    path = os.path.join(DATA, "reads_1.fastq.gz")
    nb = _native_stream(path, 3000)
    assert [b.n for b in nb] == [3000, 3000, 3000, 1000]
    assert all(b.packed.shape[1] * 4 == b.Lp for b in nb)


def test_native_plain_and_edge_cases(lib_ok, tmp_path):
    # uncompressed input, lowercase, N bases, CRLF, no trailing newline
    fq = (
        "@r1 desc\nACGTNacgt\n+\nIIIIIIIII\n"
        "@r2\nNNNN\n+\n!!!!\n"
        "@r3\nACGT"  # no trailing newline
    )
    p = tmp_path / "t.fastq"
    p.write_text(fq)
    (tmp_path / "t2.fastq.gz").write_bytes(gzip.compress(fq.encode()))
    for fn in ["t.fastq", "t2.fastq.gz"]:
        b = _native_stream(str(tmp_path / fn), 10, keep_names=True)[0]
        assert b.n == 3
        assert list(b.lens) == [9, 4, 4]
        assert b.names == [b"r1", b"r2", b"r3"]
        assert np.array_equal(b.row_codes(0)[:9], [0, 1, 2, 3, 4, 0, 1, 2, 3])
        assert np.array_equal(b.row_codes(1)[:4], [4, 4, 4, 4])
        assert np.array_equal(b.row_codes(2)[:4], [0, 1, 2, 3])
        # pad region reads as N
        assert (b.row_codes(1)[4:] == 4).all()


def test_malformed_fastq_raises_cleanly(tmp_path):
    """Failure detection: malformed FASTQ reports file + record instead of
    silently mis-parsing (reference kseq has no such guard)."""
    import gzip

    import pytest

    from kallisto_tpu.io.fastx import single_batches

    p = str(tmp_path / "bad.fastq.gz")
    with gzip.open(p, "wt") as f:
        f.write("@r1\nACGT\n+\nIIII\nr2-missing-at\nACGT\n+\nIIII\n")
    with pytest.raises(ValueError, match="malformed FASTQ"):
        list(single_batches(p, 100))


def test_mismatched_pair_counts_raise(tmp_path):
    import gzip

    import pytest

    from kallisto_tpu.io.fastx import paired_batches

    p1 = str(tmp_path / "a.fastq.gz")
    p2 = str(tmp_path / "b.fastq.gz")
    with gzip.open(p1, "wt") as f:
        f.write("@r1\nACGT\n+\nIIII\n@r2\nACGT\n+\nIIII\n")
    with gzip.open(p2, "wt") as f:
        f.write("@r1\nACGT\n+\nIIII\n")
    with pytest.raises(ValueError, match="different record counts"):
        list(paired_batches(p1, p2, 100))
