"""`kallisto bus` equivalent: single-cell BUS record generation.

reference: BUSProcessor::processBuffer (src/ProcessReads.cpp:1380-1832),
MasterProcessor::update BUS branch (602-628), main.cpp bus finalize
(2336-2617), BUS binary format (src/BUSData.h:30-38, src/BUSTools.cpp).

Barcode/UMI extraction and 2-bit packing are vectorized host numpy; the
cDNA sequence goes through the same device pseudoalignment + host EC
resolution as bulk quant.  Records are emitted in read order with EC ids
assigned at first-seen (the reference's per-8MB-batch [known-EC..., new-
EC...] record grouping is an artifact of its threading, not semantics;
single-batch runs match byte-for-byte).
"""

import os
import struct
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .. import KALLISTO_COMPAT_VERSION
from ..common import MAX_FRAG_LEN, Options, REFERENCE_INDEX_VERSION
from ..index import load_index, save_index
from ..io import writers
from ..io.fastx import ReadBatch, _read_batch_to_packed, single_batches
from ..ops.pseudoalign import device_index_from_host, pair_fragment_lengths
from ..quant.ecmap import EcResolver
from ..quant.filters import StrandFilter
from ..quant.pipeline import (
    _SideArrays,
    _apply_overflow_fallback,
    _dispatch_side,
    _make_pair_fetcher,
    _make_single_fetcher,
)
from ..ops.pseudoalign import pair_key_hash, single_key_hash
from .technologies import BusOptions, parse_technology

BUS_VERSION = 1
BUS_HEADER_TEXT = b"BUS file produced by kallisto"


def write_bus_header(f, bclen: int, umilen: int) -> None:
    """reference: writeBUSHeader (src/BUSTools.cpp:5-14)."""
    f.write(b"BUS\x00")
    f.write(struct.pack("<III", BUS_VERSION, bclen, umilen))
    f.write(struct.pack("<I", len(BUS_HEADER_TEXT)))
    f.write(BUS_HEADER_TEXT)


def pack_dna_binary(codes: np.ndarray, lens: np.ndarray):
    """Vectorized stringToBinary (reference: src/BUSData.cpp:8-36).

    codes: [B, L] base codes (4 = N/other, packed as G).  Returns
    (binary uint64 [B], flag uint32 [B]); positions >= lens are ignored.
    flag = (min(numN,3) & 3) | (first N position & 31) << 2.
    """
    B, L = codes.shape
    k = np.minimum(lens, 32)
    pos = np.arange(L)[None, :]
    active = pos < k[:, None]
    bits = np.where(codes == 4, 2, codes).astype(np.uint64)
    shift = (k[:, None] - 1 - pos).astype(np.int64)
    contrib = np.where(active, bits << np.maximum(shift, 0).astype(np.uint64) * np.uint64(2), 0)
    r = contrib.sum(axis=1, dtype=np.uint64)
    isN = active & (codes == 4)
    numN = np.minimum(isN.sum(axis=1), 3).astype(np.uint32)
    first_n = np.where(isN.any(axis=1), isN.argmax(axis=1), 0).astype(np.uint32)
    flag = np.where(numN > 0, (numN & 3) | ((first_n & 31) << 2), 0).astype(np.uint32)
    return r, flag


def _extract_substrs(
    batches: List[ReadBatch], substrs, max_out: int
):
    """Concatenate technology substrings across files, vectorized.

    Returns (codes [B, max_out], lens [B], ok [B]); ok=False means a
    required substring exceeded the read (reference 'bad umi/bc' skip).
    """
    B = batches[0].n
    out = np.full((B, max_out), 4, np.uint8)
    out_len = np.zeros(B, np.int32)
    ok = np.ones(B, bool)
    for fileno, start, stop in substrs:
        rb = batches[fileno]
        l = rb.lens.astype(np.int64)
        sublen = np.where(stop == 0, l - start, stop - start)
        good = (l >= start + sublen) & (sublen > 0)
        ok &= good
        maxsub = int(min(max(sublen.max(initial=0), 0), max_out))
        if maxsub <= 0:
            continue
        src = rb.codes[:, start : start + maxsub]
        if src.shape[1] < maxsub:
            src = np.concatenate(
                [src, np.full((B, maxsub - src.shape[1]), 4, np.uint8)], axis=1
            )
        # scatter src rows into out at per-read offsets
        col = np.arange(maxsub)[None, :]
        take = col < sublen[:, None]
        dst_col = out_len[:, None] + col
        valid = take & (dst_col < max_out) & good[:, None]
        rowi = np.broadcast_to(np.arange(B)[:, None], dst_col.shape)
        out[rowi[valid], dst_col[valid]] = src[valid]
        out_len = out_len + np.where(good, np.minimum(sublen, max_out - out_len), 0).astype(np.int32)
    return out, out_len, ok


def _extract_seq(batches: List[ReadBatch], seq_substrs) -> ReadBatch:
    """Build the cDNA sequence batch: a single substring slice, or multiple
    substrings joined by an N separator (reference: ProcessReads.cpp:1549-1580)."""
    if len(seq_substrs) == 1:
        fileno, start, stop = seq_substrs[0]
        rb = batches[fileno]
        l = rb.lens.astype(np.int64)
        sublen = np.where(stop == 0, l - start, np.minimum(stop, l) - start)
        sublen = np.maximum(sublen, 0)
        codes = rb.codes[:, start:] if stop == 0 else rb.codes[:, start:stop]
        return ReadBatch(codes=np.ascontiguousarray(codes), lens=sublen.astype(np.int32))
    total = sum(
        (batches[f].codes.shape[1] - a if b == 0 else b - a) + 1
        for f, a, b in seq_substrs
    )
    codes, lens, _ = _extract_substrs_with_sep(batches, seq_substrs, total)
    return ReadBatch(codes=codes, lens=lens)


def _extract_substrs_with_sep(batches, substrs, max_out):
    B = batches[0].n
    out = np.full((B, max_out), 4, np.uint8)
    out_len = np.zeros(B, np.int32)
    for fileno, start, stop in substrs:
        rb = batches[fileno]
        l = rb.lens.astype(np.int64)
        sublen = np.clip(np.where(stop == 0, l - start, stop - start), 0, None)
        maxsub = int(min(sublen.max(initial=0), max_out))
        if maxsub > 0:
            src = rb.codes[:, start : start + maxsub]
            if src.shape[1] < maxsub:
                src = np.concatenate(
                    [src, np.full((B, maxsub - src.shape[1]), 4, np.uint8)], axis=1
                )
            col = np.arange(maxsub)[None, :]
            take = col < sublen[:, None]
            dst_col = out_len[:, None] + col
            valid = take & (dst_col < max_out)
            rowi = np.broadcast_to(np.arange(B)[:, None], dst_col.shape)
            out[rowi[valid], dst_col[valid]] = src[valid]
            out_len = (out_len + np.minimum(sublen, max_out - out_len)).astype(np.int32)
        # 'N' separator after each piece (reference appends 'N')
        sep_ok = out_len < max_out
        out[np.arange(B)[sep_ok], out_len[sep_ok]] = 4
        out_len = out_len + sep_ok.astype(np.int32)
    return out, out_len, np.ones(B, bool)


@dataclass
class BusResult:
    num_processed: int
    num_pseudoaligned: int
    num_unique: int
    bclen: int
    umilen: int
    ec_sets: List[np.ndarray]
    counts: np.ndarray
    flens: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))


def _binary_to_string(val: int, length: int) -> str:
    """reference: binaryToString (src/BUSData.cpp:38-49)."""
    return "".join(
        "ACGT"[(val >> (2 * (length - 1 - i))) & 3] for i in range(length)
    )


def _emit_records(busf, read_ec, sel, bc_bin, umi_bin, bc_flag, umi_flag,
                  read_numbers=None):
    """Write BUS records for mapped reads, in read order.  With -n the
    flags column holds the global read number instead
    (reference: ProcessReads.cpp:1747-1749)."""
    mapped = np.flatnonzero(read_ec >= 0)
    if not mapped.size:
        return
    recs = np.zeros(
        mapped.size,
        dtype=np.dtype(
            [("barcode", "<u8"), ("UMI", "<u8"), ("ec", "<i4"),
             ("count", "<u4"), ("flags", "<u4"), ("pad", "<u4")]
        ),
    )
    gsel = sel[mapped]
    recs["barcode"] = bc_bin[gsel]
    recs["UMI"] = umi_bin[gsel]
    recs["ec"] = read_ec[mapped]
    recs["count"] = 1
    if read_numbers is not None:
        recs["flags"] = read_numbers[gsel]
    else:
        recs["flags"] = bc_flag[gsel] | (umi_flag[gsel] << 8)
    busf.write(recs.tobytes())


def _process_aa_frames(seq1, didx, index, k, resolver, aa_resolver):
    """6-frame comma-free-code pseudoalignment + best-frame selection
    (reference: BUSProcessor aa frames, src/ProcessReads.cpp:1653-1694;
    MinCollector::intersectKmersCFC, src/MinCollector.cpp:44-119).

    Frames: forward +0/+1/+2, then reverse-complement +0/+1/+2.  A read
    whose ANY frame intersects an off-list (D-list) target is discarded;
    otherwise the frame with the smallest non-empty on-list EC wins (first
    frame wins ties; ties are counted as cardinality clashes).
    """
    from ..utils.cfc import nt_to_cfc_codes, revcomp_codes

    codes, lens = seq1.codes, seq1.lens
    B = codes.shape[0]
    rc = revcomp_codes(codes, lens)
    num_onlist = index.num_onlist

    frame_idx = []    # per frame: [B] index into that frame's uniq list
    frame_sets = []   # per frame: list of (masked_set|None)
    frame_off = []    # per frame: [B] bool off-list member present
    frame_card = []   # per frame: [B] cardinality of masked set (0 = none)
    for src in (codes, rc):
        for fr in range(3):
            fc, fl = nt_to_cfc_codes(src, lens, fr)
            fb = ReadBatch(codes=fc, lens=fl)
            r1 = _dispatch_side(didx, _read_batch_to_packed(fb, k), k)
            h = np.asarray(single_key_hash(r1))
            s1 = _SideArrays(r1)
            uidx, usets = aa_resolver.resolve_batch_hashed(
                h, _make_single_fetcher(r1, s1),
                int(r1.rows.shape[1]), paired=False,
            )
            _apply_overflow_fallback(
                aa_resolver, index, uidx, usets, False,
                (s1, _read_batch_to_packed(fb, k)), None,
            )
            off = np.array(
                [s is not None and bool((s >= num_onlist).any()) for s in usets]
            )
            masked = [
                None if s is None or s[s < num_onlist].size == 0
                else s[s < num_onlist]
                for s in usets
            ]
            card = np.array(
                [0 if m is None else m.shape[0] for m in masked], np.int64
            )
            frame_idx.append(uidx)
            frame_sets.append(masked)
            frame_off.append(off[uidx] if off.size else np.zeros(B, bool))
            frame_card.append(card[uidx])

    veto = np.zeros(B, bool)
    for off in frame_off:
        veto |= off
    cards = np.stack(frame_card)                      # [6, B]
    cards_inf = np.where(cards > 0, cards, np.iinfo(np.int64).max)
    winner = np.argmin(cards_inf, axis=0)             # first frame wins ties
    any_hit = (cards > 0).any(axis=0)
    ok = any_hit & ~veto

    # assemble (final_idx, final_sets) for count_batch
    final_sets = []
    offsets = []
    for fs in frame_sets:
        offsets.append(len(final_sets))
        final_sets.extend(fs)
    none_slot = len(final_sets)
    final_sets.append(None)
    final_idx = np.full(B, none_slot, np.int64)
    for f in range(6):
        m = ok & (winner == f)
        final_idx[m] = offsets[f] + frame_idx[f][m]
    return resolver.count_batch(final_idx, final_sets)


def run_bus(opt: Options, index=None) -> BusResult:
    start_time = time.strftime("%a %b %d %H:%M:%S %Y")
    if index is None:
        index = load_index(opt.index_path)
    bus: BusOptions = parse_technology(
        opt.technology, opt.single_end, paired=opt.bus_paired
    )
    strand = opt.strand if opt.strand is not None else bus.strand
    if getattr(opt, "unstranded", False):
        strand = None

    didx = device_index_from_host(index)
    resolver = EcResolver(index)
    aa_resolver = EcResolver(index, mask_offlist=False) if opt.aa else None
    k = index.k
    strand_filter = StrandFilter(index, strand) if strand in ("fr", "rf") else None

    os.makedirs(opt.output_dir, exist_ok=True)
    bus_path = os.path.join(opt.output_dir, "output.bus")
    busf = open(bus_path, "wb")
    tech_bclen = bus.bc_length()
    tech_umilen = bus.umi_length()
    write_bus_header(busf, tech_bclen, tech_umilen)

    bc_len_hist = np.zeros(33, np.int64)
    umi_len_hist = np.zeros(33, np.int64)
    num_processed = 0
    flens = np.zeros(MAX_FRAG_LEN, np.int64)
    tlencount = 0

    no_bc = bus.bc[0][0] == -1
    no_umi = bus.umi[0][0] == -1

    if len(opt.files) % bus.nfiles != 0:
        raise ValueError(
            f"number of files must be a multiple of {bus.nfiles} for this technology"
        )
    groups = [
        opt.files[i : i + bus.nfiles] for i in range(0, len(opt.files), bus.nfiles)
    ]

    max_bc = 32
    max_umi = 32

    num_seen = 0
    capped = False
    for group_idx, group in enumerate(groups):
        if capped:
            break
        streams = [single_batches(f, opt.batch_size) for f in group]
        for batches in zip(*streams):
            B = batches[0].n
            if any(b.n != B for b in batches):
                raise ValueError("technology FASTQ files have different record counts")
            if opt.max_num_reads and num_seen + B >= opt.max_num_reads:
                # downsample the final batch to exactly -N reads
                # (reference: ProcessReads.cpp:589-595)
                B = opt.max_num_reads - num_seen
                capped = True
                if B <= 0:
                    break
                batches = tuple(
                    ReadBatch(codes=b.codes[:B], lens=b.lens[:B])
                    for b in batches
                )
            read_base = num_seen
            num_seen += B

            # UMI first (reads with bad UMI are skipped before the barcode
            # histogram is touched, reference: ProcessReads.cpp:1504-1544)
            if no_umi:
                # no-UMI technologies (bulk/batch, SMARTSEQ2): UMI = u64(-1)
                umi_bin = np.full(B, np.uint64(0xFFFFFFFFFFFFFFFF))
                umi_flag = np.zeros(B, np.uint32)
                umi_ok = np.ones(B, bool)
                ulen = np.ones(B, np.int32)
            else:
                ucodes, ulen, umi_ok = _extract_substrs(batches, bus.umi, max_umi)
                umi_bin, umi_flag = pack_dna_binary(ucodes, ulen)
            uok = umi_ok & (ulen <= 32)
            np.add.at(umi_len_hist, ulen[uok], 1)

            if no_bc:
                # fake barcode identifying the batch (file group)
                # (reference: ProcessReads.cpp:1606-1610)
                bc_bin = np.full(B, group_idx, np.uint64)
                bc_flag = np.zeros(B, np.uint32)
                bc_ok = np.ones(B, bool)
                blen = np.full(B, 16, np.int32)  # BUSFORMAT_FAKE_BARCODE_LEN
            else:
                bcodes, blen, bc_ok = _extract_substrs(batches, bus.bc, max_bc)
                bc_bin, bc_flag = pack_dna_binary(bcodes, blen)

            good = umi_ok & bc_ok
            bok = good & (blen <= 32)
            np.add.at(bc_len_hist, blen[bok], 1)

            sel = np.flatnonzero(good)
            if sel.size == 0:
                continue
            sub = [
                ReadBatch(codes=b.codes[sel], lens=b.lens[sel]) for b in batches
            ]
            seq1 = _extract_seq(sub, [bus.seq[0]] if bus.paired else bus.seq)
            if opt.aa:
                read_ec, read_card = _process_aa_frames(
                    seq1, didx, index, k, resolver, aa_resolver
                )
                num_processed += B
                _emit_records(
                    busf, read_ec, sel, bc_bin, umi_bin, bc_flag, umi_flag,
                    read_numbers=(
                        read_base + np.arange(B, dtype=np.uint32)
                        if opt.bus_num else None
                    ),
                )
                if capped:
                    break
                continue
            r1 = _dispatch_side(didx, _read_batch_to_packed(seq1, k), k)
            if bus.paired:
                seq2 = _extract_seq(sub, [bus.seq[1]])
                r2 = _dispatch_side(didx, _read_batch_to_packed(seq2, k), k)
                h = np.asarray(pair_key_hash(r1, r2))
                s1, s2 = _SideArrays(r1), _SideArrays(r2)
                read_uidx, uniq_sets = resolver.resolve_batch_hashed(
                    h, _make_pair_fetcher(r1, r2, s1, s2),
                    int(r1.rows.shape[1]), paired=True,
                )
                _apply_overflow_fallback(
                    resolver, index, read_uidx, uniq_sets, False,
                    (s1, seq1), (s2, seq2),
                )
                tl = np.asarray(pair_fragment_lengths(r1, r2, k=k))
            else:
                h = np.asarray(single_key_hash(r1))
                s1 = _SideArrays(r1)
                s2 = None
                read_uidx, uniq_sets = resolver.resolve_batch_hashed(
                    h, _make_single_fetcher(r1, s1),
                    int(r1.rows.shape[1]), paired=False,
                )
                _apply_overflow_fallback(
                    resolver, index, read_uidx, uniq_sets, False, (s1, seq1), None
                )
                tl = None

            final_idx, final_sets = read_uidx, uniq_sets
            if strand_filter is not None:
                if bus.paired:
                    final_idx, final_sets = strand_filter.apply_pair(
                        read_uidx, uniq_sets,
                        s1.has_hits, s1.f_block, s1.f_strand,
                        s2.has_hits, s2.f_block, s2.f_strand,
                    )
                else:
                    final_idx, final_sets = strand_filter.apply_pair(
                        read_uidx, uniq_sets, s1.has_hits, s1.f_block, s1.f_strand
                    )

            read_ec, read_card = resolver.count_batch(final_idx, final_sets)
            num_processed += B

            if bus.paired and tlencount < 10000 and tl is not None:
                okfl = (
                    (tl > 0) & (tl < MAX_FRAG_LEN) & (read_card == 1)
                    & s1.has_hits & s2.has_hits
                )
                take = np.flatnonzero(okfl)[: 10000 - tlencount]
                np.add.at(flens, tl[take], 1)
                tlencount += take.shape[0]

            _emit_records(
                busf, read_ec, sel, bc_bin, umi_bin, bc_flag, umi_flag,
                read_numbers=(
                    read_base + np.arange(B, dtype=np.uint32)
                    if opt.bus_num else None
                ),
            )
            if capped:
                break

    busf.close()

    # barcode/UMI length detection + header back-patch
    # (reference: main.cpp:2472-2508)
    bclen = int(np.argmax(bc_len_hist))
    umilen = int(np.argmax(umi_len_hist))
    patch = False
    if tech_bclen == 0:
        patch = patch or bclen > 0
    else:
        bclen = tech_bclen
    if tech_umilen == 0:
        patch = patch or umilen > 0
    else:
        umilen = tech_umilen
    if patch:
        with open(bus_path, "r+b") as f:
            f.seek(8)
            f.write(struct.pack("<II", bclen, umilen))

    counts = resolver.counts_array()
    num_pseudoaligned = int(counts.sum())
    num_unique = resolver.num_unique_reads()

    # outputs (reference: main.cpp:2509-2596)
    if no_bc:
        # batch/bulk mode: fake per-batch barcodes (main.cpp:2408-2420)
        with open(os.path.join(opt.output_dir, "matrix.cells"), "w") as f:
            for i in range(len(groups)):
                f.write(f"batch{i}\n")
        with open(
            os.path.join(opt.output_dir, "matrix.sample.barcodes"), "w"
        ) as f:
            for i in range(len(groups)):
                f.write(_binary_to_string(i, 16) + "\n")
        save_index(index, os.path.join(opt.output_dir, "index.saved"))
    if bus.paired:
        with open(os.path.join(opt.output_dir, "flens.txt"), "w") as f:
            f.write(" ".join(str(int(x)) for x in flens) + "\n")
        save_index(index, os.path.join(opt.output_dir, "index.saved"))
    writers.write_ec_list(
        os.path.join(opt.output_dir, "matrix.ec"), resolver.ec_sets
    )
    writers.write_transcripts(
        os.path.join(opt.output_dir, "transcripts.txt"),
        index.target_names[: index.num_onlist],
    )
    writers.write_run_info(
        os.path.join(opt.output_dir, "run_info.json"),
        n_targets=index.num_onlist,
        n_bootstraps=0,
        n_processed=num_processed,
        n_pseudoaligned=num_pseudoaligned,
        n_unique=num_unique,
        kallisto_version=KALLISTO_COMPAT_VERSION,
        index_version=REFERENCE_INDEX_VERSION,
        k=k,
        start_time=start_time,
        call=opt.call,
    )
    return BusResult(
        num_processed=num_processed,
        num_pseudoaligned=num_pseudoaligned,
        num_unique=num_unique,
        bclen=bclen,
        umilen=umilen,
        ec_sets=resolver.ec_sets,
        counts=counts,
        flens=flens,
    )
