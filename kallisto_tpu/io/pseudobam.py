"""--pseudobam: BAM output of pseudoalignments in transcriptome coordinates.

Faithful port of the reference replay path (AlnProcessor::processBufferTrans,
src/ProcessReads.cpp:1962-2363; fillBamRecord/fixCigarStringTrans/
reverseComplementSeqInData, 2908-3070; createPseudoBamHeaderTrans,
src/PseudoBam.cpp:7-23).  During read processing the pipeline records one
PseudoAlignmentInfo equivalent per fragment; after the EM, records are
replayed into a BGZF BAM with per-target EM posterior ZW tags.

Parity is asserted on the decompressed BAM payload (BGZF framing is a
compressor choice).
"""

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .bam import (
    BgzfWriter,
    FMREVERSE,
    FMUNMAP,
    FPAIRED,
    FPROPER_PAIR,
    FREAD1,
    FREAD2,
    FREVERSE,
    FSECONDARY,
    FUNMAP,
    BAM_CMATCH,
    BAM_CSOFT_CLIP,
    aux_f,
    aux_i,
    bam_header_bytes,
    encode_record,
    reg2bin,
)

_EM_TOLERANCE = 5e-324  # std::numeric_limits<double>::denorm_min()


@dataclass
class _Batch:
    names: List[bytes]
    seq1: List[np.ndarray]      # base codes per read
    qual1: List[bytes]
    f1: dict                    # has_hits, f_block, f_upos, f_rpos, f_strand
    read_ec: np.ndarray
    seq2: Optional[List[np.ndarray]] = None
    qual2: Optional[List[bytes]] = None
    f2: Optional[dict] = None


@dataclass
class PseudoAlnRecorder:
    """In-memory pseudoaln.bin equivalent."""

    paired: bool
    batches: List[_Batch] = field(default_factory=list)

    def add(self, **kw) -> None:
        self.batches.append(_Batch(**kw))


def _revcomp_codes(codes: np.ndarray) -> np.ndarray:
    return np.where(codes < 4, 3 - codes, codes)[::-1].copy()


def _strandedness_info(index, block: int, ua_tx: set):
    """Port of the strandednessInfo lambda (ProcessReads.cpp:2141-2177).

    Returns (consistent, trsense == um.strand input is applied by caller).
    """
    if block < 0:
        return False, False
    row = int(index.block_ec[block])
    if row < 0:
        return False, False
    bs, be = int(index.bp_ptr[block]), int(index.bp_ptr[block + 1])
    txs = index.bp_tx[bs:be]
    if txs.shape[0] == 0:
        return False, False
    strands = index.bp_strand[bs:be]
    trsense = bool(strands[0] != 0)  # bp_tx is tx-sorted: [0] = minimum
    for t, c in zip(txs, strands):
        # "(!v_ec[trs[i]]) != trsense" transcribed literally
        if ((c == 0) != trsense) and int(t) in ua_tx:
            return False, False
    return True, trsense


def _find_position(index, pl, block: int, tx: int, upos: int, rpos: int,
                   strand: bool):
    """KmerIndex::findPosition -> (x, sense) for one (read, target)."""
    pidx, found = pl.find(np.array([block]), np.array([tx]))
    if not bool(found[0]):
        return -1, True
    p = int(pidx[0])
    raw = int(pl.bp_pos[p])
    trsense = (raw >> 31) == 0
    t0 = raw & 0x7FFFFFFF
    rstart = int(pl.bp_rstart[p])
    rstop = int(pl.bp_rstop[p])
    t_kmer = t0 + (upos - rstart) if trsense else t0 + (rstop - 1 - upos)
    sense = trsense == strand
    x = t_kmer - rpos + 1 if sense else t_kmer + pl.k + rpos
    return x, sense


def _cigar_trans(rlen: int, softclip: int, overhang: int):
    """fixCigarStringTrans (ProcessReads.cpp:2943-2985)."""
    if softclip <= 0 and overhang <= 0:
        return [(rlen, BAM_CMATCH)]
    if softclip > 0 and overhang > 0:
        return [
            (softclip, BAM_CSOFT_CLIP),
            (rlen - overhang - softclip, BAM_CMATCH),
            (overhang, BAM_CSOFT_CLIP),
        ]
    if softclip > 0:
        return [(softclip, BAM_CSOFT_CLIP), (rlen - softclip, BAM_CMATCH)]
    return [(rlen - overhang, BAM_CMATCH), (overhang, BAM_CSOFT_CLIP)]


def write_pseudobam_trans(
    path: str,
    index,
    recorder: PseudoAlnRecorder,
    ec_sets: List[np.ndarray],
    alpha: np.ndarray,
    eff_lens: np.ndarray,
    counts: np.ndarray,
    version: str,
    use_em: bool = True,
) -> None:
    from ..quant.filters import _PayloadLookup

    pl = _PayloadLookup(index)
    paired = recorder.paired
    nl = index.num_onlist

    w = BgzfWriter(path)
    text = f"@HD\tVN:1.0\n@PG\tID:kallisto\tPN:kallisto\tVN:{version}\n"
    w.write(bam_header_bytes(
        text, index.target_names[:nl], index.target_lens[:nl]
    ))

    def emit_unmapped(name, s1, q1, s2, q2):
        f1 = FUNMAP
        if paired:
            f1 = FPAIRED | FREAD1 | FUNMAP | FMUNMAP
        w.write(encode_record(
            -1, -1, 0, 4680, f1, -1, -1, 0, name, [], s1, q1, b""
        ))
        if paired:
            f2 = FPAIRED | FREAD2 | FUNMAP | FMUNMAP
            w.write(encode_record(
                -1, -1, 0, 4680, f2, -1, -1, 0, name, [], s2, q2, b""
            ))

    for b in recorder.batches:
        n = len(b.names)
        for i in range(n):
            name = b.names[i]
            s1, q1 = b.seq1[i], b.qual1[i]
            s2 = b.seq2[i] if paired else None
            q2 = b.qual2[i] if paired else None
            r1empty = not bool(b.f1["has_hits"][i])
            r2empty = not (paired and bool(b.f2["has_hits"][i]))
            ec = int(b.read_ec[i])
            rlen1 = s1.shape[0]
            rlen2 = s2.shape[0] if paired else 0

            if (r1empty and r2empty) or ec < 0:
                emit_unmapped(name, s1, q1, s2, q2)
                continue

            trs = ec_sets[ec]
            ua = []
            best_tr = -1
            if use_em:
                inv = 1.0 / eff_lens[trs]
                denom = float(counts[ec]) * float(np.sum(alpha[trs] * inv))
                if denom < _EM_TOLERANCE:
                    ua = []
                else:
                    best_p = 0.0
                    for t, iv in zip(trs, inv):
                        a = float(alpha[t])
                        if a > 0.0:
                            prob = a * float(counts[ec]) * iv / denom
                            ua.append((int(t), prob))
                            if prob > best_p:
                                best_p = prob
                                best_tr = int(t)
            else:
                ua = [(int(t), 0.0) for t in trs]
                best_tr = int(trs[0])
            if not ua:
                emit_unmapped(name, s1, q1, s2, q2)
                continue

            ua_tx = {t for t, _ in ua}
            nmap = len(ua)

            flag1 = FUNMAP
            flag2 = 0
            if paired:
                flag1 = FPAIRED | FREAD1 | FUNMAP | FMUNMAP
                flag2 = FPAIRED | FREAD2 | FUNMAP | FMUNMAP
            if not r1empty:
                flag1 &= ~FUNMAP
                if paired:
                    flag2 &= ~FMUNMAP
            if paired and not r2empty:
                flag1 &= ~FMUNMAP
                flag2 &= ~FUNMAP
            if paired and not r1empty and not r2empty:
                flag1 |= FPROPER_PAIR
                flag2 |= FPROPER_PAIR

            str1 = (True, True)
            str2 = (True, True)
            if not r1empty:
                str1 = _strandedness_info(
                    index, int(b.f1["f_block"][i]), ua_tx
                )
            if paired and not r2empty:
                str2 = _strandedness_info(
                    index, int(b.f2["f_block"][i]), ua_tx
                )
            base_rc1 = str1[0] and not (
                str1[1] == bool(b.f1["f_strand"][i]) if not r1empty else True
            )
            base_rc2 = paired and str2[0] and not (
                str2[1] == bool(b.f2["f_strand"][i]) if not r2empty else True
            )

            for t, prob in ua:
                best = t == best_tr
                if not r1empty:
                    pos1 = _find_position(
                        index, pl, int(b.f1["f_block"][i]), t,
                        int(b.f1["f_upos"][i]), int(b.f1["f_rpos"][i]),
                        bool(b.f1["f_strand"][i]),
                    )
                else:
                    pos1 = (-(2**31), True)
                if paired:
                    if not r2empty:
                        pos2 = _find_position(
                            index, pl, int(b.f2["f_block"][i]), t,
                            int(b.f2["f_upos"][i]), int(b.f2["f_rpos"][i]),
                            bool(b.f2["f_strand"][i]),
                        )
                    else:
                        pos2 = (-(2**31), True)

                rc1 = base_rc1 or ((not str1[0]) and not pos1[1])
                rc2 = paired and (base_rc2 or ((not str2[0]) and not pos2[1]))

                f1, f2 = flag1, flag2
                if paired:
                    if not r1empty and not pos1[1]:
                        f1 |= FREVERSE
                        f2 |= FMREVERSE
                    if not r2empty and not pos2[1]:
                        f1 |= FMREVERSE
                        f2 |= FREVERSE
                elif not r1empty and not pos1[1]:
                    f1 |= FREVERSE
                if not best:
                    f1 |= FSECONDARY
                    f2 |= FSECONDARY

                tlen = int(index.target_lens[t])
                cig1 = [] if r1empty else [(rlen1, BAM_CMATCH)]
                cig2 = [] if (not paired or r2empty) else [(rlen2, BAM_CMATCH)]
                p1 = p2 = -1
                bin1 = bin2 = 4680
                q1m = q2m = 0
                if not r1empty:
                    p1 = pos1[0] - 1 if pos1[1] else pos1[0] - rlen1
                    sc1, oh1 = -p1, p1 + rlen1 - tlen
                    p1 = max(p1, 0)
                    bin1 = reg2bin(p1, p1 + rlen1 - 1)
                    q1m = 255
                    if sc1 > 0 or oh1 > 0:
                        cig1 = _cigar_trans(rlen1, sc1, oh1)
                if paired:
                    if not r2empty:
                        p2 = pos2[0] - 1 if pos2[1] else pos2[0] - rlen2
                        sc2, oh2 = -p2, p2 + rlen2 - tlen
                        p2 = max(p2, 0)
                        # reference quirk: b2's bin uses end = pos + slen
                        bin2 = reg2bin(p2, p2 + rlen2)
                        q2m = 255
                        if sc2 > 0 or oh2 > 0:
                            cig2 = _cigar_trans(rlen2, sc2, oh2)
                        if r1empty:
                            p1, bin1, q1m = p2, bin2, 0
                    else:
                        p2, bin2, q2m = p1, bin1, 0

                isize1 = isize2 = 0
                if paired and not r1empty and not r2empty:
                    tl = pos2[0] - pos1[0]
                    if tl != 0:
                        tl += 1 if tl > 0 else -1
                    isize1, isize2 = tl, -tl

                aux = aux_i(b"NH", nmap)
                if use_em:
                    aux += aux_f(b"ZW", prob)

                if not r1empty or best:
                    w.write(encode_record(
                        t, p1, q1m, bin1, f1,
                        t if paired else -1, p2 if paired else -1, isize1,
                        name, cig1,
                        _revcomp_codes(s1) if rc1 else s1,
                        q1[::-1] if rc1 else q1,
                        aux,
                    ))
                if paired and (not r2empty or best):
                    w.write(encode_record(
                        t, p2, q2m, bin2, f2, t, p1, isize2,
                        name, cig2,
                        _revcomp_codes(s2) if rc2 else s2,
                        q2[::-1] if rc2 else q2,
                        aux,
                    ))
    w.close()
