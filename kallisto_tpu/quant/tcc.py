"""quant-tcc: per-cell EM over transcript-compatibility-count matrices.

reference: src/main.cpp:2802-3220.  The reference runs one EM thread per
cell; here every cell is a row of ONE vmapped EM program (shared EC
structure, batched counts and effective lengths), chunked over cells.
"""

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import numpy as np

from ..common import MAX_FRAG_LEN, Options
from ..io import writers
from .em import EmProblem, build_em_problem, counts_to_tpm, _run_em_batch_jax
from .fld import (
    calc_eff_lens,
    compute_mean_frag_lens_trunc,
    get_frag_len_means,
    trunc_gaussian_fld,
)
from .genemodel import GeneMap, parse_gene_map, rollup_to_genes


def load_ec_file(path: str, num_trans: int) -> List[np.ndarray]:
    """matrix.ec: `ec<TAB>t1,t2,...` with sequential EC ids
    (reference: KmerIndex::loadECsFromFile, src/KmerIndex.cpp:1561-1599)."""
    ec_sets: List[np.ndarray] = []
    with open(path) as f:
        for i, line in enumerate(f):
            parts = line.split()
            if int(parts[0]) != i:
                raise ValueError(
                    f"equivalence class file has a misplaced equivalence class: "
                    f"found {parts[0]}, expected {i}"
                )
            txs = np.array([int(x) for x in parts[1].split(",")], np.int32)
            if (txs < 0).any() or (txs >= num_trans).any():
                raise ValueError(f"equivalence class file has invalid value in {parts[1]}")
            ec_sets.append(txs)
    return ec_sets


def load_tcc_matrix(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Parse a MatrixMarket TCC file (rows = cells, cols = ECs) or a flat
    2-column `ec count` file (single cell).

    Returns (rows, cols, vals) 0-based plus (nrow, ncol).
    reference: src/main.cpp:2821-2899.
    """
    with open(path) as f:
        first = f.readline()
        if first.startswith("%%MatrixMarket"):
            line = f.readline()
            while line.startswith("%"):
                line = f.readline()
            nrow, ncol, nlines = (int(x) for x in line.split())
            data = np.loadtxt(f, dtype=np.int64, ndmin=2, max_rows=nlines)
            if data.shape[0] < nlines:
                raise ValueError(
                    f"found only {data.shape[0]} entries in TCC matrix file, "
                    f"expected {nlines}"
                )
            rows, cols, vals = data[:, 0] - 1, data[:, 1] - 1, data[:, 2]
            if (rows >= nrow).any() or (cols >= ncol).any():
                raise ValueError("TCC matrix file is malformed")
            return rows, cols, vals, nrow, ncol
        # flat: zero-indexed `ec count`
        entries = [first] + f.readlines()
    data = np.loadtxt(entries, dtype=np.int64, ndmin=2)
    cols, vals = data[:, 0], data[:, 1]
    return np.zeros_like(cols), cols, vals, 1, int(cols.max()) + 1


def load_fld_file(path: str, num_trans: int) -> List[np.ndarray]:
    """Per-cell (or shared) FLD histograms, space-separated
    (reference: src/main.cpp:2936-2973)."""
    out = []
    with open(path) as f:
        for line in f:
            if not line.strip() or line.startswith("#"):
                continue
            vec = np.array([int(x) for x in line.split(" ") if x.strip() != ""], np.uint32)
            if vec.shape[0] not in (MAX_FRAG_LEN, num_trans):
                raise ValueError(
                    f"fragment length distribution line has {vec.shape[0]} values; "
                    f"expected {MAX_FRAG_LEN}"
                )
            out.append(vec)
    return out


@dataclass
class TccResult:
    est_counts: np.ndarray     # [C, T]
    tpm: np.ndarray            # [C, T]
    eff_lens: np.ndarray       # [C, T]
    fld_stats: Optional[np.ndarray]  # [C, 2] (mean, sd) or None
    gene_counts: Optional[np.ndarray]
    gene_tpm: Optional[np.ndarray]


def run_quant_tcc(opt: Options, index=None, chunk: int = 256) -> TccResult:
    from ..index import load_index

    if index is None:
        index = load_index(opt.index_path)
    T = index.num_trans
    target_lens = index.target_lens

    ec_sets = load_ec_file(opt.ec_file, T)
    rows, cols, vals, C, ncol = load_tcc_matrix(opt.tcc_file)
    if ncol > len(ec_sets):
        raise ValueError("TCC matrix has more ECs than the EC file")

    counts = np.zeros((C, len(ec_sets)), np.float64)
    counts[rows, cols] = vals

    calc_eff = bool(opt.fld_file) or opt.fld_mean != 0.0
    flds: List[np.ndarray] = []
    if calc_eff and opt.fld_file:
        flds = load_fld_file(opt.fld_file, T)
        if len(flds) not in (1, C):
            raise ValueError(
                f"fragment length distribution file contains {len(flds)} lines; "
                f"expected {C}"
            )

    # per-cell effective lengths (reference: EM_lambda, main.cpp:2996-3016)
    eff_lens = np.empty((C, T), np.float64)
    fld_stats = np.zeros((C, 2), np.float64) if calc_eff else None
    for c in range(C):
        if calc_eff:
            if opt.fld_mean != 0.0:
                # -l/-s: truncated-gaussian conditional means; the cell's
                # observed flens histogram stays EMPTY, so the reported sd is
                # NaN exactly as in the reference (init_mean_fl_trunc +
                # get_sd_frag_len over empty flens, main.cpp:2999,3011-3013)
                mft = trunc_gaussian_fld(0, MAX_FRAG_LEN, opt.fld_mean, opt.fld_sd)
                mean_fl = mft[MAX_FRAG_LEN - 1]
                fl = np.zeros(MAX_FRAG_LEN, np.uint32)
            else:
                fl = flds[0] if len(flds) == 1 else flds[c]
                mft = compute_mean_frag_lens_trunc(fl.astype(np.int64))
                tot = fl.sum()
                i = np.arange(fl.shape[0], dtype=np.float64)
                mean_fl = (
                    float((fl * i).sum() / tot) if tot > 0
                    else np.finfo(np.float64).max
                )
            fl_means = get_frag_len_means(target_lens, mft)
            eff_lens[c] = calc_eff_lens(target_lens, fl_means)
            with np.errstate(invalid="ignore", divide="ignore"):
                tot = float(fl.sum())
                i = np.arange(fl.shape[0], dtype=np.float64)
                sd = np.sqrt((fl * (i - mean_fl) ** 2).sum() / tot)
            fld_stats[c] = (mean_fl, sd)
        else:
            # mean fl = target length -> every effective length is 1
            eff_lens[c] = calc_eff_lens(target_lens, target_lens.astype(np.float64))

    problem = build_em_problem(ec_sets, T)
    priors = None
    if opt.priors:
        from .em import read_priors

        priors = read_priors(opt.priors, T)
    est = np.empty((C, T), np.float64)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        for lo in range(0, C, chunk):
            hi = min(lo + chunk, C)
            sa = np.zeros((hi - lo, T), np.float64)
            if problem.singleton_tx.size:
                sa[:, problem.singleton_tx] = counts[lo:hi][:, problem.singleton_ec]
            mc = counts[lo:hi][:, problem.multi_ec_ids]
            inv_eff = 1.0 / eff_lens[lo:hi]
            alpha, _, _ = _run_em_batch_jax(
                sa, problem.flat_tx, problem.flat_ec, mc, inv_eff,
                num_trans=T,
                num_multi=int(problem.multi_ec_ids.shape[0]),
                n_iter=10000, min_rounds=50, batched_eff=True,
                alpha_init=priors,
            )
            est[lo:hi] = np.asarray(alpha)

    tpm = np.stack([counts_to_tpm(est[c], eff_lens[c]) for c in range(C)])

    gmap: Optional[GeneMap] = None
    gene_counts = gene_tpm = None
    if getattr(opt, "genemap", ""):
        gmap = parse_gene_map(opt.genemap, index.target_names)
        gene_counts = np.stack(
            [rollup_to_genes(est[c], gmap.tx_gene, gmap.num_genes) for c in range(C)]
        )
        gene_tpm = np.stack(
            [rollup_to_genes(tpm[c], gmap.tx_gene, gmap.num_genes) for c in range(C)]
        )

    result = TccResult(
        est_counts=est, tpm=tpm, eff_lens=eff_lens, fld_stats=fld_stats,
        gene_counts=gene_counts, gene_tpm=gene_tpm,
    )

    if opt.output_dir:
        os.makedirs(opt.output_dir, exist_ok=True)
        out = opt.output_dir
        writers.write_transcripts(os.path.join(out, "transcripts.txt"), index.target_names)
        _write_mtx(os.path.join(out, "matrix.abundance.mtx"), est)
        _write_mtx(os.path.join(out, "matrix.abundance.tpm.mtx"), tpm)
        if calc_eff:
            _write_mtx(os.path.join(out, "matrix.efflens.mtx"), eff_lens, dense_mask=est > 0)
            with open(os.path.join(out, "matrix.fld.tsv"), "w") as f:
                for c in range(C):
                    f.write(
                        f"{c}\t{writers.cpp_double(fld_stats[c,0])}\t"
                        f"{writers.cpp_double(fld_stats[c,1])}\n"
                    )
            with open(os.path.join(out, "transcript_lengths.txt"), "w") as f:
                for n, L in zip(index.target_names, target_lens):
                    f.write(f"{n} {int(L)}\n")
        if gmap is not None:
            _write_mtx(os.path.join(out, "matrix.abundance.gene.mtx"), gene_counts)
            _write_mtx(os.path.join(out, "matrix.abundance.gene.tpm.mtx"), gene_tpm)
            with open(os.path.join(out, "genes.txt"), "w") as f:
                for g in gmap.gene_names:
                    f.write(f"{g}\n")

    return result


def _write_mtx(path: str, mat: np.ndarray, dense_mask: Optional[np.ndarray] = None):
    """MatrixMarket writer matching writeSparseBatchMatrix
    (reference: src/PlaintextWriter.h:73-105): nonzero entries, 1-based,
    row-major order, C++ default double formatting."""
    mask = mat != 0 if dense_mask is None else dense_mask
    rows, cols = np.nonzero(mask)
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{mat.shape[0]}\t{mat.shape[1]}\t{rows.shape[0]}\n")
        for r, c in zip(rows, cols):
            f.write(f"{r+1}\t{c+1}\t{writers.cpp_double(mat[r, c])}\n")
