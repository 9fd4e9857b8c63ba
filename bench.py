#!/usr/bin/env python
"""End-to-end benchmark: the full `quant` pipeline over 10M simulated pairs.

Measures `run_quant` whole -- gzipped FASTQ streamed from disk through the
native reader, pseudoalignment on the device, host EC resolution, FLD
estimation, the EM, and abundance outputs -- i.e. exactly what the CLI
does, timed wall-to-wall.  Prints one JSON line
{"metric", "value", "unit", "vs_baseline"}.

Dataset: 10M DISTINCT simulated pairs (length-weighted fragments from the
bundled test transcriptome + 0.5% base errors; kallisto_tpu/utils/
benchdata.py), cached in .bench_cache/.  Distinct reads keep the number
honest: tiling a small FASTQ hundreds of times (as earlier rounds did)
both under-uses the EC-resolution path and would flatter any
deduplication layer.

Baseline: reference kallisto 0.51.1 built from /root/reference
(-DUSE_HDF5=OFF), `quant -t 1` on the SAME dataset and machine:
10M pairs in 51.98 s = 192,383 pairs/s end-to-end (2026-08-20, includes
its index load, pseudoalignment, EM, output writing).  That is consistent
with the README claim of 30M reads < 3 min (/root/reference/README.md:7-9)
and with round-2's 160,620 pairs/s measured on tiled data.

A warmup pass over a 2.2M-pair prefix compiles the kernels (they land in
the persistent compilation cache, so production runs after the first ever
pay none of it); the measured run reflects steady-state throughput the
way a deployed service would see it.
"""

import os
import sys

# First-touch page faults in this environment run at ~15 MB/s; keep glibc
# from handing large frees back to the kernel so steady-state numpy reuse
# stays in already-faulted pages.
if os.environ.get("MALLOC_MMAP_MAX_") != "0":
    os.environ["MALLOC_MMAP_MAX_"] = "0"
    os.environ["MALLOC_TRIM_THRESHOLD_"] = "-1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import json
import time

REFERENCE_PAIRS_PER_S_1CORE = 192383.0

N_PAIRS = int(os.environ.get("KALLISTO_TPU_BENCH_PAIRS", 10_000_000))
N_WARM = min(2_200_000, N_PAIRS)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)

    import jax

    # persistent compilation cache: production runs after the very first
    # pay no XLA compile time (the tunneled-TPU first compile is minutes)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(here, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from kallisto_tpu.common import Options
    from kallisto_tpu.index import build_index, load_index, save_index
    from kallisto_tpu.quant.pipeline import run_quant
    from kallisto_tpu.utils.benchdata import ensure_bench_data

    cache = os.path.join(here, ".bench_cache")
    fasta = os.path.join(here, "tests", "data", "transcripts.fasta.gz")
    big1, big2 = ensure_bench_data(cache, fasta, N_PAIRS)
    warm1, warm2 = ensure_bench_data(cache, fasta, N_WARM)

    idx_path = os.path.join(cache, "bench_toy.idx.npz")
    if not os.path.exists(idx_path):
        save_index(build_index([fasta], k=31), idx_path)

    def quant(f1, f2):
        # index LOAD is inside the timed region: the reference baseline's
        # 51.98 s includes kallisto's own index load, so both sides time
        # the same phases
        index = load_index(idx_path)
        opt = Options(
            files=[f1, f2], plaintext=True, batch_size=1 << 20,
        )
        return run_quant(opt, index=index)

    # Two warm passes: the first compiles the cold-start kernel variants
    # and learns the data's anchor-failure rate; the second compiles the
    # ADAPTED wave-2 variant that the measured run will actually use
    # (kernels land in the persistent compilation cache either way, so
    # production runs after the very first pay none of this).
    quant(warm1, warm2)
    quant(warm1, warm2)

    # Pre-warm EVERY host-wave-1 wave-2 slice variant: the measured run's
    # batch tails produce fail counts the warmup prefix never hits, and a
    # new power-of-two bucket appearing mid-measurement would pay a
    # multi-minute tunneled compile inside the timed region.  One-time
    # cost (persistent compilation cache).
    import numpy as np

    from kallisto_tpu.ops.pseudoalign import device_index_from_host
    from kallisto_tpu.ops.turbo import (
        make_aux,
        pseudoalign_pair_halffail,
        pseudoalign_pair_turbo,
    )
    from kallisto_tpu.quant.pipeline import _W2MAX, _W2MIN, _W2ROWS, _w2keys

    didx = device_index_from_host(load_index(idx_path))
    rl, Lp = 50, 56
    aux = make_aux(1, rl, np.empty(0, np.int64))
    Bp = _W2MIN
    while Bp <= _W2MAX:
        z = np.zeros((Bp, Lp // 4), np.uint8)
        _, _, ck, _ = pseudoalign_pair_turbo(
            didx, z, z, aux, k=31, L=Lp, rl=rl, max_rows=_W2ROWS,
            max_keys=_w2keys(Bp), with_slots=True,
        )
        np.asarray(ck[:1])
        _, _, ck, _ = pseudoalign_pair_halffail(
            didx, z, np.zeros((Bp, 2), np.int32),
            np.zeros(Bp, np.int32), aux, k=31, L=Lp, rl=rl,
            max_rows=_W2ROWS, max_keys=_w2keys(Bp), with_slots=True,
        )
        np.asarray(ck[:1])
        Bp <<= 1

    t0 = time.time()
    res = quant(big1, big2)
    dt = time.time() - t0
    pairs_per_s = res.num_processed / dt

    print(
        json.dumps(
            {
                "metric": "quant_end_to_end_pairs_per_s_chip",
                "value": round(pairs_per_s, 1),
                "unit": "pairs/s",
                "vs_baseline": round(
                    pairs_per_s / REFERENCE_PAIRS_PER_S_1CORE, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
