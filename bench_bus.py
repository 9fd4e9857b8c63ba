#!/usr/bin/env python
"""Single-cell BUS throughput benchmark: `bus -x 10xv2` end to end.

Builds a 10xv2-shaped dataset from the same distinct-fragment generator
as bench.py (R1 = 16bp barcode + 10bp UMI drawn from a 4096-barcode
whitelist-like pool; R2 = the cDNA mate with 0.5% errors), then times
run_bus wall-to-wall: gzipped FASTQ from disk, device pseudoalignment on
the anchor fast path, host EC resolution, barcode/UMI packing, BUS record
emission, matrix.ec/run_info outputs.  Prints one JSON line; the
comparison target is bulk quant's pairs/s (verdict criterion: bus within
2x of bulk).

Reference counterpart: BUSProcessor (src/ProcessReads.cpp:1380-1832).
"""

import json
import os
import sys
import time

N_READS = int(os.environ.get("KALLISTO_TPU_BENCH_BUS_READS", 4_000_000))


def _make_r1(path, n, rng):
    import numpy as np

    from kallisto_tpu.utils.benchdata import _write_fastq_gz

    bcs = rng.integers(0, 4, (4096, 16), dtype=np.uint8)
    bc = bcs[rng.integers(0, bcs.shape[0], n)]
    umi = rng.integers(0, 4, (n, 10), dtype=np.uint8)
    _write_fastq_gz(path, np.concatenate([bc, umi], axis=1), "c")


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)

    import jax
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(here, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from kallisto_tpu.common import Options
    from kallisto_tpu.index import build_index, save_index
    from kallisto_tpu.sc.bus import run_bus
    from kallisto_tpu.utils.benchdata import ensure_bench_data

    cache = os.path.join(here, ".bench_cache")
    fasta = os.path.join(here, "tests", "data", "transcripts.fasta.gz")
    # reuse bench.py's R2-style cDNA mate; R1 is barcodes+UMIs
    _, r2 = ensure_bench_data(cache, fasta, N_READS)
    r1 = os.path.join(cache, f"bus_r1_{N_READS}.fastq.gz")
    if not os.path.exists(r1):
        _make_r1(r1, N_READS, np.random.default_rng(11))

    idx_path = os.path.join(cache, "bench_toy.idx.npz")
    if not os.path.exists(idx_path):
        save_index(build_index([fasta], k=31), idx_path)

    def bus(out):
        opt = Options(
            files=[r1, r2], output_dir=out, technology="10xv2",
            index_path=idx_path, batch_size=1 << 20,
        )
        return run_bus(opt)

    warm = os.path.join(cache, "bus_warm_out")
    bus(warm)
    bus(warm)  # second pass compiles the adapted wave-2 variant

    out = os.path.join(cache, "bus_bench_out")
    t0 = time.time()
    bus(out)
    dt = time.time() - t0
    rps = N_READS / dt
    print(json.dumps({
        "metric": "bus_10xv2_reads_per_s_chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "seconds": round(dt, 2),
    }))


if __name__ == "__main__":
    main()
