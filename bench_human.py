#!/usr/bin/env python
"""Human-scale benchmark: index build + quant on a >=100k-target
transcriptome.

The toy bench (bench.py) runs on the bundled 14-transcript FASTA; this one
exercises the pipeline at GENCODE scale -- ~105k targets / ~1.3e8 bases /
~8e7 distinct k-mers from the deterministic isoform-structured generator
(kallisto_tpu/utils/simtx.py) -- where the index takes the bucketed
binary-search device layout, EC resolution sees a deep key space, and the
EM is 1e5-wide.  Reference yardstick: kallisto builds a human index in
< 10 minutes and quantifies 30M reads in < 3 minutes on a desktop
(/root/reference/README.md:7-10).

Prints TWO JSON lines: index-build seconds and end-to-end pairs/s
(including index load, like bench.py).

Env knobs: KALLISTO_TPU_BENCH_GENES (default 35000 -> ~105k targets),
KALLISTO_TPU_BENCH_HUMAN_PAIRS (default 2,000,000).
"""

import json
import os
import sys
import time

N_GENES = int(os.environ.get("KALLISTO_TPU_BENCH_GENES", 35000))
N_PAIRS = int(os.environ.get("KALLISTO_TPU_BENCH_HUMAN_PAIRS", 2_000_000))


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(here, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from kallisto_tpu.common import Options
    from kallisto_tpu.index import build_index, load_index, save_index
    from kallisto_tpu.quant.pipeline import run_quant
    from kallisto_tpu.utils.benchdata import ensure_bench_data
    from kallisto_tpu.utils.simtx import ensure_transcriptome

    cache = os.path.join(here, ".bench_cache")
    fasta = ensure_transcriptome(cache, N_GENES)

    t0 = time.time()
    index = build_index([fasta], k=31)
    build_s = time.time() - t0
    print(json.dumps({
        "metric": "index_build_seconds_100k_targets",
        "value": round(build_s, 1),
        "unit": "s",
        "n_targets": index.num_trans,
        "n_kmers": int(index.kmer_keys.shape[0]),
    }))

    idx_path = os.path.join(cache, f"simtx_{N_GENES}.idx.npz")
    if not os.path.exists(idx_path):
        save_index(index, idx_path)
    del index

    r1, r2 = ensure_bench_data(
        os.path.join(cache, "human"), fasta, N_PAIRS
    )

    def quant():
        index = load_index(idx_path)
        opt = Options(files=[r1, r2], plaintext=True, batch_size=1 << 20)
        return run_quant(opt, index=index)

    # two warm passes: the second compiles the ADAPTED wave-2 capacity
    # variant the measured run uses (see bench.py)
    quant()
    quant()
    t0 = time.time()
    res = quant()
    dt = time.time() - t0
    print(json.dumps({
        "metric": "human_scale_quant_pairs_per_s_chip",
        "value": round(res.num_processed / dt, 1),
        "unit": "pairs/s",
        "n_targets": len(res.target_names),
    }))


if __name__ == "__main__":
    main()
