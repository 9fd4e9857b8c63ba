#!/usr/bin/env python
"""EM iterations/s (the BASELINE.md metric) at human scale.

Runs the batched bootstrap-style EM -- 100 replicates of a ~105k-target,
~200k-EC problem -- once on the CPU float64 parity leg and once on the
accelerator float32 leg, and reports device EM throughput as total
(replicate x iteration) updates per second plus the end-to-end
bootstrap wall time the reference's BootstrapThreadPool would spend
(reference: src/Bootstrap.cpp:15-92, src/EMAlgorithm.h:95-222).

Requires the cached human-scale index (run bench_human.py first, or set
KALLISTO_TPU_BENCH_GENES to match an existing .bench_cache entry).
Prints JSON lines.
"""

import json
import os
import sys
import time

N_GENES = int(os.environ.get("KALLISTO_TPU_BENCH_GENES", 35000))
N_BOOT = int(os.environ.get("KALLISTO_TPU_BENCH_BOOT", 100))


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(here, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import numpy as np

    from kallisto_tpu.index import load_index
    from kallisto_tpu.quant.bootstrap import run_bootstraps
    from kallisto_tpu.quant.em import _run_em_batch_jax, build_em_problem

    idx_path = os.path.join(here, ".bench_cache", f"simtx_{N_GENES}.idx.npz")
    index = load_index(idx_path)
    T = index.num_trans
    # EC structure straight from the index's deduplicated EC rows (the
    # realistic sparsity pattern), deterministic synthetic counts
    ec_sets = [index.ec_row(r) for r in range(index.num_ec_rows)]
    rng = np.random.default_rng(42)
    counts = rng.integers(0, 2000, len(ec_sets)).astype(np.int64)
    eff_lens = np.clip(
        index.target_lens.astype(np.float64) - 179.0, 1.0, None
    )
    problem = build_em_problem(ec_sets, T)
    print(json.dumps({
        "metric": "em_problem",
        "n_targets": T,
        "n_ecs": len(ec_sets),
        "flat_entries": int(problem.flat_tx.shape[0]),
    }))

    singleton = np.zeros((N_BOOT, T), np.float64)
    if problem.singleton_tx.size:
        singleton[:, problem.singleton_tx] = counts[problem.singleton_ec]
    multi = np.tile(counts[problem.multi_ec_ids], (N_BOOT, 1)).astype(
        np.float64
    )
    inv_eff = 1.0 / eff_lens

    def run(dtype, device, n_iter=200):
        args = (
            singleton.astype(dtype), problem.flat_tx, problem.flat_ec,
            multi.astype(dtype), inv_eff.astype(dtype),
        )
        with jax.default_device(device):
            # warm (compile)
            a, _, n = _run_em_batch_jax(
                *args, num_trans=T,
                num_multi=int(problem.multi_ec_ids.shape[0]),
                n_iter=2, min_rounds=1,
            )
            np.asarray(a)
            t0 = time.time()
            a, _, n = _run_em_batch_jax(
                *args, num_trans=T,
                num_multi=int(problem.multi_ec_ids.shape[0]),
                n_iter=n_iter, min_rounds=n_iter - 1,
            )
            np.asarray(a)
            dt = time.time() - t0
        iters = int(np.asarray(n).max()) * N_BOOT
        return iters, dt

    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    it_c, dt_c = run(np.float64, cpu, n_iter=60)
    print(json.dumps({
        "metric": "em_iters_per_s_cpu_f64",
        "value": round(it_c / dt_c, 1),
        "unit": "replicate-iters/s",
        "batch": N_BOOT,
    }))
    if dev.platform != "cpu":
        it_d, dt_d = run(np.float32, dev, n_iter=200)
        print(json.dumps({
            "metric": "em_iters_per_s_device_f32",
            "value": round(it_d / dt_d, 1),
            "unit": "replicate-iters/s",
            "batch": N_BOOT,
        }))

    # full bootstrap wall time through the production entry point
    t0 = time.time()
    run_bootstraps(problem, counts, eff_lens, N_BOOT, seed=42)
    dt = time.time() - t0
    print(json.dumps({
        "metric": "bootstrap_wall_seconds_100k_targets",
        "value": round(dt, 1),
        "unit": "s",
        "n_bootstrap": N_BOOT,
    }))


if __name__ == "__main__":
    main()
