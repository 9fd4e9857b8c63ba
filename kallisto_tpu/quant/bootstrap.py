"""Bootstrap uncertainty estimation: multinomial resampling + batched EM.

reference: src/Bootstrap.{h,cpp} + src/Multinomial.hpp.  The reference
resamples n = sum(counts) draws from a discrete distribution weighted by the
EC counts (Multinomial::sample, Multinomial.hpp:33-51) -- i.e. a multinomial
-- then reruns the EM per replicate in a thread pool.  Here all replicates
run as ONE vmapped EM program (shared EC structure, batched alpha state).

Seeds come from std::mt19937_64(opt.seed) exactly as the reference draws
them (main.cpp:2746-2752); the multinomial sampler itself is numpy's
(std::discrete_distribution's stream is implementation-defined, so
draw-level parity is not possible even between libstdc++ versions).
"""

from typing import List

import jax
import numpy as np

from ..utils.mt19937 import MT19937_64
from .em import EmProblem, _run_em_batch_jax, em_accel_device


def bootstrap_seeds(seed: int, n: int) -> List[int]:
    g = MT19937_64(seed)
    return [g() for _ in range(n)]


def resample_counts(counts: np.ndarray, seed: int) -> np.ndarray:
    """One multinomial resample of the EC count vector."""
    n = int(counts.sum())
    rng = np.random.Generator(np.random.PCG64(seed))
    p = counts.astype(np.float64)
    return rng.multinomial(n, p / p.sum()).astype(np.float64)


def run_bootstraps(
    problem: EmProblem,
    counts: np.ndarray,
    eff_lens: np.ndarray,
    n_bootstrap: int,
    seed: int,
    n_iter: int = 10000,
    min_rounds: int = 50,
) -> np.ndarray:
    """Returns bootstrap alphas [n_bootstrap, T].

    Device/precision: CPU float64 for small problems (the parity leg);
    ONE vmapped float32 EM on the accelerator when the batched work is
    large (the TPU leg of the reference's BootstrapThreadPool,
    src/Bootstrap.cpp:15-92 -- resampling noise dominates f32 rounding).
    """
    T = problem.num_trans
    seeds = bootstrap_seeds(seed, n_bootstrap)
    resampled = np.stack([resample_counts(counts, s) for s in seeds])  # [B, E_all]

    singleton_b = np.zeros((n_bootstrap, T), np.float64)
    if problem.singleton_tx.size:
        singleton_b[:, problem.singleton_tx] = resampled[:, problem.singleton_ec]
    multi_b = resampled[:, problem.multi_ec_ids]
    inv_eff = 1.0 / eff_lens.astype(np.float64)

    accel = em_accel_device(n_bootstrap * int(problem.flat_tx.shape[0]))
    if accel is not None:
        with jax.default_device(accel):
            alpha, _, _ = _run_em_batch_jax(
                singleton_b.astype(np.float32),
                problem.flat_tx,
                problem.flat_ec,
                multi_b.astype(np.float32),
                inv_eff.astype(np.float32),
                num_trans=T,
                num_multi=int(problem.multi_ec_ids.shape[0]),
                n_iter=n_iter,
                min_rounds=min_rounds,
            )
        return np.asarray(alpha).astype(np.float64)

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        alpha, _, _ = _run_em_batch_jax(
            singleton_b,
            problem.flat_tx,
            problem.flat_ec,
            multi_b,
            inv_eff,
            num_trans=T,
            num_multi=int(problem.multi_ec_ids.shape[0]),
            n_iter=n_iter,
            min_rounds=min_rounds,
        )
    return np.asarray(alpha)
