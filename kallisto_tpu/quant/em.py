"""The EM abundance quantifier as a dense batched JAX program.

Replaces the reference's per-EC hash-map loop (EMAlgorithm::run,
src/EMAlgorithm.h:95-375) with segment reductions over a flattened
EC -> transcript CSR:

  per iteration:
    s_ec        = segment_sum(alpha[tx] / eff_len[tx])          (denominator)
    next_alpha  = singleton_counts
                + scatter_add(count_ec * alpha[tx] / (eff_len[tx] * s_ec))

The reference's weights w[ec][i] = count_ec / eff_len_t (src/weights.cpp:
220-246) make its update next += w*alpha*count/denom with denom =
sum(alpha*w) = count * s; the count factor cancels exactly as above, with
the same skip conditions (count == 0; denom < denorm_min).

Convergence matches EMAlgorithm.h:171-222: stop when no transcript with
next_alpha > 1e-2 changes by more than 1% relative, after min_rounds; then
zero out alpha < 1e-8 and run one final iteration.

Device placement: the MAIN EM runs on CPU in float64 -- that is the
byte-parity path (f64 matches the reference's doubles, and a fixed
reduction order keeps abundance.tsv byte-identical).  The BOOTSTRAP EM
(quant/bootstrap.py) and the per-cell quant-tcc EM move to the
accelerator in float32 when the batched problem is big enough to beat
the transfer+dispatch cost (resampling noise dominates f32 rounding
there); KALLISTO_TPU_EM_DEVICE=cpu|tpu|auto overrides.
"""

import os
from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import (
    EM_ALPHA_CHANGE,
    EM_ALPHA_CHANGE_LIMIT,
    EM_ALPHA_LIMIT,
    EM_TOLERANCE,
)


# batched-EM work threshold (flat CSR entries x replicates) above which
# the accelerator beats CPU including transfers; measured on the axon
# v5e tunnel where per-dispatch latency is ~25 ms
_EM_ACCEL_WORK = 2_000_000


def em_accel_device(work: int):
    """Device for a batched (bootstrap / per-cell) EM of `work` flat
    entries, or None to stay on CPU float64.

    auto: use the accelerator when one exists and the problem is large;
    KALLISTO_TPU_EM_DEVICE=cpu|tpu forces either leg."""
    mode = os.environ.get("KALLISTO_TPU_EM_DEVICE", "auto")
    if mode == "cpu":
        return None
    try:
        dev = jax.devices()[0]
    except Exception:
        return None
    if mode == "tpu":
        # forced accelerator leg (on the CPU backend this still exercises
        # the float32 + mesh-sharded code path -- used by tests)
        return dev
    if dev.platform == "cpu":
        return None
    return dev if work >= _EM_ACCEL_WORK else None


class EmProblem(NamedTuple):
    """Flattened EC->transcript structure for the EM update."""

    num_trans: int            # static
    singleton_tx: np.ndarray  # [S] transcript of each singleton EC
    singleton_ec: np.ndarray  # [S] ec id of each singleton EC
    flat_tx: np.ndarray       # [M] transcript ids of multi-tx ECs
    flat_ec: np.ndarray       # [M] position of the owning EC in the multi list
    multi_ec_ids: np.ndarray  # [E] original ec ids of multi-tx ECs


def build_em_problem(ec_sets: List[np.ndarray], num_trans: int) -> EmProblem:
    singleton_tx, singleton_ec = [], []
    flat_tx, flat_ec, multi_ec_ids = [], [], []
    for ec, s in enumerate(ec_sets):
        if s.shape[0] == 1:
            singleton_tx.append(int(s[0]))
            singleton_ec.append(ec)
        elif s.shape[0] > 1:
            flat_tx.append(s)
            flat_ec.append(np.full(s.shape[0], len(multi_ec_ids), np.int32))
            multi_ec_ids.append(ec)
    return EmProblem(
        num_trans=num_trans,
        singleton_tx=np.array(singleton_tx, np.int32),
        singleton_ec=np.array(singleton_ec, np.int64),
        flat_tx=(
            np.concatenate(flat_tx).astype(np.int32)
            if flat_tx else np.empty(0, np.int32)
        ),
        flat_ec=(
            np.concatenate(flat_ec).astype(np.int32)
            if flat_ec else np.empty(0, np.int32)
        ),
        multi_ec_ids=np.array(multi_ec_ids, np.int64),
    )


def _em_iteration(alpha, singleton_alpha, flat_tx, flat_ec, multi_counts, inv_eff, num_multi):
    """One reference-exact EM update (shared by quant and bootstrap)."""
    a_over_l = alpha[flat_tx] * inv_eff[flat_tx]
    s_ec = jax.ops.segment_sum(a_over_l, flat_ec, num_segments=num_multi)
    denom = multi_counts * s_ec
    valid = (multi_counts > 0) & (denom >= EM_TOLERANCE)
    scale = jnp.where(valid, multi_counts / jnp.where(s_ec > 0, s_ec, 1.0), 0.0)
    contrib = a_over_l * scale[flat_ec]
    return singleton_alpha + jax.ops.segment_sum(
        contrib, flat_tx, num_segments=alpha.shape[0]
    )


def _em_loop(
    singleton_alpha,   # [T] f64: counts of singleton ECs scattered to their tx
    flat_tx,           # [M] int32
    flat_ec,           # [M] int32
    multi_counts,      # [E] f64
    inv_eff,           # [T] f64 (1 / eff_len)
    num_trans: int,
    num_multi: int,
    n_iter: int,
    min_rounds: int,
    state=None,
    alpha_init=None,   # [T] f64 priors (EMAlgorithm::set_priors) or None
):
    """Run the EM while-loop from `state` (or a fresh start) until
    convergence or the global iteration counter reaches n_iter.  The state
    carries the global iteration number so callers can interleave host-side
    effective-length recomputation (bias) between segments while keeping
    the reference's exact convergence/final-round bookkeeping."""
    if alpha_init is None:
        alpha0 = jnp.full(num_trans, 1.0 / num_trans, singleton_alpha.dtype)
    else:
        alpha0 = alpha_init

    def body(state):
        alpha, i, final_round, done, before = state
        next_alpha = _em_iteration(
            alpha, singleton_alpha, flat_tx, flat_ec, multi_counts, inv_eff, num_multi
        )
        changed = (next_alpha > EM_ALPHA_CHANGE_LIMIT) & (
            jnp.abs(next_alpha - alpha) / jnp.where(next_alpha > 0, next_alpha, 1.0)
            > EM_ALPHA_CHANGE
        )
        chcount = jnp.sum(changed)
        stop_em = (chcount == 0) & (i > min_rounds)
        done_now = final_round          # the previous iteration started the
        #                                 final round; this update was it
        start_final = stop_em & ~final_round
        alpha_out = jnp.where(
            start_final & (next_alpha < EM_ALPHA_LIMIT / 10.0), 0.0, next_alpha
        )
        before = jnp.where(start_final, next_alpha, before)
        return (alpha_out, i + 1, final_round | start_final, done_now, before)

    def cond(state):
        _, i, _, done, _ = state
        return (~done) & (i < n_iter)

    init = (
        (alpha0, jnp.int64(0), jnp.bool_(False), jnp.bool_(False), alpha0)
        if state is None
        else state
    )
    return jax.lax.while_loop(cond, body, init)


def _finish_em_state(state):
    alpha, i, final_round, done, before_zeroes = state
    # if we ran out of iterations without converging, alpha_before_zeroes
    # is simply the final alpha (reference: EMAlgorithm.h:359-365)
    before_zeroes = jnp.where(done, before_zeroes, alpha)
    # the reference reports the 0-based index at break (EMAlgorithm.h:369)
    n_rounds = jnp.where(done, i - 1, i)
    return alpha, before_zeroes, n_rounds


def _em_full(singleton_alpha, flat_tx, flat_ec, multi_counts, inv_eff,
             num_trans, num_multi, n_iter, min_rounds, alpha_init=None):
    return _finish_em_state(_em_loop(
        singleton_alpha, flat_tx, flat_ec, multi_counts, inv_eff,
        num_trans, num_multi, n_iter, min_rounds, alpha_init=alpha_init,
    ))


_run_em_jax = partial(jax.jit, static_argnames=(
    "num_trans", "num_multi", "n_iter", "min_rounds"))(_em_full)

_run_em_segment_jax = partial(jax.jit, static_argnames=(
    "num_trans", "num_multi", "n_iter", "min_rounds"))(_em_loop)


def read_priors(path: str, num_trans: int) -> Optional[np.ndarray]:
    """Parse a priors file (one float per line, same order as targets).

    If the values sum to more than 1 (+eps) they are raw counts: add a
    pseudocount of 1 to every entry and normalize, so no prior is exactly
    zero (reference: EMAlgorithm::read_priors, src/EMAlgorithm.h:52-81).
    A length mismatch warns and falls back to uniform priors
    (EMAlgorithm::set_priors, src/EMAlgorithm.h:83-93).
    """
    import sys

    print(f"[   em] reading priors from file {path}", file=sys.stderr)
    with open(path) as f:
        priors = np.array(
            [float(line) for line in f if line.strip() != ""], np.float64
        )
    s = priors.sum()
    if s >= 1.0 + 1e-3:
        priors = (priors + 1.0) / (s + priors.shape[0])
    if priors.shape[0] != num_trans:
        print("[   em] number of priors does not match number of "
              "transcripts.", file=sys.stderr)
        print("        defaulting to uniform priors.", file=sys.stderr)
        return None
    return priors


@partial(
    jax.jit,
    static_argnames=("num_trans", "num_multi", "n_iter", "min_rounds", "batched_eff"),
)
def _run_em_batch_jax(
    singleton_alpha_b,  # [Bb, T]
    flat_tx,
    flat_ec,
    multi_counts_b,     # [Bb, E]
    inv_eff,            # [T] shared or [Bb, T] per replicate (batched_eff)
    num_trans: int,
    num_multi: int,
    n_iter: int,
    min_rounds: int,
    batched_eff: bool = False,
    alpha_init=None,    # [T] shared priors or None
):
    """vmapped EM over replicates/cells (shared EC structure)."""
    return jax.vmap(
        lambda sa, mc, ie: _em_full(
            sa, flat_tx, flat_ec, mc, ie,
            num_trans, num_multi, n_iter, min_rounds,
            alpha_init=alpha_init,
        ),
        in_axes=(0, 0, 0 if batched_eff else None),
    )(singleton_alpha_b, multi_counts_b, inv_eff)


class EmResult(NamedTuple):
    alpha: np.ndarray
    alpha_before_zeroes: np.ndarray
    n_rounds: int
    eff_lens: Optional[np.ndarray] = None  # bias-corrected (when bias ran)
    post_bias: Optional[np.ndarray] = None  # [4096] expected hexamer dist


def run_em(
    problem: EmProblem,
    counts: np.ndarray,
    eff_lens: np.ndarray,
    n_iter: int = 10000,
    min_rounds: int = 50,
    bias_update=None,
    singletons_after: bool = False,
    priors: Optional[np.ndarray] = None,
) -> EmResult:
    """Run the EM to convergence (host/CPU device, float64).

    bias_update: optional callable(alpha, eff_lens) -> (eff_lens, post_bias)
    invoked at global iterations min_rounds and min_rounds+500, exactly as
    the reference's update_eff_lens hook (EMAlgorithm.h:113-116).  Weights
    need no separate recomputation: the reference's w = count/eff_len makes
    the count factor cancel, so only 1/eff_len enters the update.

    singletons_after: the long-read (PacBio) EM variant keeps singleton-EC
    counts out of the iterations and adds them to alpha once after the
    loop (reference: EMAlgorithm.h:224-357).
    """
    T = problem.num_trans
    singleton_alpha = np.zeros(T, np.float64)
    if problem.singleton_tx.size:
        # next_alpha[t] = counts[singleton ec of t] (assignment; each t has
        # at most one singleton EC) -- reference: EMAlgorithm.h:119-123
        singleton_alpha[problem.singleton_tx] = counts[problem.singleton_ec]
    post_singletons = None
    if singletons_after:
        post_singletons = singleton_alpha
        singleton_alpha = np.zeros(T, np.float64)
    multi_counts = counts[problem.multi_ec_ids].astype(np.float64)
    inv_eff = 1.0 / eff_lens.astype(np.float64)

    num_multi = int(problem.multi_ec_ids.shape[0])
    args = (
        jnp.asarray(singleton_alpha),
        jnp.asarray(problem.flat_tx),
        jnp.asarray(problem.flat_ec),
        jnp.asarray(multi_counts),
    )
    cpu = jax.local_devices(backend="cpu")[0]
    post_bias = None
    alpha_init = None if priors is None else jnp.asarray(priors, jnp.float64)
    with jax.default_device(cpu):
        if bias_update is None:
            alpha, before, i = _run_em_jax(
                *args, jnp.asarray(inv_eff),
                num_trans=T, num_multi=num_multi,
                n_iter=n_iter, min_rounds=min_rounds,
                alpha_init=alpha_init,
            )
        else:
            state = None
            cur_eff = eff_lens.astype(np.float64)
            for bound in (min_rounds, min_rounds + 500, n_iter):
                if state is not None:
                    if bool(state[3]):  # done: converged in prior segment
                        break
                    # reference recomputes at the top of iterations 50/550
                    # whenever the loop reaches them (EMAlgorithm.h:113-116)
                    cur_eff, post_bias = bias_update(
                        np.asarray(state[0]), cur_eff
                    )
                state = _run_em_segment_jax(
                    *args, jnp.asarray(1.0 / cur_eff),
                    num_trans=T, num_multi=num_multi,
                    n_iter=bound, min_rounds=min_rounds,
                    state=state, alpha_init=alpha_init,
                )
            alpha, before, i = _finish_em_state(state)
            eff_lens = cur_eff
    alpha = np.asarray(alpha)
    if post_singletons is not None:
        alpha = alpha + post_singletons
    return EmResult(
        alpha=np.asarray(alpha),
        alpha_before_zeroes=np.asarray(before),
        n_rounds=int(i),
        eff_lens=np.asarray(eff_lens, np.float64),
        post_bias=post_bias,
    )


def counts_to_tpm(est_counts: np.ndarray, eff_lens: np.ndarray) -> np.ndarray:
    """reference: counts_to_tpm (src/PlaintextWriter.cpp:5-27)."""
    tpm = est_counts / eff_lens
    return tpm / tpm.sum() * 1e6
