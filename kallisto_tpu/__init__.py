"""kallisto-tpu: a TPU-native pseudoalignment + RNA-seq quantification framework.

A ground-up reimplementation of the capabilities of kallisto
(pachterlab/kallisto, reference v0.51.1) designed for TPU hardware:

- the transcriptome de Bruijn graph index is compiled into dense, HBM-resident
  sorted k-mer tables probed by vectorized JAX/Pallas kernels
  (instead of Bifrost's minimizer-hash unitig index),
- pseudoalignment (read -> equivalence class) runs as batched, branchless
  device code over padded read matrices,
- the EM quantifier and multinomial bootstrap are dense batched jnp programs,
- multi-chip/multi-host scaling is data parallelism over a `reads` mesh axis
  with EC-count histograms merged via psum.

Numerical parity anchor: the quantification path reproduces reference
kallisto's est_counts/TPM on its bundled test data (see tests/golden).
"""

import os as _os

import jax

# The index k-mer tables are 2-bit packed uint64 and the EM accumulates in
# float64 for parity with the reference (C++ doubles).  Both require x64 mode;
# hot compute paths explicitly opt into narrower dtypes.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the unrolled k-mer kernels take tens of
# seconds to compile per (batch, length) shape; cache across processes.
_cache_dir = _os.environ.get(
    "KALLISTO_TPU_JAX_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "kallisto_tpu_jax"),
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - older jax without the option
    pass

__version__ = "0.1.0"

# Version of the reference implementation whose behavior we reproduce
# (reference: src/common.h:4 KALLISTO_VERSION "0.51.1").
KALLISTO_COMPAT_VERSION = "0.51.1"
