"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Correctness tests run on the CPU backend (deterministic, no TPU needed);
sharding tests use the 8 virtual host devices.  Set KALLISTO_TPU_TEST_TPU=1
to run on real TPU hardware instead.
"""

import os

if not os.environ.get("KALLISTO_TPU_TEST_TPU"):
    # force CPU: the environment may pre-register a TPU backend at
    # interpreter start (sitecustomize) and override JAX_PLATFORMS, but
    # correctness tests need the deterministic CPU backend and the
    # sharding tests need 8 virtual devices
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), "data")
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def data_dir():
    return DATA


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN


@pytest.fixture(scope="session")
def test_index():
    from kallisto_tpu.index import build_index

    return build_index([os.path.join(DATA, "transcripts.fasta.gz")], k=31)


def read_abundance(path):
    names, lens, eff, est, tpm = [], [], [], [], []
    with open(path) as f:
        next(f)
        for line in f:
            p = line.rstrip("\n").split("\t")
            names.append(p[0])
            lens.append(int(p[1]))
            eff.append(float(p[2]))
            est.append(float(p[3]))
            tpm.append(float(p[4]))
    return names, np.array(lens), np.array(eff), np.array(est), np.array(tpm)
