"""Multi-host data parallelism: a REAL 2-process jax.distributed run must
reproduce the single-process result bit-for-bit (per-host file shards +
rank-order EC merge; parallel/multihost.py)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_quant_parity(data_dir, tmp_path, test_index):
    files = [
        os.path.join(data_dir, "bulkb0_1.fastq.gz"),
        os.path.join(data_dir, "bulkb0_2.fastq.gz"),
        os.path.join(data_dir, "bulkb1_1.fastq.gz"),
        os.path.join(data_dir, "bulkb1_2.fastq.gz"),
    ]
    # single-process reference run (2 pairs, -l/-s FLD so the result is
    # independent of the per-host fragment-length subsample)
    from kallisto_tpu.common import Options
    from kallisto_tpu.quant.pipeline import run_quant

    ref_out = str(tmp_path / "single")
    run_quant(
        Options(files=files, output_dir=ref_out, fld_mean=180.0,
                fld_sd=20.0, plaintext=True, write_index=True),
        index=test_index,
    )

    # 2-process run: fresh interpreters, jax.distributed over localhost
    mh_out = str(tmp_path / "multi")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # driver sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_driver.py"),
             str(pid), "2", coord, mh_out] + files,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    # after the merge every host reports the GLOBAL totals
    # (bulkb0 = 1500 pairs + bulkb1 = 2000 pairs)
    assert "processed=3500" in outs[0]
    assert "processed=3500" in outs[1]
    for fname in ("abundance.tsv", "counts.txt", "run_info.json"):
        a = open(os.path.join(ref_out, fname)).read()
        b = open(os.path.join(mh_out, fname)).read()
        if fname == "run_info.json":
            import json

            ja, jb = json.loads(a), json.loads(b)
            for k in ("n_targets", "n_processed", "n_pseudoaligned",
                      "n_unique"):
                assert ja[k] == jb[k], k
        else:
            assert a == b, fname


def test_two_process_estimated_fld_parity(data_dir, tmp_path, test_index):
    """ESTIMATED-FLD multi-host run == single-process run bit-for-bit:
    the global first-10k fragment-length subsample is merged in rank
    order (= global read order), removing the per-host divergence (and
    beating the reference's thread-timing-dependent 'first 10k',
    SURVEY section 4)."""
    files = [
        os.path.join(data_dir, "bulkb0_1.fastq.gz"),
        os.path.join(data_dir, "bulkb0_2.fastq.gz"),
        os.path.join(data_dir, "bulkb1_1.fastq.gz"),
        os.path.join(data_dir, "bulkb1_2.fastq.gz"),
    ]
    from kallisto_tpu.common import Options
    from kallisto_tpu.quant.pipeline import run_quant

    # goal 2000 places the global subsample cut INSIDE host 1's shard
    # (host 0 holds 1500 pairs): a per-host or summed merge would differ
    os.environ["KALLISTO_TPU_FLEN_GOAL"] = "2000"
    try:
        ref_out = str(tmp_path / "single")
        ref = run_quant(
            Options(files=files, output_dir=ref_out, plaintext=True,
                    write_index=True),
            index=test_index,
        )
    finally:
        del os.environ["KALLISTO_TPU_FLEN_GOAL"]
    assert 0 < ref.flens.sum() <= 2000  # the estimate path actually sampled

    mh_out = str(tmp_path / "multi")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["KALLISTO_TPU_FLEN_GOAL"] = "2000"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_driver.py"),
             str(pid), "2", coord, mh_out, "--est-fld"] + files,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    for fname in ("abundance.tsv", "counts.txt"):
        a = open(os.path.join(ref_out, fname)).read()
        b = open(os.path.join(mh_out, fname)).read()
        assert a == b, fname
