"""2-process multi-host quant driver (launched by test_multihost.py).

usage: multihost_driver.py <pid> <nproc> <coordinator> <outdir> <files...>
Each process connects to the jax.distributed coordinator, runs the
multi-host quant path over its file shard, and rank 0 writes the outputs.
"""

import os
import sys

pid, nproc, coord, out = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
)
files = sys.argv[5:]
est_fld = files and files[0] == "--est-fld"
if est_fld:
    files = files[1:]

os.environ["KALLISTO_TPU_NO_MALLOC_TUNE"] = "1"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coord, num_processes=nproc, process_id=pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kallisto_tpu.common import Options  # noqa: E402
from kallisto_tpu.index import build_index  # noqa: E402
from kallisto_tpu.quant.pipeline import run_quant  # noqa: E402

index = build_index(
    [os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                  "transcripts.fasta.gz")],
    k=31,
)
opt = Options(
    files=files,
    output_dir=out,
    fld_mean=0.0 if est_fld else 180.0,
    fld_sd=0.0 if est_fld else 20.0,
    plaintext=True,
    write_index=True,
)
res = run_quant(opt, index=index)
print(f"[host {pid}] processed={res.num_processed} "
      f"mapped={res.num_pseudoaligned}", flush=True)
