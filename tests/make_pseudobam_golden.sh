#!/bin/bash
# Golden generation for tests/test_pseudobam_golden.py.
#
# The shipped reference 0.51.1 pseudobam replay crashes (see the test
# docstring); building the oracle requires a reference compiled with
# USE_BAM=ON plus two minimal guards, each returning findPosition's own
# cannot-position sentinel {-1, true} instead of crashing:
#   1. src/KmerIndex.cpp:2193 -- null/isEmpty check before
#      um.getData()->id (upstream derefs null for empty UnitigMaps)
#   2. before `rawpos = v_ec.get(tr, true).minimum()` in findPosition --
#      `if (!ec.contains(tr)) return {-1, true};` (upstream throws
#      std::invalid_argument from SparseVector::get and aborts)
# htslib needs autotools normally; on hosts without them, pre-create
# ext/htslib/config.h (defines HAVE_LIBLZMA only) and set the htslib
# ExternalProject CONFIGURE_COMMAND to `true`.
set -euo pipefail
KALLISTO=${KALLISTO:?path to patched USE_BAM reference kallisto}
HERE=$(cd "$(dirname "$0")" && pwd)
T=$(mktemp -d); trap 'rm -rf "$T"' EXIT
"$KALLISTO" index -i "$T/r.idx" "$HERE/data/transcripts.fasta.gz"
"$KALLISTO" quant -i "$T/r.idx" -o "$T/pb" --plaintext --pseudobam \
  "$HERE/data/clean_pb_1.fastq.gz" "$HERE/data/clean_pb_2.fastq.gz"
mkdir -p "$HERE/golden/pseudobam_clean"
cp "$T/pb/pseudoalignments.bam" "$HERE/golden/pseudobam_clean/"
