#!/bin/bash
# Golden generation for the D-list overhang / multi-file / --aa tests.
# Requires a built reference kallisto (KALLISTO=... ./make_dlist_goldens.sh).
# Outputs committed under tests/golden/; regular test runs never invoke
# the reference.
set -euo pipefail
KALLISTO=${KALLISTO:-/tmp/refbuild/src/kallisto}
HERE=$(cd "$(dirname "$0")" && pwd)
DATA=$HERE/data
GOLD=$HERE/golden
T=$(mktemp -d); trap 'rm -rf "$T"' EXIT
READS="$DATA/reads_1.fastq.gz $DATA/reads_2.fastq.gz $DATA/contam_1.fastq.gz $DATA/contam_2.fastq.gz"

# overhang 3
"$KALLISTO" index -i "$T/d3.idx" -d "$DATA/dlist.fasta" --d-list-overhang 3 "$DATA/transcripts.fasta.gz"
"$KALLISTO" quant -i "$T/d3.idx" -o "$T/out_d3" --plaintext $READS
mkdir -p "$GOLD/quant_dlist_D3"; cp "$T/out_d3/abundance.tsv" "$GOLD/quant_dlist_D3/"

# comma-separated multi-file -d (dlist.fasta split record-per-file)
"$KALLISTO" index -i "$T/dm.idx" -d "$DATA/dlist_part1.fasta,$DATA/dlist_part2.fasta" "$DATA/transcripts.fasta.gz"
"$KALLISTO" quant -i "$T/dm.idx" -o "$T/out_dm" --plaintext $READS
mkdir -p "$GOLD/quant_dlist_multi"; cp "$T/out_dm/abundance.tsv" "$GOLD/quant_dlist_multi/"

# --aa D-list (6-frame CFC translation, overhang coerced to 3)
"$KALLISTO" index --aa -k 7 -i "$T/aa_dl.idx" -d "$DATA/dlist_nn.fasta" "$DATA/aa_ref.fasta"
cat "$DATA/virus_nn_frame0.fastq.gz" "$DATA/contam_nn.fastq.gz" > "$T/mix_nn.fastq.gz"
"$KALLISTO" bus --aa -i "$T/aa_dl.idx" -o "$T/aabus" -x bulk "$T/mix_nn.fastq.gz"
mkdir -p "$GOLD/bus_aa_dlist"; cp "$T/aabus/output.bus" "$T/aabus/matrix.ec" "$GOLD/bus_aa_dlist/"
