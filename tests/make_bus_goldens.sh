#!/bin/bash
# Golden generation for the bus input-surface tests.  Requires a built
# reference kallisto binary (KALLISTO=... ./make_bus_goldens.sh).
# Outputs are committed under tests/golden/; regular test runs never
# invoke the reference.
set -euo pipefail
KALLISTO=${KALLISTO:-/tmp/refbuild/src/kallisto}
HERE=$(cd "$(dirname "$0")" && pwd)
DATA=$HERE/data
GOLD=$HERE/golden
IDX=${IDX:-/tmp/ref_k31.idx}

if [ ! -f "$IDX" ]; then
  "$KALLISTO" index -i "$IDX" "$DATA/transcripts.fasta.gz"
fi

keep() { # keep <outdir> <goldname> files...
  local out=$1 name=$2; shift 2
  mkdir -p "$GOLD/$name"
  for f in "$@"; do cp "$out/$f" "$GOLD/$name/$f"; done
}

T=$(mktemp -d)
trap 'rm -rf "$T"' EXIT

# 1. SMARTSEQ3 (default tag)
"$KALLISTO" bus -i "$IDX" -o "$T/ss3" -x SMARTSEQ3 \
  "$DATA/ss3_I1.fastq.gz" "$DATA/ss3_I2.fastq.gz" \
  "$DATA/ss3_R1.fastq.gz" "$DATA/ss3_R2.fastq.gz"
keep "$T/ss3" bus_smartseq3 output.bus matrix.ec transcripts.txt run_info.json flens.txt

# 2. bulk batch mode (-B, paired)
cat > "$T/batch_bulk.txt" <<EOF
sampleA $DATA/bulkb0_1.fastq.gz $DATA/bulkb0_2.fastq.gz
sampleB $DATA/bulkb1_1.fastq.gz $DATA/bulkb1_2.fastq.gz
EOF
"$KALLISTO" bus -i "$IDX" -o "$T/bb" -B "$T/batch_bulk.txt"
keep "$T/bb" bus_batch_bulk output.bus matrix.ec matrix.cells matrix.sample.barcodes run_info.json flens.txt

# 3. 10xv2 batch mode with technology
cat > "$T/batch_10x.txt" <<EOF
cellA $DATA/sc_b0_1.fastq.gz $DATA/sc_b0_2.fastq.gz
cellB $DATA/sc_b1_1.fastq.gz $DATA/sc_b1_2.fastq.gz
EOF
"$KALLISTO" bus -i "$IDX" -o "$T/b10" -x 10xv2 -B "$T/batch_10x.txt"
keep "$T/b10" bus_batch_10x output.bus matrix.ec matrix.cells run_info.json

# 4. 10xv2 batch mode + --batch-barcodes
"$KALLISTO" bus -i "$IDX" -o "$T/b10b" -x 10xv2 -B "$T/batch_10x.txt" --batch-barcodes
keep "$T/b10b" bus_batch_10x_bb output.bus matrix.ec matrix.cells matrix.sample.barcodes run_info.json

# 5. interleaved 10xv2
"$KALLISTO" bus -i "$IDX" -o "$T/il" -x 10xv2 --inleaved "$DATA/interleaved_10x.fastq.gz"
keep "$T/il" bus_inleaved output.bus matrix.ec run_info.json

# 6. RX:Z custom technology
"$KALLISTO" bus -i "$IDX" -o "$T/rx" -x 0,0,16:RX:1,0,0 \
  "$DATA/rx_R1.fastq.gz" "$DATA/rx_R2.fastq.gz"
keep "$T/rx" bus_rx output.bus matrix.ec run_info.json

# 7. BAM conversion oracle (reference runs the converted FASTQs)
"$KALLISTO" bus -i "$IDX" -o "$T/bam" -x 10xv2 \
  "$DATA/bamconv_R1.fastq.gz" "$DATA/bamconv_R2.fastq.gz"
keep "$T/bam" bus_bam output.bus matrix.ec run_info.json

# 8. long-read bulk bus
"$KALLISTO" bus -i "$IDX" -o "$T/lr" -x bulk --long "$DATA/reads_lr.fastq.gz"
keep "$T/lr" bus_long output.bus matrix.ec run_info.json flens.txt

# 9. custom tag on SMARTSEQ3
"$KALLISTO" bus -i "$IDX" -o "$T/tag" -x SMARTSEQ3 -T ATTGCGCAATG -n \
  "$DATA/ss3_I1.fastq.gz" "$DATA/ss3_I2.fastq.gz" \
  "$DATA/ss3_R1.fastq.gz" "$DATA/ss3_R2.fastq.gz"
keep "$T/tag" bus_smartseq3_num output.bus

echo "goldens written to $GOLD"
