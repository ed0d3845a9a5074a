#!/bin/bash
# CI quality gate (reference ci/ci_asm_qual_test.sh analog).
# Generates the deterministic synthetic sample, runs the full pipeline, and
# diffs assembly metrics against the golden file within 1%.
set -e
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}

python ci/make_sample.py --out-dir ci/data
rm -rf ci/run
python -m mhm2_proxy_tpu -r ci/data/synth_sample.fastq -k 21 33 55 -o ci/run
python ci/check_asm_quality.py \
  --assembly ci/run/final_assembly.fasta \
  --genomes ci/data/genome*.fasta \
  --golden ci/good-synth-sample.txt \
  --threshold 0.01
