#!/bin/bash
# Full CI gate: 12-genome >=1 Mbp synthetic coassembly (reference
# ci_asm_qual_test-full.sh arcticsynth analog), 2% threshold
# (ci_asm_qual_test-full.sh:52).
set -e
cd "$(dirname "$0")/.."

# force CPU (the environment presets JAX_PLATFORMS=axon — see ci_asm_qual_test.sh)
export JAX_PLATFORMS=${MHM2_CI_PLATFORM:-cpu}

python ci/make_sample.py --out-dir ci/data --coassembly
rm -rf ci/run_full
python -m mhm2_proxy_tpu -r ci/data/synth_coassembly.fastq -k 21 33 55 77 99 \
  -o ci/run_full
python ci/check_asm_quality.py \
  --assembly ci/run_full/final_assembly.fasta \
  --genomes ci/data/synth_coassembly-genome*.fasta \
  --golden ci/good-synth-coassembly.txt \
  --threshold 0.02
echo "FULL CI QUALITY GATE PASSED"
