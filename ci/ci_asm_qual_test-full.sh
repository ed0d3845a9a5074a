#!/bin/bash
# Full (nightly) CI gate: 12-genome >=2 Mbp synthetic coassembly with
# log-skewed coverage (~4x..26x) and SHARED repeats spliced across genomes
# (reference ci_asm_qual_test-full.sh arcticsynth analog), 2% threshold
# (ci_asm_qual_test-full.sh:52). The smoke-tier 75 kb community stays in
# ci_asm_qual_test.sh; this tier stresses inter-genome repeat collapse,
# depth-skewed purge behavior, and low-abundance high-k survival.
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

echo "=== gate sensitivity self-test: pre-high-k checkpoint must fail ==="
if python ci/check_asm_quality.py \
  --assembly ci/run_full/contigs-55.fasta \
  --genomes ci/data/synth_coassembly-genome*.fasta \
  --golden ci/good-synth-coassembly.txt \
  --threshold 0.02 >/dev/null 2>&1; then
  echo "ERROR: gate passed the k=55 checkpoint; it cannot detect high-k regressions" >&2
  exit 1
fi
echo "sensitivity self-test OK (k=55 checkpoint rejected)"
echo "FULL CI QUALITY GATE PASSED"
