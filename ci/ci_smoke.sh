#!/bin/bash
# Cheap CI smoke tier (<10 min on a 2-core box).
#
# Runs the k=21,33 slice single-shard against the same bit-stable golden the
# sharded rerun in ci_asm_qual_test.sh uses (shard-count independence means
# one golden serves both). The full gate (k=21..99 + 8-device sharded rerun +
# sensitivity self-test) stays in ci_asm_qual_test.sh for nightly use; this
# file is the fast pre-merge gate (reference splits the same way:
# ci_asm_qual_test.sh single-sample vs ci_asm_qual_test-full.sh 12-sample).
set -e
cd "$(dirname "$0")/.."

# force CPU (see ci_asm_qual_test.sh for why: JAX_PLATFORMS=axon is preset
# in this environment and would route the gate over a remote TPU tunnel)
export JAX_PLATFORMS=${MHM2_CI_PLATFORM:-cpu}

python ci/make_sample.py --out-dir ci/data
rm -rf ci/run_smoke
python -m mhm2_proxy_tpu -r ci/data/synth_sample.fastq -k 21 33 -o ci/run_smoke
python ci/check_asm_quality.py \
  --assembly ci/run_smoke/final_assembly.fasta \
  --genomes ci/data/synth_sample-genome*.fasta \
  --golden ci/good-synth-sample-k2133.txt \
  --threshold 0.01
echo "CI SMOKE GATE PASSED"
