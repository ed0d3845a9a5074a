#!/bin/bash
# Post-assembly alignment/abundance CI tier (VERDICT r4 missing #5).
#
# The reference documents --post-asm-align / abundance as a user-facing mode
# (docs/mhm_guide.md:211-233: SAM of all reads vs final assembly + a
# jgi_summarize-style depths table for binning). This tier runs the k=21,33
# smoke slice WITH both flags and gates the artifacts: structural SAM/CIGAR/
# NM validation plus a metric golden (ci/good-synth-postasm.txt).
set -e
cd "$(dirname "$0")/.."

# force CPU (the environment presets JAX_PLATFORMS=axon — see ci_asm_qual_test.sh)
export JAX_PLATFORMS=${MHM2_CI_PLATFORM:-cpu}

python ci/make_sample.py --out-dir ci/data
rm -rf ci/run_postasm
python -m mhm2_proxy_tpu -r ci/data/synth_sample.fastq -k 21 33 \
  --post-asm-align --post-asm-abundance -o ci/run_postasm
python ci/check_post_asm.py \
  --sam ci/run_postasm/final_assembly.sam \
  --depths ci/run_postasm/final_assembly_depths.tsv \
  --assembly ci/run_postasm/final_assembly.fasta \
  --golden ci/good-synth-postasm.txt \
  --threshold 0.02

echo "=== --post-asm-only restart surface (docs/mhm_guide.md:226-233) ==="
rm -f ci/run_postasm/final_assembly.sam ci/run_postasm/final_assembly_depths.tsv
python -m mhm2_proxy_tpu -r ci/data/synth_sample.fastq --post-asm-only \
  --post-asm-align --post-asm-abundance -o ci/run_postasm
# separate golden: -only reloads just the dumped >=500bp contigs, so the
# abundance table legitimately covers 5 rows instead of the in-memory 85
python ci/check_post_asm.py \
  --sam ci/run_postasm/final_assembly.sam \
  --depths ci/run_postasm/final_assembly_depths.tsv \
  --assembly ci/run_postasm/final_assembly.fasta \
  --golden ci/good-synth-postasm-only.txt \
  --threshold 0.02
echo "POST-ASM CI GATE PASSED"
