#!/bin/bash
# Nightly TPU-platform CI tier (VERDICT r4 weak #7).
#
# The standing gates run CPU-only by policy (ci_asm_qual_test.sh header), but
# two real XLA:TPU miscompiles were found in this project (the fused
# pack+revcomp chain collapsing distinct k-mers; Mosaic arith.maxui in the
# join kernel) — whole-graph TPU coverage must be routine, not a campaign.
# This tier runs the k=21,33 smoke slice ON THE TPU (whole-graph: extraction,
# raw-LSM, Pallas merges, fused finalize, merge-join edges, stitch) and gates
# the SAME bit-stable golden as the CPU smoke tier: any platform-dependent
# numeric divergence fails.
#
# Guarded by the compile-service probe (bench.py::compile_service_ok): the
# remote TPU terminal can enter a state where cached executables run but
# fresh compiles hang forever; a hung gate is worse than a skipped one, so
# probe first and exit 75 (EX_TEMPFAIL) if compiles are wedged.
set -e
cd "$(dirname "$0")/.."

if ! python -c "
import sys
sys.path.insert(0, '.')
from bench import compile_service_ok
sys.exit(0 if compile_service_ok() else 1)
"; then
  echo "TPU compile service unavailable; skipping TPU smoke tier" >&2
  exit 75
fi

JAX_PLATFORMS=cpu python ci/make_sample.py --out-dir ci/data
rm -rf ci/run_tpu_smoke
# INHERIT the default platform env (this environment presets the TPU
# tunnel); block auto-sizing then picks the TPU config. The CPU-only tiers
# override JAX_PLATFORMS=cpu — this tier's whole point is not to.
timeout 1800 python -m mhm2_proxy_tpu \
  -r ci/data/synth_sample.fastq -k 21 33 -o ci/run_tpu_smoke
python ci/check_asm_quality.py \
  --assembly ci/run_tpu_smoke/final_assembly.fasta \
  --genomes ci/data/synth_sample-genome*.fasta \
  --golden ci/good-synth-sample-k2133.txt \
  --threshold 0.01
echo "TPU SMOKE GATE PASSED"
