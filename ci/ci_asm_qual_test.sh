#!/bin/bash
# CI quality gate (reference ci/ci_asm_qual_test.sh analog).
#
# Generates the deterministic synthetic sample, runs the full pipeline over
# the production k progression (21..99 — high-k word paths W=6/8 are gated,
# not just low k), diffs assembly metrics against the golden file within 1%,
# then repeats the assembly on the sharded 8-device backend against the SAME
# golden (an all_to_all routing/layout bug fails the gate). Finally a
# sensitivity self-test proves the gate discriminates: the pre-high-k
# checkpoint (contigs-55) must FAIL the golden diff — i.e. a silent high-k
# regression cannot pass.
set -e
cd "$(dirname "$0")/.."

# force CPU: the gate validates numerics/metrics, not device perf, and this
# environment PRESETS JAX_PLATFORMS=axon (a remote TPU tunnel) — inheriting
# it silently runs the whole gate over the tunnel and wedges on contention.
# Override consciously with MHM2_CI_PLATFORM if a device run is intended.
export JAX_PLATFORMS=${MHM2_CI_PLATFORM:-cpu}

python ci/make_sample.py --out-dir ci/data
rm -rf ci/run ci/run_sharded
python -m mhm2_proxy_tpu -r ci/data/synth_sample.fastq -k 21 33 55 77 99 -o ci/run
python ci/check_asm_quality.py \
  --assembly ci/run/final_assembly.fasta \
  --genomes ci/data/synth_sample-genome*.fasta \
  --golden ci/good-synth-sample.txt \
  --threshold 0.01

echo "=== sharded backend (8-device CPU mesh), k=21,33 golden ==="
# shard-count independence means the sharded run must reproduce the
# single-shard metrics exactly; k=21,33 keeps the 8-device-on-2-core CPU
# emulation affordable while still gating the full exchange/LSM/stitch path
XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}" \
python -m mhm2_proxy_tpu -r ci/data/synth_sample.fastq -k 21 33 \
  --shards 8 -o ci/run_sharded
python ci/check_asm_quality.py \
  --assembly ci/run_sharded/final_assembly.fasta \
  --genomes ci/data/synth_sample-genome*.fasta \
  --golden ci/good-synth-sample-k2133.txt \
  --threshold 0.01

echo "=== gate sensitivity self-test: pre-high-k checkpoint must fail ==="
if python ci/check_asm_quality.py \
  --assembly ci/run/contigs-55.fasta \
  --genomes ci/data/synth_sample-genome*.fasta \
  --golden ci/good-synth-sample.txt \
  --threshold 0.01 >/dev/null 2>&1; then
  echo "ERROR: gate passed the k=55 checkpoint; it cannot detect high-k regressions" >&2
  exit 1
fi
echo "sensitivity self-test OK (k=55 checkpoint rejected)"
echo "CI QUALITY GATE PASSED"
