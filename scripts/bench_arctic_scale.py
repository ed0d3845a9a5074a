#!/usr/bin/env python3
"""Arctic-scale end-to-end wall-time benchmark (BASELINE.md row).

The reference's CI assembles arctic_sample_0 (ArcticSynth synthetic ocean
metagenome, 27.7 Mbp assembled, ci/good-arctic-sample0.txt) — the dataset is
behind a NERSC portal (no egress here), so this synthesizes a community of
comparable assembled size (default 12 genomes totalling ~27 Mbp), simulates
reads, and runs the full pipeline (k=21,33,55,77,99 like the reference
default) on the default platform, reporting per-stage wall times.

Usage: python scripts/bench_arctic_scale.py [--mbp 27] [--coverage 8]
       [--shards N] [--out DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=27.0, help="total genome Mbp")
    ap.add_argument("--coverage", type=float, default=8.0)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--genomes", type=int, default=12)
    ap.add_argument("--kmer-lens", type=int, nargs="+", default=[21, 33, 55, 77, 99])
    ap.add_argument("--shards", type=int, default=0)
    ap.add_argument("--block-reads", type=int, default=4096)
    ap.add_argument("--out", default="/tmp/arctic_scale_run")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from mhm2_proxy_tpu.models import Assembler, AssemblerConfig
    from mhm2_proxy_tpu.utils.synth import random_genome, simulate_reads

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(12)
    total_bp = int(args.mbp * 1e6)
    per = total_bp // args.genomes

    t_all = time.perf_counter()
    t0 = time.perf_counter()
    asm = Assembler(
        AssemblerConfig(
            kmer_lens=tuple(args.kmer_lens),
            block_reads=args.block_reads,
            n_shards=args.shards,
            output_dir=args.out,
            checkpoint=False,
        )
    )
    n_reads = 0
    from mhm2_proxy_tpu.io.fasta import write_fasta

    for g in range(args.genomes):
        genome = random_genome(rng, per)
        # saved for the post-run metaquast-style quality gate
        write_fasta(os.path.join(args.out, f"genome{g}.fasta"), [(g, genome, 1.0)])
        ids, seqs, quals = simulate_reads(
            rng, genome, coverage=args.coverage, read_len=args.read_len, err_rate=0.002
        )
        if len(seqs) % 2:
            seqs, quals = seqs[:-1], quals[:-1]
        asm.add_interleaved(seqs, quals)
        n_reads += len(seqs)
    t_ingest = time.perf_counter() - t0
    print(f"[ingest+merge] {n_reads} reads, {asm.packed_reads.total_bases} bases "
          f"in {t_ingest:.1f}s", file=sys.stderr, flush=True)

    stage_times = {}
    for k in args.kmer_lens:
        t0 = time.perf_counter()
        asm.run_round(k)
        stage_times[f"k{k}_s"] = round(time.perf_counter() - t0, 1)
        print(f"[round k={k}] {stage_times[f'k{k}_s']}s, "
              f"{len(asm.contigs)} contigs", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    asm.dump_contigs(os.path.join(args.out, "final_assembly.fasta"))
    stats = asm.print_stats()
    total = time.perf_counter() - t_all
    print(json.dumps({
        "metric": "arctic_scale_end_to_end_wall_s",
        "value": round(total, 1),
        "unit": "s",
        "detail": {
            "platform": jax.devices()[0].platform,
            "genome_mbp": args.mbp,
            "n_reads": n_reads,
            "ingest_merge_s": round(t_ingest, 1),
            **stage_times,
            "assembly": stats,
        },
    }))
    # quality gate vs the recorded golden (ci/good-arctic-scale.txt), same
    # metric engine as the CI tiers; prints metrics either way
    import glob
    import subprocess

    golden = os.path.join(os.path.dirname(__file__), "..", "ci",
                          "good-arctic-scale.txt")
    cmd = [sys.executable,
           os.path.join(os.path.dirname(__file__), "..", "ci", "check_asm_quality.py"),
           "--assembly", os.path.join(args.out, "final_assembly.fasta"),
           "--genomes", *sorted(glob.glob(os.path.join(args.out, "genome*.fasta"))),
           "--threshold", "0.02"]
    if os.path.exists(golden):
        cmd += ["--golden", golden]
    r = subprocess.run(cmd)
    if os.path.exists(golden) and r.returncode != 0:
        sys.exit(2)


if __name__ == "__main__":
    main()
