#!/usr/bin/env python3
"""Deterministic synthetic metagenome sample generator (ArcticSynth stand-in).

Writes a multi-genome community's reference FASTAs and an interleaved paired
FASTQ with Illumina-like errors. Fixed seed => bit-identical across runs, so
the golden metrics in ci/good-*.txt are stable.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from mhm2_proxy_tpu.utils.synth import random_genome, simulate_reads  # noqa: E402
from mhm2_proxy_tpu.io.fastq import write_fastq  # noqa: E402
from mhm2_proxy_tpu.io.fasta import write_fasta  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="ci/data")
    ap.add_argument("--genomes", type=int, default=3)
    ap.add_argument("--genome-len", type=int, default=20000)
    ap.add_argument("--genome-len-step", type=int, default=5000)
    ap.add_argument("--coverage", type=float, default=18.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--seed", type=int, default=20260817)
    ap.add_argument("--name", default="synth_sample")
    ap.add_argument("--coassembly", action="store_true",
                    help="12-genome >=1Mbp community (reference arcticsynth "
                    "12-sample coassembly analog, ci_asm_qual_test-full.sh)")
    ap.add_argument("--arctic-scale", action="store_true",
                    help="27 Mbp / 12-genome flagship stand-in for the "
                    "reference's arctic_sample_0 (26.2 Mbp of references, "
                    "ci/good-arctic-sample0.txt): uniform 8x coverage, "
                    "100 bp pairs, 0.2%% errors — the round-4 campaign shape "
                    "(BASELINE.md arctic table)")
    args = ap.parse_args()
    if args.arctic_scale:
        args.genomes = 12
        args.genome_len = 2_250_000
        args.genome_len_step = 0
        args.coverage = 8.0
        args.read_len = 100
        args.seed = 12
        args.name = "arctic-scale"
    if args.coassembly:
        # >= 2 Mbp, 12 genomes, log-skewed coverage, SHARED repeats: the
        # nightly tier must stress what the 75 kb smoke community cannot —
        # inter-genome repeat collapse, depth-skewed purge behavior, and
        # high-k survival of low-abundance members (the reference gates at
        # 28.9% genome fraction under real skew, good-arctic-sample0.txt:33)
        args.genomes = 12
        args.genome_len = 120000
        args.genome_len_step = 10000
        args.coverage = 4.0
        args.name = "synth_coassembly"

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    # shared repeat library (coassembly only): mobile-element-like sequences
    # spliced into MULTIPLE genomes, some reverse-complemented — the classic
    # metagenome misassembly trap (distinct genomes joined through a repeat)
    repeats = []
    if args.coassembly:
        from mhm2_proxy_tpu.oracle.pyref import revcomp_str

        repeats = [random_genome(rng, int(n)) for n in (2000, 3000, 1500, 2500, 4000)]

    all_ids, all_seqs, all_quals = [], [], []
    total_bp = 0
    for g in range(args.genomes):
        if args.coassembly:
            # log-spaced abundance skew ~4x..26x across community members
            cov = args.coverage * (1.6 ** (g % 5))
        elif args.arctic_scale:
            # flagship stand-in is uniform-coverage (matches the round-4
            # campaign's 2.16M-read volume: 27e6 * 8 / 100)
            cov = args.coverage
        else:
            # varied abundances like a real metagenome
            cov = args.coverage * (1.0 + 0.5 * (g % 4))
        genome = random_genome(rng, args.genome_len + args.genome_len_step * g)
        if repeats:
            # splice 2-5 copies from the shared library at random loci
            parts, pos = [], 0
            cuts = np.sort(rng.integers(1000, len(genome) - 1000,
                                        int(rng.integers(2, 6))))
            for c in np.unique(cuts):
                el = repeats[int(rng.integers(0, len(repeats)))]
                if rng.random() < 0.5:
                    el = revcomp_str(el)
                parts.extend([genome[pos:c], el])
                pos = int(c)
            parts.append(genome[pos:])
            genome = "".join(parts)
        total_bp += len(genome)
        write_fasta(
            os.path.join(args.out_dir, f"{args.name}-genome{g}.fasta"), [(g, genome, 1.0)]
        )
        ids, seqs, quals = simulate_reads(
            rng, genome, coverage=cov, read_len=args.read_len, insert_mean=260,
            insert_sd=40, err_rate=0.002 if args.arctic_scale else 0.004,
        )
        ids = [f"g{g}.{i.decode()}".encode() for i in ids]
        all_ids.extend(ids)
        all_seqs.extend(seqs)
        all_quals.extend(quals)
    # interleave order is already /1,/2 alternating per genome; shuffle pairs
    n_pairs = len(all_seqs) // 2
    order = rng.permutation(n_pairs)
    ids, seqs, quals = [], [], []
    for p in order:
        for j in (0, 1):
            ids.append(all_ids[2 * p + j])
            seqs.append(all_seqs[2 * p + j])
            quals.append(all_quals[2 * p + j])
    write_fastq(os.path.join(args.out_dir, f"{args.name}.fastq"), ids, seqs, quals)
    print(f"wrote {n_pairs} pairs + {args.genomes} genomes ({total_bp} bp) to {args.out_dir}")


if __name__ == "__main__":
    main()
