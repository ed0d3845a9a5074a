#!/usr/bin/env python3
"""Regenerate CI golden metrics from the ORACLE pipeline, not the code under test.

The reference's golden files came from an external tool (metaquast) run against
an independently-produced assembly (/root/reference/ci/check_asm_quality.py:30-44);
a golden emitted by the very pipeline it gates can only catch regressions, not a
shared misreading of the reference semantics (VERDICT r4 weak #4). This script
produces the goldens from the sequential Python oracle instead:

  merge_pair_oracle  (oracle/merge_ref.py — merge_reads.cpp:307-495 mirror)
  count_kmers_oracle (oracle/pyref.py — kcount.cpp/kcount_cpu.cpp mirror)
  traverse_oracle    (oracle/pyref.py — dbjg_traversal.cpp path decomposition)

run over the full k ladder with the contig-kmer second pass, exactly the
production round structure (models/assembler.py::run_round) but sharing NO code
with the JAX/Pallas implementation. The resulting metrics are written as the
golden file with a provenance header; ci_asm_qual_test.sh then gates the
production assembly against these oracle-produced numbers.

Usage:
  python ci/make_golden_oracle.py --reads ci/data/synth_sample.fastq \
      --genomes ci/data/synth_sample-genome*.fasta \
      --kmer-lens 21 33 55 77 99 --out ci/good-synth-sample.txt
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mhm2_proxy_tpu.io.fastq import read_fastq  # noqa: E402
from mhm2_proxy_tpu.io.fasta import read_fasta, write_fasta  # noqa: E402
from mhm2_proxy_tpu.oracle.merge_ref import merge_pair_oracle  # noqa: E402
from mhm2_proxy_tpu.oracle.pyref import count_kmers_oracle, traverse_oracle  # noqa: E402
from check_asm_quality import contig_metrics  # noqa: E402


def oracle_assemble(reads_fname: str, kmer_lens: list[int], dmin_thres: int = 2):
    """Full oracle pipeline: interleaved paired FASTQ -> final contigs."""
    ids, seqs, quals = read_fastq(reads_fname)
    seqs = [s.decode() if isinstance(s, bytes) else s for s in seqs]
    quals = [q.decode() if isinstance(q, bytes) else q for q in quals]
    assert len(seqs) % 2 == 0, "interleaved pairs expected"
    reads: list[tuple[str, str]] = []
    n_merged = 0
    for i in range(0, len(seqs), 2):
        merged, m_seq, m_quals = merge_pair_oracle(
            seqs[i], quals[i], seqs[i + 1], quals[i + 1])
        if merged:
            reads.append((m_seq, m_quals))
            n_merged += 1
        else:
            reads.append((seqs[i], quals[i]))
            reads.append((seqs[i + 1], quals[i + 1]))
    print(f"[oracle] merged {n_merged}/{len(seqs)//2} pairs", flush=True)

    contigs: list[tuple[str, float]] = []
    for k in kmer_lens:
        t0 = time.time()
        ctgs = [(seq, int(depth)) for seq, depth in contigs if len(seq) >= k + 2]
        table = count_kmers_oracle(reads, k, dmin_thres=dmin_thres,
                                   ctgs=ctgs or None)
        contigs = traverse_oracle(table, k)
        print(f"[oracle] k={k}: {len(table)} table kmers -> "
              f"{len(contigs)} contigs ({time.time()-t0:.1f}s)", flush=True)
    return contigs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", required=True)
    ap.add_argument("--genomes", nargs="+", required=True)
    ap.add_argument("--kmer-lens", type=int, nargs="+",
                    default=[21, 33, 55, 77, 99])
    ap.add_argument("--out", required=True)
    ap.add_argument("--dump-fasta", help="also write the oracle assembly here")
    args = ap.parse_args()

    contigs = oracle_assemble(args.reads, args.kmer_lens)
    if args.dump_fasta:
        write_fasta(args.dump_fasta,
                    [(i, seq, depth) for i, (seq, depth) in enumerate(contigs)],
                    min_len=500)
    genomes = []
    for g in args.genomes:
        genomes.extend(seq for _, seq in read_fasta(g))
    m = contig_metrics([seq for seq, _ in contigs], genomes)
    with open(args.out, "w") as f:
        f.write(
            "# Golden assembly metrics produced by the SEQUENTIAL PYTHON ORACLE\n"
            "# (ci/make_golden_oracle.py: oracle/merge_ref.py + oracle/pyref.py),\n"
            "# NOT by the JAX/Pallas pipeline these numbers gate — independent\n"
            "# provenance, the reference's metaquast-vs-independent-run role\n"
            "# (/root/reference/ci/check_asm_quality.py:30-44).\n"
            f"# reads={os.path.basename(args.reads)} k={args.kmer_lens} "
            f"generated={time.strftime('%Y-%m-%d')}\n"
        )
        for k, v in m.items():
            f.write(f"{k} = {v}\n")
    print(f"wrote {args.out}:")
    for k, v in m.items():
        print(f"  {k} = {v}")


if __name__ == "__main__":
    main()
