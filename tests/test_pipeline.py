"""End-to-end assembly on synthetic data: genome recovery + oracle equality."""

import numpy as np
import pytest

from mhm2_proxy_tpu.models import Assembler, AssemblerConfig
from mhm2_proxy_tpu.oracle.pyref import revcomp_str
from mhm2_proxy_tpu.utils.synth import random_genome, simulate_reads


def test_single_round_assembly(rng, tmp_path):
    genome = random_genome(rng, 5000)
    ids, seqs, quals = simulate_reads(rng, genome, coverage=25.0, read_len=100, err_rate=0.002)
    cfg = AssemblerConfig(kmer_lens=(21,), block_reads=512, output_dir=str(tmp_path))
    asm = Assembler(cfg)
    asm.add_interleaved(seqs, quals)
    contigs = asm.run()
    assert contigs
    # recovery: most of the genome should be covered by exact contig matches
    gplus = genome + "$" + revcomp_str(genome)
    matched = sum(len(c.seq) for c in contigs if c.seq in gplus or revcomp_str(c.seq) in gplus)
    total = sum(len(c.seq) for c in contigs)
    assert matched / total > 0.95, f"only {matched}/{total} contig bases match genome"
    covered = sum(len(c.seq) - 20 for c in contigs if len(c.seq) >= 500)
    assert covered > 0.7 * len(genome), f"covered {covered} of {len(genome)}"
    stats = asm.print_stats(500)
    assert stats["total_length"] > 0.7 * len(genome)
    asm.dump_contigs(str(tmp_path / "final_assembly.fasta"))
    from mhm2_proxy_tpu.io.fasta import read_fasta

    back = read_fasta(str(tmp_path / "final_assembly.fasta"))
    assert len(back) == sum(1 for c in contigs if len(c.seq) >= 500)


def test_two_round_assembly(rng, tmp_path):
    """k=21 then k=33 with ctg-kmer carry-over (reference multi-round flow)."""
    genome = random_genome(rng, 4000)
    ids, seqs, quals = simulate_reads(rng, genome, coverage=30.0, read_len=100, err_rate=0.003)
    cfg = AssemblerConfig(kmer_lens=(21, 33), block_reads=512, output_dir=str(tmp_path))
    asm = Assembler(cfg)
    asm.add_interleaved(seqs, quals)
    contigs = asm.run()
    gplus = genome + "$" + revcomp_str(genome)
    matched = sum(len(c.seq) for c in contigs if c.seq in gplus or revcomp_str(c.seq) in gplus)
    total = sum(len(c.seq) for c in contigs)
    assert matched / total > 0.9
    stats = asm.print_stats(500)
    assert stats["total_length"] > 0.6 * len(genome)


def test_full_oracle_equality_small(rng):
    """Device pipeline == oracle pipeline on a small two-round problem."""
    from mhm2_proxy_tpu.oracle.pyref import count_kmers_oracle, traverse_oracle
    from tests.test_count import reads_to_block

    k1, k2 = 21, 33
    genome = random_genome(rng, 600)
    reads = []
    for _ in range(200):
        s = int(rng.integers(0, 520))
        seq = genome[s : s + 80]
        reads.append((seq, chr(33 + 38) * len(seq)))

    cfg = AssemblerConfig(kmer_lens=(k1, k2), block_reads=256)
    asm = Assembler(cfg)
    for seq, q in reads:
        asm.packed_reads.add_read(seq, q)
    got1 = asm.run_round(k1)
    exp1 = traverse_oracle(count_kmers_oracle(reads, k1), k1)
    assert sorted((c.seq) for c in got1) == sorted(s for s, _ in exp1)

    oracle_ctgs = [(s, int(min(max(int(d), 0), 0xFFFF))) for s, d in exp1]
    got2 = asm.run_round(k2)
    exp2 = traverse_oracle(count_kmers_oracle(reads, k2, ctgs=oracle_ctgs), k2)
    assert sorted(c.seq for c in got2) == sorted(s for s, _ in exp2)
