"""Post-assembly read alignment stats."""

import numpy as np

from mhm2_proxy_tpu.models import Assembler, AssemblerConfig
from mhm2_proxy_tpu.models.post_asm import post_asm_align_stats, align_reads_to_contigs, build_contig_index
from mhm2_proxy_tpu.utils.synth import random_genome, simulate_reads
from mhm2_proxy_tpu.ops.bitkmer import ascii_to_codes


def test_post_asm_align(rng):
    genome = random_genome(rng, 3000)
    ids, seqs, quals = simulate_reads(rng, genome, coverage=20.0, read_len=80, err_rate=0.002)
    cfg = AssemblerConfig(kmer_lens=(21,), block_reads=512)
    asm = Assembler(cfg)
    asm.add_interleaved(seqs, quals)
    asm.run()
    stats = post_asm_align_stats(asm, sample_reads=512)
    # most reads must anchor to the assembly and align nearly perfectly
    assert stats["aligned_frac"] > 0.85, stats
    assert stats["mean_identity"] > 0.9, stats


def test_align_reads_direct(rng):
    genome = random_genome(rng, 1500)
    contigs = [genome]
    idx = build_contig_index(contigs, 31)
    B, L = 32, 80
    codes = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        s = int(rng.integers(0, len(genome) - L))
        codes[i] = ascii_to_codes(genome[s : s + L].encode())
        lens[i] = L
    out = align_reads_to_contigs(codes, lens, contigs, index=idx, k=31)
    assert (out["cid"] == 0).all()
    assert (out["score"] == L).all()  # perfect match, match score 1
