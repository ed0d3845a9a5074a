"""End-to-end contigging pipeline (reference src/main.cpp + src/contigging.cpp).

FASTQ ingest -> paired merge -> per-k rounds of (k-mer counting [+ contig
k-mers from the previous round] -> de Bruijn traversal) -> final contigs.
The per-round flow mirrors contigging<MAX_K> (contigging.cpp:93-158) and
analyze_kmers (kcount.cpp:140-157).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

from ..constants import (
    DEFAULT_KMER_LENS,
    DEFAULT_MIN_CTG_PRINT_LEN,
    DEFAULT_QUAL_OFFSET,
    DEFAULT_DMIN_THRES,
    QUAL_CUTOFF,
)
from ..io.fastq import FastqReader, split_paired_fname
from ..io.fasta import write_fasta
from ..io.merge import merge_reads_arrays
from ..io.reads import PackedReads
from ..kcount import KmerCountStore
from ..dbjg import traverse_debruijn_graph
from ..ops.bitkmer import ascii_to_codes
from ..utils.logger import get_logger


@dataclasses.dataclass
class AssemblerConfig:
    kmer_lens: tuple = DEFAULT_KMER_LENS
    qual_offset: int = DEFAULT_QUAL_OFFSET
    dmin_thres: int = DEFAULT_DMIN_THRES
    min_ctg_print_len: int = DEFAULT_MIN_CTG_PRINT_LEN
    block_reads: int = 4096
    pad_len_quantum: int = 32  # pad read length up to a multiple -> few shapes
    checkpoint: bool = False
    checkpoint_merged: bool = False
    output_dir: str = "."
    verbose: bool = False


@dataclasses.dataclass
class Contig:
    id: int
    seq: str
    depth: float


class Assembler:
    def __init__(self, config: AssemblerConfig | None = None):
        self.cfg = config or AssemblerConfig()
        self.log = get_logger(verbose=self.cfg.verbose)
        self.packed_reads = PackedReads(self.cfg.qual_offset)
        self.contigs: list[Contig] = []

    # -- ingest + merge ----------------------------------------------------

    def load_reads(self, reads_fnames: list[str]):
        """Read FASTQ files (paired 'f1:f2' or interleaved) and merge pairs."""
        for fname in reads_fnames:
            f1, f2 = split_paired_fname(fname)
            r1 = FastqReader(f1)
            if f2 is not None:
                r2 = FastqReader(f2)
                seqs1, quals1 = r1.seqs, r1.quals
                seqs2, quals2 = r2.seqs, r2.quals
            else:
                seqs1, quals1 = r1.seqs[0::2], r1.quals[0::2]
                seqs2, quals2 = r1.seqs[1::2], r1.quals[1::2]
            self._merge_and_pack(seqs1, quals1, seqs2, quals2)
        self.log.info(
            f"Loaded {len(self.packed_reads)} reads, {self.packed_reads.total_bases} bases"
        )

    def add_interleaved(self, seqs, quals):
        self._merge_and_pack(seqs[0::2], quals[0::2], seqs[1::2], quals[1::2])

    def add_unpaired(self, seqs, quals):
        for s, q in zip(seqs, quals):
            self.packed_reads.add_read(s, q)

    def _merge_and_pack(self, seqs1, quals1, seqs2, quals2):
        cfg = self.cfg
        B = cfg.block_reads
        n = len(seqs1)
        maxlen = max((max((len(s) for s in seqs1), default=1)), max((len(s) for s in seqs2), default=1))
        q = cfg.pad_len_quantum
        L = ((maxlen + q - 1) // q) * q
        n_merged = 0
        for s in range(0, n, B):
            chunk = slice(s, min(s + B, n))
            nn = chunk.stop - chunk.start
            c1 = np.full((B, L), 4, np.uint8)
            c2 = np.full((B, L), 4, np.uint8)
            q1 = np.full((B, L), cfg.qual_offset, np.uint8)
            q2 = np.full((B, L), cfg.qual_offset, np.uint8)
            l1 = np.zeros(B, np.int32)
            l2 = np.zeros(B, np.int32)
            for i in range(nn):
                s1, s2_ = seqs1[chunk.start + i], seqs2[chunk.start + i]
                c1[i, : len(s1)] = ascii_to_codes(s1)
                c2[i, : len(s2_)] = ascii_to_codes(s2_)
                qs1, qs2 = quals1[chunk.start + i], quals2[chunk.start + i]
                q1[i, : len(qs1)] = np.frombuffer(qs1, np.uint8)
                q2[i, : len(qs2)] = np.frombuffer(qs2, np.uint8)
                l1[i], l2[i] = len(s1), len(s2_)
            out = merge_reads_arrays(c1, q1, l1, c2, q2, l2, qual_offset=cfg.qual_offset)
            merged = out["merged"]
            for i in range(nn):
                if merged[i]:
                    ln = int(out["m_len"][i])
                    self.packed_reads._codes.append(out["m_codes"][i, :ln].copy())
                    self.packed_reads._quals.append(out["m_quals"][i, :ln].copy())
                    self.packed_reads._lens.append(ln)
                    self.packed_reads.max_read_len = max(self.packed_reads.max_read_len, ln)
                    n_merged += 1
                else:
                    for c, qq, ll in ((c1, out["quals1_z"], l1), (c2, out["quals2_z"], l2)):
                        ln = int(ll[i])
                        self.packed_reads._codes.append(np.asarray(c[i, :ln], np.uint8).copy())
                        self.packed_reads._quals.append(np.asarray(qq[i, :ln], np.uint8).copy())
                        self.packed_reads._lens.append(ln)
                        self.packed_reads.max_read_len = max(self.packed_reads.max_read_len, ln)
        self.log.info(f"Merged {n_merged}/{n} pairs")

    # -- contigging rounds -------------------------------------------------

    def run_round(self, k: int) -> list[Contig]:
        """One contigging round (reference contigging.cpp:93-158)."""
        cfg = self.cfg
        t0 = time.time()
        store = KmerCountStore(k, dmin_thres=cfg.dmin_thres)
        q = cfg.pad_len_quantum
        L = max(((self.packed_reads.max_read_len + q - 1) // q) * q, k + q)
        n_blocks = 0
        for codes, quals, lens in self.packed_reads.blocks(cfg.block_reads, pad_len=L, min_len=k):
            qual_ok = quals >= cfg.qual_offset + QUAL_CUTOFF
            store.add_reads_block(codes, qual_ok, lens)
            n_blocks += 1
        if self.contigs:
            self._add_ctg_kmers(store, k)
        table = store.finalize()
        n_kmers = int(table.n)
        self.log.info(
            f"k={k}: counted {n_kmers} kmers from {n_blocks} blocks in {time.time()-t0:.1f}s"
        )
        t1 = time.time()
        raw = traverse_debruijn_graph(table, k)
        self.contigs = [Contig(i, seq, depth) for i, (seq, depth) in enumerate(sorted(raw))]
        self.log.info(
            f"k={k}: traversal -> {len(self.contigs)} contigs in {time.time()-t1:.1f}s"
        )
        if cfg.checkpoint:
            write_fasta(
                f"{cfg.output_dir}/contigs-{k}.fasta",
                [(c.id, c.seq, c.depth) for c in self.contigs],
            )
        return self.contigs

    def _add_ctg_kmers(self, store: KmerCountStore, k: int):
        """Second pass: contig k-mers with depth (reference kcount.cpp:100-138)."""
        cfg = self.cfg
        ctgs = [c for c in self.contigs if len(c.seq) >= k + 2]
        if not ctgs:
            return
        B = 256
        maxlen = max(len(c.seq) for c in ctgs)
        q = cfg.pad_len_quantum
        L = ((maxlen + q - 1) // q) * q
        for s in range(0, len(ctgs), B):
            chunk = ctgs[s : s + B]
            codes = np.full((B, L), 4, np.uint8)
            lens = np.zeros(B, np.int32)
            deps = np.zeros(B, np.int32)
            for i, c in enumerate(chunk):
                codes[i, : len(c.seq)] = ascii_to_codes(c.seq.encode())
                lens[i] = len(c.seq)
                deps[i] = min(max(int(c.depth), 0), 0xFFFF)
            store.add_ctgs_block(codes, lens, deps)

    def run(self, kmer_lens=None) -> list[Contig]:
        for k in kmer_lens or self.cfg.kmer_lens:
            self.run_round(k)
        return self.contigs

    # -- output ------------------------------------------------------------

    def dump_contigs(self, fname: str, min_len: int | None = None):
        min_len = self.cfg.min_ctg_print_len if min_len is None else min_len
        write_fasta(fname, [(c.id, c.seq, c.depth) for c in self.contigs], min_len=min_len)

    def print_stats(self, min_len: int | None = None):
        """Assembly statistics (reference contigs.cpp:92-164)."""
        min_len = self.cfg.min_ctg_print_len if min_len is None else min_len
        lens = sorted((len(c.seq) for c in self.contigs if len(c.seq) >= min_len), reverse=True)
        tot = sum(lens)
        depths = [c.depth for c in self.contigs if len(c.seq) >= min_len]
        n50 = 0
        acc = 0
        for ln in lens:
            acc += ln
            if acc >= tot / 2:
                n50 = ln
                break
        stats = {
            "num_contigs": len(lens),
            "total_length": tot,
            "avg_depth": (sum(depths) / len(depths)) if depths else 0.0,
            "max_length": lens[0] if lens else 0,
            "n50": n50,
        }
        for cut in (1, 5, 10, 25, 50):
            stats[f"ge_{cut}kbp"] = sum(ln for ln in lens if ln >= cut * 1000)
        self.log.info(f"Assembly stats (>= {min_len}bp): {stats}")
        return stats


def assemble(reads_fnames: list[str], config: AssemblerConfig | None = None):
    """Convenience driver: full pipeline to final contigs."""
    asm = Assembler(config)
    asm.load_reads(reads_fnames)
    asm.run()
    asm.dump_contigs(f"{asm.cfg.output_dir}/final_assembly.fasta")
    asm.print_stats()
    return asm
