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
from ..io.fastq import split_paired_fname
from ..io.fasta import write_fasta
from ..io.merge import merge_reads_arrays
from ..io.reads import PackedReads
from ..kcount import KmerCountStore
from ..dbjg import traverse_debruijn_graph
from ..ops.bitkmer import ascii_to_codes
from ..utils.logger import get_logger


def resolve_block_reads(block_reads: int) -> int:
    """0 = auto: large blocks on TPU (dispatch/merge amortization), small on
    CPU (compile latency dominates test/CI runs)."""
    if block_reads:
        return block_reads
    import jax

    return 131072 if jax.default_backend() == "tpu" else 4096


@dataclasses.dataclass
class AssemblerConfig:
    kmer_lens: tuple = DEFAULT_KMER_LENS
    qual_offset: int = DEFAULT_QUAL_OFFSET
    dmin_thres: int = DEFAULT_DMIN_THRES
    min_ctg_print_len: int = DEFAULT_MIN_CTG_PRINT_LEN
    # reads per device block; 0 = auto (131072 on TPU — larger blocks amortize
    # dispatch/merge overhead, measured 4.6x counting throughput over 4096
    # blocks on v5e — 4096 on CPU where compile time dominates small runs)
    block_reads: int = 0
    pad_len_quantum: int = 32  # pad read length up to a multiple -> few shapes
    chunk_bytes: int = 8 << 20  # streaming-ingest chunk size (bounded memory)
    checkpoint: bool = False
    checkpoint_merged: bool = False
    output_dir: str = "."
    verbose: bool = False
    # >0 selects the sharded multi-device backend over an n-device mesh
    # (the analog of the reference's CPU/GPU backend seam, kcount.hpp:57-69)
    n_shards: int = 0
    # >1 arranges the n_shards devices as a (n_hosts, n_shards/n_hosts)
    # ("dcn","ici") mesh and uses the hierarchical node-aware exchange
    # (the ThreeTierAggrStore analog, three_tier_aggr_store.hpp:289-316)
    n_hosts: int = 0
    bucket_cap: int | None = None
    dump_kmers: bool = False


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
        self._next_read_id: int | None = None

    # -- ingest + merge ----------------------------------------------------

    # per-process read-id block stride (reference allocates
    # rank*(max_est+10000)*3 estimated blocks, merge_reads.cpp:258-260;
    # a fixed 2^44 stride guarantees disjointness with no communication)
    READ_ID_STRIDE = 1 << 44

    def load_reads(self, reads_fnames: list[str], byte_range=None,
                   rank: int = 0, n_ranks: int = 1, validate_pairs: bool = True):
        """Stream FASTQ files (paired 'f1:f2' or interleaved) and merge pairs.

        Inputs are streamed in bounded-memory chunks (io/stream.py; the
        reference streams rank byte ranges, fastq.cpp:457-475) through the
        native C++ parser when available. rank/n_ranks split each input by
        bytes for multi-process ingest: interleaved files resync to record
        boundaries (fastq.cpp:399-455); two-file pairs are aligned to a
        common PAIR boundary per file (set_matching_pair, fastq.cpp:310-396)
        so same-ordinal records are guaranteed mates even when the files
        have different record byte sizes. byte_range overrides the split for
        single-file inputs only. With validate_pairs, mate headers are
        normalized and checked block-vectorized (get_fq_name,
        fastq.cpp:73-122) and a mis-paired input dies loudly.
        """
        from ..io.fastq import check_pair_block
        from ..io.stream import matching_pair_ranges, stream_fastq_blocks

        if self._next_read_id is None:
            self._next_read_id = rank * self.READ_ID_STRIDE
        cfg = self.cfg
        B = resolve_block_reads(cfg.block_reads)
        kw = dict(
            pad_quantum=cfg.pad_len_quantum, qual_offset=cfg.qual_offset,
            chunk_bytes=cfg.chunk_bytes,
        )

        def die_mispaired(fname, hdrs1, hdrs2, bad):
            h1 = bytes(hdrs1[0][bad][: hdrs1[1][bad]]) if bad < len(hdrs1[1]) else b"<eof>"
            h2 = bytes(hdrs2[0][bad][: hdrs2[1][bad]]) if bad < len(hdrs2[1]) else b"<eof>"
            raise ValueError(
                f"mis-paired input {fname}: record {bad}: {h1!r} vs {h2!r} "
                "are not mates (reference merge_reads.cpp:346-348 dies here too)"
            )

        for fname in reads_fnames:
            f1, f2 = split_paired_fname(fname)
            if f2 is not None:
                if n_ranks > 1:
                    br1, br2 = matching_pair_ranges(f1, f2, rank, n_ranks)
                else:
                    br1 = br2 = byte_range
                it2 = stream_fastq_blocks(f2, B, byte_range=br2,
                                          with_ids=validate_pairs, **kw)
                for blk1 in stream_fastq_blocks(f1, B, byte_range=br1,
                                                with_ids=validate_pairs, **kw):
                    c1, q1, l1, n1 = blk1[:4]
                    blk2 = next(it2, None)
                    if blk2 is None:
                        raise ValueError(f"paired files record mismatch: {f2} ran out first")
                    c2, q2, l2, n2 = blk2[:4]
                    if n1 != n2:
                        raise ValueError(f"paired files record mismatch: {n1} vs {n2}")
                    if validate_pairs:
                        hdrs1, hdrs2 = blk1[4], blk2[4]
                        bad = check_pair_block(
                            hdrs1[0][:n1], hdrs1[1][:n1], hdrs2[0][:n2], hdrs2[1][:n2]
                        )
                        if bad >= 0:
                            die_mispaired(fname, hdrs1, hdrs2, bad)
                    self._merge_blocks(c1, q1, l1, c2, q2, l2)
                if next(it2, None) is not None:
                    raise ValueError(f"paired files record mismatch: {f1} ran out first")
            else:
                br = byte_range
                if br is None and n_ranks > 1:
                    import os

                    size = os.path.getsize(f1)
                    br = (size * rank // n_ranks, size * (rank + 1) // n_ranks)
                for blk in stream_fastq_blocks(f1, 2 * B, byte_range=br,
                                               with_ids=validate_pairs, **kw):
                    c, q, l, n = blk[:4]
                    if validate_pairs:
                        hm, hl = blk[4]
                        m = 2 * (n // 2)  # a dangling trailing record is not an error
                        bad = check_pair_block(
                            hm[0:m:2], hl[0:m:2], hm[1:m:2], hl[1:m:2]
                        )
                        if bad >= 0:
                            die_mispaired(fname, (hm[0::2], hl[0::2]), (hm[1::2], hl[1::2]), bad)
                    self._merge_blocks(c[0::2], q[0::2], l[0::2], c[1::2], q[1::2], l[1::2])
        self.log.info(
            f"Merged {getattr(self, '_n_merged', 0)}/{getattr(self, '_n_pairs', 0)} pairs"
        )
        self.log.info(
            f"Loaded {len(self.packed_reads)} reads, {self.packed_reads.total_bases} bases"
        )

    def add_interleaved(self, seqs, quals):
        c, q, l = _lists_to_block(seqs, quals, self.cfg.pad_len_quantum, self.cfg.qual_offset)
        self._merge_blocks(c[0::2], q[0::2], l[0::2], c[1::2], q[1::2], l[1::2])

    def add_unpaired(self, seqs, quals):
        c, q, l = _lists_to_block(seqs, quals, self.cfg.pad_len_quantum, self.cfg.qual_offset)
        # unpaired reads get a pair id block like the reference's dummy-mate
        # convention (merge_reads.cpp:306-312): 2 ids per read, mate-1 sign
        ids = -(self._take_read_ids(len(l)) + 1)
        self.packed_reads.add_block(c, q, l, ids=ids)

    def _take_read_ids(self, n_pairs: int) -> np.ndarray:
        """Allocate n_pairs read-id bases (2 ids per pair, reference
        merge_reads.cpp:306-329 read_id += 2)."""
        if self._next_read_id is None:
            self._next_read_id = 0
        base = self._next_read_id
        self._next_read_id += 2 * n_pairs
        return base + 2 * np.arange(n_pairs, dtype=np.int64)

    def _merge_blocks(self, c1, q1, l1, c2, q2, l2):
        """Merge aligned pair blocks and pack results (block-vectorized)."""
        cfg = self.cfg
        # equalize widths
        L = max(c1.shape[1], c2.shape[1])
        pad = lambda a, v: (
            a if a.shape[1] == L else np.pad(a, ((0, 0), (0, L - a.shape[1])), constant_values=v)
        )
        c1, c2 = pad(c1, 4), pad(c2, 4)
        q1, q2 = pad(q1, cfg.qual_offset), pad(q2, cfg.qual_offset)
        out = merge_reads_arrays(c1, q1, l1, c2, q2, l2, qual_offset=cfg.qual_offset)
        merged = out["merged"] & (l1 > 0) & (l2 > 0)
        mi = np.nonzero(merged)[0]
        ui = np.nonzero(~merged & ((l1 > 0) | (l2 > 0)))[0]
        # signed int64 identity (packed_reads.cpp:74-75): pair base id + 1,
        # negative mate 1 / positive mate 2; merged reads carry the mate-1 id
        ids = self._take_read_ids(c1.shape[0])
        if mi.size:
            self.packed_reads.add_block(
                out["m_codes"][mi], out["m_quals"][mi], out["m_len"][mi],
                ids=-(ids[mi] + 1),
            )
        if ui.size:
            self.packed_reads.add_block(c1[ui], out["quals1_z"][ui], l1[ui], ids=-(ids[ui] + 1))
            self.packed_reads.add_block(c2[ui], out["quals2_z"][ui], l2[ui], ids=ids[ui] + 1)
        self._n_merged = getattr(self, "_n_merged", 0) + int(mi.size)
        self._n_pairs = getattr(self, "_n_pairs", 0) + int(((l1 > 0) & (l2 > 0)).sum())
        self.log.debug(f"Merged {mi.size}/{(l1 > 0).sum()} pairs in block")

    def load_merged_reads(self, fname: str):
        """Reload a --checkpoint-merged FASTQ: reads are already merged, so
        ingest skips the pair-merge pass entirely (reference --restart
        consumes *-merged.fastq the same way, docs/mhm_guide.md:197-210).
        Read ids round-trip through the r<id>/<mate> names."""
        from ..io.fastq import parse_rid_headers
        from ..io.stream import stream_fastq_blocks

        cfg = self.cfg
        B = resolve_block_reads(cfg.block_reads)
        hi_id = 0
        for c, q, l, n, (hm, hl) in stream_fastq_blocks(
            fname, B, pad_quantum=cfg.pad_len_quantum, qual_offset=cfg.qual_offset,
            chunk_bytes=cfg.chunk_bytes, with_ids=True,
        ):
            ids = parse_rid_headers(hm[:n], hl[:n])
            if ids.size:
                hi_id = max(hi_id, int(np.abs(ids).max()))
            self.packed_reads.add_block(c[:n], q[:n], l[:n], ids=ids)
        self._next_read_id = hi_id  # continue past the reloaded block
        self.log.info(
            f"Reloaded {len(self.packed_reads)} merged reads from {fname}"
        )

    def dump_merged_reads(self, fname: str):
        """Write the merged/packed read set as FASTQ (reference
        --checkpoint-merged, merged fname convention utils.cpp:154-161).
        Vectorized block rendering (io/fastq.py render_fastq_block) — no
        per-read Python at arctic scale."""
        import gzip

        from ..io.fastq import render_fastq_block

        opener = gzip.open if fname.endswith(".gz") else open
        with opener(fname, "wb") as f:
            for codes, quals, lens, ids in self.packed_reads.blocks(65536, with_ids=True):
                f.write(render_fastq_block(ids, codes, quals, lens))

    # -- contigging rounds -------------------------------------------------

    def _make_store(self, k: int):
        cfg = self.cfg
        if cfg.n_shards > 0:
            if cfg.n_hosts > 1:
                from ..parallel import HierarchicalCounter, make_host_mesh

                if not hasattr(self, "_mesh"):
                    self._mesh = make_host_mesh(cfg.n_hosts, cfg.n_shards // cfg.n_hosts)
                return HierarchicalCounter(
                    k, self._mesh, dmin_thres=cfg.dmin_thres, bucket_cap=cfg.bucket_cap
                )
            from ..parallel import ShardedCounter, make_shard_mesh

            if not hasattr(self, "_mesh"):
                self._mesh = make_shard_mesh(cfg.n_shards)
            return ShardedCounter(
                k, self._mesh, dmin_thres=cfg.dmin_thres, bucket_cap=cfg.bucket_cap
            )
        return KmerCountStore(k, dmin_thres=cfg.dmin_thres)

    def _estimate_num_kmers(self, k: int) -> int:
        """Estimated k-mer records this round (reference contigging.cpp:61-91
        samples reads; our packed store knows totals exactly)."""
        n = len(self.packed_reads)
        return max(self.packed_reads.total_bases - n * (k + 1), 0)

    def run_round(self, k: int) -> list[Contig]:
        """One contigging round (reference contigging.cpp:93-158)."""
        cfg = self.cfg
        t0 = time.time()
        # drop any device buffers the previous round left reachable before
        # this round's memory pre-flight sizes its budgets (at arctic scale
        # successive k rounds otherwise stack fragmentation until an OOM)
        import gc

        gc.collect()
        # memory pre-flight (reference kmer_dht.cpp:119-131, main.cpp:107-130)
        est = self._estimate_num_kmers(k)
        from ..constants import words32_for_k
        from ..utils.memlog import get_free_device_mem_bytes, get_free_mem_bytes

        bytes_per_rec = 4 * words32_for_k(k) + 8 + 2 * 32  # words + count + exts
        want = est * bytes_per_rec * 2  # LSM transient factor
        free = get_free_mem_bytes()
        # on accelerators the binding constraint is device HBM, not host RAM
        # (reference sizes from device memory, kcount_gpu.cpp:175-196)
        dev_free = get_free_device_mem_bytes()
        if dev_free:
            free = min(free, dev_free)
        if want > 0.8 * free:
            self.log.warning(
                f"k={k}: estimated {est} kmer records (~{want>>20} MiB) vs "
                f"{free>>20} MiB free; may run out of memory"
            )
        store = self._make_store(k)
        q = cfg.pad_len_quantum
        L = max(((self.packed_reads.max_read_len + q - 1) // q) * q, k + q)
        # block-size backoff (reference refuses/resizes, kmer_dht.cpp:119-131):
        # the transient working set of one push is ~6 capacity-sized copies of
        # the block's records (sort operands + dedup + split); halve the block
        # until that fits the free-memory budget instead of OOMing
        B = resolve_block_reads(cfg.block_reads)
        # a push's transient is ~6 capacity copies of the block's RAW records
        # (sort operands + dedup/split) — raw rows are key words (+1 payload
        # lane), far smaller than the per-unique table rows estimated above
        raw_rec_bytes = 4 * (words32_for_k(k) + 1)
        while B > 1024 and 6 * B * (L - k + 1) * raw_rec_bytes > 0.5 * free:
            B //= 2
        if B != resolve_block_reads(cfg.block_reads):
            self.log.warning(f"k={k}: block-size backoff to {B} reads/block to fit memory")
        n_blocks = 0
        for codes, quals, lens in self.packed_reads.blocks(B, pad_len=L, min_len=k):
            qual_ok = quals >= cfg.qual_offset + QUAL_CUTOFF
            store.add_reads_block(codes, qual_ok, lens)
            n_blocks += 1
        if self.contigs:
            self._add_ctg_kmers(store, k)
        table = store.finalize()
        n_kmers = int(np.sum(np.asarray(table.n)))
        self.log.info(
            f"k={k}: counted {n_kmers} kmers from {n_blocks} blocks in {time.time()-t0:.1f}s"
        )
        if cfg.n_shards > 0:
            self.log.info(f"k={k}: exchange {store.describe_exchange()}")
            if store.spilled:
                self.log.warning(
                    f"k={k}: minimizer-hash skew: {store.spilled} records "
                    f"re-sent over {store.spill_rounds} spill rounds "
                    "(consider a larger --bucket-cap)"
                )
        if cfg.dump_kmers:
            fname = f"{cfg.output_dir}/kmers-{k}.txt.gz"
            if cfg.n_shards > 0:
                import gzip

                from ..kcount.kmer_store import render_kmer_dump

                parts = [
                    (np.asarray(ft.words[: int(ft.n)]), np.asarray(ft.count[: int(ft.n)]),
                     np.asarray(ft.left[: int(ft.n)]), np.asarray(ft.right[: int(ft.n)]))
                    for ft in table.shard_tables()
                ]
                w = np.concatenate([p[0] for p in parts])
                order = np.lexsort(tuple(w[:, i] for i in range(w.shape[1] - 1, -1, -1)))
                with gzip.open(fname, "wb") as f:
                    f.write(render_kmer_dump(
                        w[order],
                        np.concatenate([p[1] for p in parts])[order],
                        np.concatenate([p[2] for p in parts])[order],
                        np.concatenate([p[3] for p in parts])[order], k,
                    ))
            else:
                table.dump_kmers(fname)
        t1 = time.time()
        tstats: dict = {}
        if cfg.n_shards > 0:
            from ..dbjg import traverse_debruijn_graph_sharded

            raw = traverse_debruijn_graph_sharded(table, k, stats=tstats)
        else:
            # k+2 usability bound: shorter contigs can never seed a later
            # (larger-k) round nor reach any output (min print len 500)
            raw = traverse_debruijn_graph(table, k, stats=tstats,
                                          min_ctg_len=k + 2)
        self.contigs = [Contig(i, seq, depth) for i, (seq, depth) in enumerate(sorted(raw))]
        self.log.info(
            f"k={k}: traversal -> {len(self.contigs)} contigs in {time.time()-t1:.1f}s"
        )
        term = tstats.get("terminations", {})
        self.log.info(
            f"k={k}: walk terminations deadend={term.get('deadend', 0)} "
            f"fork={term.get('fork', 0)} conflict={term.get('conflict', 0)} "
            f"repeat={term.get('repeat', 0)}"
        )
        if tstats.get("stitch_timings"):
            self.log.info(f"k={k}: stitch {tstats['stitch_timings']}")
        if "stitch_rounds" in tstats:
            sr = tstats["stitch_rounds"]
            self.log.info(
                f"k={k}: sharded stitch rounds {sr['doubling']}+{sr['cycle_min']}"
                f"+{sr['post_cut']} (static bound {sr['static_bound']} each), "
                f"all_to_all {tstats['stitch_all_to_all_bytes'] >> 20} MiB"
            )
        if cfg.checkpoint:
            write_fasta(
                f"{cfg.output_dir}/contigs-{k}.fasta",
                [(c.id, c.seq, c.depth) for c in self.contigs],
            )
        return self.contigs

    # cells (rows x padded length) per ctg-pass block: bounds both the device
    # working set and the extraction work per dispatch
    CTG_CELL_BUDGET = 1 << 19
    # longest contig window fed to extraction (longer contigs chop with k-1
    # overlap); caps the compile shape zoo at L <= 4096
    CTG_MAX_SEG = 2048

    def _add_ctg_kmers(self, store, k: int):
        """Second pass: contig k-mers with depth (reference kcount.cpp:100-138).

        ALL contigs are chopped into windows of at most CTG_MAX_SEG bases
        with a k+1 overlap — a window's valid k-mers are those with BOTH
        extension bases in-window (positions 1..len-k-1), so the k+1 overlap
        makes consecutive windows' valid ranges exactly contiguous: every
        interior k-mer lands in exactly one window WITH its true left/right
        ext bases (multiset and ext calls unchanged; per-window depth =
        contig depth),
        then packed into ONE fixed (rows, CTG_MAX_SEG) block shape. One
        shape means exactly one extraction + one aggregation compile per k —
        pow2 length-bucketing compiled ~7 shapes per round, each a multi-
        minute XLA:TPU compile over the remote tunnel at arctic scale, which
        dominated the whole round. The reference's fixed 3 MB seq-block
        packing bounds its shapes the same way (kcount.cpp:100-138 +
        KCOUNT_SEQ_BLOCK_SIZE); cell waste from short contigs is ~3x at
        reference-like N50, a few ms of vectorized extraction.
        """
        cfg = self.cfg
        ctgs = [c for c in self.contigs if len(c.seq) >= k + 2]
        if not ctgs:
            return
        import jax

        seg = self.CTG_MAX_SEG
        windows = []  # (seq, depth)
        for c in ctgs:
            if len(c.seq) <= seg:
                windows.append((c.seq, c.depth))
            else:
                step = seg - (k + 1)
                for st in range(0, len(c.seq) - (k + 1), step):
                    windows.append((c.seq[st : st + seg], c.depth))
        row_q = 8 if cfg.n_shards == 0 else max(8, cfg.n_shards)
        cells = self.CTG_CELL_BUDGET * (8 if jax.default_backend() == "tpu" else 1)
        B = max(row_q, cells // seg // row_q * row_q)
        for s0 in range(0, len(windows), B):
            chunk = windows[s0 : s0 + B]
            codes = np.full((B, seg), 4, np.uint8)
            lens = np.zeros(B, np.int32)
            deps = np.zeros(B, np.int32)
            for i, (seq, depth) in enumerate(chunk):
                codes[i, : len(seq)] = ascii_to_codes(seq.encode())
                lens[i] = len(seq)
                deps[i] = min(max(int(depth), 0), 0xFFFF)
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
            "avg_depth": float(sum(depths) / len(depths)) if depths else 0.0,
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

def _lists_to_block(seqs, quals, quantum: int, qual_offset: int, rows: int | None = None):
    maxlen = max((len(s) for s in seqs), default=1)
    L = ((maxlen + quantum - 1) // quantum) * quantum
    B = rows or len(seqs)
    codes = np.full((B, L), 4, np.uint8)
    q = np.full((B, L), qual_offset, np.uint8)
    lens = np.zeros((B,), np.int32)
    for i, (sq, ql) in enumerate(zip(seqs, quals)):
        sq = sq.encode() if isinstance(sq, str) else sq
        ql = ql.encode() if isinstance(ql, str) else ql
        codes[i, : len(sq)] = ascii_to_codes(sq)
        q[i, : len(ql)] = np.frombuffer(ql, np.uint8)
        lens[i] = len(sq)
    return codes, q, lens
