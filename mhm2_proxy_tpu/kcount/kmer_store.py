"""Per-shard k-mer count store: LSM-style sorted runs + deterministic merge.

Plays the role of the reference's KmerDHT + HashTableInserter
(src/kcount/kmer_dht.hpp:96-172) on one shard: read blocks stream in as
deduped sorted runs which are merged pairwise (merge-sort style) to bound
memory; finalize() applies extension calls and purge rules to produce the
round's final table.

The contig-kmer second pass (reference insert_supermer_from_ctg,
src/kcount/kcount_cpu.cpp:357-406) is reformulated deterministically: per
kmer over all its contig occurrences, a conflict (distinct (left,right) ext
pairs) zeroes the count, otherwise count = min depth over occurrences; the
read-table entry survives only if it is a UU kmer with count >= 2, matching
the sequential RPC-order-dependent reference semantics in all outcomes that
are order-independent (order-dependent reference cases all end purged; see
oracle/pyref.py::count_kmers_oracle).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import EXT_X, MAX_KMER_COUNT, minimizer_len_for_k, words32_for_k
from ..ops import count as C
from ..ops import bitkmer as bk

I64 = jnp.int64


@dataclasses.dataclass
class FinalTable:
    """A finalized, lexsorted k-mer table (single shard)."""

    k: int
    words: jnp.ndarray  # (T, W) uint32, kept rows in dense sorted prefix
    count: jnp.ndarray  # (T,) int32
    left: jnp.ndarray  # (T,) uint8 ext call codes (0-3 base, 4 F, 5 X)
    right: jnp.ndarray  # (T,) uint8
    n: jnp.ndarray  # scalar int32 number of valid rows

    def dump_kmers(self, fname: str):
        """Write 'KMER count L R' lines gzipped (reference kmer_dht.cpp:238-266).

        Rows are already in k-mer string order (lexicographic packed words ==
        lexicographic bases); rendering is fully vectorized numpy."""
        import gzip

        n = int(self.n)
        with gzip.open(fname, "wb") as f:
            f.write(render_kmer_dump(
                np.asarray(self.words[:n]), np.asarray(self.count[:n]),
                np.asarray(self.left[:n]), np.asarray(self.right[:n]), self.k,
            ))

    def to_host_dict(self) -> dict[str, tuple[int, str, str]]:
        """Materialize as {kmer_str: (count, left_char, right_char)}."""
        n = int(self.n)
        words = np.asarray(self.words[:n])
        cnt = np.asarray(self.count[:n])
        left = np.asarray(self.left[:n])
        right = np.asarray(self.right[:n])
        from ..constants import EXT_CALL_CHARS

        kmers = bk.words_to_strings(words, self.k)
        return {
            km: (int(c), EXT_CALL_CHARS[l], EXT_CALL_CHARS[r])
            for km, c, l, r in zip(kmers, cnt, left, right)
        }


def render_kmer_dump(words, count, left, right, k: int) -> bytes:
    """Vectorized 'KMER count L R\\n' rendering (kmer_dht.cpp:243-266 format).

    Per-row Python at arctic scale (~tens of millions of rows) takes minutes;
    this renders the whole table with numpy ragged scatters in seconds.
    """
    from ..constants import EXT_CALL_CHARS

    n = len(count)
    if n == 0:
        return b""
    chars = bk.decode_words_ascii(words, k)  # (n, k) ascii
    cnt = np.asarray(count, np.int64)
    ext_lut = np.frombuffer(EXT_CALL_CHARS.encode()[:8].ljust(8, b"?"), np.uint8)
    thresholds = 10 ** np.arange(1, 10, dtype=np.int64)
    ndig = 1 + (cnt[:, None] >= thresholds[None, :]).sum(1)
    D = int(ndig.max())
    pow10 = (10 ** np.arange(D - 1, -1, -1)).astype(np.int64)
    digits = ((cnt[:, None] // pow10) % 10 + ord("0")).astype(np.uint8)

    seg = k + 1 + ndig + 5  # KMER ' ' digits ' ' L ' ' R '\n'
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(seg, out=starts[1:])
    out = np.empty(int(starts[-1]), np.uint8)
    rs = starts[:-1]
    kcols = rs[:, None] + np.arange(k)
    out[kcols] = chars
    out[rs + k] = ord(" ")
    # digits: right-aligned in D, keep the last ndig
    total_d = int(ndig.sum())
    dt = np.repeat(rs + k + 1, ndig) + (
        np.arange(total_d) - np.repeat(np.concatenate([[0], np.cumsum(ndig)[:-1]]), ndig)
    )
    out[dt] = digits[np.arange(D) >= (D - ndig)[:, None]]
    base = rs + k + 1 + ndig
    out[base] = ord(" ")
    out[base + 1] = ext_lut[np.minimum(np.asarray(left), 7)]
    out[base + 2] = ord(" ")
    out[base + 3] = ext_lut[np.minimum(np.asarray(right), 7)]
    out[base + 4] = ord("\n")
    return out.tobytes()


@partial(jax.jit, static_argnames=("size",))
def _slice_range(arrs, start, width, size: int):
    """Take `size` rows at `start` from each array; rows outside
    [start, start+width) are sentinelized (all-ones words for arrs[0],
    zero fill for the rest). start is clamped so the dynamic slice stays
    in-bounds; the clamp offset is masked back out — static `size` keeps
    the compile shape set to ONE program for every (run, range) pair."""
    N = arrs[0].shape[0]
    start = jnp.asarray(start, jnp.int32)
    start_c = jnp.clip(start, 0, max(N - size, 0))
    delta = start - start_c
    idx = jnp.arange(size, dtype=jnp.int32)
    keep = (idx >= delta) & (idx < delta + jnp.asarray(width, jnp.int32))
    out = []
    for j, x in enumerate(arrs):
        sl = jax.lax.dynamic_slice_in_dim(x, start_c, size, axis=0)
        if j == 0:
            sl = jnp.where(keep[:, None], sl, jnp.uint32(0xFFFFFFFF))
        else:
            shape = (size,) + (1,) * (sl.ndim - 1)
            sl = jnp.where(keep.reshape(shape), sl, jnp.zeros((), sl.dtype))
        # valid rows must START at row 0: consumers validate rows [0, width)
        # (expand_singles' arange mask), but the clamp left them at `delta`
        sl = jnp.roll(sl, -delta, axis=0)
        out.append(sl)
    return tuple(out)


def _pad_part(x, P: int, sent):
    n = x.shape[0]
    if n >= P:
        return x
    fill = jnp.full((P - n,) + x.shape[1:], sent, x.dtype)
    return jnp.concatenate([x, fill])


@jax.jit
def _combine_pieces_purged(pieces):
    """Concatenate ranged-fold FinalTable pieces + one stable compaction."""
    w = jnp.concatenate([p[0] for p in pieces])
    keep = ~jnp.all(w == jnp.uint32(0xFFFFFFFF), axis=-1)
    pay = jnp.concatenate([
        C._pack_cnt_ext(p[1].astype(jnp.int32), p[2], p[3]) for p in pieces
    ])
    out = C._compact_keep(w, keep, (pay,))
    w_s, pay_s, n_kept = out[0], out[1], out[-1]
    cnt, left, right = C._unpack_cnt_ext(pay_s)
    return (w_s, cnt, left, right, n_kept)


@jax.jit
def _combine_pieces_agg(pieces):
    """Concatenate ranged-fold aggregate pieces (purge=False contract)."""
    w = jnp.concatenate([p[0] for p in pieces])
    keep = ~jnp.all(w == jnp.uint32(0xFFFFFFFF), axis=-1)
    pays = [C._pack_sums(p[1], p[2], p[3]) for p in pieces]
    pay5 = tuple(jnp.concatenate([p[i] for p in pays]) for i in range(5))
    out = C._compact_keep(w, keep, pay5)
    u_count, u_l4, u_r4 = C._unpack_sums(*out[1:-1])
    return (out[0], u_count, u_l4, u_r4, out[-1])


class KmerCountStore:
    """Accumulates k-mer count records for one shard of one k round.

    With compact_singles (default), runs are stored split into a multi part
    (count >= 2) and a ~4x-smaller compact singleton part, and are trimmed to
    their occupancy after every merge — the GQF singleton-filter analog
    (reference kcount-gpu/gqf.hpp:358-378; sizing kmer_dht.cpp:151).
    """

    def __init__(self, k: int, dmin_thres: int = 2, n_shards: int = 1,
                 compact_singles: bool = True, raw_lsm: bool | None = None,
                 raw_budget_bytes: int | None = None):
        self.k = k
        self.m = minimizer_len_for_k(k)
        self.dmin_thres = dmin_thres
        self.n_shards = n_shards
        self.compact_singles = compact_singles
        # deferred-dedup mode (ops.count raw-run section): blocks push ONE
        # sorted run each (no scan/split/occupancy sync); dedup runs once at
        # finalize over the merged run. Auto on-device (TPU), where the
        # Pallas bitonic merge makes late dedup nearly free. Layout: the
        # 7-bit payload folds into the key lanes' free bits where it fits
        # (k=21/33/55/99); k=63/77 carry it as a separate lane.
        if raw_lsm is None:
            raw_lsm = jax.default_backend() == "tpu"
        self.raw_lsm = raw_lsm
        self._raw_packed = C.payload_fits_in_keys(k, words32_for_k(k))
        if raw_budget_bytes is None:
            # the collapse's transient working set is ~7x the raw bytes it
            # folds (pow2-padded merge tree + the 7-lane scan/split over the
            # merged run), so the budget must be a small fraction of DEVICE
            # memory — sizing from HBM like the reference sizes its GPU
            # table from device memory (kcount_gpu.cpp:175-196). A 2 GiB
            # budget OOMed a 16 GiB v5e at arctic scale (27 Mbp, 2.16M
            # reads): 17 raw blocks collapsed into one ~270M-row split.
            from ..utils.memlog import get_free_device_mem_bytes

            # /64: the collapse transient (~7x) plus the split-LSM cascade
            # peak (~3x the two largest deduped runs) must fit alongside
            # resident runs and allocator fragmentation accumulated across
            # k rounds; W grows with k (k=33 rows are 1.5x k=21's), so the
            # margin must cover the widest round, not the first
            dev_free = get_free_device_mem_bytes()
            raw_budget_bytes = (
                min(2 << 30, max(128 << 20, dev_free // 64)) if dev_free
                else 2 << 30
            )
        self.raw_budget_bytes = raw_budget_bytes
        # cascade-merge row cap: the LSM's pairwise merge of two collapsed
        # runs is the measured arctic-scale HBM peak (each bitonic stage
        # holds ~2x the merged lanes transient, plus the dedup scan/split).
        # Merges above this bound are DEFERRED — the runs sit as siblings
        # until finalize's range-partitioned fold, whose peak is bounded by
        # key ranges regardless of total rows. Sized from device HBM like
        # the raw budget; the resident cost of deferral is the cross-run
        # key duplication, small at genomic coverage skews.
        W = words32_for_k(k)
        try:
            from ..utils.memlog import get_free_device_mem_bytes

            dev_free = get_free_device_mem_bytes()
        except Exception:
            dev_free = 0
        self.cascade_max_rows = (
            max(2_000_000, dev_free // (4 * (W + 5) * 40)) if dev_free
            else 12_000_000
        )
        self.raw_runs: list[tuple] = []  # sorted packed lanes per block
        # plain: (words, count, l4, r4, n_unique)
        # split: (m_words, m_count, m_l4, m_r4, n_m, s_words, s_ext, n_s)
        self.runs: list[tuple] = []
        self.ctg_runs: list[tuple] = []
        self._pending = None  # last pushed (run, occupancy) awaiting its trim

    # -- read pass ---------------------------------------------------------

    def add_reads_block(self, codes, qual_ok, lens):
        """Count one block of reads (codes (B,L) u8, qual_ok (B,L) bool).

        Pipelined with a one-block lag: each push is ONE fused dispatch whose
        occupancy fetch is DEFERRED until the next block's dispatch has been
        enqueued — the fetch then waits only on work already completed
        server-side (over a remote-tunnel TPU a host sync costs a ~30 ms
        round-trip plus a pipeline stall). Runs always enter the LSM trimmed
        to occupancy, so merges never sort capacity padding (untrimmed
        merges measured ~2x slower end-to-end at 65k-read blocks).
        """
        if self.raw_lsm:
            fn = C.block_to_raw_run if self._raw_packed else C.block_to_raw_run_sep
            run = fn(
                jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens), self.k
            )
            self.raw_runs.append(run)
            if self._raw_bytes() > self.raw_budget_bytes:
                self._collapse_raw()
            return
        if self.compact_singles:
            run, ns = C.block_to_split_run(
                jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens),
                self.k, self.m,
            )
            self._flush_pending()
            self._pending = (run, ns)
            return
        rec = C.read_kmer_records(
            jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens), self.k, self.m
        )
        agg = C.aggregate_records(rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"])
        self._push_run(self.runs, agg, C.merge_aggregates)

    def _flush_pending(self):
        if self._pending is None:
            return
        run, ns = self._pending
        self._pending = None
        h = np.asarray(jax.device_get(ns))
        self._push_split_run(self._trim(run, int(h[0]), int(h[1])))

    @staticmethod
    def _push_run(runs, agg, merge_fn):
        """LSM merge: keep runs geometrically sized to bound total sorts."""
        runs.append(agg)
        while len(runs) >= 2 and runs[-1][0].shape[0] >= runs[-2][0].shape[0] // 2:
            b = runs.pop()
            a = runs.pop()
            runs.append(merge_fn(*a[:4], *b[:4]))

    # -- split-run (singleton-filtered) LSM ---------------------------------

    @staticmethod
    def _trim(run, n_m: int, n_s: int):
        """Trim a split run to pow2 occupancy (host sizes already fetched)."""
        m_w, m_c, m_l4, m_r4, nm, s_w, s_e, ns = run
        pm = min(C.trim_rows(n_m), m_w.shape[0])
        ps = min(C.trim_rows(n_s), s_w.shape[0])
        return (m_w[:pm], m_c[:pm], m_l4[:pm], m_r4[:pm], nm,
                s_w[:ps], s_e[:ps], ns)

    @staticmethod
    def _split_rows(run) -> int:
        return run[0].shape[0] + run[5].shape[0]

    def _merge_split(self, a, b):
        # donated: a and b are popped from the LSM before this call, so
        # their buffers can alias the merge temporaries (the cascade merge
        # of two collapsed runs is the arctic-scale HBM peak)
        run = C.merge_split4_donated(
            a[:4], C.expand_singles(a[5], a[6], a[7]),
            b[:4], C.expand_singles(b[5], b[6], b[7]),
        )
        # merges are off the hot push path (O(log) per round), so the
        # occupancy fetch here is immediate; keeping every LSM run trimmed
        # beats the round-trip it costs
        ns = np.asarray(jax.device_get(jnp.stack([run[4], run[7]])))
        return self._trim(run, int(ns[0]), int(ns[1]))

    def _push_split_run(self, run):
        self.runs.append(run)
        while (
            len(self.runs) >= 2
            and self._split_rows(self.runs[-1]) >= self._split_rows(self.runs[-2]) // 2
            and (self._split_rows(self.runs[-1]) + self._split_rows(self.runs[-2])
                 <= self.cascade_max_rows)
        ):
            b = self.runs.pop()
            a = self.runs.pop()
            self.runs.append(self._merge_split(a, b))

    def _raw_bytes(self) -> int:
        return sum(sum(x.nbytes for x in run) for run in self.raw_runs)

    def _collapse_raw(self, cascade: bool = True):
        """Fold the outstanding raw runs into ONE deduped split run pushed to
        the classic LSM (the raw byte budget's overflow valve: past it, the
        singleton-filtered deduped format is the memory-safe representation,
        reference GQF sizing rationale kmer_dht.cpp:151). cascade=False
        appends without LSM tail merges — finalize's ranged fold is about to
        merge everything anyway, and a cascade merge at finalize time is the
        measured arctic-scale HBM peak."""
        if not self.raw_runs:
            return
        W = words32_for_k(self.k)
        if self._raw_packed:
            merged = C.merge_raw_runs(self.raw_runs, donate=True)
            run = C.split_from_sorted_packed_donated(merged, self.k, W)
        else:
            merged = C.merge_raw_runs(
                self.raw_runs, kw=len(self.raw_runs[0]) - 1, donate=True
            )
            run = C.split_from_sorted_sep_donated(merged, self.k, W)
        self.raw_runs = []
        ns = np.asarray(jax.device_get(jnp.stack([run[4], run[7]])))
        if self.compact_singles:
            trimmed = self._trim(run, int(ns[0]), int(ns[1]))
            if cascade:
                self._push_split_run(trimmed)
            else:
                self.runs.append(trimmed)
        else:
            # the plain-format LSM cannot hold a SPLIT (8-tuple) run: fold
            # the singleton sideband back into full format before pushing
            # (finalize's plain branch merges a[:4] only and would silently
            # drop the sideband)
            agg = C.merge_aggregates(
                *run[:4], *C.expand_singles(run[5], run[6], run[7])
            )
            self._push_run(self.runs, agg, C.merge_aggregates)

    def resident_run_bytes(self) -> int:
        """Device bytes held by the read-pass runs (memory observability)."""
        self._flush_pending()
        return self._raw_bytes() + sum(
            sum(x.nbytes for x in run if hasattr(x, "nbytes")) for run in self.runs
        )

    # -- contig pass (rounds >= 2) ----------------------------------------

    def add_ctgs_block(self, codes, lens, depths):
        """Add contig k-mers with per-contig depth (reference kcount.cpp:100-138).

        Pushed runs are TRIMMED to occupancy then padded to pow2 rows
        (sentinel tails): the aggregate's arrays keep the full block-cell
        length, which at arctic scale (34k short contigs in fixed-shape
        blocks) is ~10x the live rows — untrimmed runs totalled ~270M rows
        across the ctg LSM and OOMed the k=33 finalize. The pow2 pad bounds
        the cascade's compile shapes as before; the occupancy fetch is off
        the hot path (one scalar per ctg block)."""
        qual_ok = jnp.ones_like(jnp.asarray(codes), bool)
        rec = C.read_kmer_records(
            jnp.asarray(codes), qual_ok, jnp.asarray(lens), self.k, self.m,
            depth=jnp.asarray(depths),
        )
        agg = _aggregate_ctg_records(rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"])
        n = int(jax.device_get(agg[4]))
        P = min(C.trim_rows(n), agg[0].shape[0])
        agg = tuple(x[:P] for x in agg[:4]) + (agg[4],)
        self._push_run(self.ctg_runs, _pad_ctg_pow2(agg), _merge_ctg_padded)

    # -- finalize ----------------------------------------------------------

    def _merged_reads(self):
        if self.compact_singles:
            self._flush_pending()
            while len(self.runs) > 1:
                b = self.runs.pop()
                a = self.runs.pop()
                self.runs.append(self._merge_split(a, b))
            if self.runs:
                a = self.runs[0]
                # final: fold the singleton sideband back into full format
                return C.merge_aggregates(*a[:4], *C.expand_singles(a[5], a[6], a[7]))
        else:
            while len(self.runs) > 1:
                b = self.runs.pop()
                a = self.runs.pop()
                self.runs.append(C.merge_aggregates(*a[:4], *b[:4]))
            if self.runs:
                return self.runs[0]
        W = words32_for_k(self.k)
        z = jnp.full((1, W), 0xFFFFFFFF, jnp.uint32)
        return (z, jnp.zeros((1,), jnp.int32), jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32), jnp.int32(0))

    def _merged_ctgs(self):
        while len(self.ctg_runs) > 1:
            b = self.ctg_runs.pop()
            a = self.ctg_runs.pop()
            self.ctg_runs.append(_merge_ctg_padded(*a[:4], *b[:4]))
        return self.ctg_runs[0] if self.ctg_runs else None

    # finalize folds in key ranges above this many total rows: the
    # monolithic fold of ~50M partially-deduped rows (expanded singles +
    # pow2-padded merge tree + scan + compaction) exceeded the 14 GiB
    # usable HBM of a v5e at arctic scale (27 Mbp, k=33)
    RANGED_FOLD_MIN_ROWS = 24_000_000
    # per-range row target: the actual per-range working set is
    # R * (pow2(max range width) + pow2(max single width)) — skewed cuts
    # inflate every run's slice to the global max, so the target carries
    # ~2-3x headroom below what naively fits
    RANGED_FOLD_TARGET_ROWS = 6_000_000

    def _final_fold_ranged(self, purge: bool):
        """Range-partitioned final fold over the sorted split runs.

        Every run part is lexsorted, so splitting the key space at word0
        thresholds (quantile edges measured from the actual key
        distribution — canonical k-mers skew low) puts every key's
        occurrences in exactly one range; each range folds independently at
        ~1/Q the peak, through ONE compiled program (static pow2 slice
        sizes), and the pieces concatenate in key order + one stable
        compaction. Same contract as ops.count.final_fold_runs.
        """
        runs = self.runs
        parts = []
        w0_samples = []
        for r in runs:
            m_w0, s_w0, nm, ns_ = jax.device_get(
                (r[0][:, 0], r[5][:, 0], r[4], r[7])
            )
            nm, ns_ = int(nm), int(ns_)
            parts.append((np.asarray(m_w0), nm, np.asarray(s_w0), ns_))
            w0_samples.append(np.asarray(m_w0)[:nm])
            w0_samples.append(np.asarray(s_w0)[:ns_])
        w0_all = np.concatenate(w0_samples) if w0_samples else np.zeros(1, np.uint32)
        total = int(w0_all.size)
        Q = max(2, -(-total // self.RANGED_FOLD_TARGET_ROWS))
        edges = np.quantile(w0_all, np.arange(1, Q) / Q).astype(np.uint64)
        edges = np.minimum(edges, 0xFFFFFFFF).astype(np.uint32)
        cuts = []
        wm_max = ws_max = 1
        for m_w0, nm, s_w0, ns_ in parts:
            mc = np.concatenate([[0], np.searchsorted(m_w0[:nm], edges, "left"), [nm]])
            sc = np.concatenate([[0], np.searchsorted(s_w0[:ns_], edges, "left"), [ns_]])
            cuts.append((mc.astype(np.int64), sc.astype(np.int64)))
            wm_max = max(wm_max, int(np.max(np.diff(mc))))
            ws_max = max(ws_max, int(np.max(np.diff(sc))))
        Sm = 1 << max(8, (wm_max - 1).bit_length())
        Ss = 1 << max(8, (ws_max - 1).bit_length())
        padded = []
        for r in runs:
            padded.append((
                _pad_part(r[0], Sm, 0xFFFFFFFF), _pad_part(r[1], Sm, 0),
                _pad_part(r[2], Sm, 0), _pad_part(r[3], Sm, 0),
                _pad_part(r[5], Ss, 0xFFFFFFFF), _pad_part(r[6], Ss, 0),
            ))
        self.runs = []
        pieces = []
        for q in range(Q):
            range_runs = []
            for (mw, mc_, ml4, mr4, sw, sext), (mcut, scut) in zip(padded, cuts):
                wm = int(mcut[q + 1] - mcut[q])
                ws = int(scut[q + 1] - scut[q])
                m_sl = _slice_range((mw, mc_, ml4, mr4), int(mcut[q]), wm, Sm)
                s_sl = _slice_range((sw, sext), int(scut[q]), ws, Ss)
                range_runs.append(
                    m_sl + (jnp.int32(wm),) + s_sl + (jnp.int32(ws),)
                )
            piece = C.final_fold_runs(
                tuple(range_runs), dmin_thres=self.dmin_thres, purge=purge
            )
            # fence: serialize ranges so only one range's transients live.
            # The fetched occupancy also TRIMS the piece: final_fold_runs
            # returns arrays at its full padded input length (R*(Sm+Ss)
            # rows), and Q accumulated untrimmed pieces held ~Q x the data
            # — the arctic k=21 finalize OOMed exactly here. Kept rows are
            # a dense sorted prefix, so a half-octave slice loses nothing.
            n_live = int(jax.device_get(piece[-1]))
            P = min(C.trim_rows(n_live), piece[0].shape[0])
            pieces.append(tuple(x[:P] for x in piece[:4]))
        del padded
        # pieces are in key order; concatenate + one stable compaction
        # (jitted: per-op dispatch over the tunnel costs an RTT each)
        if purge:
            return _combine_pieces_purged(tuple(p[:4] for p in pieces))
        return _combine_pieces_agg(tuple(p[:4] for p in pieces))

    def _apply_ctg_rules_ranged(self, r, c):
        """Range-partitioned ctg-rule application + finalize.

        The monolithic _apply_ctg_rules sorts (reads + ctgs) rows over ~10
        lanes — at arctic k=33 (40M + 30M rows) the program alone needs
        >14 GiB and fails HBM compile. Both inputs are lexsorted, so the
        same key-range partitioning as _final_fold_ranged applies: each
        range's rules + purge/finalize run independently at ~1/Q the peak,
        pieces are occupancy-trimmed at the per-range fence, and the final
        table is one concatenation + stable compaction. Below the ranged
        threshold the monolithic path is used unchanged."""
        r_n, c_n = jax.device_get((r[4], c[4]))
        rn, cn = int(r_n), int(c_n)
        total = rn + cn
        if total <= self.RANGED_FOLD_MIN_ROWS:
            merged = _apply_ctg_rules(*r, *c, self.dmin_thres)
            return C.finalize_table(*merged, dmin_thres=self.dmin_thres)
        rw0 = np.asarray(jax.device_get(r[0][: max(rn, 1), 0]))[:rn]
        cw0 = np.asarray(jax.device_get(c[0][: max(cn, 1), 0]))[:cn]
        w0_all = np.concatenate([rw0, cw0]) if total else np.zeros(1, np.uint32)
        Q = max(2, -(-total // self.RANGED_FOLD_TARGET_ROWS))
        edges = np.quantile(w0_all, np.arange(1, Q) / Q).astype(np.uint64)
        edges = np.minimum(edges, 0xFFFFFFFF).astype(np.uint32)
        rcut = np.concatenate([[0], np.searchsorted(rw0, edges, "left"), [rn]]).astype(np.int64)
        ccut = np.concatenate([[0], np.searchsorted(cw0, edges, "left"), [cn]]).astype(np.int64)
        Sr = 1 << max(8, (max(int(np.max(np.diff(rcut))), 1) - 1).bit_length())
        Sc = 1 << max(8, (max(int(np.max(np.diff(ccut))), 1) - 1).bit_length())
        rp = (_pad_part(r[0], Sr, 0xFFFFFFFF), _pad_part(r[1], Sr, 0),
              _pad_part(r[2], Sr, 0), _pad_part(r[3], Sr, 0))
        cp = (_pad_part(c[0], Sc, 0xFFFFFFFF), _pad_part(c[1], Sc, 0),
              _pad_part(c[2], Sc, 0), _pad_part(c[3], Sc, 0))
        pieces = []
        for q in range(Q):
            wr = int(rcut[q + 1] - rcut[q])
            wc = int(ccut[q + 1] - ccut[q])
            r_sl = _slice_range(rp, int(rcut[q]), wr, Sr)
            c_sl = _slice_range(cp, int(ccut[q]), wc, Sc)
            piece = _ctg_rules_finalize_piece(
                r_sl, jnp.int32(wr), c_sl, jnp.int32(wc), self.dmin_thres
            )
            # fence + occupancy trim (see _final_fold_ranged)
            n_live = int(jax.device_get(piece[-1]))
            P = min(C.trim_rows(n_live), piece[0].shape[0])
            pieces.append(tuple(x[:P] for x in piece[:4]))
        return _combine_pieces_purged(tuple(pieces))

    def finalize(self) -> FinalTable:
        # the READ side folds FIRST: its resident sibling runs (deferred
        # cascades — ~17 at arctic k>=33, several GB at W=3) are freed by
        # the fold before the ctg merge cascade allocates its transients
        # (merging ctgs first OOMed k=33 on a 16 GiB chip). has_ctg decides
        # purge up front; _merged_ctgs() runs after the read fold.
        has_ctg = bool(self.ctg_runs)
        if self.raw_runs:
            if self.runs or self._pending is not None:
                # mixed (budget collapse happened): fold the raw remainder
                # into the split LSM and fall through to the classic path
                # (no cascade merge: the fold below consumes all runs)
                self._collapse_raw(cascade=False)
            else:
                W = words32_for_k(self.k)
                if self._raw_packed:
                    merged = C.merge_raw_runs(self.raw_runs, donate=True)
                    final_fn = C.final_from_sorted_packed_donated
                else:
                    merged = C.merge_raw_runs(
                        self.raw_runs, kw=len(self.raw_runs[0]) - 1, donate=True
                    )
                    final_fn = C.final_from_sorted_sep_donated
                self.raw_runs = []
                if not has_ctg:
                    out = final_fn(
                        merged, self.k, W, dmin_thres=self.dmin_thres, purge=True
                    )
                    return FinalTable(self.k, *out)
                agg = final_fn(
                    merged, self.k, W, dmin_thres=self.dmin_thres, purge=False
                )
                return FinalTable(self.k, *self._apply_ctg_rules_ranged(
                    agg, self._merged_ctgs()))
        if self.compact_singles:
            # fused path: ONE dispatch folds every outstanding split run into
            # the final table (see ops.count.final_fold_runs) — the unfused
            # cascade pays two extra full-array compactions, one redundant
            # bitonic merge, and two occupancy round-trips
            if self._pending is not None:
                # trim + append WITHOUT the LSM cascade: the fused fold is
                # about to merge everything anyway, and a cascade merge here
                # would cost its own occupancy round-trip + compaction
                run, ns = self._pending
                self._pending = None
                h = np.asarray(jax.device_get(ns))
                self.runs.append(self._trim(run, int(h[0]), int(h[1])))
            if self.runs:
                total_rows = sum(r[0].shape[0] + r[5].shape[0] for r in self.runs)
                ranged = total_rows > self.RANGED_FOLD_MIN_ROWS
                if not has_ctg:
                    if ranged:
                        out = self._final_fold_ranged(purge=True)
                    else:
                        out = C.final_fold_runs_donated(
                            tuple(self.runs), dmin_thres=self.dmin_thres, purge=True
                        )
                    self.runs = []
                    return FinalTable(self.k, *out)
                if ranged:
                    merged = self._final_fold_ranged(purge=False)
                else:
                    merged = C.final_fold_runs_donated(
                        tuple(self.runs), dmin_thres=self.dmin_thres, purge=False
                    )
                self.runs = []
                return FinalTable(self.k, *self._apply_ctg_rules_ranged(
                    merged, self._merged_ctgs()))
        r = self._merged_reads()
        if has_ctg:
            return FinalTable(self.k, *self._apply_ctg_rules_ranged(
                r, self._merged_ctgs()))
        words, cnt, left, right, n = C.finalize_table(*r, dmin_thres=self.dmin_thres)
        return FinalTable(self.k, words, cnt, left, right, n)


# ---------------------------------------------------------------------------
# contig-kmer aggregation: track (min pair, max pair, min depth) per kmer
# ---------------------------------------------------------------------------


def _pad_ctg_pow2(agg):
    """Pad a deduped ctg run to pow2 rows with sentinel tails.

    Keeps every run in the ctg LSM at a pow2 size, so cascade merges only
    ever see (2^a, 2^b) operand shapes — a handful of compiles instead of
    one per concatenation size (each a ~minute over the remote tunnel)."""
    w, pmin, pmax, dmin, n = agg
    N = w.shape[0]
    P = 1 << max(8, (N - 1).bit_length())
    if P == N:
        return agg
    pad = P - N
    w = jnp.concatenate([w, jnp.full((pad, w.shape[1]), 0xFFFFFFFF, jnp.uint32)])
    z = jnp.zeros((pad,), pmin.dtype)
    return (w, jnp.concatenate([pmin, z]), jnp.concatenate([pmax, z]),
            jnp.concatenate([dmin, z]), n)


def _merge_ctg_padded(*args):
    return _pad_ctg_pow2(_merge_ctg_aggregates(*args))


def _pack_ctg(pmin, pmax, dmin):
    """pmin | pmax << 6 | dmin << 16 in one u32 lane (pairs are 0..45)."""
    return (
        pmin.astype(jnp.uint32)
        | (pmax.astype(jnp.uint32) << jnp.uint32(6))
        | (jnp.clip(dmin, 0, MAX_KMER_COUNT).astype(jnp.uint32) << jnp.uint32(16))
    )


def _unpack_ctg(p):
    return (
        (p & jnp.uint32(0x3F)).astype(jnp.int32),
        ((p >> jnp.uint32(6)) & jnp.uint32(0x3F)).astype(jnp.int32),
        (p >> jnp.uint32(16)).astype(jnp.int32),
    )


def _ctg_flag_compact(w, keep, packed):
    """Stable 1-key flag sort compacting kept rows (gather/scatter-free)."""
    W = w.shape[-1]
    flag = jnp.where(keep, jnp.uint32(0), jnp.uint32(1))
    out = jax.lax.sort(
        (flag,) + tuple(w[:, i] for i in range(W)) + (packed,),
        num_keys=1, is_stable=True,
    )
    live = out[0] == 0
    u_words = jnp.where(
        live[:, None], jnp.stack(out[1 : 1 + W], axis=-1), jnp.uint32(0xFFFFFFFF)
    )
    pmin, pmax, dmin = _unpack_ctg(jnp.where(live, out[1 + W], jnp.uint32(0)))
    return u_words, pmin, pmax, dmin, jnp.sum(keep).astype(jnp.int32)


@jax.jit
def _aggregate_ctg_records(words, left, right, count, valid):
    """Dedup ctg records into (words, pair_min, pair_max, depth_min, n).

    Gather/scatter-free (the TPU anti-pattern — see ops.count._sort_carry):
    one variadic sort carries a packed (pair | depth << 8) lane, segmented
    min/max run as log-doubling shifted reduces over the group-id lane, and
    compaction is one stable flag sort.
    """
    w = C._sentinelize(words, valid)
    pair = left.astype(jnp.int32) * 8 + right.astype(jnp.int32)
    depth = jnp.clip(count.astype(jnp.int32), 0, MAX_KMER_COUNT)
    packed = pair.astype(jnp.uint32) | (depth.astype(jnp.uint32) << jnp.uint32(8))
    W = w.shape[-1]
    out = jax.lax.sort(
        tuple(w[:, i] for i in range(W)) + (packed,), num_keys=W, is_stable=True
    )
    w = jnp.stack(out[:W], axis=-1)
    pair_v = (out[W] & jnp.uint32(0xFF)).astype(jnp.int32)
    depth_v = (out[W] >> jnp.uint32(8)).astype(jnp.int32)
    N = w.shape[0]
    neq = jnp.any(w[1:] != w[:-1], axis=-1)
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_last = jnp.concatenate([neq, jnp.ones((1,), bool)])
    gid = jnp.cumsum(is_start.astype(jnp.int32))
    pmin, pmax, dmin = pair_v, pair_v, depth_v
    d = 1
    while d < N:
        same = jnp.concatenate([jnp.zeros((d,), bool), gid[d:] == gid[:-d]])
        sh = lambda x: jnp.concatenate([x[:d], x[:-d]])
        pmin = jnp.where(same, jnp.minimum(pmin, sh(pmin)), pmin)
        pmax = jnp.where(same, jnp.maximum(pmax, sh(pmax)), pmax)
        dmin = jnp.where(same, jnp.minimum(dmin, sh(dmin)), dmin)
        d *= 2
    keep = is_last & ~jnp.all(w == jnp.uint32(0xFFFFFFFF), axis=-1)
    return _ctg_flag_compact(w, keep, _pack_ctg(pmin, pmax, dmin))


@jax.jit
def _merge_ctg_aggregates(a_w, a_pmin, a_pmax, a_dmin, b_w, b_pmin, b_pmax, b_dmin):
    """Merge two deduped ctg runs: key multiplicity <= 2, so the segmented
    min/max needs only the distance-1 shifted reduce."""
    w = jnp.concatenate([a_w, b_w])
    packed = jnp.concatenate(
        [_pack_ctg(a_pmin, a_pmax, a_dmin), _pack_ctg(b_pmin, b_pmax, b_dmin)]
    )
    W = w.shape[-1]
    out = jax.lax.sort(
        tuple(w[:, i] for i in range(W)) + (packed,), num_keys=W, is_stable=True
    )
    w = jnp.stack(out[:W], axis=-1)
    pmin, pmax, dmin = _unpack_ctg(out[W])
    neq = jnp.any(w[1:] != w[:-1], axis=-1)
    same = jnp.concatenate([jnp.zeros((1,), bool), ~neq])
    is_last = jnp.concatenate([neq, jnp.ones((1,), bool)])
    sh = lambda x: jnp.concatenate([x[:1], x[:-1]])
    pmin = jnp.where(same, jnp.minimum(pmin, sh(pmin)), pmin)
    pmax = jnp.where(same, jnp.maximum(pmax, sh(pmax)), pmax)
    dmin = jnp.where(same, jnp.minimum(dmin, sh(dmin)), dmin)
    keep = is_last & ~jnp.all(w == jnp.uint32(0xFFFFFFFF), axis=-1)
    return _ctg_flag_compact(w, keep, _pack_ctg(pmin, pmax, dmin))


@partial(jax.jit, static_argnames=("dmin_thres",))
def _ctg_rules_finalize_piece(r_sl, r_n, c_sl, c_n, dmin_thres: int):
    """One key range's ctg-rule application + purge/finalize, fused in a
    single dispatch (see KmerCountStore._apply_ctg_rules_ranged)."""
    merged = _apply_ctg_rules(*r_sl, r_n, *c_sl, c_n, dmin_thres)
    return C.finalize_table(*merged, dmin_thres=dmin_thres)


@partial(jax.jit, static_argnames=("dmin_thres",))
def _apply_ctg_rules(
    r_words, r_count, r_l4, r_r4, r_n,
    c_words, c_pmin, c_pmax, c_dmin, c_n,
    dmin_thres: int,
):
    """Merge the read table with the deterministic ctg-kmer resolution.

    Reference semantics (kcount_cpu.cpp:357-406): a read-table UU kmer with
    count >= 2 wins over ctg kmers; otherwise the ctg entry replaces it with
    count = min depth over agreeing occurrences, or 0 on ext disagreement.
    """
    # resolve ctg entries
    conflict = c_pmin != c_pmax
    c_count = jnp.where(conflict, 0, jnp.clip(c_dmin, 0, MAX_KMER_COUNT)).astype(jnp.int32)
    c_left = jnp.where(conflict, jnp.int32(EXT_X), c_pmin // 8).astype(jnp.uint8)
    c_right = jnp.where(conflict, jnp.int32(EXT_X), c_pmin % 8).astype(jnp.uint8)
    c_valid = jnp.arange(c_words.shape[0]) < c_n
    oh = lambda e, cnt: (e[:, None] == jnp.arange(4, dtype=jnp.int32)[None, :].astype(e.dtype)).astype(jnp.int32) * cnt[:, None]
    c_l4 = oh(c_left, c_count)
    c_r4 = oh(c_right, c_count)

    # read-entry survival: UU with clamped count >= 2
    rc = jnp.minimum(r_count.astype(I64), I64(MAX_KMER_COUNT))
    r_lcall = C._get_ext_calls(jnp.minimum(r_l4, I64(MAX_KMER_COUNT)), rc, dmin_thres)
    r_rcall = C._get_ext_calls(jnp.minimum(r_r4, I64(MAX_KMER_COUNT)), rc, dmin_thres)
    r_valid = jnp.arange(r_words.shape[0]) < r_n
    r_keep = r_valid & (rc >= 2) & (r_lcall < 4) & (r_rcall < 4)

    # merge: concat with source flags, variadic sort carrying packed lanes
    # (gather/scatter-free; each key occurs at most once per source, so the
    # group combine needs only the distance-1 shifted neighbor)
    words = jnp.concatenate([C._sentinelize(r_words, r_valid), C._sentinelize(c_words, c_valid)])
    count = jnp.concatenate([r_count.astype(jnp.int32), c_count])
    l4 = jnp.concatenate([r_l4.astype(jnp.int32), c_l4])
    r4 = jnp.concatenate([r_r4.astype(jnp.int32), c_r4])
    is_read = jnp.concatenate([r_valid, jnp.zeros_like(c_valid)])
    keep_read = jnp.concatenate([r_keep, jnp.zeros_like(c_valid)])
    is_ctg = jnp.concatenate([jnp.zeros_like(r_valid), c_valid])
    flags = (
        is_read.astype(jnp.uint32)
        | (keep_read.astype(jnp.uint32) << jnp.uint32(1))
        | (is_ctg.astype(jnp.uint32) << jnp.uint32(2))
    )

    W = words.shape[-1]
    pay = C._pack_sums(count, l4, r4)
    out = jax.lax.sort(
        tuple(words[:, i] for i in range(W)) + (flags,) + pay,
        num_keys=W, is_stable=True,
    )
    words = jnp.stack(out[:W], axis=-1)
    flags = out[W]
    count, l4, r4 = C._unpack_sums(*out[W + 1 :])
    is_read = (flags & jnp.uint32(1)).astype(bool)
    keep_read = ((flags >> jnp.uint32(1)) & jnp.uint32(1)).astype(bool)
    is_ctg = ((flags >> jnp.uint32(2)) & jnp.uint32(1)).astype(bool)

    neq = jnp.any(words[1:] != words[:-1], axis=-1)
    same_prev = jnp.concatenate([jnp.zeros((1,), bool), ~neq])
    is_last = jnp.concatenate([neq, jnp.ones((1,), bool)])
    sh = lambda x: jnp.concatenate([x[:1], x[:-1]])
    nb = lambda m: same_prev & sh(m)
    # group flags as seen from the group's LAST row (group size <= 2)
    g_has_read = is_read | nb(is_read)
    g_keep_read = keep_read | nb(keep_read)
    g_has_ctg = is_ctg | nb(is_ctg)
    use_read = g_has_read & (g_keep_read | ~g_has_ctg)
    own_sel = (is_read & use_read) | (is_ctg & ~use_read)
    prev_sel = (nb(is_read) & use_read) | (nb(is_ctg) & ~use_read)
    add = lambda x, sel_o, sel_p: (
        jnp.where(sel_o, x, 0) + jnp.where(sel_p, sh(x), 0)
    )
    g_count = jnp.minimum(add(count, own_sel, prev_sel), MAX_KMER_COUNT)
    g_l4 = jnp.minimum(add(l4, own_sel[:, None], prev_sel[:, None]), MAX_KMER_COUNT)
    g_r4 = jnp.minimum(add(r4, own_sel[:, None], prev_sel[:, None]), MAX_KMER_COUNT)

    keep = is_last & ~jnp.all(words == jnp.uint32(0xFFFFFFFF), axis=-1)
    packed = C._pack_sums(g_count, g_l4, g_r4)
    flag = jnp.where(keep, jnp.uint32(0), jnp.uint32(1))
    out = jax.lax.sort(
        (flag,) + tuple(words[:, w] for w in range(W)) + packed,
        num_keys=1, is_stable=True,
    )
    live = out[0] == 0
    u_words = jnp.where(
        live[:, None], jnp.stack(out[1 : 1 + W], axis=-1), jnp.uint32(0xFFFFFFFF)
    )
    u_count, u_l4, u_r4 = C._unpack_sums(*out[1 + W :])
    z = live.astype(jnp.int32)
    n_unique = jnp.sum(keep).astype(jnp.int32)
    return u_words, u_count * z, u_l4 * z[:, None], u_r4 * z[:, None], n_unique
