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
        """Write 'KMER count L R' lines gzipped (reference kmer_dht.cpp:238-266)."""
        import gzip

        with gzip.open(fname, "wt") as f:
            for km, (c, l, r) in sorted(self.to_host_dict().items()):
                f.write(f"{km} {c} {l} {r}\n")

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


class KmerCountStore:
    """Accumulates k-mer count records for one shard of one k round.

    With compact_singles (default), runs are stored split into a multi part
    (count >= 2) and a ~4x-smaller compact singleton part, and are trimmed to
    their occupancy after every merge — the GQF singleton-filter analog
    (reference kcount-gpu/gqf.hpp:358-378; sizing kmer_dht.cpp:151).
    """

    def __init__(self, k: int, dmin_thres: int = 2, n_shards: int = 1,
                 compact_singles: bool = True):
        self.k = k
        self.m = minimizer_len_for_k(k)
        self.dmin_thres = dmin_thres
        self.n_shards = n_shards
        self.compact_singles = compact_singles
        # plain: (words, count, l4, r4, n_unique)
        # split: (m_words, m_count, m_l4, m_r4, n_m, s_words, s_ext, n_s)
        self.runs: list[tuple] = []
        self.ctg_runs: list[tuple] = []

    # -- read pass ---------------------------------------------------------

    def add_reads_block(self, codes, qual_ok, lens):
        """Count one block of reads (codes (B,L) u8, qual_ok (B,L) bool)."""
        rec = C.read_kmer_records(
            jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens), self.k, self.m
        )
        agg = C.aggregate_records(rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"])
        if self.compact_singles:
            self._push_split_run(self._split_trim(agg))
        else:
            self._push_run(self.runs, agg, C.merge_aggregates)

    @staticmethod
    def _push_run(runs, agg, merge_fn):
        """LSM merge: keep runs geometrically sized to bound total sorts."""
        runs.append(agg)
        while len(runs) >= 2 and runs[-1][0].shape[0] >= runs[-2][0].shape[0] // 2:
            b = runs.pop()
            a = runs.pop()
            runs.append(merge_fn(*a[:4], *b[:4]))

    # -- split-run (singleton-filtered) LSM ---------------------------------

    def _split_trim(self, agg):
        """Split an aggregate into (multi, singles) and trim to occupancy."""
        m_w, m_c, m_l4, m_r4, n_m, s_w, s_e, n_s = C.split_run(*agg)
        pm = min(C.pow2_rows(int(n_m)), m_w.shape[0])
        ps = min(C.pow2_rows(int(n_s)), s_w.shape[0])
        return (m_w[:pm], m_c[:pm], m_l4[:pm], m_r4[:pm], n_m,
                s_w[:ps], s_e[:ps], n_s)

    @staticmethod
    def _split_rows(run) -> int:
        return run[0].shape[0] + run[5].shape[0]

    def _merge_split(self, a, b):
        merged = C.merge_aggregates4(
            a[:4], C.expand_singles(a[5], a[6], a[7]),
            b[:4], C.expand_singles(b[5], b[6], b[7]),
        )
        return self._split_trim(merged)

    def _push_split_run(self, run):
        self.runs.append(run)
        while (
            len(self.runs) >= 2
            and self._split_rows(self.runs[-1]) >= self._split_rows(self.runs[-2]) // 2
        ):
            b = self.runs.pop()
            a = self.runs.pop()
            self.runs.append(self._merge_split(a, b))

    def resident_run_bytes(self) -> int:
        """Device bytes held by the read-pass runs (memory observability)."""
        return sum(sum(x.nbytes for x in run if hasattr(x, "nbytes")) for run in self.runs)

    # -- contig pass (rounds >= 2) ----------------------------------------

    def add_ctgs_block(self, codes, lens, depths):
        """Add contig k-mers with per-contig depth (reference kcount.cpp:100-138)."""
        qual_ok = jnp.ones_like(jnp.asarray(codes), bool)
        rec = C.read_kmer_records(
            jnp.asarray(codes), qual_ok, jnp.asarray(lens), self.k, self.m,
            depth=jnp.asarray(depths),
        )
        agg = _aggregate_ctg_records(rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"])
        self._push_run(self.ctg_runs, agg, _merge_ctg_aggregates)

    # -- finalize ----------------------------------------------------------

    def _merged_reads(self):
        if self.compact_singles:
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
            self.ctg_runs.append(_merge_ctg_aggregates(*a[:4], *b[:4]))
        return self.ctg_runs[0] if self.ctg_runs else None

    def finalize(self) -> FinalTable:
        r = self._merged_reads()
        c = self._merged_ctgs()
        if c is not None:
            merged = _apply_ctg_rules(*r, *c, self.dmin_thres)
        else:
            merged = r
        words, cnt, left, right, n = C.finalize_table(*merged, dmin_thres=self.dmin_thres)
        return FinalTable(self.k, words, cnt, left, right, n)


# ---------------------------------------------------------------------------
# contig-kmer aggregation: track (min pair, max pair, min depth) per kmer
# ---------------------------------------------------------------------------


@jax.jit
def _aggregate_ctg_records(words, left, right, count, valid):
    """Dedup ctg records into (words, pair_min, pair_max, depth_min, n)."""
    w = C._sentinelize(words, valid)
    pair = (left.astype(jnp.int32) * 8 + right.astype(jnp.int32)).astype(jnp.int32)
    big = jnp.int32(1 << 30)
    pair_v = jnp.where(valid, pair, big)
    depth_v = jnp.where(valid, count.astype(jnp.int32), big)
    W = w.shape[-1]
    keys = tuple(w[:, i] for i in range(W - 1, -1, -1))
    order = jnp.lexsort(keys)
    w, pair_v, depth_v = w[order], pair_v[order], depth_v[order]
    N = w.shape[0]
    neq = jnp.any(w[1:] != w[:-1], axis=-1)
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    seg = jnp.cumsum(is_start) - 1
    pmin = jax.ops.segment_min(pair_v, seg, num_segments=N)
    pmax = jax.ops.segment_max(jnp.where(pair_v == big, -1, pair_v), seg, num_segments=N)
    dmin = jax.ops.segment_min(depth_v, seg, num_segments=N)
    first_idx = jax.ops.segment_min(jnp.arange(N, dtype=jnp.int32), seg, num_segments=N)
    n_groups = seg[-1] + 1
    in_range = jnp.arange(N) < n_groups
    u_words = jnp.where(in_range[:, None], w[jnp.where(in_range, first_idx, 0)], jnp.uint32(0xFFFFFFFF))
    is_sent = jnp.all(u_words == jnp.uint32(0xFFFFFFFF), axis=-1)
    n_unique = jnp.sum(in_range & ~is_sent).astype(jnp.int32)
    return u_words, pmin, pmax, dmin, n_unique


@jax.jit
def _merge_ctg_aggregates(a_w, a_pmin, a_pmax, a_dmin, b_w, b_pmin, b_pmax, b_dmin):
    w = jnp.concatenate([a_w, b_w])
    pmin = jnp.concatenate([a_pmin, b_pmin])
    pmax = jnp.concatenate([a_pmax, b_pmax])
    dmin = jnp.concatenate([a_dmin, b_dmin])
    W = w.shape[-1]
    keys = tuple(w[:, i] for i in range(W - 1, -1, -1))
    order = jnp.lexsort(keys)
    w, pmin, pmax, dmin = w[order], pmin[order], pmax[order], dmin[order]
    N = w.shape[0]
    neq = jnp.any(w[1:] != w[:-1], axis=-1)
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    seg = jnp.cumsum(is_start) - 1
    u_pmin = jax.ops.segment_min(pmin, seg, num_segments=N)
    u_pmax = jax.ops.segment_max(pmax, seg, num_segments=N)
    u_dmin = jax.ops.segment_min(dmin, seg, num_segments=N)
    first_idx = jax.ops.segment_min(jnp.arange(N, dtype=jnp.int32), seg, num_segments=N)
    n_groups = seg[-1] + 1
    in_range = jnp.arange(N) < n_groups
    u_words = jnp.where(in_range[:, None], w[jnp.where(in_range, first_idx, 0)], jnp.uint32(0xFFFFFFFF))
    is_sent = jnp.all(u_words == jnp.uint32(0xFFFFFFFF), axis=-1)
    n_unique = jnp.sum(in_range & ~is_sent).astype(jnp.int32)
    return u_words, u_pmin, u_pmax, u_dmin, n_unique


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

    # merge: concat with source flags, sort, segment-combine
    words = jnp.concatenate([C._sentinelize(r_words, r_valid), C._sentinelize(c_words, c_valid)])
    count = jnp.concatenate([r_count, c_count])
    l4 = jnp.concatenate([r_l4, c_l4])
    r4 = jnp.concatenate([r_r4, c_r4])
    is_read = jnp.concatenate([r_valid, jnp.zeros_like(c_valid)])
    keep_read = jnp.concatenate([r_keep, jnp.zeros_like(c_valid)])
    is_ctg = jnp.concatenate([jnp.zeros_like(r_valid), c_valid])

    W = words.shape[-1]
    keys = tuple(words[:, i] for i in range(W - 1, -1, -1))
    order = jnp.lexsort(keys)
    words, count, l4, r4 = words[order], count[order], l4[order], r4[order]
    is_read, keep_read, is_ctg = is_read[order], keep_read[order], is_ctg[order]

    N = words.shape[0]
    neq = jnp.any(words[1:] != words[:-1], axis=-1)
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    seg = jnp.cumsum(is_start) - 1
    g_has_read = jax.ops.segment_max(is_read.astype(jnp.int32), seg, num_segments=N).astype(bool)
    g_keep_read = jax.ops.segment_max(keep_read.astype(jnp.int32), seg, num_segments=N).astype(bool)
    g_has_ctg = jax.ops.segment_max(is_ctg.astype(jnp.int32), seg, num_segments=N).astype(bool)
    use_read = g_has_read & (g_keep_read | ~g_has_ctg)
    # each kmer occurs at most once per source; mask then sum within segment
    sel_read = is_read & use_read[seg]
    sel_ctg = is_ctg & ~use_read[seg]
    sel = sel_read | sel_ctg
    g_count = jnp.minimum(jax.ops.segment_sum(jnp.where(sel, count, 0), seg, num_segments=N), MAX_KMER_COUNT)
    g_l4 = jnp.minimum(jax.ops.segment_sum(jnp.where(sel[:, None], l4, 0), seg, num_segments=N), MAX_KMER_COUNT)
    g_r4 = jnp.minimum(jax.ops.segment_sum(jnp.where(sel[:, None], r4, 0), seg, num_segments=N), MAX_KMER_COUNT)
    first_idx = jax.ops.segment_min(jnp.arange(N, dtype=jnp.int32), seg, num_segments=N)
    n_groups = seg[-1] + 1
    in_range = jnp.arange(N) < n_groups
    u_words = jnp.where(in_range[:, None], words[jnp.where(in_range, first_idx, 0)], jnp.uint32(0xFFFFFFFF))
    is_sent = jnp.all(u_words == jnp.uint32(0xFFFFFFFF), axis=-1)
    n_unique = jnp.sum(in_range & ~is_sent).astype(jnp.int32)
    return u_words, g_count, g_l4, g_r4, n_unique
