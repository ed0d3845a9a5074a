"""Sort + segmented-reduce k-mer counting kernels.

This replaces the reference's CAS/probing hash tables
(src/kcount/kcount_cpu.cpp:205-294, src/kcount/kcount-gpu/gpu_hash_table.cpp)
with a deterministic TPU-friendly formulation: flatten (kmer, left_ext,
right_ext, count) records, lexsort by the packed key words, and segment-sum
counts and per-base extension one-hots. Saturating uint16 accumulation of
nonnegative increments equals clamping the exact sum, so every segmented sum
clamps to the uint16 ceiling immediately — int32 payloads halve the sort
bandwidth vs int64 and stay exact (per-reduce partial sums are bounded well
below 2^31: read records carry count 1 and contig depths are pre-clamped).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import EXT_F, EXT_X, EXT_NONE, MAX_KMER_COUNT
from .bitkmer import (
    kmer_words_from_codes,
    canonicalize_words,
    minimizers_from_codes,
    quick_hash_u64,
)

I64 = jnp.int64
U32 = jnp.uint32


def minimizer_shard_targets(codes, k: int, m: int, n_shards: int, use_pallas: bool | None = None):
    """(B, L) codes -> (B, P) int32 target shards via quick_hash(minimizer).

    use_pallas=None auto-selects: the validated u32-pair Pallas kernel
    (ops/pallas_minimizer.py, bit-exact, ~23% faster) is the production
    default on TPU; CPU (tests) uses the jnp uint64 path.
    """
    if n_shards == 1:
        # single-shard: every target is 0; skip the sliding-window minimizer
        # scan + hash entirely (it is ~1/3 of record extraction time)
        B, L = codes.shape
        return jnp.zeros((B, L - k + 1), jnp.int32)
    if use_pallas is None:
        from . import kernels

        use_pallas = kernels.enabled("minimizer") and n_shards > 1
    if use_pallas:
        from .pallas_minimizer import pallas_minimizer_targets

        return pallas_minimizer_targets(codes, k, m, n_shards)
    minz = minimizers_from_codes(codes, k, m)
    return (quick_hash_u64(minz) % jnp.uint64(n_shards)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "m", "n_shards", "use_pallas"))
def read_kmer_records(codes, qual_ok, lens, k: int, m: int, n_shards: int = 1, depth=None,
                      use_pallas: bool | None = None):
    """Extract count records from a block of sequences.

    codes: (B, L) uint8 base codes (0-3, 4=N); qual_ok: (B, L) bool (phred >=
    cutoff); lens: (B,) int32 true lengths; depth: optional (B,) int32 count
    per sequence (contig pass; None = 1 per the read pass).

    Only k-mers at positions [1, len-k-1] are counted, with left ext at i-1
    and right ext at i+k (reference process_seq + get_kmers_and_exts,
    kcount_cpu.cpp:84-101, 307-335). Extensions from low-quality or N bases
    are EXT_NONE and never accumulate. Canonicalization swaps and complements
    extensions (kcount_cpu.cpp:326-332).

    Returns dict of flattened (B*P,)-shaped arrays: words (B*P, W), left,
    right (uint8 ext codes), count (int32), valid (bool), target (int32 shard
    ids from minimizer hash, kmer_dht.cpp:193-196).

    On TPU the words/exts/valid come from the fused Pallas extraction kernel
    (ops/pallas_extract.py) rather than the jnp formulation below: XLA:TPU
    miscompiles the fused pack+revcomp chain at production block shapes
    (observed at (131072, 160): the lowest kept bit of canonical-key lanes is
    dropped for ~half the rows, silently corrupting counts — see the
    workaround note in bitkmer.revcomp_words). The kernel is bit-exact at
    every shape (scripts/verify_extract_tpu.py) and ~an order of magnitude
    less HBM traffic. Invalid rows then carry the all-ones key sentinel and
    zero count/exts instead of undefined garbage — every consumer masks by
    `valid`, so the two paths are interchangeable (equivalence-tested).
    """
    B, L = codes.shape
    P = L - k + 1
    if use_pallas is None:
        use_pallas = _extract_pallas_ok(L)
    if use_pallas:
        from .pallas_extract import extract_record_lanes

        interp = jax.default_backend() != "tpu"
        lanes, pay = extract_record_lanes(codes, qual_ok, lens, k, interpret=interp)
        pay = pay.reshape(-1)
        words = jnp.stack([x.reshape(-1) for x in lanes], axis=-1)
        valid = pay != 0
        cnt, left, right = _unpack_cnt_ext(pay)
        if depth is not None:
            d = jnp.clip(depth, 0, MAX_KMER_COUNT).astype(jnp.int32)
            cnt = cnt * jnp.broadcast_to(d[:, None], (B, P)).reshape(-1)
        target = minimizer_shard_targets(codes, k, m, n_shards, use_pallas).reshape(-1)
        return dict(
            words=words, left=left, right=right, count=cnt, valid=valid,
            target=target,
        )
    words = kmer_words_from_codes(codes, k)  # (B, P, W)
    cwords, was_rc = canonicalize_words(words, k)

    base_ok = qual_ok & (codes < 4)
    ext_code = jnp.where(base_ok, codes, jnp.uint8(EXT_NONE))
    # left ext of kmer i is base i-1; right ext is base i+k
    # pad, not concatenate-with-full: pad preserves the operand's sharding
    # spec under explicit-sharding meshes (concat of a fresh unsharded
    # constant with a sharded slice is a ShardingTypeError on a 1-shard mesh)
    left = jnp.pad(ext_code[:, 0 : P - 1], ((0, 0), (1, 0)), constant_values=EXT_NONE)
    right = jnp.pad(ext_code, ((0, 0), (0, k + 1)), constant_values=EXT_NONE)[:, k : k + P]

    comp = lambda e: jnp.where(e < 4, jnp.uint8(3) - e, e)
    left_c = jnp.where(was_rc, comp(right), left)
    right_c = jnp.where(was_rc, comp(left), right)

    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    valid = (pos >= 1) & (pos <= lens[:, None] - k - 1)

    target = minimizer_shard_targets(codes, k, m, n_shards, use_pallas)

    if depth is None:
        count = jnp.ones((B, P), jnp.int32)
    else:
        count = jnp.broadcast_to(jnp.clip(depth, 0, MAX_KMER_COUNT)[:, None].astype(jnp.int32), (B, P))

    flat = lambda x: x.reshape((B * P,) + x.shape[2:])
    return dict(
        words=flat(cwords),
        left=flat(left_c),
        right=flat(right_c),
        count=flat(count),
        valid=flat(valid),
        target=flat(target),
    )


def _sentinelize(words, valid):
    """Overwrite invalid rows with the all-ones empty-key sentinel.

    Mirrors the reference's KEY_EMPTY convention (kcount_cpu.cpp:217,227).
    Valid k-mers with k % 32 != 0 can never be all-ones (trailing bits are 0).
    """
    return jnp.where(valid[..., None], words, jnp.uint32(0xFFFFFFFF))


def _sort_carry(words, *payload):
    """Stable variadic sort of (N, W) rows by words, CARRYING payload lanes
    through the sort network.

    Measured on TPU v5e at 573k rows: lexsort + post-sort gathers of a 9-lane
    payload = 16.9 ms; carrying the lanes through jax.lax.sort = 2.0 ms.
    XLA:TPU gathers at dynamic indices are ~8x the cost of extra sort lanes,
    so payloads ride the sort (packed to few u32 lanes by callers).
    """
    W = words.shape[-1]
    ops = tuple(words[:, w] for w in range(W)) + tuple(payload)
    out = jax.lax.sort(ops, num_keys=W, is_stable=True)
    return (jnp.stack(out[:W], axis=-1),) + tuple(out[W:])


def _pack_cnt_ext(count, left, right):
    """count (<= 0xFFFF) | left << 16 | right << 24 in one u32 lane."""
    c = jnp.clip(count, 0, MAX_KMER_COUNT).astype(jnp.uint32)
    return c | (left.astype(jnp.uint32) << U32(16)) | (right.astype(jnp.uint32) << U32(24))


def _unpack_cnt_ext(p):
    cnt = (p & U32(0xFFFF)).astype(jnp.int32)
    left = ((p >> U32(16)) & U32(0xFF)).astype(jnp.uint8)
    right = (p >> U32(24)).astype(jnp.uint8)
    return cnt, left, right


def _pack_sums(count, l4, r4):
    """(count, (N,4) l4, (N,4) r4), each value <= 0xFFFF -> 5 u32 lanes."""
    l = l4.astype(jnp.uint32)
    r = r4.astype(jnp.uint32)
    return (
        jnp.clip(count, 0, MAX_KMER_COUNT).astype(jnp.uint32),
        l[:, 0] | (l[:, 1] << U32(16)),
        l[:, 2] | (l[:, 3] << U32(16)),
        r[:, 0] | (r[:, 1] << U32(16)),
        r[:, 2] | (r[:, 3] << U32(16)),
    )


def _unpack_sums(c, l01, l23, r01, r23):
    lo = lambda x: (x & U32(0xFFFF)).astype(jnp.int32)
    hi = lambda x: (x >> U32(16)).astype(jnp.int32)
    l4 = jnp.stack([lo(l01), hi(l01), lo(l23), hi(l23)], axis=-1)
    r4 = jnp.stack([lo(r01), hi(r01), lo(r23), hi(r23)], axis=-1)
    return c.astype(jnp.int32), l4, r4


def _group_sums_scan(words, count, l4, r4):
    """Per-group payload sums at group-last rows of lexsorted rows.

    Scatter-free: group sums come from one stacked int32 cumsum sampled at
    group boundaries (a single 9-lane scatter measured 25 ms at 573k rows on
    v5e — scatters/gathers are the TPU anti-pattern; scans and sorts are
    ~1 ms), the group-start prefix rides forward on a cummax (exclusive
    prefix sums are nondecreasing since all payloads are nonnegative).
    int32 exactness: group sums here are INSTANCE counts (each input row's
    count is a sum of original unit records), so every cumsum lane is bounded
    by the total number of k-mer instances in the batch < 2^31.

    Returns (sums (N,9) i32 clamped to the u16 ceiling, is_last, is_sent).
    """
    N = words.shape[0]
    neq = jnp.any(words[1:] != words[:-1], axis=-1)
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_last = jnp.concatenate([neq, jnp.ones((1,), bool)])
    is_sent = jnp.all(words == jnp.uint32(0xFFFFFFFF), axis=-1)
    if _pallas_compact_ok(N, "scan"):
        # fused single-pass Pallas scan (XLA lowers the cumsum + cummax to
        # several full-array passes, ~10x off roofline at 18M rows)
        from .pallas_scan import TILE as SCAN_TILE, group_sums_scan_lanes

        pad = -(-N // SCAN_TILE) * SCAN_TILE - N
        lanes = (count.astype(jnp.int32),) + tuple(
            l4[:, i].astype(jnp.int32) for i in range(4)
        ) + tuple(r4[:, i].astype(jnp.int32) for i in range(4))
        st = is_start
        if pad:
            # pad rows: pay 0, start True -> carries unaffected
            lanes = tuple(jnp.concatenate([x, jnp.zeros((pad,), jnp.int32)]) for x in lanes)
            st = jnp.concatenate([st, jnp.ones((pad,), bool)])
        out = group_sums_scan_lanes(lanes, st, clamp=MAX_KMER_COUNT)
        sums = jnp.stack([x[:N] for x in out], axis=1)
        return sums, is_last, is_sent
    pay = jnp.concatenate(
        [count[:, None].astype(jnp.int32), l4.astype(jnp.int32), r4.astype(jnp.int32)],
        axis=1,
    )  # (N, 9)
    cs = jnp.cumsum(pay, axis=0, dtype=jnp.int32)
    excl = cs - pay
    start_excl = jax.lax.cummax(jnp.where(is_start[:, None], excl, 0), axis=0)
    sums = jnp.minimum(cs - start_excl, MAX_KMER_COUNT)  # valid at last rows
    return sums, is_last, is_sent


def _group_sums_bounded(words, count, l4, r4, mult: int):
    """_group_sums_scan for rows whose key multiplicity is STATICALLY
    bounded by `mult` (merge inputs are already-deduped runs): group sums
    need only ceil(log2(mult)) masked shift-adds instead of a global scan.
    All sums are exact in int32 (<= mult * 0xFFFF) before the clamp."""
    pay = jnp.concatenate(
        [count[:, None].astype(jnp.int32), l4.astype(jnp.int32), r4.astype(jnp.int32)],
        axis=1,
    )
    d = 1
    while d < mult:
        same = jnp.all(words[d:] == words[:-d], axis=-1)
        add = jnp.where(
            jnp.concatenate([jnp.zeros((d,), bool), same])[:, None],
            jnp.concatenate([jnp.zeros((d, 9), jnp.int32), pay[:-d]]),
            0,
        )
        pay = pay + add
        d *= 2
    neq = jnp.any(words[1:] != words[:-1], axis=-1)
    is_last = jnp.concatenate([neq, jnp.ones((1,), bool)])
    is_sent = jnp.all(words == jnp.uint32(0xFFFFFFFF), axis=-1)
    return jnp.minimum(pay, MAX_KMER_COUNT), is_last, is_sent



def _extract_pallas_ok(L: int) -> bool:
    """Extraction-kernel gate: enabled AND the padded read length fits the
    kernel's VMEM budget. The fused extract kernel stages whole (rows, L)
    blocks in VMEM; at L=4096 (long-contig ctg-pass blocks) its scoped
    allocation hit 60.6M vs the 16M limit and the remote compile helper
    crashed. Reads never exceed ~2x read_len (~320 padded), so 512 covers
    every read shape; longer rows (ctg windows) take the jnp extraction.
    """
    from . import kernels

    return kernels.enabled("extract") and L <= 512


def _pallas_compact_ok(N: int, *names: str) -> bool:
    """Gate for the Pallas ragged-append compaction (ops/pallas_compact.py)
    plus any extra kernels the caller's fused path needs: enabled in the
    central registry (ops/kernels.py), and large enough that the two-phase
    formulation wins."""
    from . import kernels

    if not kernels.enabled("compact", *names):
        return False
    from .pallas_compact import TILE

    return N >= 4 * TILE


def _pad_tile_lanes(lanes, flags, dead_class: int):
    """Pad (N,) lanes + flags to a TILE multiple with dead-class rows."""
    from .pallas_compact import TILE

    N = flags.shape[0]
    Np = -(-N // TILE) * TILE
    if Np != N:
        pad = Np - N
        flags = jnp.concatenate([flags, jnp.full((pad,), dead_class, flags.dtype)])
        lanes = tuple(jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]) for x in lanes)
    return lanes, flags


def _compact_keep(words, keep, payload):
    """Stable compaction of keep-flagged rows to a dense prefix.

    Returns (words (N, W) with sentinel tail, *payload lanes with zero
    tails, n_keep). On TPU uses the Pallas ragged-append compaction
    (one tile-local flag sort + one O(N) append; measured 2.8x the global
    flag sort at 18M rows); elsewhere one stable 1-key flag sort.
    """
    N, W = words.shape
    if _pallas_compact_ok(N):
        from .pallas_compact import compact_classes

        flags = jnp.where(keep, 0, 1).astype(jnp.int32)
        lanes = tuple(words[:, i] for i in range(W)) + tuple(payload)
        lanes, flags = _pad_tile_lanes(lanes, flags, 1)
        ((out, n),) = compact_classes(lanes, flags, 2, emit=(0,))
        live = jnp.arange(N, dtype=jnp.int32) < n
        u_words = jnp.where(
            live[:, None], jnp.stack([x[:N] for x in out[:W]], axis=-1),
            jnp.uint32(0xFFFFFFFF),
        )
        pays = tuple(jnp.where(live, x[:N], 0) for x in out[W:])
        return (u_words,) + pays + (n.astype(jnp.int32),)
    flag = jnp.where(keep, U32(0), U32(1))
    out = jax.lax.sort(
        (flag,) + tuple(words[:, i] for i in range(W)) + tuple(payload),
        num_keys=1, is_stable=True,
    )
    live = out[0] == 0
    u_words = jnp.where(
        live[:, None], jnp.stack(out[1 : 1 + W], axis=-1), jnp.uint32(0xFFFFFFFF)
    )
    pays = tuple(jnp.where(live, x, 0) for x in out[1 + W :])
    n = jnp.sum(keep).astype(jnp.int32)
    return (u_words,) + pays + (n,)


def _dedup_sorted(words, count, l4, r4):
    """Segment-reduce duplicate adjacent keys in lexsorted rows.

    Returns same-shape arrays with unique rows compacted to the front
    (sentinel rows group at the end), plus n_unique (excluding sentinels).
    Counts saturate at the uint16 ceiling (reference kmer_count_t semantics,
    kcount_cpu.cpp:152-155) after every reduce.
    """
    sums, is_last, is_sent = _group_sums_scan(words, count, l4, r4)
    keep = is_last & ~is_sent
    packed = _pack_sums(sums[:, 0], sums[:, 1:5], sums[:, 5:9])
    u_words, *pays, n_unique = _compact_keep(words, keep, packed)
    u_count, u_l4, u_r4 = _unpack_sums(*pays)
    return u_words, u_count, u_l4, u_r4, n_unique


def _dedup_sorted_bounded(words, count, l4, r4, mult: int):
    """Dedup sorted rows whose key multiplicity is STATICALLY bounded.

    Merge inputs are already-deduped runs, so a key occurs at most `mult`
    times (2 for pair merges, 4 for merge4). Group sums then need only
    ceil(log2(mult)) masked shift-adds instead of a global scan or
    segment-sum scatters, and compaction is ONE stable 1-key-lane sort by a
    drop flag (kept rows stay lexsorted; dropped/sentinel rows sink). All
    sums are exact in int32 (<= mult * 0xFFFF) before the u16-ceiling clamp.
    """
    sums, is_last, is_sent = _group_sums_bounded(words, count, l4, r4, mult)
    keep = is_last & ~is_sent
    packed = _pack_sums(sums[:, 0], sums[:, 1:5], sums[:, 5:9])
    u_words, *pays, n_unique = _compact_keep(words, keep, packed)
    u_count, u_l4, u_r4 = _unpack_sums(*pays)
    return u_words, u_count, u_l4, u_r4, n_unique


def _ext_onehot(ext, count):
    """(N,) ext codes + counts -> (N, 4) one-hot counts; codes >= 4 ignored."""
    oh = (ext[:, None] == jnp.arange(4, dtype=ext.dtype)[None, :]).astype(jnp.int32)
    return oh * count[:, None].astype(jnp.int32)


@jax.jit
def aggregate_records(words, left, right, count, valid):
    """Aggregate raw records into a deduped (sorted) partial table.

    Returns (u_words, u_count i32, u_l4 (N,4) i32, u_r4, n_unique).
    The sort carries one packed (count|left|right) u32 lane; extension
    one-hots are expanded only AFTER the sort (gather-free, see _sort_carry).
    """
    w = _sentinelize(words, valid)
    cnt = jnp.where(valid, count, 0).astype(jnp.int32)
    w, packed = _sort_carry(w, _pack_cnt_ext(cnt, left, right))
    cnt, left_s, right_s = _unpack_cnt_ext(packed)
    l4 = _ext_onehot(left_s, cnt)
    r4 = _ext_onehot(right_s, cnt)
    return _dedup_sorted(w, cnt, l4, r4)


def _merge_sorted_sets(a, b):
    """Merge two SORTED (words, count, l4, r4) sets -> sorted (w, cnt, l4, r4).

    On TPU uses the Pallas bitonic-merge network (ops/pallas_sort.py,
    measured 2.2x jax.lax.sort at 8M rows — the runs are already sorted, so
    a full comparator sort is wasted work); elsewhere concat + variadic
    sort-carry. b is padded with sentinel rows to make the total a power of
    two (sentinels sort last, preserving the dense-prefix convention).

    A rank-based merge (batched bisection + scatter, no re-sort) was tried
    and measured 7x SLOWER on TPU (734 vs 98 ms at 2x1M rows): XLA:TPU row
    gathers at dynamic indices are far more expensive than its sort.
    """
    a_words, a_count, a_l4, a_r4 = a
    b_words, b_count, b_l4, b_r4 = b
    W = a_words.shape[1]
    na, nb = a_words.shape[0], b_words.shape[0]
    from . import kernels

    if kernels.enabled("sort"):
        from .pallas_sort import merge_sorted_lanes_padded

        a_lanes = tuple(a_words[:, w] for w in range(W)) + _pack_sums(a_count, a_l4, a_r4)
        b_lanes = tuple(b_words[:, w] for w in range(W)) + _pack_sums(b_count, b_l4, b_r4)
        # TILE-granular merge (virtual sentinel tiles stand in for the pow2
        # tail) — the former pow2 padding cost up to ~2x the merge traffic
        out = merge_sorted_lanes_padded(a_lanes, b_lanes, kw=W)
        w = jnp.stack(out[:W], axis=-1)
        cnt, l4, r4 = _unpack_sums(*out[W:])
        return w, cnt, l4, r4
    words = jnp.concatenate([a_words, b_words])
    cnt = jnp.concatenate([a_count, b_count])
    l4 = jnp.concatenate([a_l4, b_l4])
    r4 = jnp.concatenate([a_r4, b_r4])
    w, *packed = _sort_carry(words, *_pack_sums(cnt, l4, r4))
    cnt, l4, r4 = _unpack_sums(*packed)
    return w, cnt, l4, r4


@jax.jit
def merge_aggregates(a_words, a_count, a_l4, a_r4, b_words, b_count, b_l4, b_r4):
    """Merge two deduped partial tables (sorted-run merge + bounded dedup)."""
    w, cnt, l4, r4 = _merge_sorted_sets(
        (a_words, a_count, a_l4, a_r4), (b_words, b_count, b_l4, b_r4)
    )
    return _dedup_sorted_bounded(w, cnt, l4, r4, mult=2)


def _get_ext_calls(c4, count, dmin_thres):
    """Vectorized extension call (reference kcount_cpu.cpp:173-182).

    c4: (N, 4) integer per-base counts (clamped to uint16 range by caller);
    count: (N,) clamped total — any signed int dtype (values fit i32; i64
    costs 2x on TPU). Ties break toward the greater base char (T > G > C >
    A), encoded by key = count*4 + base_code.
    """
    key = c4 * 4 + jnp.arange(4, dtype=c4.dtype)[None, :]
    top_key = jnp.max(key, axis=-1)
    top_code = (top_key % 4).astype(jnp.uint8)
    top_cnt = top_key // 4
    runner_cnt = jnp.max(jnp.where(key == top_key[:, None], c4.dtype.type(-1), key), axis=-1) // 4
    # dmin_dyn = max((int)((1.0-0.9)*count), dmin_thres). The reference
    # computes this in double precision where 1.0-0.9 is slightly BELOW 0.1;
    # for integer count in [0, 65535] that truncation equals the pure-integer
    # form ceil(count/10)-1 (verified exhaustively in tests), keeping float64
    # out of the TPU path.
    dmin_dyn = jnp.maximum((count + 9) // 10 - 1, count.dtype.type(dmin_thres))
    call = jnp.where(
        top_cnt < dmin_dyn,
        jnp.uint8(EXT_X),
        jnp.where(runner_cnt >= dmin_dyn, jnp.uint8(EXT_F), top_code),
    )
    return call


# ---------------------------------------------------------------------------
# singleton pre-filter (GQF analog)
# ---------------------------------------------------------------------------
#
# The reference's GPU path keeps singletons OUT of the hash table with a
# counting quotient filter: first sight stashes the extensions in the filter,
# second sight promotes to the table (kcount-gpu/gqf.hpp:358-378, ~0.6x table
# memory, kmer_dht.cpp:151). The LSM-run analog: split every deduped run into
# a multi part (count >= 2, full count + 2x(4-wide) ext-count format,
# 4W+36 B/row) and a compact singleton part (count == 1: exactly one
# occurrence, so its ext one-hots collapse to two 4-bit codes — 4W+1 B/row,
# ~4x smaller for k=21). Merges re-expand transiently; a second occurrence
# promotes the row to the multi part.


def pow2_rows(n: int, floor: int = 256) -> int:
    """Static row count to slice a run to (bounds the jit shape zoo)."""
    return max(floor, 1 << (max(int(n), 1) - 1).bit_length())


def trim_rows(n: int, floor: int = 256) -> int:
    """Static row count with half-octave granularity: smallest 2^k or
    3*2^(k-1) >= n. Doubles the shape zoo vs pow2_rows but caps sentinel
    padding at 33% instead of 100% — padding rides every downstream bitonic
    merge and flag sort, so tighter trims shrink the LSM's hot sorts
    (measured ~25% off the steady-state merge on v5e)."""
    n = max(int(n), 1)
    p = 1 << (n - 1).bit_length()
    half_octave = 3 * (p // 4)
    if p >= 4 and n <= half_octave:
        return max(floor, half_octave)
    return max(floor, p)


def _ext_code_of(c4, valid):
    """(N,4) one-hot ext counts of count-1 rows -> u8 code (0-3 or EXT_NONE)."""
    has = jnp.sum(c4, axis=-1) == 1
    code = jnp.argmax(c4, axis=-1).astype(jnp.uint8)
    return jnp.where(valid & has, code, jnp.uint8(EXT_NONE))


@jax.jit
def split_run(words, count, l4, r4, n_unique):
    """Split a deduped run into (multi, compact-singleton) parts.

    Returns (m_words, m_count, m_l4, m_r4, n_multi, s_words, s_ext, n_single);
    both parts lexsorted dense prefixes (sentinel-tailed), s_ext packs
    left | right << 4 in one uint8.
    """
    N, W = words.shape
    row_valid = jnp.arange(N) < n_unique
    is_single = row_valid & (count == 1)
    is_multi = row_valid & (count >= 2)

    # input rows are already lexsorted, so ONE stable 1-key-lane flag sort
    # per part compacts it while preserving key order (gather-free)
    def _flag_compact(keep, *packed):
        flag = jnp.where(keep, U32(0), U32(1))
        out = jax.lax.sort(
            (flag,) + tuple(words[:, w] for w in range(W)) + tuple(packed),
            num_keys=1, is_stable=True,
        )
        live = (out[0] == 0)
        w_s = jnp.where(live[:, None], jnp.stack(out[1 : 1 + W], axis=-1), jnp.uint32(0xFFFFFFFF))
        return (w_s, live) + tuple(out[1 + W :])

    m_words, m_live, *m_packed = _flag_compact(is_multi, *_pack_sums(count, l4, r4))
    m_count, m_l4, m_r4 = _unpack_sums(*m_packed)
    z = (~m_live).astype(jnp.int32)
    m_count = m_count * (1 - z)
    m_l4 = m_l4 * (1 - z)[:, None]
    m_r4 = m_r4 * (1 - z)[:, None]
    n_multi = jnp.sum(is_multi).astype(jnp.int32)

    ext = _ext_code_of(l4, is_single) | (_ext_code_of(r4, is_single) << jnp.uint8(4))
    s_words, s_live, s_ext = _flag_compact(is_single, jnp.where(is_single, ext, jnp.uint8(0)))
    s_ext = jnp.where(s_live, s_ext, jnp.uint8(0))
    n_single = jnp.sum(is_single).astype(jnp.int32)
    return m_words, m_count, m_l4, m_r4, n_multi, s_words, s_ext, n_single


@jax.jit
def expand_singles(s_words, s_ext, n_single):
    """Compact singleton rows -> full (words, count, l4, r4) format."""
    N = s_words.shape[0]
    valid = jnp.arange(N) < n_single
    left = (s_ext & jnp.uint8(0xF)).astype(jnp.uint8)
    right = (s_ext >> jnp.uint8(4)).astype(jnp.uint8)
    cnt = jnp.where(valid, 1, 0).astype(jnp.int32)
    return s_words, cnt, _ext_onehot(left, cnt), _ext_onehot(right, cnt)


def _split_emit_pallas(words, p, keep_m, keep_s):
    """Shared Pallas 3-way split compaction: (words, 5 packed sum lanes,
    class flags) -> split run. p[0] must already carry the singleton ext code
    in its upper 16 bits on keep_s rows."""
    from .pallas_compact import compact_classes

    N, W = words.shape
    rows = jnp.arange(N, dtype=jnp.int32)
    p0, p1, p2, p3, p4 = p
    flags = jnp.where(keep_m, 0, jnp.where(keep_s, 1, 2)).astype(jnp.int32)
    lanes = tuple(words[:, i] for i in range(W)) + (p0, p1, p2, p3, p4)
    lanes, flags = _pad_tile_lanes(lanes, flags, 2)
    # singles only append the key words + the (count|ext) lane
    (m_out, n_multi), (s_out, n_single) = compact_classes(
        lanes, flags, 3, emit=(0, 1),
        emit_lanes=(tuple(range(W + 5)), tuple(range(W + 1))),
    )
    n_multi = n_multi.astype(jnp.int32)
    n_single = n_single.astype(jnp.int32)
    m_live = rows < n_multi
    m_words = jnp.where(
        m_live[:, None], jnp.stack([x[:N] for x in m_out[:W]], axis=-1),
        jnp.uint32(0xFFFFFFFF),
    )
    m_count, m_l4, m_r4 = _unpack_sums(
        jnp.where(m_live, m_out[W][:N] & U32(0xFFFF), 0),
        *(jnp.where(m_live, x[:N], 0) for x in m_out[W + 1 :]),
    )
    s_live = rows < n_single
    s_words = jnp.where(
        s_live[:, None], jnp.stack([x[:N] for x in s_out[:W]], axis=-1),
        jnp.uint32(0xFFFFFFFF),
    )
    s_ext = jnp.where(
        s_live, (s_out[W][:N] >> U32(16)).astype(jnp.uint8), jnp.uint8(0)
    )
    return m_words, m_count, m_l4, m_r4, n_multi, s_words, s_ext, n_single


def _split_from_packed_sums(words, p, is_last, is_sent):
    """_split_from_scanned taking the 5 PRE-PACKED group-sum lanes (as
    emitted by pallas_scan.group_sums_scan_packed) — no (N, 9) i32
    materialization. Pallas path only (callers gate on _pallas_compact_ok)."""
    p0, p1, p2, p3, p4 = p
    cnt = (p0 & U32(0xFFFF)).astype(jnp.int32)
    keep_m = is_last & ~is_sent & (cnt >= 2)
    keep_s = is_last & ~is_sent & (cnt == 1)
    lo = lambda x: (x & U32(0xFFFF)).astype(jnp.int32)
    hi = lambda x: (x >> U32(16)).astype(jnp.int32)

    def _code(a, b):
        # singleton rows have 0/1 ext fields; exactly-one-set -> its code
        f0, f1, f2, f3 = lo(a), hi(a), lo(b), hi(b)
        has = (f0 + f1 + f2 + f3) == 1
        code = (f1 + 2 * f2 + 3 * f3).astype(jnp.uint8)
        return jnp.where(keep_s & has, code, jnp.uint8(EXT_NONE))

    ext = _code(p1, p2) | (_code(p3, p4) << jnp.uint8(4))
    p0 = p0 | jnp.where(keep_s, ext.astype(U32) << U32(16), U32(0))
    return _split_emit_pallas(words, (p0, p1, p2, p3, p4), keep_m, keep_s)


def _split_from_scanned(words, sums, is_last, is_sent):
    """Compact scanned lexsorted rows straight into a split run.

    ONE 3-way flag sort (multi=0, single=1, dead=2) replaces the three
    full-N sorts the unfused aggregate+split path needs (dedup compact + two
    split compacts). Dead rows are sentinelized pre-sort (their keys are
    never read again), so the sorted array is [multis | singles | sentinels]
    with each part in key order (stable sort). The singleton ext code rides
    the FREE upper 16 bits of the count lane (singles have count == 1), so
    no extra lane is carried. The multi part is the prefix (masked past
    n_multi); the single part is recovered by one dynamic roll of the 2+1
    lanes singles need — elementwise traffic, ~100x cheaper than the 4-lane
    full-N sort it replaces (each full-N sort is ~100-190 ms at 18M rows on
    v5e).
    """
    N, W = words.shape
    keep_m = is_last & ~is_sent & (sums[:, 0] >= 2)
    keep_s = is_last & ~is_sent & (sums[:, 0] == 1)

    ext = _ext_code_of(sums[:, 1:5], keep_s) | (
        _ext_code_of(sums[:, 5:9], keep_s) << jnp.uint8(4)
    )
    p0, p1, p2, p3, p4 = _pack_sums(sums[:, 0], sums[:, 1:5], sums[:, 5:9])
    p0 = p0 | jnp.where(keep_s, ext.astype(U32) << U32(16), U32(0))
    rows = jnp.arange(N, dtype=jnp.int32)

    if _pallas_compact_ok(N):
        return _split_emit_pallas(words, (p0, p1, p2, p3, p4), keep_m, keep_s)

    dead = ~(keep_m | keep_s)
    w = jnp.where(dead[:, None], jnp.uint32(0xFFFFFFFF), words)
    flag = jnp.where(keep_m, U32(0), jnp.where(keep_s, U32(1), U32(2)))
    out = jax.lax.sort(
        (flag,) + tuple(w[:, i] for i in range(W)) + (p0, p1, p2, p3, p4),
        num_keys=1, is_stable=True,
    )
    n_multi = jnp.sum(keep_m).astype(jnp.int32)
    n_single = jnp.sum(keep_s).astype(jnp.int32)

    sw = jnp.stack(out[1 : 1 + W], axis=-1)
    m_live = rows < n_multi
    m_words = jnp.where(m_live[:, None], sw, jnp.uint32(0xFFFFFFFF))
    m_count, m_l4, m_r4 = _unpack_sums(
        out[1 + W] & U32(0xFFFF), *out[2 + W :]
    )
    z = m_live.astype(jnp.int32)
    m_count = m_count * z
    m_l4 = m_l4 * z[:, None]
    m_r4 = m_r4 * z[:, None]

    # singles occupy [n_multi, n_multi + n_single): roll them to the front
    s_live = rows < n_single
    sh = -n_multi
    s_words = jnp.where(
        s_live[:, None], jnp.roll(sw, sh, axis=0), jnp.uint32(0xFFFFFFFF)
    )
    s_ext = jnp.where(
        s_live, (jnp.roll(out[1 + W], sh) >> U32(16)).astype(jnp.uint8), jnp.uint8(0)
    )
    return m_words, m_count, m_l4, m_r4, n_multi, s_words, s_ext, n_single


@jax.jit
def aggregate_split_records(words, left, right, count, valid):
    """Fused aggregate_records + split_run: records -> split run directly."""
    w = _sentinelize(words, valid)
    cnt = jnp.where(valid, count, 0).astype(jnp.int32)
    w, packed = _sort_carry(w, _pack_cnt_ext(cnt, left, right))
    cnt, left_s, right_s = _unpack_cnt_ext(packed)
    l4 = _ext_onehot(left_s, cnt)
    r4 = _ext_onehot(right_s, cnt)
    sums, is_last, is_sent = _group_sums_scan(w, cnt, l4, r4)
    return _split_from_scanned(w, sums, is_last, is_sent)


def _sorted_from_lanes(word_lanes, payload):
    """Sort pre-sentinelized record lanes (Pallas extraction layout) and
    unpack into the (w, cnt, l4, r4) aggregation format."""
    W = len(word_lanes)
    out = jax.lax.sort(tuple(word_lanes) + (payload,), num_keys=W, is_stable=True)
    w = jnp.stack(out[:W], axis=-1)
    cnt, left_s, right_s = _unpack_cnt_ext(out[W])
    return w, cnt, _ext_onehot(left_s, cnt), _ext_onehot(right_s, cnt)


@jax.jit
def aggregate_record_lanes(word_lanes, payload):
    """aggregate_records for pre-sentinelized (words..., payload) lanes as
    produced by ops.pallas_extract.extract_record_lanes."""
    w, cnt, l4, r4 = _sorted_from_lanes(word_lanes, payload)
    return _dedup_sorted(w, cnt, l4, r4)


@jax.jit
def aggregate_split_lanes(word_lanes, payload):
    """aggregate_split_records for pre-sentinelized record lanes."""
    w, cnt, l4, r4 = _sorted_from_lanes(word_lanes, payload)
    sums, is_last, is_sent = _group_sums_scan(w, cnt, l4, r4)
    return _split_from_scanned(w, sums, is_last, is_sent)


def payload_fits_in_keys(k: int, W: int) -> bool:
    """True when the 7-bit read-record payload (valid + two 3-bit ext codes)
    fits the free low bits of the last NON-ZERO key lane (32*ceil(2k/32) - 2k
    >= 7): k=21/33/55/99 qualify; k=63/77 fall back to the separate-payload
    lane."""
    weff = -(-2 * k // 32)
    return weff <= W and 32 * weff - 2 * k >= 7


@partial(jax.jit, static_argnames=("k",))
def aggregate_split_lanes_packed(word_lanes, payload, k: int):
    """aggregate_split_lanes with the payload FOLDED into the key words.

    A read-pass record's payload is 7 effective bits (count==1 valid flag +
    two 3-bit extension codes). The key layout is u32 PAIRS mirroring the
    reference's big-endian u64[N_LONGS] packing (bitkmer.py), so (a) any
    trailing u32 lanes past ceil(2k/32) are ALWAYS zero on valid rows and
    need not ride the sort at all, and (b) the last non-zero lane has
    32*ceil(2k/32) - 2k free low bits where the payload rides. The initial
    record sort (the block pipeline's single most expensive op) then runs
    over ceil(2k/32) lanes instead of W + 1 (3 -> 2 at k=21, 5 -> 3 at k=33).
    Payload bits sit BELOW every key bit, so lexicographic order on the
    packed lanes refines key order (ties broken by payload — harmless:
    consumers segment-reduce within equal keys). Sentinel rows keep the
    all-ones convention in every sorted lane; a valid canonical k-mer can
    never be all-ones in every key bit (it would be poly-T, whose canonical
    form is poly-A), so sentinel detection stays unambiguous. Dropped zero
    lanes are reconstructed after the sort (0 on live rows, all-ones on
    sentinels), keeping the output format identical to the unpacked path.
    """
    W = len(word_lanes)
    return aggregate_split_packed(
        pack_payload_into_lanes(word_lanes, payload, k), k, W
    )


def pack_payload_into_lanes(word_lanes, payload, k: int):
    """Fold the 7-bit record payload (_pack_cnt_ext layout, count in {0, 1})
    into the last non-zero key lane's free low bits; payload == 0 rows become
    full all-ones sentinels. Returns the ceil(2k/32) packed lanes (see
    aggregate_split_lanes_packed for the layout argument)."""
    W = len(word_lanes)
    weff = -(-2 * k // 32)
    free = 32 * weff - 2 * k
    assert weff <= W and free >= 7, (k, W)
    lowmask = U32((1 << free) - 1)
    last = word_lanes[weff - 1]
    pay7 = (
        (payload & U32(1))
        | (((payload >> U32(16)) & U32(7)) << U32(1))
        | (((payload >> U32(24)) & U32(7)) << U32(4))
    )
    # top-bits AND via subtraction (XLA:TPU miscompile, see revcomp_words)
    packed = jnp.where(
        payload == 0, U32(0xFFFFFFFF), (last - (last & lowmask)) | pay7
    )
    return tuple(word_lanes[: weff - 1]) + (packed,)


@partial(jax.jit, static_argnames=("k", "W"))
def aggregate_split_packed(packed_lanes, k: int, W: int):
    """aggregate_split_lanes_packed core for ALREADY-packed lanes (as emitted
    by ops.pallas_extract.extract_packed_lanes): ceil(2k/32) uint32 lanes,
    payload in the last lane's free low bits, sentinels all-ones. W is the
    full output key-lane count (u32-pair format)."""
    weff = len(packed_lanes)
    free = 32 * weff - 2 * k
    assert weff == -(-2 * k // 32) and free >= 7 and weff <= W, (k, W, weff)
    out = jax.lax.sort(packed_lanes, num_keys=weff, is_stable=False)
    return split_from_sorted_packed(out, k, W)


@partial(jax.jit, static_argnames=("k", "W"))
def split_from_sorted_packed(out, k: int, W: int):
    """aggregate_split_packed tail for ALREADY-SORTED packed lanes (e.g. a
    raw-LSM merge result being collapsed): scan + multi/single split."""
    weff = len(out)
    free = 32 * weff - 2 * k
    keymask_int = 0xFFFFFFFF ^ ((1 << free) - 1)
    keymask = U32(keymask_int)
    lowmask = U32((1 << free) - 1)
    slast = out[-1]
    # top-bits AND via subtraction of the low bits: XLA:TPU miscompiles the
    # direct form at production shapes (see bitkmer.revcomp_words note)
    skey = slast - (slast & lowmask)
    sent = skey == keymask
    for x in out[:-1]:
        sent = sent & (x == U32(0xFFFFFFFF))
    clean_last = jnp.where(sent, U32(0xFFFFFFFF), skey)
    zero_lane = jnp.where(sent, U32(0xFFFFFFFF), U32(0))
    w = jnp.stack(
        tuple(out[:-1]) + (clean_last,) + (zero_lane,) * (W - weff), axis=-1
    )
    if _pallas_compact_ok(w.shape[0], "scan"):
        # fused packed scan: payload one-hots and group starts derived
        # IN-KERNEL from the packed sorted lanes, sums emitted pre-packed —
        # (weff in + 5 out) lanes of HBM traffic instead of (10 in + 9 out)
        from .pallas_scan import TILE as SCAN_TILE, group_sums_scan_packed

        N = w.shape[0]
        pad = -(-N // SCAN_TILE) * SCAN_TILE - N
        lanes_p = tuple(out)
        if pad:
            lanes_p = tuple(
                jnp.concatenate([x, jnp.full((pad,), 0xFFFFFFFF, U32)])
                for x in lanes_p
            )
        p = group_sums_scan_packed(lanes_p, keymask_int, MAX_KMER_COUNT)
        p = tuple(x[:N] for x in p)
        neq = jnp.any(w[1:] != w[:-1], axis=-1)
        is_last = jnp.concatenate([neq, jnp.ones((1,), bool)])
        return _split_from_packed_sums(w, p, is_last, sent)
    cnt = jnp.where(sent, 0, 1).astype(jnp.int32)
    left = ((slast >> U32(1)) & U32(7)).astype(jnp.uint8)
    right = ((slast >> U32(4)) & U32(7)).astype(jnp.uint8)
    l4 = _ext_onehot(left, cnt)
    r4 = _ext_onehot(right, cnt)
    sums, is_last, is_sent = _group_sums_scan(w, cnt, l4, r4)
    return _split_from_scanned(w, sums, is_last, is_sent)


@jax.jit
def merge_split4(a, b, c, d):
    """Merge four sorted deduped (words, count, l4, r4) sets straight into a
    split run (fused merge_aggregates4 + split_run: the deduped intermediate
    and its compaction sort are skipped)."""
    from . import kernels

    if kernels.enabled("sort"):
        ab = _merge_sorted_sets(a[:4], b[:4])
        cd = _merge_sorted_sets(c[:4], d[:4])
        w, cnt, l4, r4 = _merge_sorted_sets(ab, cd)
    else:
        w = jnp.concatenate([a[0], b[0], c[0], d[0]])
        cnt = jnp.concatenate([a[1], b[1], c[1], d[1]])
        l4 = jnp.concatenate([a[2], b[2], c[2], d[2]])
        r4 = jnp.concatenate([a[3], b[3], c[3], d[3]])
        w, *packed = _sort_carry(w, *_pack_sums(cnt, l4, r4))
        cnt, l4, r4 = _unpack_sums(*packed)
    sums, is_last, is_sent = _group_sums_bounded(w, cnt, l4, r4, mult=4)
    return _split_from_scanned(w, sums, is_last, is_sent)


@jax.jit
def merge_aggregates4(a, b, c, d):
    """Merge four (words, count, l4, r4) sets in ONE sort + dedup."""
    from . import kernels

    if kernels.enabled("sort"):
        # three pairwise bitonic merges of already-sorted runs beat one
        # comparator sort of the concatenation
        ab = _merge_sorted_sets(a[:4], b[:4])
        cd = _merge_sorted_sets(c[:4], d[:4])
        w, cnt, l4, r4 = _merge_sorted_sets(ab, cd)
        return _dedup_sorted_bounded(w, cnt, l4, r4, mult=4)
    words = jnp.concatenate([a[0], b[0], c[0], d[0]])
    cnt = jnp.concatenate([a[1], b[1], c[1], d[1]])
    l4 = jnp.concatenate([a[2], b[2], c[2], d[2]])
    r4 = jnp.concatenate([a[3], b[3], c[3], d[3]])
    w, *packed = _sort_carry(words, *_pack_sums(cnt, l4, r4))
    cnt, l4, r4 = _unpack_sums(*packed)
    return _dedup_sorted_bounded(w, cnt, l4, r4, mult=4)


@partial(jax.jit, static_argnames=("k", "m"))
def block_to_split_run(codes, qual_ok, lens, k: int, m: int):
    """Fused read-pass push: records -> aggregate -> singleton split.

    One dispatch per block instead of three-plus: over a remote-tunnel TPU
    every extra dispatch/host-sync costs a round-trip that dwarfs the actual
    compute (~15 ms of work vs ~30 ms per RTT). Returns the 8-tuple split run
    plus a stacked (n_multi, n_single) pair so the caller's occupancy fetch
    (needed for the trim slice sizes) is a single transfer.
    """
    if _extract_pallas_ok(codes.shape[1]):
        from ..constants import words32_for_k
        from .pallas_extract import extract_packed_lanes, extract_record_lanes

        W = words32_for_k(k)
        if payload_fits_in_keys(k, W):
            lanes = extract_packed_lanes(codes, qual_ok, lens, k)
            out = aggregate_split_packed(
                tuple(x.reshape(-1) for x in lanes), k, W
            )
        else:
            lanes, pay = extract_record_lanes(codes, qual_ok, lens, k)
            out = aggregate_split_lanes(
                tuple(x.reshape(-1) for x in lanes), pay.reshape(-1)
            )
    else:
        rec = read_kmer_records(codes, qual_ok, lens, k, m)
        out = aggregate_split_records(
            rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"]
        )
    return out, jnp.stack([out[4], out[7]])


# ---------------------------------------------------------------------------
# deferred-dedup (raw-run) LSM path
# ---------------------------------------------------------------------------
#
# The reference's aggregating stores batch updates and the hash table
# accumulates incrementally (kcount_cpu.cpp:337-354). The sorted-array
# analog does NOT need per-block dedup: a block's only obligation to the LSM
# is sortedness. The Pallas bitonic merge runs near the HBM roofline
# (~6 ms for 16.8M 3-lane rows on v5e) while the per-block scan + split
# compaction cost ~65 ms/block, so deferring ALL dedup to one finalize-time
# scan over the merged run is a large net win whenever the raw records fit
# device memory (they do below ~250M records/lane-pair; the store falls
# back to collapsing into the deduped LSM past a byte budget). Count/ext
# sums are identical either way: per-block sums clamp only at the shared
# u16 ceiling, and clamped partial sums re-clamped at merge time equal the
# one-shot clamped total (both saturate at the ceiling together).


@partial(jax.jit, static_argnames=("k",))
def block_to_raw_run(codes, qual_ok, lens, k: int):
    """Read block -> ONE sorted packed run (weff uint32 lanes, 7-bit payload
    embedded in the last lane's free bits, sentinels all-ones at the tail).

    Requires payload_fits_in_keys(k, words32_for_k(k)). No scan, split, or
    occupancy fetch: the push is one sort and the block's host sync is zero.
    """
    from ..constants import words32_for_k

    W = words32_for_k(k)
    assert payload_fits_in_keys(k, W), k
    if _extract_pallas_ok(codes.shape[1]):
        from .pallas_extract import extract_packed_lanes

        lanes = extract_packed_lanes(codes, qual_ok, lens, k)
        packed = tuple(x.reshape(-1) for x in lanes)
    else:
        from ..constants import minimizer_len_for_k

        rec = read_kmer_records(codes, qual_ok, lens, k, minimizer_len_for_k(k))
        words = _sentinelize(rec["words"], rec["valid"])
        pay = jnp.where(
            rec["valid"],
            _pack_cnt_ext(rec["count"].astype(jnp.int32), rec["left"], rec["right"]),
            U32(0),
        )
        weff = -(-2 * k // 32)
        packed = pack_payload_into_lanes(
            tuple(words[:, i] for i in range(weff)), pay, k
        )
    return jax.lax.sort(packed, num_keys=len(packed), is_stable=False)


@partial(jax.jit, static_argnames=("k",))
def block_to_raw_run_sep(codes, qual_ok, lens, k: int):
    """block_to_raw_run for k where the 7-bit payload does NOT fit the key
    lanes' free bits (k=63/77): weff key lanes + ONE _pack_cnt_ext payload
    lane (count=1 | left << 16 | right << 24; 0 on sentinel rows), sorted by
    the key lanes (payload rides the sort)."""
    weff = -(-2 * k // 32)
    if _extract_pallas_ok(codes.shape[1]):
        from .pallas_extract import extract_record_lanes

        lanes, pay = extract_record_lanes(codes, qual_ok, lens, k)
        lanes = tuple(x.reshape(-1) for x in lanes[:weff])
        pay = pay.reshape(-1)
    else:
        from ..constants import minimizer_len_for_k

        rec = read_kmer_records(codes, qual_ok, lens, k, minimizer_len_for_k(k))
        words = _sentinelize(rec["words"], rec["valid"])
        pay = jnp.where(
            rec["valid"],
            _pack_cnt_ext(rec["count"].astype(jnp.int32), rec["left"], rec["right"]),
            U32(0),
        )
        lanes = tuple(words[:, i] for i in range(weff))
    out = jax.lax.sort(lanes + (pay,), num_keys=weff, is_stable=False)
    return out


def merge_raw_runs(runs, kw: int | None = None, donate: bool = False):
    """Balanced pairwise merge tree over sorted raw runs -> one sorted
    tuple of lanes. kw = number of leading key lanes (default: all lanes,
    the packed layout; the separate-payload layout passes len-1). TPU:
    Pallas bitonic merges (mid-padded to pow2, pads sliced back off);
    elsewhere one lax.sort per pair. donate=True hands each pair's buffers
    to XLA (callers that own the runs — the LSM — halve peak memory)."""
    runs = [tuple(r) for r in runs]
    if kw is None:
        kw = len(runs[0])
    from . import kernels

    on_tpu = kernels.enabled("sort")
    while len(runs) > 1:
        nxt = []
        for i in range(0, len(runs) - 1, 2):
            a, b = runs[i], runs[i + 1]
            if on_tpu:
                from .pallas_sort import (
                    merge_sorted_lanes_padded,
                    merge_sorted_lanes_padded_donated,
                )

                mfn = (merge_sorted_lanes_padded_donated if donate
                       else merge_sorted_lanes_padded)
                nxt.append(mfn(a, b, kw=kw))
            else:
                cat = tuple(jnp.concatenate([x, y]) for x, y in zip(a, b))
                nxt.append(jax.lax.sort(cat, num_keys=kw, is_stable=False))
        if len(runs) % 2:
            nxt.append(runs[-1])
        runs = nxt
    return runs[0]


@partial(jax.jit, static_argnames=("k", "W", "dmin_thres", "purge"))
def final_from_sorted_packed(sorted_lanes, k: int, W: int, dmin_thres: int = 2,
                             purge: bool = True):
    """ONE scan + compaction from a merged sorted packed run straight to the
    final table (purge=True: FinalTable arrays applying the reference purge
    rules kcount_cpu.cpp:497-517) or the unique aggregate (purge=False:
    (words, count, l4, r4, n_unique) for the ctg-rules path)."""
    weff = len(sorted_lanes)
    free = 32 * weff - 2 * k
    assert weff == -(-2 * k // 32) and free >= 7 and weff <= W, (k, W, weff)
    keymask_int = 0xFFFFFFFF ^ ((1 << free) - 1)
    keymask = U32(keymask_int)
    lowmask = U32((1 << free) - 1)
    N = sorted_lanes[0].shape[0]
    if _pallas_compact_ok(N, "finalize", "scan"):
        # fused kernel: scan + ext calls + purge + tile-local compaction in
        # ONE pass (ops/pallas_finalize.py), then the O(N) ragged append —
        # replaces the scan pass + elementwise purge pass + batched tile
        # flag sort (~51 ms alone at 36.7M rows on v5e)
        from .pallas_compact import ragged_append
        from .pallas_finalize import TILE as FTILE, scan_purge_compact

        pad = -(-N // FTILE) * FTILE - N
        lanes_p = tuple(sorted_lanes)
        if pad:
            lanes_p = tuple(
                jnp.concatenate([x, jnp.full((pad,), 0xFFFFFFFF, U32)])
                for x in lanes_p
            )
        comp, cnts = scan_purge_compact(
            lanes_p, k, dmin_thres=dmin_thres, purge=purge
        )
        off = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnts)]
        ).astype(jnp.int32)
        out = ragged_append(comp, jnp.zeros_like(cnts), off)
        n = off[-1]
        Np = lanes_p[0].shape[0]
        live = jnp.arange(Np, dtype=jnp.int32) < n
        u_words = jnp.stack(
            tuple(jnp.where(live, x, U32(0xFFFFFFFF)) for x in out[:weff])
            + (jnp.where(live, U32(0), U32(0xFFFFFFFF)),) * (W - weff),
            axis=-1,
        )
        if purge:
            cnt_s, left_s, right_s = _unpack_cnt_ext(
                jnp.where(live, out[weff], 0)
            )
            return (u_words, cnt_s, left_s, right_s, n)
        pays = tuple(jnp.where(live, x, 0) for x in out[weff : weff + 5])
        u_count, u_l4, u_r4 = _unpack_sums(*pays)
        return u_words, u_count, u_l4, u_r4, n
    slast = sorted_lanes[-1]
    # top-bits AND via subtraction (XLA:TPU miscompile, see revcomp_words)
    skey = slast - (slast & lowmask)
    sent = skey == keymask
    for x in sorted_lanes[:-1]:
        sent = sent & (x == U32(0xFFFFFFFF))
    clean_last = jnp.where(sent, U32(0xFFFFFFFF), skey)
    zero_lane = jnp.where(sent, U32(0xFFFFFFFF), U32(0))
    w = jnp.stack(
        tuple(sorted_lanes[:-1]) + (clean_last,) + (zero_lane,) * (W - weff),
        axis=-1,
    )
    cnt_in = jnp.where(sent, 0, 1).astype(jnp.int32)
    left_in = ((slast >> U32(1)) & U32(7)).astype(jnp.uint8)
    right_in = ((slast >> U32(4)) & U32(7)).astype(jnp.uint8)
    sums, is_last, _ = _group_sums_scan(
        w, cnt_in, _ext_onehot(left_in, cnt_in), _ext_onehot(right_in, cnt_in)
    )
    count = sums[:, 0]
    l4 = sums[:, 1:5]
    r4 = sums[:, 5:9]
    if not purge:
        keep = is_last & ~sent
        packed = _pack_sums(count, l4, r4)
        u_words, *pays, n_unique = _compact_keep(w, keep, packed)
        u_count, u_l4, u_r4 = _unpack_sums(*pays)
        return u_words, u_count, u_l4, u_r4, n_unique
    left = _get_ext_calls(l4, count, dmin_thres)
    right = _get_ext_calls(r4, count, dmin_thres)
    keep = is_last & ~sent & (count >= 2) & ~((left == EXT_X) & (right == EXT_X))
    packed = _pack_cnt_ext(count, left, right)
    w_s, pay, n_kept = _compact_keep(w, keep, (packed,))
    cnt_s, left_s, right_s = _unpack_cnt_ext(pay)
    return (w_s, cnt_s, left_s, right_s, n_kept)


@partial(jax.jit, static_argnames=("k", "W", "dmin_thres", "purge"))
def final_from_sorted_sep(sorted_lanes, k: int, W: int, dmin_thres: int = 2,
                          purge: bool = True):
    """final_from_sorted_packed for the separate-payload raw layout
    (block_to_raw_run_sep): weff key lanes + one _pack_cnt_ext payload
    lane, key-sorted."""
    weff = len(sorted_lanes) - 1
    assert weff == -(-2 * k // 32) and weff <= W, (k, W, weff)
    keys = sorted_lanes[:weff]
    pay = sorted_lanes[weff]
    N = keys[0].shape[0]
    if _pallas_compact_ok(N):
        from .pallas_compact import ragged_append
        from .pallas_finalize import TILE as FTILE, scan_purge_compact

        pad = -(-N // FTILE) * FTILE - N
        keys_p, pay_p = tuple(keys), pay
        if pad:
            keys_p = tuple(
                jnp.concatenate([x, jnp.full((pad,), 0xFFFFFFFF, U32)])
                for x in keys_p
            )
            pay_p = jnp.concatenate([pay_p, jnp.zeros((pad,), U32)])
        comp, cnts = scan_purge_compact(
            keys_p, k, dmin_thres=dmin_thres, purge=purge, pay=pay_p
        )
        off = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnts)]
        ).astype(jnp.int32)
        out = ragged_append(comp, jnp.zeros_like(cnts), off)
        n = off[-1]
        Np = keys_p[0].shape[0]
        live = jnp.arange(Np, dtype=jnp.int32) < n
        u_words = jnp.stack(
            tuple(jnp.where(live, x, U32(0xFFFFFFFF)) for x in out[:weff])
            + (jnp.where(live, U32(0), U32(0xFFFFFFFF)),) * (W - weff),
            axis=-1,
        )
        if purge:
            cnt_s, left_s, right_s = _unpack_cnt_ext(
                jnp.where(live, out[weff], 0)
            )
            return (u_words, cnt_s, left_s, right_s, n)
        pays = tuple(jnp.where(live, x, 0) for x in out[weff : weff + 5])
        u_count, u_l4, u_r4 = _unpack_sums(*pays)
        return u_words, u_count, u_l4, u_r4, n
    cnt_in, left_in, right_in = _unpack_cnt_ext(pay)
    sent = cnt_in == 0
    zero_lane = jnp.where(sent, U32(0xFFFFFFFF), U32(0))
    w = jnp.stack(tuple(keys) + (zero_lane,) * (W - weff), axis=-1)
    sums, is_last, _ = _group_sums_scan(
        w, cnt_in, _ext_onehot(left_in, cnt_in), _ext_onehot(right_in, cnt_in)
    )
    count = sums[:, 0]
    l4 = sums[:, 1:5]
    r4 = sums[:, 5:9]
    if not purge:
        keep = is_last & ~sent
        packed = _pack_sums(count, l4, r4)
        u_words, *pays, n_unique = _compact_keep(w, keep, packed)
        u_count, u_l4, u_r4 = _unpack_sums(*pays)
        return u_words, u_count, u_l4, u_r4, n_unique
    left = _get_ext_calls(l4, count, dmin_thres)
    right = _get_ext_calls(r4, count, dmin_thres)
    keep = is_last & ~sent & (count >= 2) & ~((left == EXT_X) & (right == EXT_X))
    packed = _pack_cnt_ext(count, left, right)
    w_s, payo, n_kept = _compact_keep(w, keep, (packed,))
    cnt_s, left_s, right_s = _unpack_cnt_ext(payo)
    return (w_s, cnt_s, left_s, right_s, n_kept)


@partial(jax.jit, static_argnames=("k", "W"))
def split_from_sorted_sep(sorted_lanes, k: int, W: int):
    """aggregate_split tail for a key-sorted separate-payload raw run (the
    raw-LSM byte-budget collapse path at k=63/77)."""
    weff = len(sorted_lanes) - 1
    keys = sorted_lanes[:weff]
    pay = sorted_lanes[weff]
    cnt, left_s, right_s = _unpack_cnt_ext(pay)
    sent = cnt == 0
    zero_lane = jnp.where(sent, U32(0xFFFFFFFF), U32(0))
    w = jnp.stack(tuple(keys) + (zero_lane,) * (W - weff), axis=-1)
    l4 = _ext_onehot(left_s, cnt)
    r4 = _ext_onehot(right_s, cnt)
    sums, is_last, is_sent = _group_sums_scan(w, cnt, l4, r4)
    return _split_from_scanned(w, sums, is_last, is_sent)


@partial(jax.jit, static_argnames=("dmin_thres", "purge"))
def final_fold_runs(runs, dmin_thres: int = 2, purge: bool = True):
    """Fold ALL outstanding split runs straight into the final table.

    One dispatch replacing the finalize cascade (LSM tail merges ->
    split-compact -> re-merge of the just-split parts -> dedup-compact ->
    finalize_table compact): the split runs are expanded once, pairwise
    bitonic-merged as a balanced tree WITHOUT intermediate dedups (merging
    never grows the row total, and the final segmented scan handles any key
    multiplicity in one pass), then a single group-sums scan feeds the
    extension calls and ONE compaction emits the final table. Eliminates two
    full-array compaction passes, one redundant bitonic merge, and the
    per-merge occupancy round-trips of the unfused path (each a ~34 ms
    tunnel RTT).

    runs: tuple of 8-tuple split runs (m_words, m_count, m_l4, m_r4, n_m,
    s_words, s_ext, n_s), each part lexsorted. With purge=True returns the
    FinalTable arrays (words, count, left, right, n_kept) applying the
    reference purge rules (kcount_cpu.cpp:497-517); with purge=False returns
    the unique aggregate (words, count i32, l4, r4, n_unique) for the
    ctg-rules path (counts still u16-clamped by the scan, matching
    _dedup_sorted semantics).
    """
    leaves = []
    for r in runs:
        leaves.append(r[:4])
        leaves.append(expand_singles(r[5], r[6], r[7]))
    while len(leaves) > 1:
        nxt = [
            _merge_sorted_sets(leaves[i], leaves[i + 1])
            for i in range(0, len(leaves) - 1, 2)
        ]
        if len(leaves) % 2:
            nxt.append(leaves[-1])
        leaves = nxt
    w, cnt, l4, r4 = leaves[0]
    sums, is_last, is_sent = _group_sums_scan(w, cnt, l4, r4)
    count = sums[:, 0]
    if not purge:
        keep = is_last & ~is_sent
        packed = _pack_sums(count, sums[:, 1:5], sums[:, 5:9])
        u_words, *pays, n_unique = _compact_keep(w, keep, packed)
        u_count, u_l4, u_r4 = _unpack_sums(*pays)
        return u_words, u_count, u_l4, u_r4, n_unique
    left = _get_ext_calls(sums[:, 1:5], count, dmin_thres)
    right = _get_ext_calls(sums[:, 5:9], count, dmin_thres)
    keep = is_last & ~is_sent & (count >= 2) & ~((left == EXT_X) & (right == EXT_X))
    packed = _pack_cnt_ext(count, left, right)
    w_s, pay, n_kept = _compact_keep(w, keep, (packed,))
    cnt_s, left_s, right_s = _unpack_cnt_ext(pay)
    return (w_s, cnt_s, left_s, right_s, n_kept)


@partial(jax.jit, static_argnames=("dmin_thres",))
def finalize_table(u_words, u_count, u_l4, u_r4, n_unique, dmin_thres: int = 2):
    """Clamp counts, call extensions, purge, and compact the final table.

    Purge rules (reference kcount_cpu.cpp:497-517): drop count < 2 and drop
    left=='X' and right=='X'. Output rows are sorted by key with kept rows in
    a dense prefix of length n_kept.

    Returns (words, count u16->i32, left u8, right u8, n_kept).
    """
    N = u_words.shape[0]
    count = jnp.minimum(u_count.astype(jnp.int32), jnp.int32(MAX_KMER_COUNT))
    l4 = jnp.minimum(u_l4.astype(jnp.int32), jnp.int32(MAX_KMER_COUNT))
    r4 = jnp.minimum(u_r4.astype(jnp.int32), jnp.int32(MAX_KMER_COUNT))
    left = _get_ext_calls(l4, count, dmin_thres)
    right = _get_ext_calls(r4, count, dmin_thres)
    row_valid = jnp.arange(N) < n_unique
    keep = row_valid & (count >= 2) & ~((left == EXT_X) & (right == EXT_X))
    # compact: rows arrive lexsorted, so a stable keep-compaction carrying
    # one packed (count|left|right) lane keeps the kept prefix sorted
    packed = _pack_cnt_ext(count, left, right)
    w_s, pay, n_kept = _compact_keep(u_words, keep, (packed,))
    cnt_s, left_s, right_s = _unpack_cnt_ext(pay)
    return (w_s, cnt_s, left_s, right_s, n_kept)

# ---------------------------------------------------------------------------
# Donated variants: identical semantics, but the inputs' device buffers are
# DONATED to XLA (aliased into outputs/temporaries). The LSM call sites
# always consume their inputs (runs are popped before merging), and at
# arctic scale (27 Mbp single chip) the non-donated forms held input +
# output + merge-tree temporaries simultaneously — the peak that OOMed a
# 16 GiB v5e. Donation at the top-level jit boundary roughly halves it.
# ---------------------------------------------------------------------------

merge_split4_donated = jax.jit(merge_split4.__wrapped__, donate_argnums=(0, 1, 2, 3))
merge_aggregates_donated = jax.jit(merge_aggregates.__wrapped__, donate_argnums=tuple(range(8)))
split_from_sorted_packed_donated = jax.jit(
    split_from_sorted_packed.__wrapped__, static_argnames=("k", "W"), donate_argnums=(0,)
)
split_from_sorted_sep_donated = jax.jit(
    split_from_sorted_sep.__wrapped__, static_argnames=("k", "W"), donate_argnums=(0,)
)
final_from_sorted_packed_donated = jax.jit(
    final_from_sorted_packed.__wrapped__,
    static_argnames=("k", "W", "dmin_thres", "purge"), donate_argnums=(0,),
)
final_from_sorted_sep_donated = jax.jit(
    final_from_sorted_sep.__wrapped__,
    static_argnames=("k", "W", "dmin_thres", "purge"), donate_argnums=(0,),
)
final_fold_runs_donated = jax.jit(
    final_fold_runs.__wrapped__,
    static_argnames=("dmin_thres", "purge"), donate_argnums=(0,),
)
