"""Vectorized binary search over sorted k-mer tables.

The per-shard table is a lexsorted dense array of packed k-mer words; point
queries become a batched lower-bound search — the TPU-native replacement for
the reference's per-kmer hash probes (kcount_cpu.cpp:231-267) and RPC lookups
(kmer_dht.cpp:199-219).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _lex_less_rows(a, b):
    """a < b lexicographically for (..., W) uint32 rows."""
    W = a.shape[-1]
    lt = a[..., W - 1] < b[..., W - 1]
    for w in range(W - 2, -1, -1):
        lt = (a[..., w] < b[..., w]) | ((a[..., w] == b[..., w]) & lt)
    return lt


def _lex_leq_rows(a, b):
    """a <= b lexicographically for (..., W) uint32 rows."""
    W = a.shape[-1]
    le = a[..., W - 1] <= b[..., W - 1]
    for w in range(W - 2, -1, -1):
        le = (a[..., w] < b[..., w]) | ((a[..., w] == b[..., w]) & le)
    return le


# test override for the merge-join fast path: None = auto (TPU only),
# True/False forces (CPU tests run it in Pallas interpret mode)
_USE_MERGE_JOIN = None

# fused (row | flag | payload)-in-one-u32 limit: row ids need 25 bits, the
# query flag bit 25, payload the top bits. Tables at/above 2^25 rows fall
# back to the separate-lane path (tests shrink this to drive that path)
_FUSED_MAX_ROWS = 1 << 25


def _compact_tile() -> int:
    from .pallas_compact import TILE

    return TILE


def _sort_join(table_words, n_valid, query_words, payload, max_dup: int,
               payload_bits: int = 32):
    """Shared sort-join core; payload is an optional (T,) uint32 lane that
    rides the join (returned per query alongside idx) — fetching table
    attributes through the join instead of post-join dynamic gathers, the
    XLA:TPU anti-pattern (a row gather at millions of indices costs several
    times the extra sort lane). When (T+1) << payload_bits fits u32, the
    (idx, payload) combo propagates in ONE u32 lane instead of an i64 (i64
    lanes cost 2x through the sort network and propagation on TPU).

    MERGE-JOIN fast path (TPU + fused lane): the table side is ALWAYS
    already lexsorted (dense sorted prefix + sentinel tail), so sorting the
    (T+Q) concatenation wastes the table's order. Instead only the Q query
    rows are comparator-sorted and the two sorted runs meet in the Pallas
    bitonic-merge network (ops/pallas_sort.py, ~2.4x lax.sort on the merge
    task) — the join's dominant sort shrinks from (T+Q) to Q rows. Pad rows
    (to the merge's pow2 total) carry sentinel keys and a TABLE-flagged
    out-of-range source id, so the back-route compaction drops them with
    the table rows and the dest sort runs over exactly Q rows (the pad
    rows would otherwise inflate it ~1.5x at the de Bruijn edge shapes)."""
    T = table_words.shape[0]
    Q = query_words.shape[0]
    W = table_words.shape[1]
    # fuse (source row | is_query | payload) into ONE u32 lane when the bits
    # fit (row < 2^25 covers 33M-row tables/query sets; payloads are <= 6
    # bits on the de Bruijn edge path): one lane fewer through the join sort
    # is a ~25% traffic cut on its dominant op
    fused = (payload is not None and payload_bits + 26 <= 32
             and max(T, Q) < _FUSED_MAX_ROWS)
    from . import kernels

    use_merge = _USE_MERGE_JOIN
    if use_merge is None:
        use_merge = kernels.enabled("sort")
    if fused and use_merge:
        from .pallas_sort import merge_sorted_lanes_tiled

        interp = jax.default_backend() != "tpu"
        qsrc = jnp.arange(Q, dtype=jnp.uint32) | jnp.uint32(1 << 25)
        qs = jax.lax.sort(
            tuple(query_words[:, w] for w in range(W)) + (qsrc,),
            num_keys=W, is_stable=False,
        )
        tsrc = jnp.arange(T, dtype=jnp.uint32) | (
            payload.astype(jnp.uint32) << jnp.uint32(26)
        )
        a_lanes = tuple(table_words[:, w] for w in range(W)) + (tsrc,)
        # TILE-granular merge (virtual sentinel tiles cover the pow2 tail):
        # the former pow2 padding inflated the merged rows up to ~2x (42%
        # measured at the 22.5M-row edge-join shape) and every pad row rode
        # the propagation + compaction too. Pad src = 0x01FFFFFF: query
        # flag (bit 25) CLEAR so the back-route compaction drops pads with
        # the table rows, idx 0x1FFFFFF >= n_valid so a pad is never a
        # found answer in the propagation.
        out = merge_sorted_lanes_tiled(
            a_lanes, tuple(qs), kw=W, pad_fill=(0x01FFFFFF,), interpret=interp
        )
        qp = Q  # static query row count (for the back-route compact)
        # interpret mode (tests forcing _USE_MERGE_JOIN on CPU) keeps the
        # fused path; on TPU the registry can turn it off individually
        fuse_ok = interp or kernels.enabled("join", "compact", "scan")
        if fuse_ok:
            from .pallas_join import TILE as JTILE

            fuse_ok = out[0].shape[0] % JTILE == 0
        if fuse_ok:
            # fused epilogue: propagation + query compaction in ONE Pallas
            # pass (ops/pallas_join.py) instead of 5 XLA doubling rounds +
            # the 2-phase compaction; only the dest sort remains
            from .pallas_compact import ragged_append
            from .pallas_join import propagate_compact

            (dest, ans), cnts = propagate_compact(
                out, n_valid, kw=W, payload_bits=payload_bits,
                max_dup=max_dup, interpret=interp,
            )
            off = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnts)]
            ).astype(jnp.int32)
            routed = ragged_append(
                (dest, ans), jnp.zeros_like(cnts), off, interpret=interp
            )
            back = jax.lax.sort(
                (routed[0][:Q].astype(jnp.int32), routed[1][:Q]),
                num_keys=1, is_stable=True,
            )
            ans = back[1][:Q]
            found = ans > 0
            idx = jnp.clip(
                (ans >> jnp.uint32(payload_bits)).astype(jnp.int32) - 1, 0, T - 1
            )
            pay = ans & jnp.uint32((1 << payload_bits) - 1)
            return idx, found, pay
    else:
        words = jnp.concatenate([table_words, query_words])
        if fused:
            src = jnp.concatenate(
                [
                    jnp.arange(T, dtype=jnp.uint32),
                    jnp.arange(Q, dtype=jnp.uint32) | jnp.uint32(1 << 25),
                ]
            ) | (
                jnp.concatenate([payload.astype(jnp.uint32), jnp.zeros((Q,), jnp.uint32)])
                << jnp.uint32(26)
            )
            lanes = (src,)
        else:
            src = jnp.concatenate(
                [jnp.arange(T, dtype=jnp.uint32), jnp.arange(Q, dtype=jnp.uint32) | jnp.uint32(1 << 31)]
            )
            lanes = (src,)
            if payload is not None:
                lanes = lanes + (jnp.concatenate([payload.astype(jnp.uint32), jnp.zeros((Q,), jnp.uint32)]),)
        out = jax.lax.sort(
            tuple(words[:, w] for w in range(W)) + lanes, num_keys=W, is_stable=True
        )
        qp = None
    sw = jnp.stack(out[:W], axis=-1)
    if fused:
        sq = ((out[W] >> jnp.uint32(25)) & jnp.uint32(1)).astype(bool)
        ssrc = (out[W] & jnp.uint32(0x1FFFFFF)).astype(jnp.int32)
        pay_lane = out[W] >> jnp.uint32(26)
    else:
        sq = (out[W] >> jnp.uint32(31)).astype(bool)
        ssrc = (out[W] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        pay_lane = out[W + 1] if payload is not None else None
    is_t = ~sq & (ssrc < jnp.asarray(n_valid, jnp.int32))  # valid table rows
    narrow = payload is not None and (T + 1) * (1 << payload_bits) <= (1 << 32)
    if payload is None:
        prop = jnp.where(is_t, ssrc, -1)
    elif narrow:
        # (idx+1) << bits | payload in one u32; 0 = not found. maximum
        # propagates both (idx is unique per key: payload never decides)
        combo = ((ssrc + 1).astype(jnp.uint32) << jnp.uint32(payload_bits)) | pay_lane
        prop = jnp.where(is_t, combo, jnp.uint32(0))
    else:
        # idx and payload fused in one i64 lane so ONE maximum propagates
        # both (idx is unique per key, so the payload never decides)
        combo = (ssrc.astype(jnp.int64) << jnp.int64(32)) | pay_lane.astype(jnp.int64)
        prop = jnp.where(is_t, combo, jnp.int64(-1))
    # propagate the (unique) table idx across its equal-key run: sortedness
    # makes key-equality at distance s transitive, so doubling shifts cover
    # runs shorter than max_dup in log2(max_dup) steps, both directions.
    # The fill must be the dtype's "missing" value (0 for the unsigned
    # narrow combo, -1 for the signed paths) so maximum ignores it.
    miss = prop.dtype.type(0 if prop.dtype == jnp.uint32 else -1)
    s = 1
    while s < max_dup:
        same_d = jnp.all(sw[s:] == sw[:-s], axis=-1)
        down = jnp.concatenate([jnp.full((s,), miss, prop.dtype),
                                jnp.where(same_d, prop[:-s], miss)])
        up = jnp.concatenate([jnp.where(same_d, prop[s:], miss),
                              jnp.full((s,), miss, prop.dtype)])
        prop = jnp.maximum(prop, jnp.maximum(down, up))
        s *= 2
    # route answers back to query order with ONE stable 1-key sort by
    # destination (query source ids are unique, table rows sink to the tail)
    # instead of two scatters. On the merge path the query-row count is
    # STATIC (qp = Q exactly: pad rows are TABLE-flagged and drop with the
    # table rows), so an O(N) Pallas compaction first drops the table+pad
    # rows and the dest sort runs over exactly Q rows. This branch is the
    # merge path's non-tile-multiple fallback only — tile-multiple merged
    # sizes take the fused-epilogue early return above.
    dest = jnp.where(sq, ssrc, jnp.int32(T + Q))
    from . import kernels

    if (qp is not None
            and (kernels.enabled("compact") or jax.default_backend() != "tpu")
            and dest.shape[0] % _compact_tile() == 0
            and prop.dtype == jnp.uint32):
        from .pallas_compact import compact_classes

        flags = jnp.where(sq, 0, 1).astype(jnp.int32)
        ((lanes, _n),) = compact_classes(
            (dest.astype(jnp.uint32), prop), flags, 2, emit=(0,),
            interpret=jax.default_backend() != "tpu",
        )
        back = jax.lax.sort(
            (lanes[0][:qp].astype(jnp.int32), lanes[1][:qp]),
            num_keys=1, is_stable=True,
        )
    else:
        back = jax.lax.sort((dest, prop), num_keys=1, is_stable=True)
    ans = back[1][:Q]
    if payload is None:
        found = ans >= 0
        idx = jnp.clip(ans, 0, T - 1).astype(jnp.int32)
        return idx, found, None
    if narrow:
        found = ans > 0
        idx = jnp.clip((ans >> jnp.uint32(payload_bits)).astype(jnp.int32) - 1, 0, T - 1)
        pay = ans & jnp.uint32((1 << payload_bits) - 1)
        return idx, found, pay
    found = ans >= 0
    idx = jnp.clip(ans >> jnp.int64(32), 0, T - 1).astype(jnp.int32)
    pay = jnp.where(found, ans & jnp.int64(0xFFFFFFFF), 0).astype(jnp.uint32)
    return idx, found, pay


@partial(jax.jit, static_argnames=("max_dup",))
def table_join(table_words, n_valid, query_words, max_dup: int = 32):
    """Sort-join lookup: same contract as table_lookup (idx, found).

    TPU-preferred for large query sets: one lexsort of the (T+Q) rows plus a
    bounded log-shift propagation replaces the bisection loop, whose ~log(T)
    dynamic row gathers dominate on TPU (measured ~7x slower at millions of
    rows — XLA:TPU gathers are far more expensive than its sorts).

    Precondition: fewer than max_dup rows (table + queries combined) share
    any key — true for de Bruijn neighbor joins, where a key can be queried
    by at most 8 right-walking and 8 left-walking k-mers (one query each, so
    <= 17 rows per key; default 32 covers it). Callers must
    sentinelize invalid queries (all-ones) so they cannot crowd a valid key's
    neighborhood; sentinel-keyed rows never match (table sentinels are
    excluded by n_valid).
    """
    idx, found, _ = _sort_join(table_words, n_valid, query_words, None, max_dup)
    return idx, found


@partial(jax.jit, static_argnames=("max_dup", "payload_bits"))
def table_join_payload(table_words, n_valid, query_words, payload,
                       max_dup: int = 32, payload_bits: int = 32):
    """table_join that also returns a (T,) uint32 table attribute per query.

    Returns (idx, found, pay); pay is payload[idx] where found, else 0 —
    computed join-side (no post-join gather). Declaring a tight
    payload_bits lets the (idx, payload) combo propagate in one u32 lane
    when (T+1) << payload_bits fits (i64 lanes cost 2x on TPU). Same
    preconditions as table_join.
    """
    return _sort_join(table_words, n_valid, query_words, payload, max_dup,
                      payload_bits)


@partial(jax.jit, static_argnames=("upper",))
def rank_rows(table_words, n_valid, query_words, upper: bool = False):
    """Rank of each query row in a lexsorted table prefix.

    rank = #table rows < query (lower, default) or <= query (upper=True),
    counting only the valid prefix of length n_valid. The merge primitive:
    two sorted runs interleave at positions i + rank(other, row) without any
    re-sort (cf. merge-path GPU merges; here a batched bisection).
    """
    T = table_words.shape[0]
    Q = query_words.shape[0]
    steps = max(1, (T - 1).bit_length() + 1) if T > 1 else 1
    lo = jnp.zeros((Q,), jnp.int32)
    hi = jnp.broadcast_to(jnp.asarray(n_valid, jnp.int32), (Q,))
    cmp = _lex_leq_rows if upper else _lex_less_rows

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) >> 1
        go_right = cmp(table_words[mid], query_words)
        active = lo < hi
        new_lo = jnp.where(active & go_right, mid + 1, lo)
        new_hi = jnp.where(active & ~go_right, mid, hi)
        return new_lo, new_hi

    lo, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


@jax.jit
def table_lookup(table_words, n_valid, query_words):
    """Lower-bound binary search of query rows in a lexsorted table prefix.

    table_words: (T, W) uint32 sorted rows, valid prefix length n_valid.
    query_words: (Q, W) uint32.
    Returns (idx (Q,) int32, found (Q,) bool); idx is meaningful iff found.
    """
    T = table_words.shape[0]
    Q = query_words.shape[0]
    steps = max(1, (T - 1).bit_length() + 1) if T > 1 else 1
    lo = jnp.zeros((Q,), jnp.int32)
    hi = jnp.broadcast_to(n_valid.astype(jnp.int32), (Q,))

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) >> 1
        rows = table_words[mid]
        less = _lex_less_rows(rows, query_words)
        active = lo < hi
        new_lo = jnp.where(active & less, mid + 1, lo)
        new_hi = jnp.where(active & ~less, mid, hi)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    idx = jnp.clip(lo, 0, T - 1)
    found = (lo < n_valid) & jnp.all(table_words[idx] == query_words, axis=-1)
    return idx, found
