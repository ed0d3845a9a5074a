"""Pallas bitonic merge of sorted multi-lane runs (the LSM's hot op).

XLA:TPU's general sort runs at ~1-2% of the HBM roofline (measured 106M
rows/s at 18M rows = ~8 GB/s effective on a ~820 GB/s v5e): its comparator
network materializes every substage to HBM. Merging two ALREADY-SORTED runs
(which is what the LSM count store does all day — the reference's
aggregating-store merge path) needs far less: concat(A, reverse(B)) is a
bitonic sequence, so one bitonic-merge network of log2(2N) compare-exchange
substages sorts it. Substages with span >= TILE rows are REGULAR two-tile
elementwise kernels (tile t's partner is tile t XOR span/TILE at identical
in-tile offsets — no shuffles, no gathers); all substages with span < TILE
fuse into ONE kernel whose tile stays VMEM-resident. HBM passes:
~1.5 * log2(n_tiles) + 2 instead of log2(2N).

Rows are tuples of (N,) uint32 lanes (the count store's native layout); keys
are the first `kw` lanes compared lexicographically, most-significant LAST
(lane 0 is the most significant word, matching ops.count._sort_carry's
operand order). Bitonic exchange is not stable, but every consumer is
order-invariant within equal keys (segmented reduces); determinism is
preserved.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32

# rows per tile: working set = (2 input + 1 output) tiles x n_lanes x 4B,
# DOUBLE-buffered by the Mosaic grid pipeline, must fit VMEM (~16 MB):
# 32k rows x 7 lanes x 4B x (in+out, double-buffered) + substage temporaries
TILE = 1 << 15


def _lex_gt(lo, hi, kw: int):
    """lo > hi lexicographically on the first kw lanes (lane 0 = most
    significant)."""
    gt = lo[kw - 1] > hi[kw - 1]
    for w in range(kw - 2, -1, -1):
        gt = (lo[w] > hi[w]) | ((lo[w] == hi[w]) & gt)
    return gt


def _cmpx_tail(vals, kw: int, max_span: int, roll_below: int = 1):
    """All compare-exchange substages with span <= max_span, on values.

    roll_below is kept for the interpret path (CPU tests): spans >=
    roll_below use the (n/2s, 2, s) reshape formulation. Compiled TPU
    kernels pass roll_below > max_span so every substage exchanges via two
    rolls + an XOR-bit select — Mosaic cannot shape-cast vectors through
    arbitrary 3-D reshapes, but lane rolls (axis 1) and sublane rolls
    (axis 0) compile fine.
    """
    R2, _ = vals[0].shape
    n = R2 * 128
    s = max_span
    while s >= roll_below:
        r = [v.reshape(n // (2 * s), 2, s) for v in vals]
        lo = [v[:, 0, :] for v in r]
        hi = [v[:, 1, :] for v in r]
        swap = _lex_gt(lo, hi, kw)
        new = []
        for l, h in zip(lo, hi):
            nl = jnp.where(swap, h, l)
            nh = jnp.where(swap, l, h)
            new.append(jnp.stack([nl, nh], axis=1).reshape(n))
        vals = [v.reshape(R2, 128) for v in new]
        s //= 2
    if s >= 1:
        R = n // 128
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        while s >= 1:
            if s >= 128:
                sr = s // 128  # partner row distance (sublane roll)
                am_hi = (row & sr) != 0
                partner = [
                    jnp.where(
                        am_hi,
                        pltpu.roll(v, jnp.int32(sr), axis=0),
                        pltpu.roll(v, jnp.int32(R - sr), axis=0),
                    )
                    for v in vals
                ]
            else:
                am_hi = (lane & s) != 0
                partner = [
                    jnp.where(
                        am_hi,
                        pltpu.roll(v, jnp.int32(s), axis=1),
                        pltpu.roll(v, jnp.int32(128 - s), axis=1),
                    )
                    for v in vals
                ]
            lo = [jnp.where(am_hi, p, v) for v, p in zip(vals, partner)]
            hi = [jnp.where(am_hi, v, p) for v, p in zip(vals, partner)]
            swap = _lex_gt(lo, hi, kw)
            # lo keeps min, hi keeps max: in both cases the element takes its
            # partner's value exactly when the (lo, hi) pair is out of order
            vals = [jnp.where(swap, p, v) for v, p in zip(vals, partner)]
            s //= 2
    return [v.reshape(R2, 128) for v in vals]


def _tail_kernel(kw: int, n_lanes: int, max_span: int, roll_below: int):
    def kernel(*refs):
        vals = [r[:] for r in refs[:n_lanes]]
        vals = _cmpx_tail(vals, kw, max_span, roll_below)
        for o, v in zip(refs[n_lanes:], vals):
            o[:] = v

    return kernel


def _cross_kernel(kw: int, n_lanes: int, st: int, t_phys: int | None = None):
    """Program t reads its tile and its partner tile (t XOR st) and writes
    its own tile's post-exchange value (min side if t is the low tile).

    t_phys (virtual-tile mode): tiles >= t_phys are VIRTUAL all-sentinel
    tiles that are never materialized — a tile whose partner is virtual is
    the low side of a compare with +inf and keeps its own values (the
    partner BlockSpec clamps to self; the exchange is masked out here)."""

    st_log2 = st.bit_length() - 1

    def kernel(*refs):
        t = pl.program_id(0)
        mine = [r[:] for r in refs[:n_lanes]]
        other = [r[:] for r in refs[n_lanes : 2 * n_lanes]]
        am_hi = (
            jax.lax.bitwise_and(
                jax.lax.shift_right_logical(t, jnp.int32(st_log2)), jnp.int32(1)
            )
            == 1
        )
        # lo/hi in network order
        lo = [jnp.where(am_hi, o, m) for m, o in zip(mine, other)]
        hi = [jnp.where(am_hi, m, o) for m, o in zip(mine, other)]
        swap = _lex_gt(lo, hi, kw)
        real = (
            jnp.bitwise_xor(t, jnp.int32(st)) < jnp.int32(t_phys)
            if t_phys is not None else None
        )
        for out, m, l, h in zip(refs[2 * n_lanes :], mine, lo, hi):
            keep_lo = jnp.where(swap, h, l)
            keep_hi = jnp.where(swap, l, h)
            ex = jnp.where(am_hi, keep_hi, keep_lo)
            out[:] = ex if real is None else jnp.where(real, ex, m)

    return kernel


def _bitonic_network(vals, kw: int, interpret: bool):
    """Bitonic-merge network on a tuple of (P,) lanes holding a bitonic
    sequence whose sentinel (all-ones-key) tail extends VIRTUALLY to the
    next power of two M >= P.

    P == M (the classic case) runs the full network. P < M (P a TILE
    multiple) runs the same network over only the P physical rows: the
    virtual rows [P, M) hold +inf keys forever (an exchange writes
    max(x, +inf) = +inf back to them), so (a) cross-tile stages whose span
    >= P/TILE pair every physical tile with a virtual one and are identity
    — skipped outright; (b) within remaining stages, a tile whose partner
    is virtual passes through unchanged (masked in _cross_kernel). Cuts the
    merge's HBM traffic from M to P rows per stage — the pow2 padding this
    replaces wasted up to ~2x (measured 42% at the de Bruijn join's 22.5M-
    row shape, BASELINE.md round-4)."""
    P = vals[0].shape[0]
    M = 1 << max(8, (P - 1).bit_length())
    n_lanes = len(vals)
    roll_below = 1 if interpret else (1 << 30)
    # (rows, 128) layout: keeps blocks >= 2-D, which both Mosaic and the
    # vmap batching rule for pallas_call require
    vals = tuple(v.reshape(P // 128, 128) for v in vals)
    # Mosaic rejects i64 index scalars; the package enables x64 globally, so
    # trace the kernel bodies and index maps with x64 off (everything is u32)
    with jax.enable_x64(False):
        if P <= TILE:
            assert P == M, "sub-TILE inputs must be physically pow2-padded"
            out = pl.pallas_call(
                _tail_kernel(kw, n_lanes, M // 2, roll_below),
                out_shape=tuple(
                    jax.ShapeDtypeStruct((M // 128, 128), U32) for _ in range(n_lanes)
                ),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_lanes,
                out_specs=tuple(
                    pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_lanes)
                ),
                interpret=interpret,
            )(*vals)
            return tuple(v.reshape(M) for v in out)

        assert P % TILE == 0, "multi-tile inputs must be TILE-aligned"
        T = P // TILE
        rows = TILE // 128
        shape2 = (P // 128, 128)
        span = M // 2
        while span >= TILE:
            st = span // TILE
            span //= 2
            if st >= T:
                continue  # every partner tile is virtual: identity stage
            self_spec = pl.BlockSpec(
                (rows, 128), lambda t: (t, 0), memory_space=pltpu.VMEM
            )
            partner_spec = pl.BlockSpec(
                (rows, 128),
                # clamp virtual partners to self; the kernel masks them out
                lambda t, st=st, T=T: (
                    jnp.where(jnp.bitwise_xor(t, st) >= T, t, jnp.bitwise_xor(t, st)),
                    0,
                ),
                memory_space=pltpu.VMEM,
            )
            vals = pl.pallas_call(
                _cross_kernel(kw, n_lanes, st, t_phys=None if P == M else T),
                grid=(T,),
                out_shape=tuple(
                    jax.ShapeDtypeStruct(shape2, U32) for _ in range(n_lanes)
                ),
                in_specs=[self_spec] * n_lanes + [partner_spec] * n_lanes,
                out_specs=tuple(self_spec for _ in range(n_lanes)),
                interpret=interpret,
            )(*vals, *vals)

        spec = pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        vals = pl.pallas_call(
            _tail_kernel(kw, n_lanes, TILE // 2, roll_below),
            grid=(T,),
            out_shape=tuple(jax.ShapeDtypeStruct(shape2, U32) for _ in range(n_lanes)),
            in_specs=[spec] * n_lanes,
            out_specs=tuple(spec for _ in range(n_lanes)),
            interpret=interpret,
        )(*vals)
    return tuple(v.reshape(P) for v in vals)


def _merge_anylen_core(a_lanes, b_lanes, kw: int, pad_fill, slice_out: bool,
                       interpret: bool):
    """Merge core for arbitrary run lengths at TILE granularity.

    Layout: reversed(b) (descending) then a (ascending) then sentinel pad
    rows (all-ones keys, ascending) — down-then-up, a rotation of up-down,
    so the standard bitonic network applies. Pads only reach the next TILE
    boundary (<= 32k rows); from there to the next power of two the tail is
    VIRTUAL (see _bitonic_network) — the pow2 physical padding this
    replaces cost up to ~2x the merge's HBM traffic (42% measured at the
    edge join's 22.5M-row shape).

    Non-key pad lanes fill with pad_fill[i] (default 0, a real sentinel
    row's fill — an all-ones payload pad could land in the kept prefix and
    leak a count=0xFFFF row downstream). slice_out=False returns the full
    TILE-aligned physical rows (trailing pads included) for callers that
    need tile-multiple shapes (the join's fused epilogue).
    """
    A = a_lanes[0].shape[0]
    B = b_lanes[0].shape[0]
    total = A + B
    m = 1 << max(8, (total - 1).bit_length())
    P = m if m <= TILE else -(-total // TILE) * TILE
    pad = P - total
    # ALWAYS the down-up layout, even at pad == 0: up-down (a, rev(b)) plus
    # the network's virtual +inf tail is up-down-up — NOT bitonic. A pad==0
    # delegation to the up-down path at a non-pow2 tile count silently
    # produced UNSORTED merges (hit at the arctic collapse's exact
    # 36,700,160-row = 1120-tile shape; downstream dedup over the "sorted"
    # run then left ~12M duplicate keys in the k=21 table).
    fills = [0xFFFFFFFF] * kw + list(
        pad_fill if pad_fill is not None else [0] * (len(a_lanes) - kw)
    )
    vals = tuple(
        jnp.concatenate(
            [b[::-1], a] + ([jnp.full((pad,), fills[i], U32)] if pad else [])
        )
        for i, (a, b) in enumerate(zip(a_lanes, b_lanes))
    )
    out = _bitonic_network(vals, kw, interpret)
    if slice_out:
        out = tuple(v[:total] for v in out)
    return out


@partial(jax.jit, static_argnames=("kw", "interpret"))
def merge_sorted_lanes_padded(a_lanes, b_lanes, kw: int, interpret: bool = False):
    """merge_sorted_lanes for ARBITRARY (non-pow2) run lengths (see
    _merge_anylen_core for the layout and virtual-tile padding scheme)."""
    return _merge_anylen_core(a_lanes, b_lanes, kw, None, True, interpret)


@partial(jax.jit, static_argnames=("kw", "pad_fill", "interpret"))
def merge_sorted_lanes_tiled(a_lanes, b_lanes, kw: int,
                             pad_fill: tuple = None, interpret: bool = False):
    """Anylen merge returning TILE-aligned physical rows (pads included).

    Trailing pad rows carry all-ones keys and pad_fill[i] per non-key lane
    — callers that tag pads for a downstream compaction (the sort-join's
    back-route) declare the tag here instead of materializing pow2 pads."""
    return _merge_anylen_core(a_lanes, b_lanes, kw, pad_fill, False, interpret)


@partial(jax.jit, static_argnames=("kw", "interpret"))
def merge_sorted_lanes(a_lanes, b_lanes, kw: int, interpret: bool = False):
    """Merge two sorted runs given as tuples of (N,) uint32 lanes.

    Both runs must be lexicographically sorted on their first kw lanes
    (lane 0 most significant); any total length works (TILE-granular pads +
    virtual sentinel tiles, see _merge_anylen_core). Returns merged
    (len(a)+len(b),) lanes. Not stable."""
    return _merge_anylen_core(a_lanes, b_lanes, kw, None, True, interpret)

# Donated variant: inputs' buffers are consumed (the LSM merge tree's call
# sites never reuse a merged-away run) — halves peak HBM at arctic-scale
# merges (see ops/count.py donated variants note).
merge_sorted_lanes_padded_donated = jax.jit(
    merge_sorted_lanes_padded.__wrapped__,
    static_argnames=("kw", "interpret"), donate_argnums=(0, 1),
)
