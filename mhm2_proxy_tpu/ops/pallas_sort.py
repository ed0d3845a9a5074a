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


def _cross_kernel(kw: int, n_lanes: int, st: int):
    """Program t reads its tile and its partner tile (t XOR st) and writes
    its own tile's post-exchange value (min side if t is the low tile)."""

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
        for out, l, h in zip(refs[2 * n_lanes :], lo, hi):
            keep_lo = jnp.where(swap, h, l)
            keep_hi = jnp.where(swap, l, h)
            out[:] = jnp.where(am_hi, keep_hi, keep_lo)

    return kernel


def _bitonic_network(vals, kw: int, interpret: bool):
    """Full bitonic-merge network on a tuple of (M,) lanes; M a power of two
    and the input a bitonic sequence."""
    M = vals[0].shape[0]
    n_lanes = len(vals)
    roll_below = 1 if interpret else (1 << 30)
    # (rows, 128) layout: keeps blocks >= 2-D, which both Mosaic and the
    # vmap batching rule for pallas_call require
    vals = tuple(v.reshape(M // 128, 128) for v in vals)
    # Mosaic rejects i64 index scalars; the package enables x64 globally, so
    # trace the kernel bodies and index maps with x64 off (everything is u32)
    with jax.enable_x64(False):
        if M <= TILE:
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

        T = M // TILE
        rows = TILE // 128
        shape2 = (M // 128, 128)
        span = M // 2
        while span >= TILE:
            st = span // TILE
            self_spec = pl.BlockSpec(
                (rows, 128), lambda t: (t, 0), memory_space=pltpu.VMEM
            )
            partner_spec = pl.BlockSpec(
                (rows, 128), lambda t, st=st: (t ^ st, 0), memory_space=pltpu.VMEM
            )
            vals = pl.pallas_call(
                _cross_kernel(kw, n_lanes, st),
                grid=(T,),
                out_shape=tuple(
                    jax.ShapeDtypeStruct(shape2, U32) for _ in range(n_lanes)
                ),
                in_specs=[self_spec] * n_lanes + [partner_spec] * n_lanes,
                out_specs=tuple(self_spec for _ in range(n_lanes)),
                interpret=interpret,
            )(*vals, *vals)
            span //= 2

        spec = pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        vals = pl.pallas_call(
            _tail_kernel(kw, n_lanes, TILE // 2, roll_below),
            grid=(T,),
            out_shape=tuple(jax.ShapeDtypeStruct(shape2, U32) for _ in range(n_lanes)),
            in_specs=[spec] * n_lanes,
            out_specs=tuple(spec for _ in range(n_lanes)),
            interpret=interpret,
        )(*vals)
    return tuple(v.reshape(M) for v in vals)


@partial(jax.jit, static_argnames=("kw", "interpret"))
def merge_sorted_lanes_padded(a_lanes, b_lanes, kw: int, interpret: bool = False):
    """merge_sorted_lanes for ARBITRARY (non-pow2) run lengths.

    Sentinel pad rows (all-ones KEY lanes, the empty-key convention) are
    inserted BETWEEN a and reversed(b): ascending-a then all-ones then
    descending-b is still bitonic, so the standard network applies at the
    next pow2 size. All-ones keys sort to the tail, where exactly `pad` of
    the trailing sentinel rows are sliced off statically. Non-key lanes pad
    with a real sentinel row's fill (0 — e.g. the separate-payload raw
    layout zeroes the payload of sentinel rows): bitonicity depends only on
    the kw key lanes, and a matching fill makes pad rows truly
    indistinguishable from real sentinels (an all-ones payload pad could
    land in the kept prefix and leak a count=0xFFFF row into downstream
    intermediates).
    """
    A = a_lanes[0].shape[0]
    B = b_lanes[0].shape[0]
    total = A + B
    m = 1 << max(8, (total - 1).bit_length())
    pad = m - total
    if pad == 0:
        return merge_sorted_lanes(a_lanes, b_lanes, kw, interpret)
    ones = jnp.full((pad,), 0xFFFFFFFF, U32)
    zeros = jnp.zeros((pad,), U32)
    vals = tuple(
        jnp.concatenate([a, ones if i < kw else zeros, b[::-1]])
        for i, (a, b) in enumerate(zip(a_lanes, b_lanes))
    )
    out = _bitonic_network(vals, kw, interpret)
    return tuple(v[:total] for v in out)


@partial(jax.jit, static_argnames=("kw", "interpret"))
def merge_sorted_lanes(a_lanes, b_lanes, kw: int, interpret: bool = False):
    """Merge two sorted runs given as tuples of (N,) uint32 lanes.

    Both runs must be lexicographically sorted on their first kw lanes
    (lane 0 most significant) with power-of-two lengths whose sum is a power
    of two times a power of two... (callers use equal or 2:1 pow2 sizes; any
    pow2 total works). Returns merged (len(a)+len(b),) lanes. Not stable.
    """
    vals = tuple(jnp.concatenate([a, b[::-1]]) for a, b in zip(a_lanes, b_lanes))
    return _bitonic_network(vals, kw, interpret)

# Donated variant: inputs' buffers are consumed (the LSM merge tree's call
# sites never reuse a merged-away run) — halves peak HBM at arctic-scale
# merges (see ops/count.py donated variants note).
merge_sorted_lanes_padded_donated = jax.jit(
    merge_sorted_lanes_padded.__wrapped__,
    static_argnames=("kw", "interpret"), donate_argnums=(0, 1),
)
