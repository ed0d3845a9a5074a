"""Pallas stable compaction: gather flagged rows to a dense prefix.

Stable compaction (keep-flagged rows to the front, order preserved) is the
count pipeline's single hottest primitive: every dedup, multi/single split,
and finalize purge is one. The XLA formulation is a 1-key stable flag sort —
a full O(N log^2 N) comparator network over all payload lanes (~250 ms for
8 lanes at 18M rows on v5e) for what is information-theoretically one read
and one (smaller) write.

Two-phase reformulation:

1. TILE-LOCAL flag sort (XLA batched lax.sort over (T, TILE) segments):
   each tile's kept rows move to the tile prefix, stably. A tile-local
   network is log^2(TILE)/log^2(N) (~2.5x) cheaper than the global sort and
   XLA batches it perfectly.
2. RAGGED APPEND (the Pallas kernel here): per-tile kept prefixes are
   concatenated at exact element offsets (exclusive scan of per-tile
   counts, scalar-prefetched). The kernel walks tiles sequentially; each
   step element-rolls its segment to the destination offset (one dynamic
   lane roll + two sublane rolls + an iota select) and merges it into the
   current output tile, spilling the part that crosses the tile boundary
   into a VMEM carry scratch. Output blocks are revisited across steps
   (out block index = out_off[t] // TILE, nondecreasing), so the whole
   append is ONE HBM read + ONE HBM write of the data.

The combination replaces the global flag sort at ~2.5x less comparator work
plus an O(N) pass, and generalizes to multi-class splits (one tile-local
3-way sort, then one append per emitted class).

Rows are tuples of (N,) uint32 lanes; flags are int32 classes. Segment
extraction masks by exact element windows, so tiles may contain arbitrary
junk outside their [start, start+count) segment.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
I32 = jnp.int32

# elements per tile; TR = TILE // 128 sublane rows. VMEM per lane:
# (in + out + carry + 2 canvases) * TILE * 4B; 8 lanes at 32k rows ~ 5 MB
# plus double buffering.
TILE = 1 << 15


def _element_roll(x2, shift, lane, two_tr, roll):
    """Roll a (2TR, 128) block by `shift` ELEMENTS in logical row-major
    order (element index = row*128 + lane). shift is a traced nonnegative
    i32 < 2*TILE. One dynamic lane roll + two dynamic sublane rolls + a
    lane-index select (wrapped lanes advance one extra row)."""
    lam = jax.lax.rem(shift, jnp.int32(128))
    rho = jax.lax.div(shift, jnp.int32(128))
    xr = roll(x2, lam, axis=1)
    a = roll(xr, rho, axis=0)
    b = roll(xr, jax.lax.rem(rho + 1, jnp.int32(two_tr)), axis=0)
    return jnp.where(lane < lam, b, a)


def _append_kernel(n_lanes: int, tr: int, interpret: bool, n_out_blocks: int):
    two_tr = 2 * tr
    # pltpu.roll has no interpret-mode lowering; jnp.roll matches its
    # semantics (elements move toward higher indices) but compiles to a
    # gather on TPU, so it is interpret-only
    roll = jnp.roll if interpret else pltpu.roll

    def kernel(in_start_ref, out_off_ref, *refs):
        ins = refs[:n_lanes]
        outs = refs[n_lanes : 2 * n_lanes]
        carries = refs[2 * n_lanes :]
        t = pl.program_id(0)
        p_in = in_start_ref[t]
        p_out = out_off_ref[t]
        cnt = out_off_ref[t + 1] - p_out
        q = jax.lax.rem(p_out, jnp.int32(TILE))
        # "new block" must mirror the out index map's CLIPPED block index
        # (the phantom step may clip onto the last real block — that is a
        # revisit, not a fresh buffer)
        clipblk = lambda p: jnp.clip(
            jax.lax.div(p, jnp.int32(TILE)), 0, n_out_blocks - 1
        )
        new_block = jnp.logical_or(
            t == 0,
            clipblk(p_out) != clipblk(out_off_ref[jnp.maximum(t - 1, 0)]),
        )

        row = jax.lax.broadcasted_iota(jnp.int32, (2 * tr, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (2 * tr, 128), 1)
        d = row * 128 + lane  # element index within the 2-tile canvas
        # segment [p_in, p_in+cnt) of the tile lands at canvas [q, q+cnt)
        shift = jax.lax.rem(q - p_in + jnp.int32(2 * TILE), jnp.int32(2 * TILE))
        sel = (d >= q) & (d < q + cnt)

        for i in range(n_lanes):
            x2 = jnp.concatenate([ins[i][:], jnp.zeros((tr, 128), U32)], axis=0)
            canvas = _element_roll(x2, shift, lane, two_tr, roll)
            lo, hi = canvas[:tr], canvas[tr:]
            sel_lo, sel_hi = sel[:tr], sel[tr:]
            base = jnp.where(new_block, carries[i][:], outs[i][:])
            outs[i][:] = jnp.where(sel_lo, lo, base)
            carries[i][:] = jnp.where(
                sel_hi, hi, jnp.where(new_block, jnp.zeros((tr, 128), U32), carries[i][:])
            )

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def ragged_append(lanes, in_start, out_off, interpret: bool = False):
    """Concatenate per-tile segments at exact element offsets.

    lanes: tuple of (N,) uint32, N a multiple of TILE, viewed as T tiles of
    TILE elements. Tile t contributes elements [in_start[t], in_start[t] +
    out_off[t+1] - out_off[t]) (within the tile), landing at global element
    offset out_off[t]. out_off must be nondecreasing with per-tile counts
    <= TILE. Elements of the output at >= out_off[-1] are JUNK (callers
    mask). Returns tuple of (N,) uint32.
    """
    N = lanes[0].shape[0]
    T = N // TILE
    tr = TILE // 128
    n_lanes = len(lanes)
    vals = tuple(v.reshape(N // 128, 128) for v in lanes)
    # the grid gets one PHANTOM trailing step (cnt == 0) whose only job is
    # to surface the final boundary spill still sitting in the carry
    # scratch (its output block would otherwise never be visited)
    spec = pl.BlockSpec(
        (tr, 128),
        lambda t, *_: (jnp.minimum(t, T - 1), 0),
        memory_space=pltpu.ANY if interpret else pltpu.VMEM,
    )

    def out_map(t, in_start_ref, out_off_ref):
        blk = jax.lax.div(out_off_ref[t], jnp.int32(TILE))
        return (jnp.clip(blk, 0, T - 1), 0)

    out_spec = pl.BlockSpec((tr, 128), out_map, memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T + 1,),
        in_specs=[spec] * n_lanes,
        out_specs=tuple(out_spec for _ in range(n_lanes)),
        scratch_shapes=[pltpu.VMEM((tr, 128), U32)] * n_lanes,
    )
    in_start_p = jnp.concatenate([in_start.astype(I32), jnp.zeros((1,), I32)])
    out_off_p = jnp.concatenate([out_off.astype(I32), out_off[-1:].astype(I32)])
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _append_kernel(n_lanes, tr, interpret, T),
            grid_spec=grid_spec,
            out_shape=tuple(
                jax.ShapeDtypeStruct((N // 128, 128), U32) for _ in range(n_lanes)
            ),
            interpret=interpret,
        )(in_start_p, out_off_p, *vals)
    return tuple(v.reshape(N) for v in out)


def compact_classes(lanes, flags, n_classes: int, emit, emit_lanes=None,
                    interpret: bool = False):
    """Stable multi-class compaction of (N,) uint32 lanes.

    flags: (N,) int32 in [0, n_classes). For each class c in `emit`
    (ascending), returns (tuple of compacted (N,) lanes, count) where the
    class's rows occupy the dense prefix IN ORIGINAL ORDER and everything
    past the count is junk (callers mask). One tile-local batched flag sort
    + one ragged append per emitted class. emit_lanes optionally restricts
    which lane indices each emitted class appends (None = all).
    """
    N = lanes[0].shape[0]
    assert N % TILE == 0, N
    T = N // TILE
    f2 = flags.astype(jnp.uint32).reshape(T, TILE)
    tiled = jax.lax.sort(
        (f2,) + tuple(v.reshape(T, TILE) for v in lanes),
        dimension=1, num_keys=1, is_stable=True,
    )
    sorted_lanes = tuple(v.reshape(N) for v in tiled[1:])
    fs = tiled[0]
    # per-tile class counts c<k via one searchsorted-free compare-sum
    below = [jnp.zeros((T,), I32)] + [
        jnp.sum(fs < jnp.uint32(c + 1), axis=1).astype(I32) for c in range(n_classes)
    ]
    if emit_lanes is None:
        emit_lanes = [tuple(range(len(lanes)))] * len(emit)
    results = []
    for c, lsel in zip(emit, emit_lanes):
        in_start = below[c]
        cnts = below[c + 1] - below[c]
        total = jnp.cumsum(cnts)
        out_off = jnp.concatenate([jnp.zeros((1,), I32), total]).astype(I32)
        out = ragged_append(
            tuple(sorted_lanes[i] for i in lsel), in_start, out_off,
            interpret=interpret,
        )
        results.append((out, total[-1]))
    return results
