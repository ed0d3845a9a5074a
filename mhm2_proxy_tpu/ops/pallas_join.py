"""Fused join epilogue: answer propagation + back-route compaction.

After the Pallas bitonic merge interleaves the sorted table and query rows
(ops.lookup._sort_join), XLA ran two more full-width stages over the merged
array: 5 doubling rounds spreading each key's unique table row to its
neighbors (~15 ms at 33.5M rows on v5e) and a 2-phase compaction dropping
table/pad rows before the dest sort (whose batched tile flag sort is the
same ~40-50 ms offender the finalize kernel eliminated). This kernel fuses
both into ONE pass:

- per key, exactly one row (the valid table row) carries a nonzero combo
  (idx+1) << payload_bits | payload; propagation is therefore a segmented
  MAX of a single nonzero over runs of <= max_dup equal-key rows;
- runs may straddle tile boundaries, so each tile is processed on a canvas
  [dead rows | prev tile's last 128 elements | tile | next tile's first
  128 elements | dead rows]: raw combos suffice for the halo rows (the max
  only needs the table row's own value), the previous tail comes from a
  VMEM carry, the next head from a peek array;
- query rows (source flag bit 25) then compact tile-locally via the
  log-shift network (ops.pallas_finalize._shift_compact), emitting
  (dest, answer) pairs ready for the O(N) ragged append + dest sort.

Junk rows are all-ones; a real dest is < 2^25, so per-tile counts are
recovered from the dest lane without a dedicated output.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_finalize import _roll_elems, _shift_compact

I32 = jnp.int32
U32 = jnp.uint32
TILE = 1 << 15
_TR = TILE // 128
_HALO = 8  # canvas halo rows on each side (1 data row + 7 dead)


def _umax(a, b):
    """Unsigned u32 elementwise max via compare+select.

    Mosaic has no legalization for `arith.maxui` (jnp.maximum on uint32
    vectors fails to compile — the round-3 regression), but unsigned
    compares (`arith.cmpi ugt`) + select are proven-legal here: the bitonic
    sort/merge kernels (pallas_sort.py) run them on every uint32 lane on
    real TPU hardware.
    """
    return jnp.where(a > b, a, b)


def _kernel(kw: int, payload_bits: int, max_dup: int, tr: int, interpret: bool):
    roll = jnp.roll if interpret else pltpu.roll
    n_lanes = kw + 1

    def kernel(scal_ref, *refs):
        # scal_ref (SMEM): [n_valid]
        ins = refs[:kw]
        src_ref = refs[kw]
        peek_ref = refs[kw + 1]  # (8*kw+8, 128): rows 8i = next head keys,
        # row 8*kw = next head src
        outs = refs[kw + 1 + 1 : kw + 2 + 2]
        carry = refs[-1]  # VMEM (8 * (kw+1), 128): prev tile's last row
        t = pl.program_id(0)
        n_valid = scal_ref[0]

        ONES = jnp.uint32(0xFFFFFFFF)
        QBIT = jnp.uint32(1 << 25)
        IDXM = jnp.uint32(0x1FFFFFF)

        def raw_prop(src):
            sq = (src & QBIT) != 0
            ssrc = (src & IDXM).astype(I32)
            is_t = (~sq) & (ssrc < n_valid)
            combo = ((ssrc + 1).astype(U32) << U32(payload_bits)) | (
                src >> U32(26)
            )
            return jnp.where(is_t, combo, U32(0))

        keys = [r[:] for r in ins]
        src = src_ref[:]
        prop = raw_prop(src)

        # canvas: [7 dead rows | prev last row | tile | next first row |
        # 7 dead rows]; dead rows carry all-ones keys and zero prop (max
        # identity) — all-ones keys match only real sentinel rows, whose
        # prop contribution is also zero
        ctr = tr + 2 * _HALO
        pk = peek_ref[:]

        @pl.when(t == 0)
        def _init():
            for i in range(kw):
                carry[8 * i : 8 * i + 8, :] = jnp.full((8, 128), ONES)
            carry[8 * kw : 8 * kw + 8, :] = jnp.zeros((8, 128), U32)

        cv = []
        dead = jnp.full((_HALO - 1, 128), ONES)
        for i in range(kw):
            prev_row = carry[8 * i : 8 * i + 1, :]
            nxt_row = pk[8 * i : 8 * i + 1, :]
            cv.append(jnp.concatenate([dead, prev_row, keys[i], nxt_row, dead]))
        prev_prop = carry[8 * kw : 8 * kw + 1, :]
        nxt_prop = raw_prop(pk[8 * kw : 8 * kw + 1, :])
        zrow = jnp.zeros((_HALO - 1, 128), U32)
        cp = jnp.concatenate([zrow, prev_prop, prop, nxt_prop, zrow])

        for i in range(kw):
            carry[8 * i : 8 * i + 8, :] = jnp.broadcast_to(
                keys[i][tr - 1 : tr, :], (8, 128)
            )
        carry[8 * kw : 8 * kw + 8, :] = jnp.broadcast_to(
            prop[tr - 1 : tr, :], (8, 128)
        )

        n = ctr * 128
        s = 1
        while s < max_dup:
            up = lambda v: _roll_elems(v, n - s, ctr, roll)  # [p] = v[p+s]
            dn = lambda v: _roll_elems(v, s, ctr, roll)  # [p] = v[p-s]
            same_u = None
            same_d = None
            for i in range(kw):
                equ = cv[i] == up(cv[i])
                eqd = cv[i] == dn(cv[i])
                same_u = equ if same_u is None else (same_u & equ)
                same_d = eqd if same_d is None else (same_d & eqd)
            cp = _umax(
                cp,
                _umax(
                    jnp.where(same_u, up(cp), 0), jnp.where(same_d, dn(cp), 0)
                ),
            )
            s *= 2

        prop = cp[_HALO : _HALO + tr, :]
        sq = (src & QBIT) != 0
        dest = jnp.where(sq, src & IDXM, ONES)

        from .pallas_scan import _inclusive_sum_scan

        drops_incl = _inclusive_sum_scan((~sq).astype(I32), roll, tr)
        drops_before = drops_incl - (~sq).astype(I32)
        comp, live = _shift_compact([dest, prop], sq, drops_before, tr, roll)
        outs[0][:] = jnp.where(live, comp[0], ONES)
        outs[1][:] = jnp.where(live, comp[1], ONES)

    return kernel


@partial(jax.jit, static_argnames=("kw", "payload_bits", "max_dup", "interpret"))
def propagate_compact(merged_lanes, n_valid, kw: int, payload_bits: int,
                      max_dup: int = 32, interpret: bool = False):
    """Fused propagation + query-row compaction over merged join lanes.

    merged_lanes: kw key lanes + 1 source lane ((M,) uint32 each, M a
    multiple of TILE), sorted by the key lanes; source lane = table idx |
    payload << 26, or query idx | 1 << 25 (ops.lookup._sort_join's fused
    narrow layout). Returns ((dest, answer) compacted per tile, per-tile
    query counts): answer = the narrow (idx+1) << payload_bits | payload
    combo of the key's valid table row, 0 if the key has none.
    """
    M = merged_lanes[0].shape[0]
    T = M // TILE
    assert M % TILE == 0, M
    # the canvas carries ONE data row (128 elems) of halo per side, so an
    # equal-key run straddling a tile boundary is only covered when it fits
    # in tile + halo; beyond that the propagation would silently miss rows
    assert max_dup <= 129, f"max_dup {max_dup} exceeds the 1-row halo bound"
    vals = tuple(v.reshape(M // 128, 128) for v in merged_lanes)
    # peek: next tile's first row per lane at rows 8i of (8*(kw+1), 128)
    rows = []
    nrow = M // 128
    for v in vals:
        head = v.reshape(T, _TR, 128)[:, 0, :]
        nxt = jnp.concatenate([head[1:], jnp.full((1, 128), 0xFFFFFFFF, U32)])
        rows.append(nxt)
    peek = jnp.concatenate(
        [
            jnp.concatenate(
                [r[:, None, :], jnp.zeros((T, 7, 128), U32)], axis=1
            )
            for r in rows
        ],
        axis=1,
    ).reshape(T * 8 * (kw + 1), 128)
    spec = pl.BlockSpec((_TR, 128), lambda t, s: (t, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    peek_spec = pl.BlockSpec((8 * (kw + 1), 128), lambda t, s: (t, 0),
                             memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[spec] * (kw + 1) + [peek_spec],
        out_specs=(spec, spec),
        scratch_shapes=[pltpu.VMEM((8 * (kw + 1), 128), U32)],
    )
    nv = jnp.asarray(n_valid, I32).reshape(1)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel(kw, payload_bits, max_dup, _TR, interpret),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((M // 128, 128), U32),
                jax.ShapeDtypeStruct((M // 128, 128), U32),
            ),
            interpret=interpret,
        )(nv, *vals, peek)
    dest = out[0].reshape(M)
    ans = out[1].reshape(M)
    counts = jnp.sum(
        dest.reshape(T, TILE) != U32(0xFFFFFFFF), axis=1
    ).astype(I32)
    return (dest, ans), counts
