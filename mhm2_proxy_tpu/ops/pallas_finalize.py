"""Fused finalize: segmented group sums + purge + tile-local compaction.

The raw-LSM finalize (ops.count.final_from_sorted_packed) previously ran
three full-array passes: the Pallas group-sum scan, an XLA ext-call/purge
elementwise pass, and a compaction whose phase 1 — a batched (T, TILE)
1-key stable flag sort — cost ~51 ms alone at 36.7M rows on v5e (XLA's
tile-local comparator network is far from free). This kernel fuses all
three into ONE sequential pass over the sorted packed lanes:

1. group-start detection with cross-tile key carries (SMEM), group-last
   detection with a one-block PEEK at the next tile's first element;
2. the 9 payload scans (count + 8 ext one-hots) as cumsum/runmax chains
   with SMEM carries (same identity as ops.count._group_sums_scan);
3. extension calls + purge rules (kcount_cpu.cpp:173-182, 497-517)
   elementwise in VMEM;
4. STABLE tile-local compaction of kept rows via an LSB-first log-shift
   network: kept element i must move left by s_i = (# dropped j < i),
   nondecreasing in i. Processing shift bits LSB->MSB moves every kept
   element whose remaining shift has bit b set left by 2^b; a collision
   (an arriving element landing on a staying one) would need two kept
   elements with remaining shifts differing by >= 2^b while all lower
   bits are zero AND destinations in order — impossible when destinations
   strictly increase (proof: s'_src - s'_dst >= 2^b contradicts
   dst + 2^b - s'_src < dst - s'_dst + 2^b). Freed positions are tracked
   with a live mask so vacated garbage never overwrites kept rows.
   log2(TILE) static-shift rounds, ~3x cheaper than the XLA tile sort and
   zero extra HBM traffic.

Outputs: per-tile-compacted lanes (kept rows at each tile's front, order
preserved) + per-tile keep counts; ops.pallas_compact.ragged_append then
concatenates the tile prefixes — the same O(N) append the two-phase
compaction already used.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EXT_X, MAX_KMER_COUNT

I32 = jnp.int32
U32 = jnp.uint32
TILE = 1 << 15
_TR = TILE // 128


def _roll_elems(x, shift: int, tr: int, roll):
    """Static element-order roll toward HIGHER indices by `shift` (wrap)
    over a (TR, 128) block (element index = row*128 + lane)."""
    shift %= tr * 128
    lam = shift % 128
    rho = shift // 128
    if lam == 0:
        return roll(x, rho, axis=0) if rho else x
    lane = jax.lax.broadcasted_iota(I32, (tr, 128), 1)
    xr = roll(x, lam, axis=1)
    a = roll(xr, rho, axis=0)
    b = roll(xr, (rho + 1) % tr, axis=0)
    return jnp.where(lane < lam, b, a)


def _shift_compact(lanes, keep, drops_before, tr: int, roll):
    """Stable in-VMEM compaction: kept rows to the block front, in order.

    lanes: list of (TR, 128) u32; keep: bool; drops_before: i32 exclusive
    count of dropped elements before each position (the kept element's
    leftward shift). Returns compacted lanes (junk past the keep count).
    """
    n = tr * 128
    row = jax.lax.broadcasted_iota(I32, (tr, 128), 0)
    lane = jax.lax.broadcasted_iota(I32, (tr, 128), 1)
    pos = row * 128 + lane
    # live mask carried as i32: Mosaic has no dynamic_rotate for i1 vectors
    live = keep.astype(I32)
    s = jnp.where(keep, drops_before, 0)
    vals = list(lanes)
    b = 1
    while b < n:
        down = lambda v: _roll_elems(v, n - b, tr, roll)  # result[p] = v[p+b]
        src_ok = pos < n - b  # rolled-in tail positions wrap: never sources
        s_src = down(s)
        arrives = (down(live) != 0) & src_ok & ((s_src & b) != 0)
        stays = (live != 0) & ((s & b) == 0)
        vals = [jnp.where(arrives, down(v), v) for v in vals]
        s = jnp.where(arrives, s_src - b, jnp.where(stays, s, 0))
        live = (arrives | stays).astype(I32)
        b *= 2
    return vals, live != 0


def _scan9(pays, is_start, carry, base, clamp, tr, roll):
    """Segmented group-sum chains with SMEM carries (shared implementation:
    ops.pallas_scan.seg_group_sums)."""
    from .pallas_scan import seg_group_sums

    return seg_group_sums(pays, is_start, carry, base, clamp, tr, roll)


def _ext_call(c4, count, dmin_thres: int):
    """Vectorized extension call on (TR, 128) blocks (kcount_cpu.cpp:173-182;
    see ops.count._get_ext_calls for the integer dmin_dyn argument)."""
    key = [c4[j] * 4 + j for j in range(4)]
    top = jnp.maximum(jnp.maximum(key[0], key[1]), jnp.maximum(key[2], key[3]))
    runner = jnp.full_like(top, -1)
    for j in range(4):
        runner = jnp.maximum(runner, jnp.where(key[j] == top, -1, key[j]))
    top_code = top % 4
    top_cnt = top // 4
    runner_cnt = runner // 4
    dmin_dyn = jnp.maximum((count + 9) // 10 - 1, dmin_thres)
    return jnp.where(
        top_cnt < dmin_dyn,
        I32(EXT_X),
        jnp.where(runner_cnt >= dmin_dyn, I32(4), top_code),
    )


def _kernel(weff: int, keymask: int, dmin_thres: int, purge: bool,
            tr: int, interpret: bool, packed_layout: bool = True):
    roll = jnp.roll if interpret else pltpu.roll
    n_in = weff if packed_layout else weff + 1

    def kernel(peek_ref, *refs):
        # peek_ref (scalar prefetch, SMEM): peek_ref[t*weff + i] = the NEXT
        # tile's first element of key lane i, already key-masked; all-ones
        # for the final tile (every non-sentinel last element ends a group)
        ins = refs[:n_in]
        n_out = (weff + 1) if purge else (weff + 5)
        outs = refs[n_in : n_in + n_out]
        carry = refs[-1]  # SMEM: 9 sums, 9 maxes, prev key words
        t = pl.program_id(0)

        INV = jnp.uint32((~keymask) & 0xFFFFFFFF)
        KM = jnp.uint32(keymask)
        ONES = jnp.uint32(0xFFFFFFFF)

        @pl.when(t == 0)
        def _init():
            for i in range(18):
                carry[i] = 0
            for i in range(weff):
                carry[18 + i] = -1

        lanes = [r[:] for r in ins]
        if packed_layout:
            # x & KM via subtraction of the low bits (Mosaic miscompiles the
            # direct top-bits AND; see ops/pallas_scan.py note)
            keyw = lanes[:-1] + [lanes[-1] - (lanes[-1] & INV)]
            sent = None
            for i in range(weff):
                m = (ONES & KM) if i == weff - 1 else ONES
                eq = keyw[i] == m
                sent = eq if sent is None else (sent & eq)
            valid = ~sent
            pay = lanes[-1]
            left = (pay >> U32(1)) & U32(7)
            right = (pay >> U32(4)) & U32(7)
            cin = valid.astype(I32)
        else:
            # separate-payload layout (k=63/77: the 7-bit payload does not
            # fit the key lanes' free bits): keys ride unmasked, payload is
            # a _pack_cnt_ext lane (count | left << 16 | right << 24), 0 on
            # sentinel rows (keys all-ones, set at extraction)
            keyw = lanes[:weff]
            pay = lanes[weff]
            cin = (pay & U32(0xFFFF)).astype(I32)
            valid = cin > 0
            sent = ~valid
            left = (pay >> U32(16)) & U32(7)
            right = (pay >> U32(24)) & U32(7)

        from .pallas_scan import _elem_prev

        is_start = jnp.zeros(keyw[0].shape, bool)
        for i in range(weff):
            prev = _elem_prev(keyw[i].astype(I32), roll, tr, carry[18 + i])
            is_start = is_start | (keyw[i] != prev.astype(U32))

        # group-last: next element's key differs. The last element of the
        # tile peeks the next tile's first element; the final tile's last
        # element is always a group end.
        row = jax.lax.broadcasted_iota(I32, (tr, 128), 0)
        lane = jax.lax.broadcasted_iota(I32, (tr, 128), 1)
        at_end = (row == tr - 1) & (lane == 127)
        is_last = jnp.zeros(keyw[0].shape, bool)
        for i in range(weff):
            pk = peek_ref[t * weff + i].astype(U32)  # SMEM scalar broadcast
            # next element within the tile: element roll by -1
            nxt = _roll_elems(keyw[i], tr * 128 - 1, tr, roll)
            nxt = jnp.where(at_end, pk, nxt)
            is_last = is_last | (keyw[i] != nxt)

        pays = [cin]
        for j in range(4):
            pays.append(jnp.where((left == j) & valid, cin, 0))
        for j in range(4):
            pays.append(jnp.where((right == j) & valid, cin, 0))
        sums = _scan9(pays, is_start, carry, 0, MAX_KMER_COUNT, tr, roll)
        for i in range(weff):
            carry[18 + i] = keyw[i][tr - 1, 127].astype(I32)

        count = sums[0]
        if purge:
            lcall = _ext_call(sums[1:5], count, dmin_thres)
            rcall = _ext_call(sums[5:9], count, dmin_thres)
            keep = (
                is_last & valid & (count >= 2)
                & ~((lcall == EXT_X) & (rcall == EXT_X))
            )
            packed = (
                count.astype(U32)
                | (lcall.astype(U32) << U32(16))
                | (rcall.astype(U32) << U32(24))
            )
            data = keyw + [packed]
        else:
            keep = is_last & valid
            data = keyw + [
                count.astype(U32),
                sums[1].astype(U32) | (sums[2].astype(U32) << U32(16)),
                sums[3].astype(U32) | (sums[4].astype(U32) << U32(16)),
                sums[5].astype(U32) | (sums[6].astype(U32) << U32(16)),
                sums[7].astype(U32) | (sums[8].astype(U32) << U32(16)),
            ]

        from .pallas_scan import _inclusive_sum_scan

        drops_incl = _inclusive_sum_scan((~keep).astype(I32), roll, tr)
        drops_before = drops_incl - (~keep).astype(I32)
        comp, live = _shift_compact(data, keep, drops_before, tr, roll)
        # junk rows are all-ones in EVERY lane; a kept row's packed lane can
        # never be all-ones (ext codes <= 5), so the caller recovers per-tile
        # counts from lane weff without a dedicated count output
        for o, v in zip(outs, comp):
            o[:] = jnp.where(live, v, ONES)

    return kernel


@partial(jax.jit, static_argnames=("k", "dmin_thres", "purge", "interpret"))
def scan_purge_compact(sorted_lanes, k: int, dmin_thres: int = 2,
                       purge: bool = True, interpret: bool = False,
                       pay=None):
    """Fused scan + purge + per-tile compaction over sorted packed lanes.

    sorted_lanes: weff (N,) uint32 lexsorted lanes, 7-bit payload in the last
    lane's free low bits, N a multiple of TILE (pad with all-ones). Returns
    (compacted lanes tuple, per-tile keep counts (T,) i32). purge=True emits
    weff key lanes + 1 packed (count|left|right) lane with the reference
    purge rules applied; purge=False emits weff key lanes + the 5 packed
    group-sum lanes of ops.count._pack_sums for every unique non-sentinel
    key. Compacted rows sit at each tile's front in key order; junk
    (all-ones) past each tile's count.
    """
    N = sorted_lanes[0].shape[0]
    T = N // TILE
    weff = len(sorted_lanes)
    packed = pay is None
    free = 32 * weff - 2 * k
    assert weff == -(-2 * k // 32), (k, weff)
    assert (free >= 7) if packed else True, (k, weff)
    keymask = (0xFFFFFFFF ^ ((1 << free) - 1)) if packed else 0
    n_out = (weff + 1) if purge else (weff + 5)
    spec = pl.BlockSpec((_TR, 128), lambda t, pk: (t, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    vals = tuple(v.reshape(N // 128, 128) for v in sorted_lanes)
    if not packed:
        vals = vals + (pay.reshape(N // 128, 128),)
    # scalar-prefetch peek (SMEM): peek[t*weff + i] = tile t+1's first
    # element of key lane i, KEY-MASKED in the packed layout; all-ones for
    # the final tile (every non-sentinel last element ends a group). SMEM
    # scalars broadcast cleanly inside the kernel; Mosaic has no
    # (1,1)->(TR,128) vector broadcast.
    firsts = [v.reshape(N // 128, 128)[:, 0] for v in sorted_lanes]
    if packed:
        lowmask = U32((1 << free) - 1)
        firsts[-1] = firsts[-1] - (firsts[-1] & lowmask)
    idx = (jnp.arange(T) + 1) * _TR
    safe = jnp.minimum(idx, N // 128 - 1)
    last_tile = idx > N // 128 - 1
    peek = jnp.stack(
        [jnp.where(last_tile, U32(0xFFFFFFFF), f[safe]) for f in firsts], -1
    ).reshape(-1).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[spec] * (weff if packed else weff + 1),
        out_specs=tuple(spec for _ in range(n_out)),
        scratch_shapes=[pltpu.SMEM((18 + weff,), I32)],
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel(weff, keymask, dmin_thres, purge, _TR, interpret,
                    packed_layout=packed),
            grid_spec=grid_spec,
            out_shape=tuple(
                jax.ShapeDtypeStruct((N // 128, 128), U32) for _ in range(n_out)
            ),
            interpret=interpret,
        )(peek, *vals)
    lanes_out = tuple(v.reshape(N) for v in out[:n_out])
    # per-tile keep counts from the packed lane: junk rows are all-ones in
    # every output lane, and a kept row's packed lane is never all-ones
    counts = jnp.sum(
        lanes_out[weff].reshape(T, TILE) != U32(0xFFFFFFFF), axis=1
    ).astype(jnp.int32)
    return lanes_out, counts
