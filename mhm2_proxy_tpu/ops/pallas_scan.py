"""Pallas fused segmented group-sum scan (the aggregation's scan stage).

ops.count._group_sums_scan needs, per payload lane: an inclusive cumsum, an
exclusive variant, and a running max of the group-start prefix — XLA lowers
that to several full-array scan passes (~90 ms for 9 i32 lanes at 18M rows
on v5e; the data is only 650 MB, so that is ~10x off the HBM roofline).

This kernel fuses everything into ONE sequential pass: each grid step loads
a tile, computes in-tile inclusive sum- and max-scans (7 lane-roll rounds +
log2(TR) sublane-roll rounds, all VPU), folds in the cross-tile carries
(SMEM scalars), and writes the clamped group sums. HBM traffic: one read of
the payload + start lanes, one write of the sums.

Scan identity used (see _group_sums_scan): for lexsorted rows,
    sums[i] = min(incl[i] - runmax_{j<=i}(is_start[j] ? excl[j] : 0), CLAMP)
which is exact because exclusive prefix sums are nondecreasing (payloads
are nonnegative), so the latest group start dominates the running max.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
TILE = 1 << 15  # elements per grid step
_TR = TILE // 128


def _inclusive_sum_scan(x, roll, tr):
    """In-tile inclusive sum-scan in row-major element order over (TR, 128)
    blocks."""
    lane = jax.lax.broadcasted_iota(I32, (tr, 128), 1)
    row = jax.lax.broadcasted_iota(I32, (tr, 128), 0)
    s = 1
    while s < 128:
        x = x + jnp.where(lane >= s, roll(x, s, axis=1), 0)
        s *= 2
    # per-row totals live in lane 127; scan them down the sublanes
    xt = x[:, 127:128]
    s = 1
    while s < tr:
        xt = xt + jnp.where(row[:, :1] >= s, roll(xt, s, axis=0), 0)
        s *= 2
    # element scan = in-row scan + exclusive row prefix
    return x + (xt - x[:, 127:128])


def _inclusive_max_scan(b, roll, tr):
    """In-tile inclusive max-scan in row-major element order; b >= 0 (0 is
    the max identity)."""
    lane = jax.lax.broadcasted_iota(I32, (tr, 128), 1)
    row = jax.lax.broadcasted_iota(I32, (tr, 128), 0)
    s = 1
    while s < 128:
        b = jnp.maximum(b, jnp.where(lane >= s, roll(b, s, axis=1), 0))
        s *= 2
    bt = b[:, 127:128]
    s = 1
    while s < tr:
        bt = jnp.maximum(bt, jnp.where(row[:, :1] >= s, roll(bt, s, axis=0), 0))
        s *= 2
    b_prev_row = jnp.where(row[:, :1] >= 1, roll(bt, 1, axis=0), 0)
    return jnp.maximum(b, b_prev_row)


def _inclusive_scans(x, b, roll, tr):
    """In-tile inclusive (sum-scan of x, max-scan of b); kept for callers
    that genuinely need both (the kernels below use the dedicated variants —
    a fused call wastes a full dead scan chain per use when one output is
    discarded, measured ~2x the whole kernel's VPU time)."""
    return _inclusive_sum_scan(x, roll, tr), _inclusive_max_scan(b, roll, tr)


def _scan_kernel(n_pay: int, tr: int, clamp: int, interpret: bool):
    roll = jnp.roll if interpret else pltpu.roll

    def kernel(*refs):
        start_ref = refs[0]
        pays = refs[1 : 1 + n_pay]
        outs = refs[1 + n_pay : 1 + 2 * n_pay]
        carry = refs[-1]  # SMEM (2 * n_pay,): [sum carries..., max carries...]
        t = pl.program_id(0)
        is_start = start_ref[:] != 0

        @pl.when(t == 0)
        def _init():
            for i in range(2 * n_pay):
                carry[i] = 0

        sums = seg_group_sums(
            [pays[i][:] for i in range(n_pay)], is_start, carry, 0, clamp,
            tr, roll,
        )
        for i in range(n_pay):
            outs[i][:] = sums[i]

    return kernel


def seg_group_sums(pays, is_start, carry, base, clamp, tr, roll):
    """9 SEGMENTED group-sum chains with SMEM carries.

    True Hillis-Steele segmented scans (operator (f1,x1) + (f2,x2) =
    (f1|f2, f2 ? x2 : x1+x2)): ONE shared flag chain replaces the per-lane
    running-max chain of the cumsum-minus-runmax identity — half the VPU
    work of the previous formulation. Per round, x_i += f_i ? 0 : x_{i-s};
    f_i |= f_{i-s}; the SMEM carry (the previous tile's open tail-segment
    sum) flows into elements with no start anywhere before them.
    carry[base+i] = running tail-segment sum per payload; slots base+9..
    base+17 are unused (kept for layout stability). Returns clamped sums
    (the inclusive within-group sums, exact at group-last rows)."""
    lane = jax.lax.broadcasted_iota(I32, (tr, 128), 1)
    row = jax.lax.broadcasted_iota(I32, (tr, 128), 0)
    f = is_start.astype(I32)
    xs = [p for p in pays]
    s = 1
    while s < 128:
        m = (lane >= s) & (f == 0)
        for j in range(len(xs)):
            xs[j] = xs[j] + jnp.where(m, roll(xs[j], s, axis=1), 0)
        f = f | jnp.where(lane >= s, roll(f, s, axis=1), 0)
        s *= 2
    # column phase over per-row tail sums (lane 127)
    row1 = row[:, :1]
    ft = f[:, 127:128]
    xt = [x[:, 127:128] for x in xs]
    s = 1
    while s < tr:
        m1 = (row1 >= s) & (ft == 0)
        for j in range(len(xs)):
            xt[j] = xt[j] + jnp.where(m1, roll(xt[j], s, axis=0), 0)
        ft = ft | jnp.where(row1 >= s, roll(ft, s, axis=0), 0)
        s *= 2
    # carry-in per row: previous rows' segment sum, plus the SMEM carry for
    # rows with no start anywhere before them in this tile
    f_prev = jnp.where(row1 >= 1, roll(ft, 1, axis=0), 0)
    sums = []
    for j in range(len(xs)):
        ct_prev = jnp.where(row1 >= 1, roll(xt[j], 1, axis=0), 0)
        ctp = ct_prev + jnp.where(f_prev == 0, carry[base + j], 0)
        xf = xs[j] + jnp.where(f == 0, ctp, 0)
        carry[base + j] = xf[tr - 1, 127]
        sums.append(jnp.minimum(xf, clamp))
    return sums



def _elem_prev(x, roll, tr, first):
    """Previous element in row-major order; element (0,0) gets `first`
    (an (1,1)-broadcastable scalar)."""
    lane = jax.lax.broadcasted_iota(I32, (tr, 128), 1)
    row = jax.lax.broadcasted_iota(I32, (tr, 128), 0)
    xr = roll(x, 1, axis=1)
    prev = jnp.where(lane == 0, roll(xr, 1, axis=0), xr)
    return jnp.where((lane == 0) & (row == 0), first, prev)


def _packed_scan_kernel(weff: int, keymask: int, tr: int, clamp: int,
                        interpret: bool):
    """Read-pass group-sum scan over PACKED sorted record lanes.

    Inputs are the weff sorted key lanes with the 7-bit record payload
    (valid | left<<1 | right<<4) embedded in the last lane's free low bits
    (ops.count.aggregate_split_lanes_packed layout). The 9 logical payload
    lanes (count + 4 left + 4 right one-hots, all 0/1 on the read pass) and
    the group-start flags are derived IN-KERNEL from the key lanes, and the
    group sums are written as the 5 packed u32 lanes of ops.count._pack_sums
    — HBM traffic drops from (10 in + 9 out) to (weff in + 5 out) i32 lanes
    per element (76 -> 28 bytes at k=21).
    """
    roll = jnp.roll if interpret else pltpu.roll

    def kernel(*refs):
        KM = jnp.uint32(keymask)
        # x & KM via x - (x & ~KM): Mosaic miscompiles the top-bits AND when
        # fused with cross-vreg ops (drops the lowest kept bit on some lanes
        # — observed here as per-element group splits on keys whose low bit
        # is 1; same bug as ops/pallas_extract.py::endmask). ~KM is a
        # positive low-bits splat and compiles correctly.
        INV = jnp.uint32((~keymask) & 0xFFFFFFFF)
        ONES = jnp.uint32(0xFFFFFFFF)
        ins = refs[:weff]
        outs = refs[weff : weff + 5]
        carry = refs[-1]  # SMEM (18 + weff,): sums, maxes, prev-key words
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            for i in range(18):
                carry[i] = 0
            for wname in range(weff):
                # all-ones differs from every valid key -> first row starts
                carry[18 + wname] = -1

        lanes = [r[:] for r in ins]
        keyw = lanes[:-1] + [lanes[-1] - (lanes[-1] & INV)]
        # sentinel rows are all-ones in every KEY bit
        sent = None
        for i in range(weff):
            m = (ONES & KM) if i == weff - 1 else ONES
            eq = keyw[i] == m
            sent = eq if sent is None else (sent & eq)
        valid = ~sent
        pay = lanes[-1]
        left = (pay >> jnp.uint32(1)) & jnp.uint32(7)
        right = (pay >> jnp.uint32(4)) & jnp.uint32(7)

        # group start: any key word differs from the previous element's
        is_start = jnp.zeros(keyw[0].shape, bool)
        for i in range(weff):
            prev = _elem_prev(
                keyw[i].astype(I32), roll, tr,
                carry[18 + i],
            ).astype(jnp.uint32)
            is_start = is_start | (keyw[i] != prev)

        pays = [valid.astype(I32)]
        for j in range(4):
            pays.append(((left == j) & valid).astype(I32))
        for j in range(4):
            pays.append(((right == j) & valid).astype(I32))

        sums = [
            x.astype(jnp.uint32)
            for x in seg_group_sums(pays, is_start, carry, 0, clamp, tr, roll)
        ]
        for i in range(weff):
            carry[18 + i] = keyw[i][tr - 1, 127].astype(I32)

        outs[0][:] = sums[0]
        outs[1][:] = sums[1] | (sums[2] << jnp.uint32(16))
        outs[2][:] = sums[3] | (sums[4] << jnp.uint32(16))
        outs[3][:] = sums[5] | (sums[6] << jnp.uint32(16))
        outs[4][:] = sums[7] | (sums[8] << jnp.uint32(16))

    return kernel


@partial(jax.jit, static_argnames=("keymask", "clamp", "interpret"))
def group_sums_scan_packed(sorted_lanes, keymask: int, clamp: int,
                           interpret: bool = False):
    """Fused read-pass scan over packed sorted record lanes.

    sorted_lanes: weff (N,) uint32 lanes, lexsorted, payload embedded in the
    last lane's low bits (below keymask). N must be a multiple of TILE
    (callers pad with all-ones sentinel rows). Returns the 5 packed
    group-sum lanes of ops.count._pack_sums, valid at group-last rows.
    """
    N = sorted_lanes[0].shape[0]
    T = N // TILE
    weff = len(sorted_lanes)
    U = jnp.uint32
    spec = pl.BlockSpec((_TR, 128), lambda t: (t, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    vals = tuple(v.reshape(N // 128, 128) for v in sorted_lanes)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _packed_scan_kernel(weff, keymask, _TR, clamp, interpret),
            grid=(T,),
            in_specs=[spec] * weff,
            out_specs=tuple(spec for _ in range(5)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((N // 128, 128), U) for _ in range(5)
            ),
            scratch_shapes=[pltpu.SMEM((18 + weff,), I32)],
            interpret=interpret,
        )(*vals)
    return tuple(v.reshape(N) for v in out)


@partial(jax.jit, static_argnames=("clamp", "interpret"))
def group_sums_scan_lanes(pay_lanes, is_start, clamp: int, interpret: bool = False):
    """Fused segmented group-sum scan over (N,) int32 payload lanes.

    N must be a multiple of TILE (callers pad; trailing pad rows must have
    pay == 0 and is_start == True so carries are unaffected). Returns the
    clamped sums lanes (valid at group-LAST rows, like _group_sums_scan).
    """
    N = pay_lanes[0].shape[0]
    T = N // TILE
    n_pay = len(pay_lanes)
    spec = pl.BlockSpec((_TR, 128), lambda t: (t, 0),
                        memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    start2 = is_start.astype(I32).reshape(N // 128, 128)
    vals = tuple(v.reshape(N // 128, 128) for v in pay_lanes)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _scan_kernel(n_pay, _TR, clamp, interpret),
            grid=(T,),
            in_specs=[spec] * (1 + n_pay),
            out_specs=tuple(spec for _ in range(n_pay)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((N // 128, 128), I32) for _ in range(n_pay)
            ),
            scratch_shapes=[pltpu.SMEM((2 * n_pay,), I32)],
            interpret=interpret,
        )(start2, *vals)
    return tuple(v.reshape(N) for v in out)
