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


def _inclusive_scans(x, b, roll, tr):
    """In-tile inclusive (sum-scan of x, max-scan of b) in row-major element
    order over (TR, 128) blocks. b >= 0 (0 is the max identity)."""
    lane = jax.lax.broadcasted_iota(I32, (tr, 128), 1)
    row = jax.lax.broadcasted_iota(I32, (tr, 128), 0)
    s = 1
    while s < 128:
        x = x + jnp.where(lane >= s, roll(x, s, axis=1), 0)
        b = jnp.maximum(b, jnp.where(lane >= s, roll(b, s, axis=1), 0))
        s *= 2
    # per-row totals live in lane 127; scan them down the sublanes
    xt = x[:, 127:128]
    bt = b[:, 127:128]
    s = 1
    while s < tr:
        xt = xt + jnp.where(row[:, :1] >= s, roll(xt, s, axis=0), 0)
        bt = jnp.maximum(bt, jnp.where(row[:, :1] >= s, roll(bt, s, axis=0), 0))
        s *= 2
    # element scan = in-row scan + exclusive row prefix
    x_excl_row = xt - x[:, 127:128]
    b_prev_row = jnp.where(row[:, :1] >= 1, roll(bt, 1, axis=0), 0)
    return x + x_excl_row, jnp.maximum(b, b_prev_row)


def _scan_kernel(n_pay: int, tr: int, clamp: int, interpret: bool):
    roll = jnp.roll if interpret else pltpu.roll

    def kernel(*refs):
        start_ref = refs[0]
        pays = refs[1 : 1 + n_pay]
        outs = refs[1 + n_pay : 1 + 2 * n_pay]
        carry = refs[-1]  # SMEM (2 * n_pay,): [sum carries..., max carries...]
        t = pl.program_id(0)
        is_start = start_ref[:] != 0

        for i in range(n_pay):
            pay = pays[i][:]

            @pl.when(t == 0)
            def _init():
                carry[i] = 0
                carry[n_pay + i] = 0

            c_sum = carry[i]
            c_max = carry[n_pay + i]
            # b uses tile-local excl + c_sum; both scans fused in one pass
            # incl_local computed first, then globalized by c_sum
            incl_local, _ = _inclusive_scans(pay, jnp.zeros_like(pay), roll, tr)
            incl = incl_local + c_sum
            excl = incl - pay
            b = jnp.where(is_start, excl, 0)
            _, m_local = _inclusive_scans(jnp.zeros_like(pay), b, roll, tr)
            m = jnp.maximum(m_local, c_max)
            outs[i][:] = jnp.minimum(incl - m, clamp)
            carry[i] = incl[tr - 1, 127]
            carry[n_pay + i] = m[tr - 1, 127]

    return kernel


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
