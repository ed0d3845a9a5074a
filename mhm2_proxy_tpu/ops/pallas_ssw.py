"""Pallas TPU kernel: batched Smith-Waterman forward scoring.

The XLA lax.scan formulation (ops/ssw.py::sw_align_ends) is HBM-bound: every
ref-column step round-trips its (B, Lq) carries through HBM (~40 ms for an
8192x128x160 batch on v5e, ~5 GCUPS). This kernel keeps the whole DP state in
VMEM — batch pairs ride the 128 lanes, query positions the sublanes — so each
column is pure VPU work (reference analog: the ADEPT GPU SW kernel, BMC
Bioinformatics 21:406, one thread block per pair; reported ~30-60 GCUPS on
V100 for short reads).

Semantics are bit-identical to sw_align_ends (same lazy-F max-decay scan,
valid because gap_open >= gap_extend; same (score desc, ref pos asc, query
pos asc) tie-breaking), property-tested against it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
NEG = -(10 ** 6)


def _shift_down(x, s: int, fill):
    """x shifted s rows down along the sublane axis; top filled."""
    Lq, TB = x.shape
    if s >= Lq:
        return jnp.full_like(x, fill)
    return jnp.concatenate([jnp.full((s, TB), fill, x.dtype), x[: Lq - s]], axis=0)


def _sw_kernel(q_ref, ql_ref, r_ref, rl_ref, out_ref,
               H_s, E_s, r_s, best_s, *, Lr: int,
               match: int, mismatch: int, gap_open: int, gap_extend: int,
               ambiguity: int):
    q = q_ref[:].astype(I32)  # (Lq, TB)
    Lq, TB = q.shape
    ql = ql_ref[0:1, :].astype(I32)  # (1, TB)
    rl = rl_ref[0:1, :].astype(I32)
    i_iota = jax.lax.broadcasted_iota(I32, (Lq, TB), 0)
    q_valid = i_iota < ql
    q_amb = q >= 4

    # DP state lives in VMEM scratch (loop carries would force Mosaic to
    # unify the body's natural layouts with splat-constant init layouts)
    H_s[:] = jnp.zeros((Lq, TB), I32)
    E_s[:] = jnp.full((Lq, TB), NEG, I32)
    r_s[:] = r_ref[:].astype(I32)  # rolled one row per column step
    best_s[:] = jnp.concatenate(
        [jnp.zeros((1, TB), I32), jnp.full((7, TB), -1, I32)], axis=0
    )

    def col(j, _):
        H_prev = H_s[:]
        E_prev = E_s[:]
        r_cur = r_s[:]
        # static row-0 read + roll avoids dynamic sublane indexing, which
        # Mosaic only allows at 8-row-aligned offsets
        r_b = r_cur[0:1, :]  # (1, TB)
        r_s[:] = pltpu.roll(r_cur, Lr - 1, 0)  # rotate up one row
        r_ok = j < rl  # (1, TB)
        is_amb = q_amb | (r_b >= 4)
        sub = jnp.where(
            is_amb, I32(-ambiguity),
            jnp.where(q == r_b, I32(match), I32(-mismatch)),
        )
        sub = jnp.where(q_valid & r_ok, sub, I32(NEG))
        diag = _shift_down(H_prev, 1, 0)
        E = jnp.maximum(H_prev - gap_open, E_prev - gap_extend)
        H_noF = jnp.maximum(jnp.maximum(diag + sub, E), 0)
        # lazy F: max-plus decay scan down the column (log2(Lq) shift steps)
        f = _shift_down(H_noF, 1, NEG) - gap_open
        s = 1
        while s < Lq:
            f = jnp.maximum(f, _shift_down(f, s, NEG) - s * gap_extend)
            s *= 2
        H = jnp.maximum(H_noF, f)
        H = jnp.where(q_valid & r_ok, H, 0)
        H_s[:] = H
        E_s[:] = E
        col_best = jnp.max(H, axis=0, keepdims=True)  # (1, TB)
        col_i = jnp.min(
            jnp.where(H == col_best, i_iota, Lq), axis=0, keepdims=True
        )
        best = best_s[0:1, :]
        upd = col_best > best
        best_s[0:1, :] = jnp.where(upd, col_best, best)
        best_s[1:2, :] = jnp.where(upd, col_i, best_s[1:2, :])
        best_s[2:3, :] = jnp.where(upd, j, best_s[2:3, :])
        return 0

    jax.lax.fori_loop(0, Lr, col, 0)
    best = best_s[0:1, :]
    none = best <= 0
    out_ref[0:1, :] = jnp.where(none, 0, best)
    out_ref[1:2, :] = jnp.where(none, -1, best_s[1:2, :])
    out_ref[2:3, :] = jnp.where(none, -1, best_s[2:3, :])
    out_ref[3:4, :] = jnp.zeros((1, TB), I32)


@partial(jax.jit, static_argnames=(
    "match", "mismatch", "gap_open", "gap_extend", "ambiguity", "interpret"))
def pallas_sw_align_ends(
    query, q_len, ref, r_len,
    match: int = 1, mismatch: int = 1, gap_open: int = 1, gap_extend: int = 1,
    ambiguity: int = 1, interpret: bool = False,
):
    """Drop-in Pallas replacement for ssw.sw_align_ends (same returns)."""
    B, Lq = query.shape
    _, Lr = ref.shape
    TB = 128
    Bp = (B + TB - 1) // TB * TB
    pad = Bp - B
    qT = jnp.pad(query, ((0, pad), (0, 0)), constant_values=255).T
    rT = jnp.pad(ref, ((0, pad), (0, 0)), constant_values=255).T
    ql = jnp.pad(q_len, (0, pad)).astype(I32)[None, :]
    rl = jnp.pad(r_len, (0, pad)).astype(I32)[None, :]

    kernel = partial(
        _sw_kernel, Lr=Lr, match=match, mismatch=mismatch,
        gap_open=gap_open, gap_extend=gap_extend, ambiguity=ambiguity,
    )
    # Mosaic rejects i64 index scalars; the package enables x64 globally, so
    # trace the kernel body with x64 off (everything here is u8/i32)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(Bp // TB,),
            in_specs=[
                pl.BlockSpec((Lq, TB), lambda i: (0, i)),
                pl.BlockSpec((1, TB), lambda i: (0, i)),
                pl.BlockSpec((Lr, TB), lambda i: (0, i)),
                pl.BlockSpec((1, TB), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((4, TB), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((4, Bp), I32),
            scratch_shapes=[
                pltpu.VMEM((Lq, TB), I32),
                pltpu.VMEM((Lq, TB), I32),
                pltpu.VMEM((Lr, TB), I32),
                pltpu.VMEM((8, TB), I32),
            ],
            interpret=interpret,
        )(qT, ql, rT, rl)
    return out[0, :B], out[1, :B], out[2, :B]
