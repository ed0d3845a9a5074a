"""Supermer-packed exchange records (communication compression).

The reference ships maximal runs of consecutive same-owner k-mers as one
(k+len)-base string instead of len separate k-mers — its signature ~k×
all-to-all bandwidth reduction (kcount_cpu.cpp:84-103, Supermer pack/unpack
kmer_dht.cpp:70-103, 4 bits/base encoding case=quality). The TPU version uses
fixed-capacity records for static shapes:

  record = [code words: 2 bits/base MSB-first, N folded to G]
           [mask words: 1 bit/base ext-valid (high quality, not N)]
           [meta word:  kmer count n (8 bits) | depth (16 bits)]

covering up to SMAX k-mers (runs longer than SMAX split). A record carries
bases i0-1 .. i0+n-1+k of the read — exactly the window whose positions
1..n are counted k-mers with both extensions — so the receiver literally
replays read_kmer_records on the unpacked windows, reusing the verified
counting path end to end.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import MAX_KMER_COUNT

I32 = jnp.int32
U32 = jnp.uint32


def supermer_layout(k: int, smax: int):
    nb = k + 1 + smax  # bases per record window
    cw = (nb + 15) // 16  # code words
    mw = (nb + 31) // 32  # mask words
    return nb, cw, mw, cw + mw + 1


@partial(jax.jit, static_argnames=("k", "m", "smax", "n_shards"))
def build_supermers(codes, qual_ok, lens, k: int, m: int, smax: int, n_shards: int, depth=None):
    """Segment reads into supermer records routed by minimizer hash.

    Returns dict(records (B*P, RW) u32, target (B*P,) i32, valid (B*P,) bool,
    n_kmers scalar) — only segment-start rows are valid records.
    """
    from .count import minimizer_shard_targets

    B, L = codes.shape
    P = L - k + 1
    nb, cw, mw, rw = supermer_layout(k, smax)

    pos = jnp.arange(P, dtype=I32)[None, :]
    valid = (pos >= 1) & (pos <= lens[:, None] - k - 1)
    # Pallas minimizer kernel on TPU (production default), jnp u64 on CPU
    target = minimizer_shard_targets(codes, k, m, n_shards)

    prev_valid = jnp.pad(valid[:, :-1], ((0, 0), (1, 0)))
    prev_target = jnp.pad(target[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    run_break = valid & (~prev_valid | (target != prev_target))
    # start position of the current run (cummax of break positions)
    brkpos = jnp.where(run_break, pos, I32(-1))
    run_start = jax.lax.cummax(brkpos, axis=1)
    idx_in_run = pos - run_start
    seg_start = valid & ((idx_in_run % smax) == 0)

    # forward run length from each position: distance to the end of the run
    cont_next = jnp.pad(
        valid[:, 1:] & valid[:, :-1] & (target[:, 1:] == target[:, :-1]),
        ((0, 0), (0, 1)),
    )  # cont_next[p] = position p+1 continues this run
    # suffix run length via reversed cummax of stop positions
    stop_at = jnp.where(~cont_next, pos, I32(1 << 30))
    run_end = jnp.flip(jax.lax.cummin(jnp.flip(stop_at, axis=1), axis=1), axis=1)
    n_seg = jnp.minimum(run_end - pos + 1, smax)
    n_seg = jnp.where(seg_start, n_seg, 0)

    # the nb-base window starting at pos-1 for every row, built from nb
    # STATIC shifted slices (window j = codes[:, p-1+j]) instead of a
    # 33M-element dynamic gather — gathers are the XLA:TPU anti-pattern
    q_codes = qual_ok & (codes < 4)
    pad_c = jnp.pad(codes, ((0, 0), (1, nb - 1)))
    pad_q = jnp.pad(q_codes, ((0, 0), (1, nb - 1)))
    wcodes = jnp.stack([pad_c[:, j : j + P] for j in range(nb)], axis=-1)
    wmask = jnp.stack([pad_q[:, j : j + P] for j in range(nb)], axis=-1)
    in_read = (pos[..., None] - 1 + jnp.arange(nb)[None, None, :]) < lens[:, None, None]
    wcodes = jnp.where(in_read, wcodes, jnp.uint8(0))
    wmask = jnp.where(in_read, wmask, False)

    # pack codes 16 bases/word MSB-first (N->G like kmer packing):
    # one broadcast multiply-accumulate instead of unrolled shift chains
    wc = wcodes.reshape(B * P, nb).astype(U32)
    wc = jnp.where(wc >= 4, U32(2), wc)
    wc16 = jnp.pad(wc, ((0, 0), (0, cw * 16 - nb))).reshape(B * P, cw, 16)
    code_shift = (U32(2) * (U32(15) - jnp.arange(16, dtype=U32)))[None, None, :]
    code_words_m = jnp.sum(wc16 << code_shift, axis=2).astype(U32)  # (B*P, cw)
    wm = wmask.reshape(B * P, nb).astype(U32)
    wm32 = jnp.pad(wm, ((0, 0), (0, mw * 32 - nb))).reshape(B * P, mw, 32)
    bit_shift = jnp.arange(32, dtype=U32)[None, None, :]
    mask_words_m = jnp.sum(wm32 << bit_shift, axis=2).astype(U32)  # (B*P, mw)

    if depth is None:
        cnt = jnp.ones((B, P), I32)
    else:
        cnt = jnp.broadcast_to(
            jnp.clip(depth, 0, MAX_KMER_COUNT)[:, None].astype(I32), (B, P)
        )
    meta = (
        n_seg.reshape(-1).astype(U32)
        | (cnt.reshape(-1).astype(U32) << U32(8))
    )
    records = jnp.concatenate([code_words_m, mask_words_m, meta[:, None]], axis=1)
    return dict(
        records=records,
        target=target.reshape(-1),
        valid=seg_start.reshape(-1),
        n_kmers=jnp.sum(jnp.where(valid, 1, 0)),
    )


@partial(jax.jit, static_argnames=("k", "smax"))
def expand_supermers(records, k: int, smax: int):
    """Unpack records -> (codes (N, nb) u8, qual_ok (N, nb) bool, lens, depth).

    lens = n + k + 1 so that read_kmer_records counts exactly the n supermer
    k-mers (positions 1..n of the window). Empty records get lens 0.
    """
    nb, cw, mw, rw = supermer_layout(k, smax)
    N = records.shape[0]
    code_w = records[:, :cw]
    mask_w = records[:, cw : cw + mw]
    meta = records[:, cw + mw]
    n = (meta & U32(0xFF)).astype(I32)
    depth = ((meta >> U32(8)) & U32(0xFFFF)).astype(I32)

    code_shift = (U32(2) * (U32(15) - jnp.arange(16, dtype=U32)))[None, None, :]
    codes = (
        ((code_w[:, :, None] >> code_shift) & U32(3))
        .reshape(N, cw * 16)[:, :nb]
        .astype(jnp.uint8)
    )
    bit_shift = jnp.arange(32, dtype=U32)[None, None, :]
    qual_ok = (
        ((mask_w[:, :, None] >> bit_shift) & U32(1)).reshape(N, mw * 32)[:, :nb].astype(bool)
    )
    lens = jnp.where(n > 0, n + k + 1, 0)
    return codes, qual_ok, lens, depth
