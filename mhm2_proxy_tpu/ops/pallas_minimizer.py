"""Pallas TPU kernel: per-position minimizer hash -> target shard.

The per-base hot op of the counting path (reference device analog:
kcount-gpu/parse_and_pack.cpp:72-144, one CUDA thread per k-mer computing
quick_hash(minimizer) % ranks). The jnp path (ops/bitkmer.py) uses uint64
arithmetic, which XLA:TPU emulates; this kernel carries every 64-bit value as
a (hi, lo) uint32 pair on the VPU — candidate extraction, least-complement
reversal, sliding-window max, and the quick_hash mixer (64x64 multiplies from
16-bit limbs) — one grid row per block of reads, everything resident in VMEM.

Semantics identical to minimizers_from_codes + quick_hash_u64 % n_shards
(property-tested against them; they in turn match the reference bit-for-bit).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32


def _mul32_hi_lo(a, b):
    """32x32 -> 64 multiply as (hi, lo) uint32 via 16-bit limbs (VPU-safe)."""
    a_lo = a & U32(0xFFFF)
    a_hi = a >> U32(16)
    b_lo = b & U32(0xFFFF)
    b_hi = b >> U32(16)
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = (ll >> U32(16)) + (lh & U32(0xFFFF)) + (hl & U32(0xFFFF))
    lo = (ll & U32(0xFFFF)) | (mid << U32(16))
    hi = hh + (lh >> U32(16)) + (hl >> U32(16)) + (mid >> U32(16))
    return hi, lo


def _mul64(a_hi, a_lo, b_hi, b_lo):
    """(a * b) mod 2^64 as (hi, lo) pairs."""
    hi, lo = _mul32_hi_lo(a_lo, b_lo)
    hi = hi + a_lo * b_hi + a_hi * b_lo
    return hi, lo


def _add64(a_hi, a_lo, b_hi, b_lo):
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(U32)
    return a_hi + b_hi + carry, lo


def _shr64(hi, lo, n: int):
    if n == 0:
        return hi, lo
    if n >= 32:
        return U32(0), hi >> U32(n - 32) if n > 32 else hi
    return hi >> U32(n), (lo >> U32(n)) | (hi << U32(32 - n))


def _shl64(hi, lo, n: int):
    if n == 0:
        return hi, lo
    if n >= 32:
        return lo << U32(n - 32) if n > 32 else lo, U32(0)
    return (hi << U32(n)) | (lo >> U32(32 - n)), lo << U32(n)


def _xor64(a_hi, a_lo, b_hi, b_lo):
    return a_hi ^ b_hi, a_lo ^ b_lo


def _quick_hash64(hi, lo):
    """reference hash_funcs.c:332-342 in (hi, lo) pairs."""
    C1 = 3935559000370003845
    C2 = 2691343689449507681
    C3 = 4768777513237032717
    hi, lo = _mul64(hi, lo, U32(C1 >> 32), U32(C1 & 0xFFFFFFFF))
    hi, lo = _add64(hi, lo, U32(C2 >> 32), U32(C2 & 0xFFFFFFFF))
    hi, lo = _xor64(hi, lo, *_shr64(hi, lo, 21))
    hi, lo = _xor64(hi, lo, *_shl64(hi, lo, 37))
    hi, lo = _xor64(hi, lo, *_shr64(hi, lo, 4))
    hi, lo = _mul64(hi, lo, U32(C3 >> 32), U32(C3 & 0xFFFFFFFF))
    hi, lo = _xor64(hi, lo, *_shl64(hi, lo, 20))
    hi, lo = _xor64(hi, lo, *_shr64(hi, lo, 41))
    hi, lo = _xor64(hi, lo, *_shl64(hi, lo, 5))
    return hi, lo


def _rev2_32(v):
    """Reverse the 16 2-bit fields of each uint32."""
    v = ((v & U32(0x33333333)) << U32(2)) | ((v >> U32(2)) & U32(0x33333333))
    v = ((v & U32(0x0F0F0F0F)) << U32(4)) | ((v >> U32(4)) & U32(0x0F0F0F0F))
    v = ((v & U32(0x00FF00FF)) << U32(8)) | ((v >> U32(8)) & U32(0x00FF00FF))
    v = (v << U32(16)) | (v >> U32(16))
    return v


def _min64(a_hi, a_lo, b_hi, b_lo):
    a_less = (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))
    return (
        jnp.where(a_less, a_hi, b_hi),
        jnp.where(a_less, a_lo, b_lo),
        a_less,
    )


def _max64_sel(a_hi, a_lo, b_hi, b_lo):
    a_ge = (a_hi > b_hi) | ((a_hi == b_hi) & (a_lo >= b_lo))
    return jnp.where(a_ge, a_hi, b_hi), jnp.where(a_ge, a_lo, b_lo)


def _make_kernel(k: int, m: int, n_shards: int, L: int):
    P = L - k + 1
    n_cand = k - m + 1
    total = P + n_cand - 1

    Lp = total + 16 + 15  # padded length expected from the caller

    def kernel(codes_ref, out_ref):
        padded = codes_ref[...].astype(U32)  # (B, Lp), pre-padded by caller
        padded = jnp.where(padded >= 4, U32(2), padded)
        B = padded.shape[0]
        # v16[i] = bases i..i+15 packed MSB-first
        v = jnp.zeros((B, total + 16), U32)
        for j in range(16):
            v = (v << U32(2)) | jax.lax.slice_in_dim(padded, j, j + total + 16, axis=1)
        hi = jax.lax.slice_in_dim(v, 0, total, axis=1)
        lo = jax.lax.slice_in_dim(v, 16, 16 + total, axis=1)
        # top-aligned m-mer candidate: keep top 2m bits of (hi, lo)
        if m >= 16:
            mask_hi = U32(0xFFFFFFFF)
            mask_lo = U32((((1 << (2 * m - 32)) - 1) << (64 - 2 * m)) & 0xFFFFFFFF)
        else:
            mask_hi = U32((((1 << (2 * m)) - 1) << (32 - 2 * m)) & 0xFFFFFFFF)
            mask_lo = U32(0)
        c_hi = hi & mask_hi
        c_lo = lo & mask_lo
        # revcomp_mmer: reverse 2-bit fields of ~cand (64-bit) then << 2*(32-m)
        r_hi0 = _rev2_32(~c_lo)
        r_lo0 = _rev2_32(~c_hi)
        r_hi, r_lo = _shl64(r_hi0, r_lo0, 2 * (32 - m))
        least_hi, least_lo, _ = _min64(c_hi, c_lo, r_hi, r_lo)
        # sliding-window max of width n_cand (dyadic doubling)
        x_hi, x_lo = least_hi, least_lo
        width = 1
        n = total
        while width * 2 <= n_cand:
            a_hi = jax.lax.slice_in_dim(x_hi, 0, n - width, axis=1)
            a_lo = jax.lax.slice_in_dim(x_lo, 0, n - width, axis=1)
            b_hi = jax.lax.slice_in_dim(x_hi, width, n, axis=1)
            b_lo = jax.lax.slice_in_dim(x_lo, width, n, axis=1)
            x_hi, x_lo = _max64_sel(a_hi, a_lo, b_hi, b_lo)
            n -= width
            width *= 2
        rem = n_cand - width
        mz_hi, mz_lo = _max64_sel(
            jax.lax.slice_in_dim(x_hi, 0, P, axis=1),
            jax.lax.slice_in_dim(x_lo, 0, P, axis=1),
            jax.lax.slice_in_dim(x_hi, rem, rem + P, axis=1),
            jax.lax.slice_in_dim(x_lo, rem, rem + P, axis=1),
        )
        h_hi, h_lo = _quick_hash64(mz_hi, mz_lo)
        # (hash mod n_shards) via float-free 64-bit remainder: fold hi into lo
        # hash mod n = ((hi mod n) * (2^32 mod n) + lo mod n) mod n
        two32_mod = U32((1 << 32) % n_shards)
        part = (h_hi % U32(n_shards)) * two32_mod + (h_lo % U32(n_shards))
        # part < n*(n-1)+n <= n^2; one more mod is exact while part fits u32:
        # n_shards is a device count (small), so n^2 << 2^32
        out_ref[...] = (part % U32(n_shards)).astype(jnp.int32)

    return kernel, P


@partial(jax.jit, static_argnames=("k", "m", "n_shards", "interpret"))
def pallas_minimizer_targets(codes, k: int, m: int, n_shards: int, interpret: bool = False):
    """codes (B, L) uint8 -> target shard (B, P) int32 via one Pallas kernel.

    Equivalent to quick_hash(minimizer) % n_shards (kmer_dht.cpp:193-196).
    n_shards must satisfy n_shards**2 < 2**32 (any real device count does).
    """
    B, L = codes.shape
    # the hash-mod fold in the kernel is exact only while n^2 < 2^32
    assert n_shards * n_shards < 2**32, f"n_shards={n_shards} too large for u32 mod fold"
    kernel, P = _make_kernel(k, m, n_shards, L)
    n_cand = k - m + 1
    total = P + n_cand - 1
    Lp = total + 16 + 15
    codes_p = jnp.pad(codes, ((0, 0), (0, max(Lp - L, 0))))[:, :Lp]
    # row-block the grid so the ~20 live (TB, Lp) u32 temporaries fit VMEM
    TB = 256
    if B % TB != 0:
        padB = (B + TB - 1) // TB * TB - B
        codes_p = jnp.pad(codes_p, ((0, padB), (0, 0)))
    Bp = codes_p.shape[0]
    # Mosaic rejects i64 index scalars; the package enables x64 globally, so
    # trace the kernel body with x64 off (everything here is u32/i32)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(Bp // TB,),
            out_shape=jax.ShapeDtypeStruct((Bp, P), jnp.int32),
            in_specs=[
                pl.BlockSpec((TB, Lp), lambda i: (i, 0), memory_space=pltpu.ANY if interpret else pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((TB, P), lambda i: (i, 0), memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            interpret=interpret,
        )(codes_p)
    return out[:B]
