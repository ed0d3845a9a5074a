"""Pallas TPU kernel: fused k-mer record extraction.

Turns a block of reads directly into sort-ready count records — canonical
k-mer words plus one packed (count | left_ext << 16 | right_ext << 24) payload
lane, sentinelized — in ONE pass over HBM. The jnp formulation
(ops/count.py::read_kmer_records = bitkmer packing + revcomp + canonical
select + ext gathering) is elementwise work that XLA:TPU materializes as
~40 full-array passes (the 16 shifted ORs of the base packer, the funnel
shifts of revcomp, and every select each round-trip HBM at 18M records/block:
measured 208 ms on v5e where the information content is one ~40 MB read and
one ~220 MB write).

Here every intermediate lives in VMEM for a (TB, L) tile of reads: the
16-step MSB-first base packer, per-word window slices, the 2-bit-field
revcomp + funnel shift, the canonical lexicographic select, and the
quality-masked extension picks (reference semantics: kcount_cpu.cpp:74-103,
307-335; packing kmer.cpp:165-257; revcomp kmer.cpp:486-505). Bit-exact
against the jnp path (property-tested; that path in turn is oracle-pinned to
the reference).

Outputs are (B, P) uint32 lanes: W key-word lanes (invalid rows = all-ones
empty-key sentinel, kcount_cpu.cpp:217) and the payload lane (invalid rows =
0). Callers flatten to (B*P,) and feed jax.lax.sort directly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EXT_NONE, words32_for_k

U32 = jnp.uint32


def _rev2_32(v):
    """Reverse the 16 2-bit fields of each uint32 (TWIN_TABLE analog)."""
    v = ((v & U32(0x33333333)) << U32(2)) | ((v >> U32(2)) & U32(0x33333333))
    v = ((v & U32(0x0F0F0F0F)) << U32(4)) | ((v >> U32(4)) & U32(0x0F0F0F0F))
    v = ((v & U32(0x00FF00FF)) << U32(8)) | ((v >> U32(8)) & U32(0x00FF00FF))
    v = (v << U32(16)) | (v >> U32(16))
    return v


def _endmasks(k: int, W: int):
    """Per-word python-int masks zeroing 2-bit fields beyond base k-1."""
    masks = []
    for w in range(W):
        nb = min(max(k - 16 * w, 0), 16)
        masks.append((((1 << (2 * nb)) - 1) << (32 - 2 * nb)) & 0xFFFFFFFF if nb else 0)
    return masks


def _make_kernel(k: int, L: int, interpret: bool, packed: bool = False):
    W = words32_for_k(k)
    P = L - k + 1
    n_chunks = (k + 15) // 16
    v_len = P + 16 * (n_chunks - 1)  # packed windows needed
    Lp = v_len + 16 + 15  # caller pads codes/quals to this length
    masks = _endmasks(k, W)
    s = 32 * W - 2 * k  # revcomp funnel shift
    word_shift, bit_shift = divmod(s, 32)
    roll = jnp.roll if interpret else pltpu.roll

    def kernel(codes_ref, qual_ref, lens_ref, *out_refs):
        codes = codes_ref[...].astype(U32)  # (TB, Lp)
        qual = qual_ref[...]
        c2 = jnp.where(codes >= 4, U32(2), codes)  # N packs as G
        TB = codes.shape[0]

        # v[i] = bases i..i+15 packed MSB-first (kmer.cpp:165-257)
        v = jnp.zeros((TB, v_len + 16), U32)
        for j in range(16):
            v = (v << U32(2)) | jax.lax.slice_in_dim(c2, j, j + v_len + 16, axis=1)

        def endmask(x, w):
            if masks[w] == 0:
                return jnp.zeros((TB, P), U32)
            if masks[w] == 0xFFFFFFFF:
                return x
            # x & TOPMASK via x - (x & ~TOPMASK): Mosaic (observed on v5e,
            # jax 0.8.x) miscompiles a top-bits AND (and equivalently
            # (x>>s)<<s) when fused with a cross-vreg lane slice — the lowest
            # kept bit is dropped on some lanes. The complement mask is a
            # positive i32 splat and compiles correctly; the subtraction is
            # exact since the parts are disjoint. Verified bit-exact on-chip
            # (scripts/verify_extract_tpu.py).
            return x - (x & U32((~masks[w]) & 0xFFFFFFFF))

        fwd = []
        for w in range(W):
            if masks[w] == 0:
                fwd.append(jnp.zeros((TB, P), U32))
            else:
                fwd.append(endmask(jax.lax.slice_in_dim(v, 16 * w, 16 * w + P, axis=1), w))

        # revcomp: complement all fields, reverse word order + in-word fields,
        # funnel-shift left by 32W-2k, re-apply end masks (kmer.cpp:486-505)
        rev = [_rev2_32(~fwd[W - 1 - w]) for w in range(W)]
        rc = []
        for w in range(W):
            src = w + word_shift
            cur = rev[src] if src < W else jnp.zeros((TB, P), U32)
            if bit_shift:
                nxt = rev[src + 1] if src + 1 < W else jnp.zeros((TB, P), U32)
                cur = (cur << U32(bit_shift)) | (nxt >> U32(32 - bit_shift))
            rc.append(endmask(cur, w))

        # canonical = min(fwd, rc) wordwise; strict rc < fwd marks was_rc
        lt = rc[W - 1] < fwd[W - 1]
        for w in range(W - 2, -1, -1):
            lt = (rc[w] < fwd[w]) | ((rc[w] == fwd[w]) & lt)
        was_rc = lt
        cw = [jnp.where(was_rc, rc[w], fwd[w]) for w in range(W)]

        # extension codes: base i contributes only if high-quality and ACGT
        ext = jnp.where((qual != 0) & (codes < 4), codes, U32(EXT_NONE))
        # left ext of kmer i is base i-1 (i=0 is never valid, junk tolerated);
        # right ext is base i+k
        l0 = jax.lax.slice_in_dim(ext, 0, P, axis=1)
        left = roll(l0, 1, axis=1)
        right = jax.lax.slice_in_dim(ext, k, k + P, axis=1)
        comp = lambda e: jnp.where(e < 4, U32(3) - e, e)
        left_c = jnp.where(was_rc, comp(right), left)
        right_c = jnp.where(was_rc, comp(left), right)

        # count only interior kmers: 1 <= i <= len-k-1 (kcount_cpu.cpp:84-101)
        pos = jax.lax.broadcasted_iota(jnp.int32, (TB, P), 1)
        lens = lens_ref[...]  # (TB, 1)
        valid = (pos >= 1) & (pos <= lens - (k + 1))

        if packed:
            # packed emission (ops.count.aggregate_split_lanes_packed layout):
            # the 7-bit payload (valid | left<<1 | right<<4) rides the free
            # low bits of the last non-zero key lane; always-zero trailing
            # lanes and the separate payload lane are not written at all
            weff = -(-2 * k // 32)
            pay7 = U32(1) | (left_c << U32(1)) | (right_c << U32(4))
            for w in range(weff - 1):
                out_refs[w][...] = jnp.where(valid, cw[w], U32(0xFFFFFFFF))
            out_refs[weff - 1][...] = jnp.where(
                valid, cw[weff - 1] | pay7, U32(0xFFFFFFFF)
            )
            return
        for w in range(W):
            out_refs[w][...] = jnp.where(valid, cw[w], U32(0xFFFFFFFF))
        payload = U32(1) | (left_c << U32(16)) | (right_c << U32(24))
        out_refs[W][...] = jnp.where(valid, payload, U32(0))

    return kernel, W, P, Lp


@partial(jax.jit, static_argnames=("k", "interpret"))
def extract_record_lanes(codes, qual_ok, lens, k: int, interpret: bool = False):
    """codes (B, L) u8, qual_ok (B, L) bool, lens (B,) i32 -> record lanes.

    Returns (word_lanes, payload): W + 1 arrays of shape (B, P) uint32, with
    invalid rows sentinelized (keys all-ones, payload 0). Read pass only
    (count = 1); the contig pass stays on the jnp path.
    """
    out = _extract(codes, qual_ok, lens, k, interpret, False)
    return out[:-1], out[-1]


@partial(jax.jit, static_argnames=("k", "interpret"))
def extract_packed_lanes(codes, qual_ok, lens, k: int, interpret: bool = False):
    """extract_record_lanes in the PACKED layout: ceil(2k/32) uint32 lanes
    with the 7-bit payload (valid | left<<1 | right<<4) in the last lane's
    free low bits (requires ops.count.payload_fits_in_keys). Sentinel rows
    are all-ones in every emitted lane. Saves the payload-lane write, any
    always-zero trailing key lanes, and the caller-side repack."""
    return _extract(codes, qual_ok, lens, k, interpret, True)


def _extract(codes, qual_ok, lens, k: int, interpret: bool, packed: bool):
    B, L = codes.shape
    kernel, W, P, Lp = _make_kernel(k, L, interpret, packed)
    n_out = (-(-2 * k // 32)) if packed else (W + 1)
    codes_p = jnp.pad(codes, ((0, 0), (0, Lp - L)), constant_values=4)
    qual_p = jnp.pad(qual_ok.astype(jnp.uint8), ((0, 0), (0, Lp - L)))
    TB = 256
    padB = (B + TB - 1) // TB * TB - B
    if padB:
        codes_p = jnp.pad(codes_p, ((0, padB), (0, 0)), constant_values=4)
        qual_p = jnp.pad(qual_p, ((0, padB), (0, 0)))
        lens = jnp.pad(lens, (0, padB))
    Bp = B + padB
    lens2 = lens.astype(jnp.int32).reshape(Bp, 1)
    ms = pltpu.ANY if interpret else pltpu.VMEM
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(Bp // TB,),
            out_shape=tuple(
                jax.ShapeDtypeStruct((Bp, P), U32) for _ in range(n_out)
            ),
            in_specs=[
                pl.BlockSpec((TB, Lp), lambda i: (i, 0), memory_space=ms),
                pl.BlockSpec((TB, Lp), lambda i: (i, 0), memory_space=ms),
                pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=ms),
            ],
            out_specs=tuple(
                pl.BlockSpec((TB, P), lambda i: (i, 0), memory_space=ms)
                for _ in range(n_out)
            ),
            interpret=interpret,
        )(codes_p, qual_p, lens2)
    return tuple(x[:B] for x in out)
