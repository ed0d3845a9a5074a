"""Vectorized 2-bit k-mer kernels (JAX, TPU-first).

K-mers are arrays of uint32 words in [hi0, lo0, hi1, lo1, ...] order, i.e. the
reference's big-endian 2-bit uint64 packing (reference src/kmer.cpp:298-320,
src/kmer.hpp:61-65) split into 32-bit halves so that lexicographic comparison
over the uint32 word array equals the reference's uint64-array comparison.
Base codes: A=0 C=1 G=2 T=3, N=4 (N packs as G exactly like the reference,
src/kmer.cpp:169 comment "Note this converts Ns to Gs").

Everything here is batched/vectorized with static shapes; no per-kmer scalar
loops. The word count W = 2*ceil(k/32)*... = 2*N_LONGS always (trailing words
zero), matching the reference's fixed N_LONGS layout.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import words32_for_k

U32 = jnp.uint32
U64 = jnp.uint64
_M64 = (1 << 64) - 1

_ASCII_CODE = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    _ASCII_CODE[ord(_c)] = _i
    _ASCII_CODE[ord(_c.lower())] = _i
_ASCII_CODE[ord("N")] = 4
_ASCII_CODE[ord("n")] = 4


def ascii_to_codes(buf: np.ndarray | bytes) -> np.ndarray:
    """Host helper: ASCII bytes -> base codes uint8 (0-3, N/other=4)."""
    a = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else np.asarray(buf, np.uint8)
    return _ASCII_CODE[a]


def codes_to_ascii(codes: np.ndarray) -> bytes:
    lut = np.frombuffer(b"ACGTN", dtype=np.uint8)
    return lut[np.asarray(codes, np.uint8)].tobytes()


def _pack16(codes_padded: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """v16[..., i] = 16 bases starting at i packed MSB-first into uint32.

    codes_padded must have length >= out_len + 15 along the last axis.
    N (code 4) packs as G (code 2): packed code = code if code < 4 else 2.
    """
    c = codes_padded.astype(U32)
    c = jnp.where(c >= 4, U32(2), c)
    v = jnp.zeros(codes_padded.shape[:-1] + (out_len,), U32)
    for j in range(16):
        v = (v << U32(2)) | jax.lax.slice_in_dim(c, j, j + out_len, axis=-1)
    return v


@partial(jax.jit, static_argnames=("k",))
def kmer_words_from_codes(codes: jnp.ndarray, k: int) -> jnp.ndarray:
    """Extract all k-mer words from base-code sequences.

    codes: (..., L) uint8. Returns (..., P, W) uint32 with P = L-k+1 and
    W = words32_for_k(k). Positions whose window crosses the true sequence end
    produce garbage (zero-padded) words; callers mask with their own validity.
    Matches the reference packing incl. zeroed trailing bits (kmer.cpp:226-232).
    """
    L = codes.shape[-1]
    P = L - k + 1
    assert P >= 1, f"L={L} < k={k}"
    W = words32_for_k(k)
    n_chunks = (k + 15) // 16  # words that contain any bases
    pad = 16 * (n_chunks - 1) + 15 + 16  # enough for strided slices
    cp = jnp.pad(codes, [(0, 0)] * (codes.ndim - 1) + [(0, pad)])
    v16 = _pack16(cp, P + 16 * (n_chunks - 1))
    words = []
    for w in range(W):
        nb = min(max(k - 16 * w, 0), 16)
        if nb == 0:
            words.append(jnp.zeros(codes.shape[:-1] + (P,), U32))
            continue
        chunk = jax.lax.slice_in_dim(v16, 16 * w, 16 * w + P, axis=-1)
        if nb < 16:
            mask = U32((((1 << (2 * nb)) - 1) << (32 - 2 * nb)) & 0xFFFFFFFF)
            chunk = chunk & mask
        words.append(chunk)
    return jnp.stack(words, axis=-1)


def _rev2bits32(v: jnp.ndarray) -> jnp.ndarray:
    """Reverse the 16 2-bit fields within each uint32."""
    v = ((v & U32(0x33333333)) << U32(2)) | ((v >> U32(2)) & U32(0x33333333))
    v = ((v & U32(0x0F0F0F0F)) << U32(4)) | ((v >> U32(4)) & U32(0x0F0F0F0F))
    v = ((v & U32(0x00FF00FF)) << U32(8)) | ((v >> U32(8)) & U32(0x00FF00FF))
    v = (v << U32(16)) | (v >> U32(16))
    return v


def _shift_left_words(words: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Funnel-shift a (..., W) uint32 big-endian word array left by `bits`."""
    W = words.shape[-1]
    word_shift, bit_shift = divmod(bits, 32)
    out = []
    for w in range(W):
        src = w + word_shift
        cur = words[..., src] if src < W else jnp.zeros_like(words[..., 0])
        if bit_shift:
            nxt = words[..., src + 1] if src + 1 < W else jnp.zeros_like(words[..., 0])
            cur = (cur << U32(bit_shift)) | (nxt >> U32(32 - bit_shift))
        out.append(cur)
    return jnp.stack(out, axis=-1)


def _endmask_words(k: int, W: int) -> np.ndarray:
    """Per-word masks zeroing bit fields beyond base k-1."""
    masks = np.zeros(W, np.uint32)
    for w in range(W):
        nb = min(max(k - 16 * w, 0), 16)
        masks[w] = (((1 << (2 * nb)) - 1) << (32 - 2 * nb)) & 0xFFFFFFFF if nb else 0
    return masks


@partial(jax.jit, static_argnames=("k",))
def revcomp_words(words: jnp.ndarray, k: int) -> jnp.ndarray:
    """Reverse complement of packed k-mers (reference kmer.cpp:486-505).

    Complement every field, reverse all 16W fields (reverse word order +
    in-word field reversal), shift left to re-top-align, zero trailing fields.
    """
    W = words.shape[-1]
    comp = ~words
    rev = _rev2bits32(comp[..., ::-1])
    shifted = _shift_left_words(rev, 32 * W - 2 * k)
    # x & TOPMASK via x - (x & ~TOPMASK): XLA:TPU (v5e, jax 0.8.x) MISCOMPILES
    # the direct top-bits AND when this whole chain is fused at production
    # shapes (observed at (131072, 140, W): the lowest kept bit of some lanes
    # is dropped, silently corrupting ~half of all canonical keys; equal
    # kernels at (512, ...) compile correctly). The complement mask is a
    # positive i32 splat and compiles correctly at every shape tested; the
    # subtraction is exact since the parts are disjoint. Same workaround as
    # ops/pallas_extract.py::endmask (Mosaic shows the identical bug).
    # Verified on-chip by scripts/verify_extract_tpu.py.
    inv = jnp.asarray(~_endmask_words(k, W), U32)
    return shifted - (shifted & inv)


@jax.jit
def lex_less(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic a < b over trailing word axis (kmer.cpp:266-272)."""
    W = a.shape[-1]
    lt = a[..., W - 1] < b[..., W - 1]
    for w in range(W - 2, -1, -1):
        lt = (a[..., w] < b[..., w]) | ((a[..., w] == b[..., w]) & lt)
    return lt


@partial(jax.jit, static_argnames=("k",))
def canonicalize_words(words: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (min(kmer, revcomp) wordwise, was_rc) (kcount_cpu.cpp:326-332)."""
    rc = revcomp_words(words, k)
    was_rc = lex_less(rc, words)
    return jnp.where(was_rc[..., None], rc, words), was_rc


# ---------------------------------------------------------------------------
# minimizers
# ---------------------------------------------------------------------------


def _rev2bits64(v: jnp.ndarray) -> jnp.ndarray:
    v = ((v & U64(0x3333333333333333)) << U64(2)) | ((v >> U64(2)) & U64(0x3333333333333333))
    v = ((v & U64(0x0F0F0F0F0F0F0F0F)) << U64(4)) | ((v >> U64(4)) & U64(0x0F0F0F0F0F0F0F0F))
    v = ((v & U64(0x00FF00FF00FF00FF)) << U64(8)) | ((v >> U64(8)) & U64(0x00FF00FF00FF00FF))
    v = ((v & U64(0x0000FFFF0000FFFF)) << U64(16)) | ((v >> U64(16)) & U64(0x0000FFFF0000FFFF))
    v = (v << U64(32)) | (v >> U64(32))
    return v


def revcomp_mmer(v: jnp.ndarray, m: int) -> jnp.ndarray:
    """revcomp of top-aligned packed m-mers (reference kmer.cpp:426-433)."""
    return _rev2bits64(~v) << U64(2 * (32 - m))


@partial(jax.jit, static_argnames=("k", "m"))
def minimizers_from_codes(codes: jnp.ndarray, k: int, m: int) -> jnp.ndarray:
    """Per-position minimizer of each k-mer window.

    codes: (..., L) uint8 -> (..., P) uint64 minimizers, P = L-k+1.
    Implements the greatest least-complement m-mer (kmer.cpp:344-403):
    minimizer(p) = max_{i in [p, p+k-m]} min(cand_i, revcomp_m(cand_i)) where
    cand_i packs bases i..i+m-1 into the top 2m bits of a uint64. Strand
    symmetric, so computing over the forward read stream gives the canonical
    k-mer's minimizer.
    """
    assert 1 <= m <= min(k, 28)
    L = codes.shape[-1]
    P = L - k + 1
    n_cand = k - m + 1  # candidates per kmer window
    total = P + n_cand - 1  # candidate positions needed
    pad = total + 16 + 31  # v16 needs total+16 values, each reading 16 bases
    cp = jnp.pad(codes, [(0, 0)] * (codes.ndim - 1) + [(0, pad)])
    v16 = _pack16(cp, total + 16)
    hi = jax.lax.slice_in_dim(v16, 0, total, axis=-1).astype(U64)
    lo = jax.lax.slice_in_dim(v16, 16, 16 + total, axis=-1).astype(U64)
    t = (hi << U64(32)) | lo  # 32 bases starting at i, top-aligned
    zm = U64((((1 << (2 * m)) - 1) << (64 - 2 * m)) & _M64)
    cand = t & zm
    least = jnp.minimum(cand, revcomp_mmer(cand, m))
    # sliding-window max of width n_cand via dyadic doubling
    x = least
    width = 1
    while width * 2 <= n_cand:
        x = jnp.maximum(
            jax.lax.slice_in_dim(x, 0, x.shape[-1] - width, axis=-1),
            jax.lax.slice_in_dim(x, width, x.shape[-1], axis=-1),
        )
        width *= 2
    # x[i] = max over [i, i+width); combine with offset window for full n_cand
    rem = n_cand - width
    out = jnp.maximum(
        jax.lax.slice_in_dim(x, 0, P, axis=-1),
        jax.lax.slice_in_dim(x, rem, rem + P, axis=-1),
    )
    return out


@jax.jit
def quick_hash_u64(v: jnp.ndarray) -> jnp.ndarray:
    """64-bit mix hash (reference hash_funcs.c:332-342)."""
    v = v.astype(U64)
    v = v * U64(3935559000370003845) + U64(2691343689449507681)
    v ^= v >> U64(21)
    v ^= v << U64(37)
    v ^= v >> U64(4)
    v = v * U64(4768777513237032717)
    v ^= v << U64(20)
    v ^= v >> U64(41)
    v ^= v << U64(5)
    return v


# ---------------------------------------------------------------------------
# graph steps
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k",))
def forward_base_words(words: jnp.ndarray, base: jnp.ndarray, k: int) -> jnp.ndarray:
    """kmer[1:] + base (reference kmer.cpp:513-523).

    base: (...,) int/uint code 0..3 broadcastable against words[..., 0].
    """
    W = words.shape[-1]
    shifted = _shift_left_words(words, 2)
    i = k - 1
    w, fld = i // 16, i % 16
    ins = (base.astype(U32) & U32(3)) << U32(2 * (15 - fld))
    return shifted.at[..., w].set(shifted[..., w] | ins)


@partial(jax.jit, static_argnames=("k",))
def backward_base_words(words: jnp.ndarray, base: jnp.ndarray, k: int) -> jnp.ndarray:
    """base + kmer[:-1] (reference kmer.cpp:526-537)."""
    W = words.shape[-1]
    # shift right by 2 bits across words
    out = []
    for w in range(W):
        cur = words[..., w] >> U32(2)
        if w > 0:
            cur = cur | (words[..., w - 1] << U32(30))
        out.append(cur)
    shifted = jnp.stack(out, axis=-1)
    shifted = shifted & jnp.asarray(_endmask_words(k, W), U32)
    ins = (base.astype(U32) & U32(3)) << U32(30)
    return shifted.at[..., 0].set(shifted[..., 0] | ins)


@jax.jit
def first_base(words: jnp.ndarray) -> jnp.ndarray:
    """Code of base 0 (kmer.cpp:540-548)."""
    return (words[..., 0] >> U32(30)) & U32(3)


@partial(jax.jit, static_argnames=("k",))
def last_base(words: jnp.ndarray, k: int) -> jnp.ndarray:
    """Code of base k-1 (kmer.cpp:550-562)."""
    i = k - 1
    w, fld = i // 16, i % 16
    return (words[..., w] >> U32(2 * (15 - fld))) & U32(3)


# ---------------------------------------------------------------------------
# host conversion utilities (tests / IO)
# ---------------------------------------------------------------------------


def strings_to_words(kmers: list[str], k: int) -> np.ndarray:
    """Host: pack k-mer strings into (N, W) uint32 (oracle layout)."""
    W = words32_for_k(k)
    out = np.zeros((len(kmers), W), np.uint32)
    for n, s in enumerate(kmers):
        assert len(s) == k
        for i, c in enumerate(s.upper()):
            code = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 2}[c]
            w, fld = i // 16, i % 16
            out[n, w] |= np.uint32(code << (2 * (15 - fld)))
    return out


def decode_words_ascii(words: np.ndarray, k: int) -> np.ndarray:
    """(N, W) packed words -> (N, k) uint8 ASCII bases, vectorized numpy
    (no per-row Python: --dump-kmers at arctic scale renders millions)."""
    words = np.asarray(words, np.uint32).reshape(-1, np.asarray(words).shape[-1])
    i = np.arange(k)
    w = i // 16
    shift = (2 * (15 - (i % 16))).astype(np.uint32)
    codes = (words[:, w] >> shift[None, :]) & 3
    return np.frombuffer(b"ACGT", np.uint8)[codes]


def words_to_strings(words: np.ndarray, k: int) -> list[str]:
    chars = decode_words_ascii(words, k)
    return [row.tobytes().decode() for row in chars]


@partial(jax.jit, static_argnames=("k",))
def codes_from_words(words: jnp.ndarray, k: int) -> jnp.ndarray:
    """Unpack (..., W) words into (..., k) uint8 base codes."""
    outs = []
    for i in range(k):
        w, fld = i // 16, i % 16
        outs.append(((words[..., w] >> U32(2 * (15 - fld))) & U32(3)).astype(jnp.uint8))
    return jnp.stack(outs, axis=-1)


@partial(jax.jit, static_argnames=("k", "m"))
def minimizers_from_words(words: jnp.ndarray, k: int, m: int) -> jnp.ndarray:
    """Minimizer of packed k-mers (for table-side queries).

    Same semantics as minimizers_from_codes but starting from packed words:
    candidates are extracted with funnel shifts instead of re-packing.
    """
    n_cand = k - m + 1
    zm = U64((((1 << (2 * m)) - 1) << (64 - 2 * m)) & _M64)
    W = words.shape[-1]
    # u64 view of consecutive word pairs, then per-candidate funnel shift
    w64 = (words.astype(U64)[..., 0::2] << U64(32)) | words.astype(U64)[..., 1::2]
    n64 = w64.shape[-1]
    best = jnp.zeros(words.shape[:-1], U64)
    for i in range(n_cand):
        l, sh = i // 32, (i % 32) * 2
        cur = w64[..., l]
        if sh:
            nxt = w64[..., l + 1] if l + 1 < n64 else jnp.zeros_like(cur)
            cur = (cur << U64(sh)) | (nxt >> U64(64 - sh))
        cand = cur & zm
        least = jnp.minimum(cand, revcomp_mmer(cand, m))
        best = jnp.maximum(best, least)
    return best
