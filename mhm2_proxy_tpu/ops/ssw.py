"""Batched striped-Smith-Waterman-equivalent local alignment on TPU.

Capability parity with the reference's SSW/ADEPT aligners (exercised by
--post-asm-align in full MHM2; spec'd by test/ssw-test.cpp and the ALN_*
scoring constants, CMakeDefinitions.txt:115-119). The reference runs Farrar's
striped SSE kernel per pair (CPU) or the ADEPT GPU kernel; here one XLA scan
over reference columns processes a whole batch of pairs, with the in-column
affine-gap dependency resolved by an associative max-decay scan (valid single
pass because gap_open >= gap_extend, which holds for every scoring profile
the reference uses).

Semantics (Farrar/SSW conventions):
  H[i,j] = max(0, H[i-1,j-1] + subst, E[i,j], F[i,j])
  E[i,j] = max(H[i,j-1] - gap_open, E[i,j-1] - gap_extend)   (gap in query)
  F[i,j] = max(H[i-1,j] - gap_open, F[i-1,j] - gap_extend)   (gap in ref)
Best cell ties break toward smaller ref position then smaller query position
(matching the SSW library's first-best reporting). Begin positions come from
a second pass over the reversed prefixes, like SSW's banded re-alignment.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

I32 = jnp.int32


def _decay_max_scan(c, ge):
    """y[i] = max over k <= i of (c[k] - (i-k)*ge), via associative scan.

    c: (..., L) along the last axis.
    """
    L = c.shape[-1]

    def combine(a, b):
        sa, va = a
        sb, vb = b
        return sa + sb, jnp.maximum(vb, va - sb)

    shifts = jnp.full(c.shape, ge, c.dtype)
    _, y = jax.lax.associative_scan(combine, (shifts, c), axis=-1)
    return y


@partial(jax.jit, static_argnames=("match", "mismatch", "gap_open", "gap_extend", "ambiguity"))
def sw_align_ends(
    query, q_len, ref, r_len,
    match: int = 1, mismatch: int = 1, gap_open: int = 1, gap_extend: int = 1,
    ambiguity: int = 1,
):
    """Forward pass: best score and END positions for a batch of pairs.

    query: (B, Lq) uint8 codes (0-3, 4=N/ambiguous), ref: (B, Lr); *_len actual
    lengths. Returns (score (B,) i32, q_end (B,), r_end (B,)) with 0-based
    inclusive end positions (-1 when no positive-scoring cell exists).
    """
    B, Lq = query.shape
    _, Lr = ref.shape
    q_valid = jnp.arange(Lq)[None, :] < q_len[:, None]

    def col_step(carry, j):
        H_prev, E_prev, best, bi, bj = carry
        r_b = ref[:, j]  # (B,)
        r_ok = j < r_len
        is_amb = (query >= 4) | (r_b[:, None] >= 4)
        sub = jnp.where(
            is_amb, I32(-ambiguity),
            jnp.where(query == r_b[:, None], I32(match), I32(-mismatch)),
        )
        sub = jnp.where(q_valid & r_ok[:, None], sub, I32(-(10 ** 6)))
        # diag = H[i-1, j-1]: shift H_prev down by one
        diag = jnp.pad(H_prev[:, :-1], ((0, 0), (1, 0)))
        E = jnp.maximum(H_prev - gap_open, E_prev - gap_extend)
        H_noF = jnp.maximum(jnp.maximum(diag + sub, E), 0)
        # F[i] = max_{k<i} (H_noF[k] - gap_open - (i-1-k)*gap_extend)
        c = jnp.pad(H_noF[:, :-1] - gap_open, ((0, 0), (1, 0)), constant_values=-(10 ** 6))
        F = _decay_max_scan(c, jnp.int32(gap_extend))
        H = jnp.maximum(H_noF, F)
        H = jnp.where(q_valid & r_ok[:, None], H, 0)
        # track best with (score desc, j asc, i asc) tie-breaking
        col_best = jnp.max(H, axis=1)
        col_i = jnp.argmax(H, axis=1).astype(I32)  # first max along i
        upd = col_best > best
        best = jnp.where(upd, col_best, best)
        bi = jnp.where(upd, col_i, bi)
        bj = jnp.where(upd, jnp.int32(j), bj)
        return (H, E, best, bi, bj), None

    H0 = jnp.zeros((B, Lq), I32)
    E0 = jnp.full((B, Lq), -(10 ** 6), I32)
    init = (H0, E0, jnp.zeros((B,), I32), jnp.full((B,), -1, I32), jnp.full((B,), -1, I32))
    (Hf, Ef, best, bi, bj), _ = jax.lax.scan(col_step, init, jnp.arange(Lr))
    none = best <= 0
    return (
        jnp.where(none, 0, best),
        jnp.where(none, -1, bi),
        jnp.where(none, -1, bj),
    )


def _reverse_prefix(arr, lens, L):
    """arr[:, :lens] reversed and left-aligned; tail padded with 255."""
    j = jnp.arange(L, dtype=I32)[None, :]
    idx = jnp.clip(lens[:, None] - 1 - j, 0, L - 1)
    out = jnp.take_along_axis(arr, idx, axis=1)
    return jnp.where(j < lens[:, None], out, jnp.uint8(255))


@partial(jax.jit, static_argnames=("match", "mismatch", "gap_open", "gap_extend", "ambiguity"))
def sw_align(
    query, q_len, ref, r_len,
    match: int = 1, mismatch: int = 1, gap_open: int = 1, gap_extend: int = 1,
    ambiguity: int = 1,
):
    """Full batched local alignment: score + begin/end on both sequences.

    Returns dict(score, q_begin, q_end, r_begin, r_end), all (B,) int32,
    0-based inclusive; begin/end are -1 for pairs with no alignment.
    """
    kw = dict(match=match, mismatch=mismatch, gap_open=gap_open,
              gap_extend=gap_extend, ambiguity=ambiguity)
    score, q_end, r_end = sw_align_ends(query, q_len, ref, r_len, **kw)
    # second pass on reversed prefixes ending at the best cell
    B, Lq = query.shape
    _, Lr = ref.shape
    q_rev = _reverse_prefix(query, q_end + 1, Lq)
    r_rev = _reverse_prefix(ref, r_end + 1, Lr)
    s2, qe2, re2 = sw_align_ends(q_rev, q_end + 1, r_rev, r_end + 1, **kw)
    q_begin = jnp.where(q_end >= 0, q_end - qe2, -1)
    r_begin = jnp.where(r_end >= 0, r_end - re2, -1)
    return dict(score=score, q_begin=q_begin, q_end=q_end, r_begin=r_begin, r_end=r_end)


# ---------------------------------------------------------------------------
# host traceback for CIGARs (reference SSW report_cigar path)
# ---------------------------------------------------------------------------


def sw_cigar_host(query: str, ref: str, aln: dict, idx: int,
                  match=1, mismatch=1, gap_open=1, gap_extend=1, ambiguity=1):
    """CIGAR + mismatch count for one aligned pair by host DP traceback.

    Produces SSW-style CIGARs with '=' / 'X' / 'I' / 'D' and soft clips 'S'
    at the query ends (cf. test/ssw-test.cpp expectations like '1S4=2S').
    """
    qb, qe = int(aln["q_begin"][idx]), int(aln["q_end"][idx])
    rb, re_ = int(aln["r_begin"][idx]), int(aln["r_end"][idx])
    if qe < 0:
        return "", 0
    q = query[qb : qe + 1]
    r = ref[rb : re_ + 1]
    n, m = len(q), len(r)
    NEG = -(10 ** 6)
    H = np.zeros((n + 1, m + 1), np.int32)
    E = np.full((n + 1, m + 1), NEG, np.int32)
    F = np.full((n + 1, m + 1), NEG, np.int32)
    # global alignment of the clipped segment (it is known to align end-to-end)
    for i in range(1, n + 1):
        H[i, 0] = -gap_open - (i - 1) * gap_extend
        F[i, 0] = H[i, 0]
    for j in range(1, m + 1):
        H[0, j] = -gap_open - (j - 1) * gap_extend
        E[0, j] = H[0, j]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = match if q[i - 1] == r[j - 1] else -mismatch
            if q[i - 1] not in "ACGT" or r[j - 1] not in "ACGT":
                s = -ambiguity
            E[i, j] = max(H[i, j - 1] - gap_open, E[i, j - 1] - gap_extend)
            F[i, j] = max(H[i - 1, j] - gap_open, F[i - 1, j] - gap_extend)
            H[i, j] = max(H[i - 1, j - 1] + s, E[i, j], F[i, j])
    # traceback
    ops = []
    i, j = n, m
    mismatches = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and H[i, j] == H[i - 1, j - 1] + (
            (match if q[i - 1] == r[j - 1] else -mismatch)
            if q[i - 1] in "ACGT" and r[j - 1] in "ACGT"
            else -ambiguity
        ):
            ops.append("=" if q[i - 1] == r[j - 1] else "X")
            if q[i - 1] != r[j - 1]:
                mismatches += 1
            i, j = i - 1, j - 1
        elif j > 0 and H[i, j] == E[i, j]:
            ops.append("D")
            mismatches += 1
            j -= 1
        else:
            ops.append("I")
            mismatches += 1
            i -= 1
    ops.reverse()
    # run-length encode with soft clips
    cigar = []
    if qb > 0:
        cigar.append(f"{qb}S")
    k = 0
    while k < len(ops):
        k2 = k
        while k2 < len(ops) and ops[k2] == ops[k]:
            k2 += 1
        cigar.append(f"{k2 - k}{ops[k]}")
        k = k2
    tail = len(query) - 1 - qe
    if tail > 0:
        cigar.append(f"{tail}S")
    return "".join(cigar), mismatches
