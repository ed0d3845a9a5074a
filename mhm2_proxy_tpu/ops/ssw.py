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


def sw_align_ends(
    query, q_len, ref, r_len,
    match: int = 1, mismatch: int = 1, gap_open: int = 1, gap_extend: int = 1,
    ambiguity: int = 1, use_pallas: bool | None = None,
):
    """Forward pass: best score and END positions for a batch of pairs.

    query: (B, Lq) uint8 codes (0-3, 4=N/ambiguous), ref: (B, Lr); *_len actual
    lengths. Returns (score (B,) i32, q_end (B,), r_end (B,)) with 0-based
    inclusive end positions (-1 when no positive-scoring cell exists).

    use_pallas=None auto-selects: on TPU the VMEM-resident Pallas kernel
    (ops/pallas_ssw.py, bit-exact, ~5.5x faster: the XLA scan round-trips its
    per-column carries through HBM) is the production path.
    """
    if use_pallas is None:
        from . import kernels

        use_pallas = (
            kernels.enabled("ssw")
            and query.shape[1] <= 1024 and ref.shape[1] <= 4096
        )
    if use_pallas:
        from .pallas_ssw import pallas_sw_align_ends

        return pallas_sw_align_ends(
            query, q_len, ref, r_len, match=match, mismatch=mismatch,
            gap_open=gap_open, gap_extend=gap_extend, ambiguity=ambiguity,
        )
    return _sw_align_ends_xla(
        query, q_len, ref, r_len, match=match, mismatch=mismatch,
        gap_open=gap_open, gap_extend=gap_extend, ambiguity=ambiguity,
    )


@partial(jax.jit, static_argnames=("match", "mismatch", "gap_open", "gap_extend", "ambiguity"))
def _sw_align_ends_xla(
    query, q_len, ref, r_len,
    match: int = 1, mismatch: int = 1, gap_open: int = 1, gap_extend: int = 1,
    ambiguity: int = 1,
):
    """XLA lax.scan reference formulation (CPU path + Pallas cross-check)."""
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
# batched CIGARs: device DP with stored traceback pointers + vectorized
# host walk (reference SSW report_cigar path; ADEPT ran this DP on GPU)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("match", "mismatch", "gap_open", "gap_extend", "ambiguity"))
def _global_tb_pointers(
    q, r,
    match: int = 1, mismatch: int = 1, gap_open: int = 1, gap_extend: int = 1,
    ambiguity: int = 1,
):
    """Global-alignment DP over clipped segments, returning traceback codes.

    q: (B, Nq) uint8 codes (255 pad), r: (B, Nr). Returns hsrc (B, Nr+1, Nq+1)
    uint8 with 0=diag, 1=E (gap in query, 'D'), 2=F (gap in ref, 'I'),
    evaluated with the same priority order as the host oracle sw_cigar_host
    (diag, then E, else F). The in-column F recurrence is resolved lazily via
    the same max-decay scan as sw_align_ends; exact because gap_open >=
    gap_extend for every reference scoring profile (see module docstring).
    """
    B, Nq = q.shape
    _, Nr = r.shape
    NEG = I32(-(10 ** 6))
    i_ax = jnp.arange(Nq + 1, dtype=I32)[None, :]  # (1, Nq+1)

    # column j=0 boundary: H[i,0] = -go - (i-1)*ge, traceback 'I' everywhere
    H0 = jnp.where(i_ax == 0, 0, -gap_open - (i_ax - 1) * gap_extend)
    H0 = jnp.broadcast_to(H0.astype(jnp.int32), (B, Nq + 1))
    E0 = jnp.full((B, Nq + 1), NEG)
    tb0 = jnp.full((B, Nq + 1), 2, jnp.uint8)

    q_amb = q >= 4  # (B, Nq)

    def col_step(carry, j):
        H_prev, E_prev = carry
        r_b = r[:, j - 1]  # (B,)
        r_amb = r_b >= 4
        is_amb = q_amb | r_amb[:, None]
        sub = jnp.where(
            is_amb, I32(-ambiguity),
            jnp.where(q == r_b[:, None], I32(match), I32(-mismatch)),
        )  # (B, Nq) score for cell i = 1..Nq
        E = jnp.maximum(H_prev - gap_open, E_prev - gap_extend)
        h_bound = (-gap_open - (j - 1) * gap_extend).astype(jnp.int32)
        E = E.at[:, 0].set(h_bound)  # E[0,j] = H[0,j] boundary (host l.165-167)
        diag_plus_sub = jnp.concatenate(
            [jnp.full((B, 1), NEG), H_prev[:, :-1] + sub], axis=1
        )
        H_noF = jnp.maximum(diag_plus_sub, E)
        H_noF = H_noF.at[:, 0].set(h_bound)
        c = jnp.concatenate([jnp.full((B, 1), NEG), H_noF[:, :-1] - gap_open], axis=1)
        F = _decay_max_scan(c, jnp.int32(gap_extend))
        H = jnp.maximum(H_noF, F)
        H = H.at[:, 0].set(h_bound)
        hsrc = jnp.where(
            H == diag_plus_sub, jnp.uint8(0), jnp.where(H == E, jnp.uint8(1), jnp.uint8(2))
        )
        hsrc = hsrc.at[:, 0].set(jnp.uint8(1))  # i=0, j>0: gap in query
        return (H, E), hsrc

    (_, _), tb = jax.lax.scan(col_step, (H0, E0), jnp.arange(1, Nr + 1))
    # tb: (Nr, B, Nq+1) -> (B, Nr+1, Nq+1)
    return jnp.concatenate([tb0[:, None, :], jnp.transpose(tb, (1, 0, 2))], axis=1)


_OP_CHARS = np.frombuffer(b".=XID", np.uint8)  # op code -> CIGAR char


def sw_cigar_batch(query, q_len, ref, r_len, aln: dict,
                   match=1, mismatch=1, gap_open=1, gap_extend=1, ambiguity=1):
    """CIGARs + mismatch counts for a whole aligned batch.

    query/ref: (B, Lq)/(B, Lr) uint8 codes; aln from sw_align on the same
    batch. The clipped segments' global DP runs batched on device; the
    traceback walk is one vectorized numpy step per op (O(Lq+Lr) steps for
    the whole batch instead of O(Lq*Lr) python per pair). Returns
    (cigars: list[str], mismatches: (B,) int32); unaligned pairs get "".
    Matches sw_cigar_host exactly (same priority rules).
    """
    query = np.asarray(query)
    ref = np.asarray(ref)
    B, Lq = query.shape
    _, Lr = ref.shape
    qb = np.asarray(aln["q_begin"], np.int64)
    qe = np.asarray(aln["q_end"], np.int64)
    rb = np.asarray(aln["r_begin"], np.int64)
    re_ = np.asarray(aln["r_end"], np.int64)
    ok = qe >= 0
    nq = np.where(ok, qe - qb + 1, 0).astype(np.int64)
    nr = np.where(ok, re_ - rb + 1, 0).astype(np.int64)
    Nq = int(nq.max(initial=1))
    Nr = int(nr.max(initial=1))
    # gather the clipped segments, left-aligned, 255-padded
    jq = np.arange(Nq)[None, :]
    q_clip = np.where(
        jq < nq[:, None],
        np.take_along_axis(query, np.clip(qb[:, None] + jq, 0, Lq - 1), axis=1),
        np.uint8(255),
    ).astype(np.uint8)
    jr = np.arange(Nr)[None, :]
    r_clip = np.where(
        jr < nr[:, None],
        np.take_along_axis(ref, np.clip(rb[:, None] + jr, 0, Lr - 1), axis=1),
        np.uint8(255),
    ).astype(np.uint8)

    tb = np.asarray(_global_tb_pointers(
        jnp.asarray(q_clip), jnp.asarray(r_clip),
        match=match, mismatch=mismatch, gap_open=gap_open,
        gap_extend=gap_extend, ambiguity=ambiguity,
    ))

    # vectorized traceback from (nq, nr), emitting ops end-to-start
    i = nq.copy()
    j = nr.copy()
    rows = np.arange(B)
    max_steps = Nq + Nr
    ops_rev = np.zeros((B, max_steps), np.uint8)  # 0 none, 1 '=', 2 'X', 3 'I', 4 'D'
    n_ops = np.zeros(B, np.int64)
    for step in range(max_steps):
        active = (i > 0) | (j > 0)
        if not active.any():
            break
        h = tb[rows, j, i]
        d = active & (h == 0) & (i > 0) & (j > 0)
        dd = active & ~d & (h == 1) & (j > 0)
        ii = active & ~d & ~dd
        qi = q_clip[rows, np.clip(i - 1, 0, Nq - 1)]
        rj = r_clip[rows, np.clip(j - 1, 0, Nr - 1)]
        eq = (qi == rj) & (qi < 4)
        ops_rev[:, step] = np.where(
            d, np.where(eq, 1, 2), np.where(dd, 4, np.where(ii, 3, 0))
        )
        i = i - (d | ii)
        j = j - (d | dd)
        n_ops += active
    mismatches = (ops_rev >= 2).sum(axis=1).astype(np.int32)

    cigars = []
    for b in range(B):
        if not ok[b]:
            cigars.append("")
            continue
        ops = ops_rev[b, : n_ops[b]][::-1]
        parts = []
        if qb[b] > 0:
            parts.append(f"{qb[b]}S")
        if ops.size:
            # run-length encode via change-point detection
            cp = np.flatnonzero(np.diff(ops)) + 1
            bounds = np.concatenate(([0], cp, [ops.size]))
            for s, e in zip(bounds[:-1], bounds[1:]):
                parts.append(f"{e - s}{chr(_OP_CHARS[ops[s]])}")
        tail = int(q_len[b]) - 1 - int(qe[b])
        if tail > 0:
            parts.append(f"{tail}S")
        cigars.append("".join(parts))
    return cigars, np.where(ok, mismatches, 0).astype(np.int32)


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
