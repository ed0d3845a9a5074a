"""Batched paired-read merging (reference src/merge_reads.cpp:237-495).

The reference merges each pair with a sequential sliding-window overlap scan
(SSE2 mismatch counting + a quality-differential error model). Here the scan
is vectorized across a whole block of pairs on device: the offset loop runs as
a lax.fori_loop whose body evaluates every pair at that offset with masked
vector ops, and the reference's per-pair early-exit state machine (best/found/
ambiguous/abort) becomes a carried state fold.

Constants mirror merge_reads.cpp:285-295: MIN_OVERLAP=12, EXTRA_TEST_OVERLAP=2,
MAX_MISMATCHES=3 (+150/1000 per overlap base), MAX_PERROR=0.025,
MAX_MATCH_QUAL=41+qual_offset, and the Q2Perror table (merge_reads.cpp:73-81).

Known deliberate divergence: the reference zeroes the quality of 'N' bases
lazily as overlap scans touch them (merge_reads.cpp:375,382); we pre-zero all
N-base qualities. This changes nothing for positions inside the accepted
overlap (the winning scan always touches them) and only affects output
qualities of never-tested N bases, which cannot influence assembly (N k-mers
pack as G regardless of quality; N extensions are always ignored).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

I32 = jnp.int32
F32 = jnp.float32

MIN_OVERLAP = 12
EXTRA_TEST_OVERLAP = 2
MAX_MISMATCHES = 3
MAX_PERROR = 0.025
EXTRA_MISMATCHES_PER_1000 = 150

# Q2Perror[q] = 10^(-q/10) table (merge_reads.cpp:73-81), 80 entries
_Q2PERROR = np.array(
    [1.0, 0.7943, 0.6309, 0.5012, 0.3981, 0.3162, 0.2512, 0.1995, 0.1585, 0.1259,
     0.1, 0.07943, 0.06310, 0.05012, 0.03981, 0.03162, 0.02512, 0.01995, 0.01585, 0.01259,
     0.01, 0.007943, 0.006310, 0.005012, 0.003981, 0.003162, 0.002512, 0.001995, 0.001585, 0.001259,
     0.001, 0.0007943, 0.0006310, 0.0005012, 0.0003981, 0.0003162, 0.0002512, 0.0001995, 0.0001585, 0.0001259,
     0.0001, 7.943e-05, 6.310e-05, 5.012e-05, 3.981e-05, 3.162e-05, 2.512e-05, 1.995e-05, 1.585e-05, 1.259e-05,
     1e-05, 7.943e-06, 6.310e-06, 5.012e-06, 3.981e-06, 3.162e-06, 2.512e-06, 1.995e-06, 1.585e-06, 1.259e-06,
     1e-06, 7.943e-07, 6.310e-07, 5.012e-07, 3.981e-07, 3.1622e-07, 2.512e-07, 1.995e-07, 1.585e-07, 1.259e-07,
     1e-07, 7.943e-08, 6.310e-08, 5.012e-08, 3.981e-08, 3.1622e-08, 2.512e-08, 1.995e-08, 1.585e-08, 1.259e-08],
    np.float64,
)


K_CAND = 12  # shortlist width: prefilter-passing shifts evaluated in detail


def _eval_shift(a, q1, rc2, q2f, overlap, q2p):
    """Detailed overlap scoring at one shift (merge_reads.cpp:346-443).

    a, q1: (..., L) aligned seq1 window (codes / phred); rc2, q2f:
    broadcast-compatible (..., L) rc(read2); overlap: (...,).
    Returns (good, weak, abort_here) UNgated by scan state — callers apply
    the done/shift-validity gating.
    """
    L = a.shape[-1]
    j = jnp.arange(L, dtype=I32)
    in_ov = j < overlap[..., None]
    lead = a.shape[:-1]

    this_max = MAX_MISMATCHES + (EXTRA_MISMATCHES_PER_1000 * overlap) // 1000
    error_max = (this_max * 4) // 3 + 1

    is_mm = (a != rc2) & in_ov
    byte_mm = jnp.sum(is_mm, axis=-1)
    prefilter_ok = byte_mm <= error_max

    has_n = (a == 4) | (rc2 == 4)
    mm_n = is_mm & has_n  # N mismatches count double
    det_mm = is_mm.astype(I32) + mm_n.astype(I32)
    cum_mm = jnp.cumsum(det_mm, axis=-1)
    # j is processed iff cumulative mismatches before j never exceeded max
    proc = jnp.concatenate(
        [jnp.ones(lead + (1,), bool), cum_mm[..., :-1] <= error_max[..., None]], axis=-1
    ) & in_ov
    complete = jnp.min(jnp.where(proc | ~in_ov, 1, 0), axis=-1).astype(bool)

    match_n = (a == 4) & (rc2 == 4) & in_ov
    cum_match_n = jnp.cumsum(match_n.astype(I32), axis=-1)
    ncount = jnp.cumsum((match_n.astype(I32) * 2 + mm_n.astype(I32)), axis=-1)
    abort_j = ((cum_match_n >= 2) & match_n) | (ncount > 3)
    abort_here = jnp.any(abort_j & proc, axis=-1) & prefilter_ok

    matches = jnp.sum((a == rc2) & in_ov, axis=-1)

    # perror contributions at mismatches (merge_reads.cpp:370-406)
    q1z = jnp.where(a == 4, 0, q1)
    q2z = jnp.where(rc2 == 4, 0, q2f)
    qq1 = jnp.clip(q1z, 0, 79)
    qq2 = jnp.clip(q2z, 0, 79)
    diffq = jnp.clip(jnp.abs(qq1 - qq2), 0, 79)
    base_pe = jnp.where(diffq <= 2, F32(0.5), q2p[diffq])
    n_pe = jnp.where(a == 4, q2p[qq2], jnp.where(rc2 == 4, q2p[qq1], F32(0.0)))
    pe = jnp.where(is_mm, base_pe + n_pe, F32(0.0))
    perror = jnp.sum(pe, axis=-1)

    mm_total = jnp.where(in_ov, det_mm, 0).sum(axis=-1)
    ovf = jnp.maximum(overlap, 1).astype(F32)
    match_thres = jnp.maximum(overlap - this_max, MIN_OVERLAP)
    good = (
        prefilter_ok & complete & ~abort_here
        & (matches >= match_thres)
        & (mm_total <= this_max)
        & (perror / ovf <= F32(MAX_PERROR))
    )
    weak = (
        prefilter_ok & complete & ~abort_here & ~good
        & (mm_total <= error_max)
        & (perror / ovf <= F32(MAX_PERROR * 4 / 3))
    )
    return good, weak, abort_here


@partial(jax.jit, static_argnames=("qual_offset", "scan"))
def merge_pairs_block(codes1, quals1, len1, codes2, quals2, len2, qual_offset: int = 33,
                      scan: str = "dense"):
    """Merge a block of read pairs.

    codes*: (B, L) uint8 base codes (0-3, 4=N); quals*: (B, L) uint8 raw
    (phred+offset); len*: (B,) int32.

    scan="dense" evaluates every shift (the reference's sequential scan as a
    fori_loop fold); scan="shortlist" evaluates only prefilter-passing shifts
    (exact unless `overflow` is returned True — see below).

    Returns dict with merged (B,) bool, m_codes/m_quals (B, 2L), m_len (B,),
    plus ambiguity/abort stats and `overflow` (always False for dense).
    """
    B, L = codes1.shape
    q2p = jnp.asarray(_Q2PERROR, F32)

    # pre-zero N-base qualities (see module docstring)
    quals1 = jnp.where(codes1 == 4, jnp.uint8(qual_offset), quals1)
    quals2 = jnp.where(codes2 == 4, jnp.uint8(qual_offset), quals2)

    # rc of read2 with reversed quals, left-aligned to its length
    j = jnp.arange(L, dtype=I32)[None, :]
    rev_idx = jnp.clip(len2[:, None] - 1 - j, 0, L - 1)
    c2r = jnp.take_along_axis(codes2, rev_idx, axis=1)
    rc2 = jnp.where(c2r < 4, jnp.uint8(3) - c2r, c2r)
    rc2 = jnp.where(j < len2[:, None], rc2, jnp.uint8(255))
    rq2 = jnp.where(j < len2[:, None], jnp.take_along_axis(quals2, rev_idx, axis=1), jnp.uint8(qual_offset))

    ov_len = jnp.minimum(len1, len2)  # 'len' in the reference
    start_i = len1 - ov_len

    # seq1 aligned at start_i, padded right so offset slices stay in bounds
    a_idx = jnp.clip(start_i[:, None] + j, 0, L - 1)
    a_al = jnp.where(start_i[:, None] + j < len1[:, None], jnp.take_along_axis(codes1, a_idx, axis=1), jnp.uint8(254))
    aq_al = jnp.take_along_axis(quals1, a_idx, axis=1)
    pad = jnp.full((B, L), 254, jnp.uint8)
    a_pad = jnp.concatenate([a_al, pad], axis=1)
    aq_pad = jnp.concatenate([aq_al, jnp.full((B, L), qual_offset, jnp.uint8)], axis=1)

    q1f = aq_pad.astype(I32) - qual_offset  # (B, 2L) phred of aligned seq1
    q2f = rq2.astype(I32) - qual_offset

    n_i = max(L - MIN_OVERLAP + EXTRA_TEST_OVERLAP, 1)

    def step(state, i_k, good, weak, abort_here):
        """One state-machine transition (merge_reads.cpp:419-442)."""
        best_i, found_i, done, aborted, n_ambig = state
        good = good & ~done
        weak = weak & ~done
        abort_here = abort_here & ~done
        fresh = (best_i < 0) & (found_i < 0)
        new_best = jnp.where(good & fresh, i_k, best_i)
        good_ambig = good & ~fresh
        weak_ambig = weak & (best_i >= 0)
        new_best = jnp.where(good_ambig | weak_ambig, -1, new_best)
        new_found = jnp.where(weak, i_k, found_i)
        new_done = done | abort_here | good_ambig | weak_ambig
        new_aborted = aborted | abort_here
        new_ambig = n_ambig + (abort_here | good_ambig | weak_ambig).astype(I32)
        return (new_best, new_found, new_done, new_aborted, new_ambig)

    init = (
        jnp.full((B,), -1, I32),
        jnp.full((B,), -1, I32),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), I32),
    )

    if scan == "dense":
        def body(i, st):
            a = jax.lax.dynamic_slice(a_pad, (0, i), (B, L))
            q1 = jax.lax.dynamic_slice(q1f, (0, i), (B, L))
            overlap = ov_len - i  # (B,)
            shift_ok = i < ov_len - MIN_OVERLAP + EXTRA_TEST_OVERLAP
            good, weak, abort_here = _eval_shift(a, q1, rc2, q2f, overlap, q2p)
            ib = jnp.full((B,), i, I32)
            return step(st, ib, good & shift_ok, weak & shift_ok, abort_here & shift_ok)

        best_i, found_i, done, aborted, n_ambig = jax.lax.fori_loop(0, n_i, body, init)
        overflow = jnp.zeros((), bool)
    else:
        # shortlist scan: full detailed scoring runs only on the <= K_CAND
        # shifts per pair that pass the cheap mismatch-count prefilter (the
        # reference's SSE popcnt prefilter, merge_reads.cpp:346-357, plays
        # the same role). Exact: state transitions can only fire at
        # prefilter-passing shifts, so evaluating exactly those in order
        # reproduces the sequential scan; on > K_CAND passing shifts
        # (`overflow` True) the caller must fall back to the dense scan.
        shift_i = jnp.arange(n_i, dtype=I32)[None, :]  # (1, n_i)
        overlap_all = ov_len[:, None] - shift_i  # (B, n_i)
        this_max_all = MAX_MISMATCHES + (EXTRA_MISMATCHES_PER_1000 * overlap_all) // 1000
        error_max_all = (this_max_all * 4) // 3 + 1
        # byte mismatch counts for ALL shifts from static shifted slices (no
        # gathers): windows[b, s, :] = a_pad[b, s : s + L]
        win = jnp.stack([a_pad[:, s : s + L] for s in range(n_i)], axis=1)
        in_ov_all = jnp.arange(L, dtype=I32)[None, None, :] < overlap_all[..., None]
        byte_mm_all = jnp.sum((win != rc2[:, None, :]) & in_ov_all, axis=-1)
        shift_valid = shift_i < (ov_len - MIN_OVERLAP + EXTRA_TEST_OVERLAP)[:, None]
        passing = (byte_mm_all <= error_max_all) & shift_valid
        overflow = jnp.any(jnp.sum(passing, axis=1) > K_CAND)

        cand = jnp.sort(jnp.where(passing, shift_i, n_i), axis=1)[:, :K_CAND]
        cand_valid = cand < n_i
        idx3 = cand[:, :, None] + jnp.arange(L, dtype=I32)[None, None, :]
        gat = lambda x: jnp.take_along_axis(
            jnp.broadcast_to(x[:, None, :], (B, K_CAND, 2 * L)), idx3, axis=2
        )
        good_c, weak_c, abort_c = _eval_shift(
            gat(a_pad), gat(q1f), rc2[:, None, :], q2f[:, None, :],
            ov_len[:, None] - cand, q2p,
        )
        st = init
        for kk in range(K_CAND):
            v = cand_valid[:, kk]
            st = step(st, cand[:, kk], good_c[:, kk] & v, weak_c[:, kk] & v,
                      abort_c[:, kk] & v)
        best_i, found_i, done, aborted, n_ambig = st

    merged = (best_i >= 0) & ~aborted & (len1 > 0) & (len2 > 0)

    # --- resolution of the merged overlap (merge_reads.cpp:445-475) ---
    bi = jnp.maximum(best_i, 0)
    overlap = ov_len - bi
    a = jnp.take_along_axis(a_pad, bi[:, None] + j, axis=1)
    q1 = jnp.take_along_axis(q1f, bi[:, None] + j, axis=1)
    in_ov = j < overlap[:, None]
    is_match = (a == rc2) & in_ov
    newq_match = jnp.minimum(q1 + q2f, 41)
    use2 = q1 < q2f
    res_base = jnp.where(in_ov, jnp.where(is_match, rc2, jnp.where(use2, rc2, a)), rc2)
    newq_mm = jnp.maximum(jnp.abs(q1 - q2f), 2)
    res_q = jnp.where(in_ov, jnp.where(is_match, newq_match, newq_mm), q2f)
    res_q = (jnp.clip(res_q, 0, 255 - qual_offset) + qual_offset).astype(jnp.uint8)

    # merged[t] = seq1[t] for t < start_i+bi else res[t - start_i - bi]
    t = jnp.arange(2 * L, dtype=I32)[None, :]
    cut = (start_i + bi)[:, None]
    m_len = len1 + len2 - overlap
    src1 = jnp.clip(t, 0, L - 1)
    src2 = jnp.clip(t - cut, 0, L - 1)
    c1big = jnp.concatenate([codes1, jnp.full((B, L), 4, jnp.uint8)], axis=1)
    qu1big = jnp.concatenate([quals1, jnp.full((B, L), qual_offset, jnp.uint8)], axis=1)
    m_codes = jnp.where(t < cut, jnp.take_along_axis(c1big, src1, axis=1), jnp.take_along_axis(res_base, src2, axis=1))
    m_quals = jnp.where(t < cut, jnp.take_along_axis(qu1big, src1, axis=1), jnp.take_along_axis(res_q, src2, axis=1))
    valid_t = t < m_len[:, None]
    m_codes = jnp.where(valid_t & merged[:, None], m_codes, jnp.uint8(4))
    m_quals = jnp.where(valid_t & merged[:, None], m_quals, jnp.uint8(qual_offset))

    return dict(
        merged=merged,
        m_codes=m_codes,
        m_quals=m_quals,
        m_len=jnp.where(merged, m_len, 0),
        n_ambiguous=jnp.sum(n_ambig),
        overlap=jnp.where(merged, overlap, 0),
        quals1_z=quals1,
        quals2_z=quals2,
        overflow=overflow,
    )


def merge_reads_arrays(codes1, quals1, len1, codes2, quals2, len2, qual_offset=33,
                       use_native: bool | None = None):
    """Host wrapper: returns per-pair merged results as numpy.

    Merging is an ingest-side stage whose inputs and outputs live on the
    host (PackedReads), so running it on a remote-tunnel accelerator pays
    ~20 MB of tunnel traffic per block for compute the host does in about
    the same time. Production path: the native C++ scan
    (native/merge_native.cpp, the reference merge_reads.cpp analog) — a
    scalar early-exit scan is ~100x the block-vectorized JAX-on-CPU
    formulation, which remains the fallback/test path (equivalence-tested,
    tests/test_merge.py).
    """
    if use_native is None:
        use_native = os.environ.get("MHM2_NO_NATIVE_MERGE", "") != "1"
    if use_native:
        from . import native

        if native.merge_available():
            return native.merge_pairs(
                np.asarray(codes1), np.asarray(quals1), np.asarray(len1),
                np.asarray(codes2), np.asarray(quals2), np.asarray(len2),
                qual_offset=qual_offset,
            )
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        args = (
            jnp.asarray(np.asarray(codes1)), jnp.asarray(np.asarray(quals1)),
            jnp.asarray(np.asarray(len1)), jnp.asarray(np.asarray(codes2)),
            jnp.asarray(np.asarray(quals2)), jnp.asarray(np.asarray(len2)),
        )
        out = merge_pairs_block(*args, qual_offset=qual_offset, scan="shortlist")
        if bool(np.asarray(out["overflow"])):
            # > K_CAND prefilter-passing shifts for some pair (low-complexity
            # reads): rerun the block with the exact dense scan
            out = merge_pairs_block(*args, qual_offset=qual_offset, scan="dense")
        return {k: np.asarray(v) for k, v in out.items() if k != "overflow"}
