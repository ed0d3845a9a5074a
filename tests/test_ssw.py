"""SSW aligner tests mirroring reference test/ssw-test.cpp:150-232."""

import numpy as np
import jax.numpy as jnp
import pytest

from mhm2_proxy_tpu.ops.ssw import sw_align, sw_cigar_host
from mhm2_proxy_tpu.ops.bitkmer import ascii_to_codes

SCORINGS = [
    dict(match=2, mismatch=2, gap_open=3, gap_extend=1, ambiguity=2),  # ssw default
    dict(match=1, mismatch=1, gap_open=1, gap_extend=1, ambiguity=1),  # mhm2 ALN_*
    dict(match=2, mismatch=4, gap_open=4, gap_extend=2, ambiguity=1),  # cigar scoring
]

CASES = [
    # (query, ref, qstart, qend, rstart, rend, mismatches, cigar)
    ("ACGT", "ACGT", 0, 3, 0, 3, 0, "4="),
    ("ACGT", "AACGT", 0, 3, 1, 4, 0, "4="),
    ("ACGT", "ACGTT", 0, 3, 0, 3, 0, "4="),
    ("TACGT", "ACGT", 1, 4, 0, 3, 0, "1S4="),
    ("TTACGT", "ACGT", 2, 5, 0, 3, 0, "2S4="),
    ("ACGTT", "ACGT", 0, 3, 0, 3, 0, "4=1S"),
    ("ACGTTT", "ACGT", 0, 3, 0, 3, 0, "4=2S"),
    ("TACGTT", "ACGT", 1, 4, 0, 3, 0, "1S4=1S"),
    ("TTACGTT", "ACGT", 2, 5, 0, 3, 0, "2S4=1S"),
    ("TACGTTT", "ACGT", 1, 4, 0, 3, 0, "1S4=2S"),
    ("TTACGTTT", "ACGT", 2, 5, 0, 3, 0, "2S4=2S"),
    ("AAAATTTTCCCCGGGG", "AAAATTTTCCCCGGGG", 0, 15, 0, 15, 0, "16="),
    ("AAAATTTTACCCGGGG", "AAAATTTTCCCCGGGG", 0, 15, 0, 15, 1, "8=1X7="),
    ("AAAATTTTACCCCGGGG", "AAAATTTTCCCCGGGG", 0, 16, 0, 15, 1, "8=1I8="),
    ("AAAATTTCCCCGGGG", "AAAATTTTCCCCGGGG", 0, 14, 0, 15, 1, "4=1D11="),
    ("GCTAAAATTTTCCCCGGGG", "AAAATTTTCCCCGGGG", 3, 18, 0, 15, 0, "3S16="),
    ("AAAATTTTCCCCGGGGACT", "AAAATTTTCCCCGGGG", 0, 15, 0, 15, 0, "16=3S"),
]


def batch(cases):
    Lq = max(len(q) for q, *_ in cases)
    Lr = max(len(r) for _, r, *_ in cases)
    B = len(cases)
    q = np.full((B, Lq), 255, np.uint8)
    r = np.full((B, Lr), 255, np.uint8)
    ql = np.zeros(B, np.int32)
    rl = np.zeros(B, np.int32)
    for i, (qs, rs, *_) in enumerate(cases):
        q[i, : len(qs)] = ascii_to_codes(qs.encode())
        r[i, : len(rs)] = ascii_to_codes(rs.encode())
        ql[i], rl[i] = len(qs), len(rs)
    return jnp.asarray(q), jnp.asarray(ql), jnp.asarray(r), jnp.asarray(rl)


@pytest.mark.parametrize("scoring", SCORINGS)
def test_ssw_positions(scoring):
    q, ql, r, rl = batch(CASES)
    aln = sw_align(q, ql, r, rl, **scoring)
    aln = {k: np.asarray(v) for k, v in aln.items()}
    for i, (qs, rs, qb, qe, rb, re_, mm, cigar) in enumerate(CASES):
        assert aln["q_begin"][i] == qb, (i, qs, rs, aln["q_begin"][i])
        assert aln["q_end"][i] == qe, (i, qs, rs)
        assert aln["r_begin"][i] == rb, (i, qs, rs, aln["r_begin"][i])
        assert aln["r_end"][i] == re_, (i, qs, rs)


@pytest.mark.parametrize("scoring", SCORINGS)
def test_ssw_cigars(scoring):
    q, ql, r, rl = batch(CASES)
    aln = sw_align(q, ql, r, rl, **scoring)
    aln = {k: np.asarray(v) for k, v in aln.items()}
    for i, (qs, rs, qb, qe, rb, re_, mm, cigar) in enumerate(CASES):
        got_cigar, got_mm = sw_cigar_host(qs, rs, aln, i, **scoring)
        assert got_cigar == cigar, (i, qs, rs, got_cigar)
        assert got_mm == mm, (i, qs, rs)


def test_ssw_no_match():
    """Dissimilar sequences: tiny or no alignment (ssw-test.cpp:221-224)."""
    cases = [("GCTAGCTAGCTAGCTA", "AAAATTTTCCCCGGGG", 0, 0, 0, 0, 0, "")]
    q, ql, r, rl = batch(cases)
    for scoring in SCORINGS:
        aln = sw_align(q, ql, r, rl, **scoring)
        score = int(np.asarray(aln["score"])[0])
        re_ = int(np.asarray(aln["r_end"])[0])
        rb = int(np.asarray(aln["r_begin"])[0])
        qe = int(np.asarray(aln["q_end"])[0])
        qb = int(np.asarray(aln["q_begin"])[0])
        assert re_ - rb <= 2 and qe - qb <= 2
        assert score <= 4


def test_ssw_batch_vs_host_random(rng):
    """Random pairs: device scores == exact host DP scores."""
    from itertools import product

    def host_score(q, r, match, mismatch, gap_open, gap_extend, ambiguity):
        n, m = len(q), len(r)
        NEG = -(10**6)
        H = np.zeros((n + 1, m + 1), np.int64)
        E = np.full((n + 1, m + 1), NEG, np.int64)
        F = np.full((n + 1, m + 1), NEG, np.int64)
        best = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                s = match if q[i - 1] == r[j - 1] else -mismatch
                E[i, j] = max(H[i, j - 1] - gap_open, E[i, j - 1] - gap_extend)
                F[i, j] = max(H[i - 1, j] - gap_open, F[i - 1, j] - gap_extend)
                H[i, j] = max(0, H[i - 1, j - 1] + s, E[i, j], F[i, j])
                best = max(best, H[i, j])
        return best

    cases = []
    for _ in range(12):
        ln = int(rng.integers(10, 40))
        base = "".join(rng.choice(list("ACGT"), size=ln))
        mut = list(base)
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, len(mut)))
            op = rng.integers(0, 3)
            if op == 0:
                mut[p] = "ACGT"[int(rng.integers(0, 4))]
            elif op == 1:
                mut.insert(p, "ACGT"[int(rng.integers(0, 4))])
            elif len(mut) > 5:
                del mut[p]
        cases.append(("".join(mut), base, 0, 0, 0, 0, 0, ""))

    q, ql, r, rl = batch(cases)
    scoring = dict(match=2, mismatch=2, gap_open=3, gap_extend=1, ambiguity=2)
    aln = sw_align(q, ql, r, rl, **scoring)
    scores = np.asarray(aln["score"])
    for i, (qs, rs, *_) in enumerate(cases):
        exp = host_score(qs, rs, **scoring)
        assert scores[i] == exp, (i, qs, rs, scores[i], exp)


def test_pallas_sw_matches_xla():
    """Pallas VMEM kernel == XLA scan formulation (interpret mode on CPU)."""
    import jax
    from mhm2_proxy_tpu.ops.pallas_ssw import pallas_sw_align_ends
    from mhm2_proxy_tpu.ops.ssw import _sw_align_ends_xla

    rng = np.random.default_rng(7)
    B, Lq, Lr = 16, 24, 40
    ref = rng.integers(0, 5, (B, Lr)).astype(np.uint8)
    q = np.array(ref[:, 4 : 4 + Lq])
    mut = rng.random((B, Lq)) < 0.15
    q[mut] = ((q[mut] + rng.integers(1, 4, int(mut.sum()))) % 4).astype(np.uint8)
    ql = rng.integers(8, Lq + 1, B).astype(np.int32)
    rl = rng.integers(10, Lr + 1, B).astype(np.int32)
    args = (jnp.asarray(q), jnp.asarray(ql), jnp.asarray(ref), jnp.asarray(rl))
    interpret = jax.default_backend() != "tpu"
    for scoring in SCORINGS:
        a = _sw_align_ends_xla(*args, **scoring)
        b = pallas_sw_align_ends(*args, **scoring, interpret=interpret)
        for x, y, nm in zip(a, b, ("score", "q_end", "r_end")):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=nm)
