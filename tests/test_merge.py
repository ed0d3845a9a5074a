"""Batched device merge vs the sequential oracle mirror."""

import numpy as np
import pytest

from mhm2_proxy_tpu.io.merge import merge_reads_arrays
from mhm2_proxy_tpu.oracle.merge_ref import merge_pair_oracle
from mhm2_proxy_tpu.ops.bitkmer import ascii_to_codes, codes_to_ascii
from mhm2_proxy_tpu.utils.synth import random_genome, simulate_reads


def pairs_to_arrays(pairs, L):
    B = len(pairs)
    c1 = np.full((B, L), 4, np.uint8)
    c2 = np.full((B, L), 4, np.uint8)
    q1 = np.full((B, L), 33, np.uint8)
    q2 = np.full((B, L), 33, np.uint8)
    l1 = np.zeros(B, np.int32)
    l2 = np.zeros(B, np.int32)
    for i, (s1, qs1, s2, qs2) in enumerate(pairs):
        c1[i, : len(s1)] = ascii_to_codes(s1.encode())
        q1[i, : len(qs1)] = np.frombuffer(qs1.encode(), np.uint8)
        c2[i, : len(s2)] = ascii_to_codes(s2.encode())
        q2[i, : len(qs2)] = np.frombuffer(qs2.encode(), np.uint8)
        l1[i], l2[i] = len(s1), len(s2)
    return c1, q1, l1, c2, q2, l2


def check_block(pairs, L):
    c1, q1, l1, c2, q2, l2 = pairs_to_arrays(pairs, L)
    out = merge_reads_arrays(c1, q1, l1, c2, q2, l2)
    for i, (s1, qs1, s2, qs2) in enumerate(pairs):
        em, eseq, equals = merge_pair_oracle(s1, qs1, s2, qs2)
        gm = bool(out["merged"][i])
        assert gm == em, (i, s1, s2)
        if em:
            n = int(out["m_len"][i])
            gseq = codes_to_ascii(out["m_codes"][i, :n]).decode()
            gq = "".join(chr(c) for c in out["m_quals"][i, :n])
            assert gseq == eseq.replace("N", "N"), (i, gseq, eseq)
            # compare via codes: N stays N
            assert len(gseq) == len(eseq)
            assert gq == equals, (i, gq, equals)


def test_merge_simulated_pairs(rng):
    genome = random_genome(rng, 3000)
    ids, seqs, quals = simulate_reads(
        rng, genome, coverage=4.0, read_len=80, insert_mean=120, insert_sd=15, err_rate=0.01
    )
    pairs = [
        (seqs[i].decode(), quals[i].decode(), seqs[i + 1].decode(), quals[i + 1].decode())
        for i in range(0, len(seqs), 2)
    ][:48]
    check_block(pairs, 80)


def test_merge_no_overlap(rng):
    genome = random_genome(rng, 3000)
    ids, seqs, quals = simulate_reads(
        rng, genome, coverage=2.0, read_len=70, insert_mean=300, insert_sd=10, err_rate=0.0
    )
    pairs = [
        (seqs[i].decode(), quals[i].decode(), seqs[i + 1].decode(), quals[i + 1].decode())
        for i in range(0, len(seqs), 2)
    ][:24]
    check_block(pairs, 70)


def test_merge_exact_overlap(rng):
    """Short inserts: reads overlap heavily and must merge."""
    genome = random_genome(rng, 2000)
    pairs = []
    from mhm2_proxy_tpu.oracle.pyref import revcomp_str

    for _ in range(24):
        s = int(rng.integers(0, 1800))
        frag = genome[s : s + 120]
        r1 = frag[:80]
        r2 = revcomp_str(frag[-80:])
        q = chr(33 + 38) * 80
        pairs.append((r1, q, r2, q))
    check_block(pairs, 80)
    # at least most of these clean overlaps should merge
    c1, q1, l1, c2, q2, l2 = pairs_to_arrays(pairs, 80)
    out = merge_reads_arrays(c1, q1, l1, c2, q2, l2)
    assert out["merged"].sum() >= 20


def test_merge_with_ns(rng):
    from mhm2_proxy_tpu.oracle.pyref import revcomp_str

    genome = random_genome(rng, 1000)
    pairs = []
    for t in range(24):
        s = int(rng.integers(0, 800))
        frag = list(genome[s : s + 110])
        # sprinkle Ns
        for _ in range(int(rng.integers(0, 5))):
            frag[int(rng.integers(0, 110))] = "N"
        frag = "".join(frag)
        r1 = frag[:75]
        r2 = revcomp_str(frag[-75:])
        q = "".join(chr(33 + int(rng.integers(30, 41))) for _ in range(75))
        pairs.append((r1, q, r2, q))
    check_block(pairs, 75)


def test_shortlist_equals_dense(rng):
    """The prefilter-shortlist scan must be bit-identical to the dense scan,
    including on adversarial low-complexity pairs (which exercise the
    overflow fallback in merge_reads_arrays)."""
    import jax.numpy as jnp
    from mhm2_proxy_tpu.io.merge import merge_pairs_block
    from mhm2_proxy_tpu.oracle.pyref import revcomp_str

    genome = random_genome(rng, 2000)
    pairs = []
    for t in range(40):
        s = int(rng.integers(0, 1800))
        frag = genome[s : s + 130]
        pairs.append((frag[:80], chr(33 + 38) * 80, revcomp_str(frag[-80:]), chr(33 + 38) * 80))
    # adversarial: poly-A and dimer repeats pass the prefilter at MANY shifts
    pairs.append(("A" * 80, chr(70) * 80, "T" * 80, chr(70) * 80))
    pairs.append(("AC" * 40, chr(70) * 80, "GT" * 40, chr(70) * 80))
    c1, q1, l1, c2, q2, l2 = pairs_to_arrays(pairs, 80)
    args = tuple(jnp.asarray(x) for x in (c1, q1, l1, c2, q2, l2))
    dense = merge_pairs_block(*args, scan="dense")
    short = merge_pairs_block(*args, scan="shortlist")
    assert bool(short["overflow"])  # the repeats overflow the shortlist
    # the non-adversarial prefix must already agree pair-by-pair
    for key in ("merged", "m_len", "m_codes", "m_quals", "overlap"):
        d, s = np.asarray(dense[key]), np.asarray(short[key])
        np.testing.assert_array_equal(d[:40], s[:40], err_msg=key)
    # the wrapper falls back to dense on overflow: end-to-end equality
    out = merge_reads_arrays(c1, q1, l1, c2, q2, l2)
    for key in ("merged", "m_len", "m_codes", "m_quals", "overlap"):
        np.testing.assert_array_equal(np.asarray(dense[key]), out[key], err_msg=key)


def test_native_merge_equals_jax(rng):
    """The C++ merge engine (native/merge_native.cpp) must be bit-equal to
    the JAX formulation on simulated pairs (incl. Ns and non-overlapping
    pairs)."""
    from mhm2_proxy_tpu.io import native

    if not native.merge_available():
        import pytest

        pytest.skip("native merge unavailable")
    from mhm2_proxy_tpu.utils.synth import random_genome, simulate_reads
    from mhm2_proxy_tpu.io.merge import merge_reads_arrays

    genome = random_genome(rng, 6000)
    ids, seqs, quals = simulate_reads(
        rng, genome, coverage=12.0, read_len=100, err_rate=0.01, insert_mean=150
    )
    # inject Ns and a few random (non-overlapping) pairs
    seqs = [
        "".join("N" if rng.random() < 0.01 else chr(b) for b in s) for s in seqs
    ]
    for i in range(0, 20, 2):
        seqs[i] = "".join(rng.choice(list("ACGT"), size=100))
    quals = [q.decode() if isinstance(q, bytes) else q for q in quals]
    pairs = list(zip(seqs[0::2], quals[0::2], seqs[1::2], quals[1::2]))
    c1, q1, l1, c2, q2, l2 = pairs_to_arrays(pairs, 100)

    nat = merge_reads_arrays(c1, q1, l1, c2, q2, l2, use_native=True)
    jx = merge_reads_arrays(c1, q1, l1, c2, q2, l2, use_native=False)
    assert int(nat["merged"].sum()) > 50  # the workload actually merges
    np.testing.assert_array_equal(nat["merged"], jx["merged"])
    for key in ("m_len", "overlap", "m_codes", "m_quals", "quals1_z", "quals2_z"):
        np.testing.assert_array_equal(np.asarray(nat[key]), np.asarray(jx[key]), err_msg=key)
    assert int(nat["n_ambiguous"]) == int(jx["n_ambiguous"])
