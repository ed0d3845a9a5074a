"""Unit tests for the packed k-mer kernels vs the Python oracle.

Mirrors the coverage of the reference's test/kmer-test.cpp: pack/to-string
round trips for poly-A/C/G/T and mixed sequences at many k, revcomp vs slow
reference, canonicalization, minimizers, hashes, and graph steps.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mhm2_proxy_tpu.oracle import pyref
from mhm2_proxy_tpu.constants import words32_for_k, minimizer_len_for_k
from mhm2_proxy_tpu.ops import bitkmer as bk

KS = [21, 32, 33, 55, 77]
KS_LIGHT = [15, 31, 63, 64, 96, 99, 128, 160]


def seqs_to_code_array(seqs):
    L = max(len(s) for s in seqs)
    codes = np.full((len(seqs), L), 4, np.uint8)
    for i, s in enumerate(seqs):
        codes[i, : len(s)] = bk.ascii_to_codes(s.encode())
    lens = np.array([len(s) for s in seqs], np.int32)
    return codes, lens


def random_seqs(rng, n, lo, hi, alphabet="ACGT"):
    # fixed length hi: static shapes keep XLA recompiles bounded
    return ["".join(rng.choice(list(alphabet), size=hi)) for _ in range(n)]


@pytest.mark.parametrize("k", KS)
def test_kmer_words_match_oracle(rng, k):
    seqs = ["A" * (k + 5), "C" * (k + 5), "G" * (k + 5), "T" * (k + 5)]
    seqs += random_seqs(rng, 6, k, k + 40)
    codes, lens = seqs_to_code_array(seqs)
    words = np.asarray(bk.kmer_words_from_codes(jnp.asarray(codes), k))
    W = words32_for_k(k)
    assert words.shape[-1] == W
    for i, s in enumerate(seqs):
        for p in range(len(s) - k + 1):
            got = [int(words[i, p, 2 * l]) << 32 | int(words[i, p, 2 * l + 1]) for l in range(W // 2)]
            exp = pyref.kmer_to_words(s[p : p + k])
            assert got == exp, (k, i, p, s[p : p + k])


@pytest.mark.parametrize("k", [21, 33, 55, 99])
def test_n_packs_as_g(k):
    s = "A" * 10 + "N" + "A" * (k + 5)
    codes, _ = seqs_to_code_array([s])
    words = np.asarray(bk.kmer_words_from_codes(jnp.asarray(codes), k))[0]
    exp = pyref.kmer_to_words(s[:k].replace("N", "G"))
    W2 = words.shape[-1] // 2
    got = [int(words[0, 2 * l]) << 32 | int(words[0, 2 * l + 1]) for l in range(W2)]
    assert got == exp


@pytest.mark.parametrize("k", KS)
def test_revcomp_and_canonical(rng, k):
    seqs = random_seqs(rng, 8, k, k + 10)
    codes, lens = seqs_to_code_array(seqs)
    words = bk.kmer_words_from_codes(jnp.asarray(codes), k)
    rc = np.asarray(bk.revcomp_words(words, k))
    cw, was_rc = bk.canonicalize_words(words, k)
    cw, was_rc = np.asarray(cw), np.asarray(was_rc)
    for i, s in enumerate(seqs):
        for p in range(len(s) - k + 1):
            kmer = s[p : p + k]
            assert bk.words_to_strings(rc[i, p][None], k)[0] == pyref.revcomp_str(kmer)
            exp_c, exp_rc = pyref.canonical(kmer)
            assert bk.words_to_strings(cw[i, p][None], k)[0] == exp_c
            assert bool(was_rc[i, p]) == exp_rc


@pytest.mark.parametrize("k", [21, 33, 55, 77, 99])
def test_minimizers(rng, k):
    m = minimizer_len_for_k(k)
    seqs = random_seqs(rng, 6, k, k + 30) + ["A" * (k + 8), "T" * (k + 8)]
    codes, lens = seqs_to_code_array(seqs)
    minz = np.asarray(bk.minimizers_from_codes(jnp.asarray(codes), k, m))
    for i, s in enumerate(seqs):
        for p in range(len(s) - k + 1):
            exp = pyref.minimizer_of(s[p : p + k], m)
            assert int(minz[i, p]) == exp, (k, i, p)
            # strand symmetry
            assert pyref.minimizer_of(pyref.revcomp_str(s[p : p + k]), m) == exp


def test_quick_hash(rng):
    vals = [0, 1, 0xFFFFFFFFFFFFFFFF] + [int(x) for x in rng.integers(0, 2**63, 20)]
    got = np.asarray(bk.quick_hash_u64(jnp.asarray(np.array(vals, np.uint64))))
    for v, g in zip(vals, got):
        assert int(g) == pyref.quick_hash(v)


@pytest.mark.parametrize("k", [21, 33, 63, 99])
def test_forward_backward_base(rng, k):
    seqs = random_seqs(rng, 5, k + 1, k + 1)
    for s in seqs:
        a, b = s[:k], s[1:]
        wa = jnp.asarray(bk.strings_to_words([a], k))
        for code, ch in enumerate("ACGT"):
            fw = np.asarray(bk.forward_base_words(wa, jnp.array([code], jnp.uint8), k))
            assert bk.words_to_strings(fw, k)[0] == a[1:] + ch
            bw = np.asarray(bk.backward_base_words(wa, jnp.array([code], jnp.uint8), k))
            assert bk.words_to_strings(bw, k)[0] == ch + a[:-1]
        wfirst = np.asarray(bk.first_base(wa))
        wlast = np.asarray(bk.last_base(wa, k))
        assert "ACGT"[int(wfirst[0])] == a[0]
        assert "ACGT"[int(wlast[0])] == a[-1]


@pytest.mark.parametrize("k", [21, 33])
def test_string_roundtrip(rng, k):
    seqs = random_seqs(rng, 5, k, k)
    w = bk.strings_to_words(seqs, k)
    assert bk.words_to_strings(w, k) == seqs


@pytest.mark.parametrize("k", KS_LIGHT)
def test_pack_light_all_maxk(rng, k):
    """Packing parity across the full MAX_K bucket range (32..160)."""
    s = random_seqs(rng, 1, k, k + 3)[0]
    codes, _ = seqs_to_code_array([s])
    words = np.asarray(bk.kmer_words_from_codes(jnp.asarray(codes), k))
    W2 = words.shape[-1] // 2
    for p in range(len(s) - k + 1):
        got = [int(words[0, p, 2 * l]) << 32 | int(words[0, p, 2 * l + 1]) for l in range(W2)]
        assert got == pyref.kmer_to_words(s[p : p + k])
