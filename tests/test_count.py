"""Counting pipeline vs the Python oracle."""

import numpy as np
import pytest

from mhm2_proxy_tpu.kcount import KmerCountStore
from mhm2_proxy_tpu.oracle.pyref import count_kmers_oracle
from mhm2_proxy_tpu.ops.bitkmer import ascii_to_codes


def reads_to_block(reads, qual_offset=33, B=None, L=None):
    B = B or len(reads)
    L = L or max(len(s) for s, _ in reads)
    codes = np.full((B, L), 4, np.uint8)
    quals = np.zeros((B, L), np.uint8)
    lens = np.zeros((B,), np.int32)
    for i, (s, q) in enumerate(reads):
        codes[i, : len(s)] = ascii_to_codes(s.encode())
        quals[i, : len(q)] = np.frombuffer(q.encode(), np.uint8)
        lens[i] = len(s)
    qual_ok = quals >= qual_offset + 20
    return codes, qual_ok, lens


def make_reads(rng, n, lo, hi, err=0.0, low_q_frac=0.0, n_frac=0.0):
    reads = []
    for _ in range(n):
        ln = int(rng.integers(lo, hi + 1))
        seq = "".join(rng.choice(list("ACGT"), size=ln))
        if n_frac:
            seq = "".join(c if rng.random() > n_frac else "N" for c in seq)
        quals = "".join(
            chr(33 + (5 if rng.random() < low_q_frac else 38)) for _ in range(ln)
        )
        reads.append((seq, quals))
    return reads


@pytest.mark.parametrize("k", [21, 33, 55])
def test_count_random_reads(rng, k):
    # overlapping reads from a genome so kmers repeat
    genome = "".join(rng.choice(list("ACGT"), size=400))
    reads = []
    for _ in range(60):
        s = int(rng.integers(0, 400 - k - 30))
        ln = int(rng.integers(k + 5, k + 30))
        seq = genome[s : s + ln]
        quals = chr(33 + 38) * len(seq)
        reads.append((seq, quals))
    reads += make_reads(rng, 10, k + 2, k + 40)

    store = KmerCountStore(k)
    codes, qual_ok, lens = reads_to_block(reads)
    store.add_reads_block(codes, qual_ok, lens)
    got = store.finalize().to_host_dict()
    exp = count_kmers_oracle(reads, k)
    assert got == exp


@pytest.mark.parametrize("k", [21])
def test_count_qual_masking_and_ns(rng, k):
    genome = "".join(rng.choice(list("ACGT"), size=300))
    reads = []
    for _ in range(80):
        s = int(rng.integers(0, 300 - k - 20))
        ln = int(rng.integers(k + 4, k + 20))
        seq = "".join(
            c if rng.random() > 0.02 else "N" for c in genome[s : s + ln]
        )
        quals = "".join(chr(33 + (5 if rng.random() < 0.2 else 38)) for _ in seq)
        reads.append((seq, quals))
    store = KmerCountStore(k)
    codes, qual_ok, lens = reads_to_block(reads)
    store.add_reads_block(codes, qual_ok, lens)
    got = store.finalize().to_host_dict()
    exp = count_kmers_oracle(reads, k)
    assert got == exp


def test_count_multiple_blocks(rng):
    k = 21
    genome = "".join(rng.choice(list("ACGT"), size=500))
    reads = []
    for _ in range(90):
        s = int(rng.integers(0, 500 - k - 25))
        seq = genome[s : s + k + 25]
        reads.append((seq, chr(33 + 38) * len(seq)))
    store = KmerCountStore(k)
    for i in range(0, 90, 32):
        chunk = reads[i : i + 32]
        codes, qual_ok, lens = reads_to_block(chunk, B=32, L=k + 25)
        store.add_reads_block(codes, qual_ok, lens)
    got = store.finalize().to_host_dict()
    exp = count_kmers_oracle(reads, k)
    assert got == exp


def test_ctg_kmer_pass(rng):
    """Round-2 semantics: ctg kmers merge with read kmers under conflict rules."""
    k = 21
    genome = "".join(rng.choice(list("ACGT"), size=300))
    reads = []
    for _ in range(50):
        s = int(rng.integers(0, 300 - k - 20))
        seq = genome[s : s + k + 20]
        reads.append((seq, chr(33 + 38) * len(seq)))
    # contigs: one overlapping the genome (agreeing), one random (new kmers),
    # plus a conflicting duplicate contig
    ctgs = [
        (genome[50:150], 7),
        ("".join(rng.choice(list("ACGT"), size=80)), 3),
    ]
    ctgs.append((ctgs[1][0][:40] + "T" + ctgs[1][0][41:], 4))  # conflict kmer(s)

    store = KmerCountStore(k)
    codes, qual_ok, lens = reads_to_block(reads)
    store.add_reads_block(codes, qual_ok, lens)

    cl = max(len(c) for c, _ in ctgs)
    ccodes = np.full((len(ctgs), cl), 4, np.uint8)
    clens = np.zeros((len(ctgs),), np.int32)
    cdep = np.zeros((len(ctgs),), np.int32)
    for i, (c, d) in enumerate(ctgs):
        ccodes[i, : len(c)] = ascii_to_codes(c.encode())
        clens[i] = len(c)
        cdep[i] = d
    store.add_ctgs_block(ccodes, clens, cdep)

    got = store.finalize().to_host_dict()
    exp = count_kmers_oracle(reads, k, ctgs=ctgs)
    assert got == exp


def test_saturation():
    """Counts saturate at uint16 max (reference kmer_count_t)."""
    k = 21
    seq = "ACGTACGTACGTACGTACGTACG"  # k+2 = 23 bases -> 1 counted kmer
    reads = [(seq, chr(33 + 38) * len(seq))] * 200
    store = KmerCountStore(k)
    codes = np.tile(
        np.frombuffer(
            bytes(ascii_to_codes(seq.encode())), np.uint8
        ),
        (200, 1),
    )
    qual_ok = np.ones_like(codes, bool)
    lens = np.full((200,), len(seq), np.int32)
    store.add_reads_block(codes, qual_ok, lens)
    got = store.finalize().to_host_dict()
    exp = count_kmers_oracle(reads, k)
    assert got == exp
    assert len(got) == 1
    (cnt, l, r) = next(iter(got.values()))
    assert cnt == 200


def test_dmin_integer_form_matches_reference_double():
    """ceil(c/10)-1 == trunc((1.0-0.9)*c) for every uint16 count."""
    import numpy as np

    c = np.arange(0, 65536, dtype=np.int64)
    ref = ((1.0 - 0.9) * c.astype(np.float64)).astype(np.int64)
    ours = np.maximum((c + 9) // 10 - 1, 0)
    ref = np.maximum(ref, 0)
    assert (ref == ours).all()


def test_render_kmer_dump_matches_naive(rng):
    from mhm2_proxy_tpu.kcount.kmer_store import render_kmer_dump
    from mhm2_proxy_tpu.ops.bitkmer import words_to_strings
    from mhm2_proxy_tpu.constants import EXT_CALL_CHARS

    k, W, n = 21, 2, 300
    words = rng.integers(0, 1 << 32, (n, W), dtype=np.uint64).astype(np.uint32)
    cnt = rng.integers(1, 60000, n).astype(np.int32)
    left = rng.integers(0, 6, n).astype(np.uint8)
    right = rng.integers(0, 6, n).astype(np.uint8)
    got = render_kmer_dump(words, cnt, left, right, k).decode()
    kmers = words_to_strings(words, k)
    exp = "".join(
        f"{km} {c} {EXT_CALL_CHARS[l]} {EXT_CALL_CHARS[r]}\n"
        for km, c, l, r in zip(kmers, cnt, left, right)
    )
    assert got == exp
