"""Singleton pre-filter (GQF analog): memory reduction with identical output.

Reference: the GPU counting quotient filter keeps singletons out of the hash
table (kcount-gpu/gqf.hpp:358-378, ~0.6x memory kmer_dht.cpp:151). Our LSM
analog stores count==1 rows in a ~4x smaller compact sideband, promoted on a
later occurrence.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhm2_proxy_tpu.kcount import KmerCountStore
from mhm2_proxy_tpu.ops import count as C
from tests.test_count import reads_to_block


def low_cov_reads(rng, n=128, L=64, glen=20000):
    genome = "".join(rng.choice(list("ACGT"), size=glen))
    return [
        (genome[s : s + L], chr(33 + 38) * L)
        for s in (int(rng.integers(0, glen - L)) for _ in range(n))
    ]


def test_split_run_roundtrip(rng):
    """split_run + expand_singles is lossless."""
    reads = low_cov_reads(rng, n=64)
    codes, qual_ok, lens = reads_to_block(reads, B=64, L=64)
    k, m = 21, 15
    rec = C.read_kmer_records(jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens), k, m)
    agg = C.aggregate_records(rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"])
    m_w, m_c, m_l4, m_r4, n_m, s_w, s_e, n_s = C.split_run(*agg)
    assert int(n_m) + int(n_s) == int(agg[4])
    back = C.merge_aggregates(m_w, m_c, m_l4, m_r4, *C.expand_singles(s_w, s_e, n_s))
    t1 = C.finalize_table(*agg)
    t2 = C.finalize_table(*back)
    n1, n2 = int(t1[4]), int(t2[4])
    assert n1 == n2
    assert (np.asarray(t1[0][:n1]) == np.asarray(t2[0][:n2])).all()
    assert (np.asarray(t1[1][:n1]) == np.asarray(t2[1][:n1])).all()
    assert (np.asarray(t1[2][:n1]) == np.asarray(t2[2][:n1])).all()
    assert (np.asarray(t1[3][:n1]) == np.asarray(t2[3][:n1])).all()


def test_store_memory_reduction_low_coverage(rng):
    """>= 2x resident run bytes reduction on a singleton-heavy sample,
    bit-identical final table."""
    reads = low_cov_reads(rng)
    blocks = [reads_to_block(reads[i : i + 32], B=32, L=64) for i in range(0, len(reads), 32)]
    results = {}
    for flag in (True, False):
        st = KmerCountStore(21, compact_singles=flag)
        for b in blocks:
            st.add_reads_block(*b)
        results[flag] = (st.resident_run_bytes(), st.finalize().to_host_dict())
    assert results[True][1] == results[False][1]
    assert results[False][0] >= 2 * results[True][0], results


def test_store_equivalence_high_coverage(rng):
    """Mostly-multi sample: still identical output (promotion correctness)."""
    genome = "".join(rng.choice(list("ACGT"), size=400))
    reads = [
        (genome[s : s + 64], chr(33 + 38) * 64)
        for s in (int(rng.integers(0, 400 - 64)) for _ in range(128))
    ]
    blocks = [reads_to_block(reads[i : i + 32], B=32, L=64) for i in range(0, 128, 32)]
    tables = {}
    for flag in (True, False):
        st = KmerCountStore(21, compact_singles=flag)
        for b in blocks:
            st.add_reads_block(*b)
        tables[flag] = st.finalize().to_host_dict()
    assert tables[True] == tables[False]


def test_sharded_compact_singles(rng):
    """ShardedCounter with the singleton filter equals the plain counter."""
    from mhm2_proxy_tpu.parallel import ShardedCounter, make_shard_mesh
    from mhm2_proxy_tpu.oracle.pyref import count_kmers_oracle

    assert len(jax.devices()) >= 8
    mesh = make_shard_mesh(8)
    reads = low_cov_reads(rng, n=96)
    codes, qual_ok, lens = reads_to_block(reads, B=96, L=64)
    got = {}
    for flag in (True, False):
        counter = ShardedCounter(21, mesh, bucket_cap=4096, compact_singles=flag)
        counter.add_reads_block(codes, qual_ok, lens)
        table = counter.finalize()
        d = {}
        for ft in table.shard_tables():
            d.update(ft.to_host_dict())
        got[flag] = d
    assert got[True] == got[False] == count_kmers_oracle(reads, 21)


def test_fused_split_paths_match_unfused(rng):
    """aggregate_split_records == aggregate_records + split_run, and
    merge_split4 == merge_aggregates4 + split_run (the fused production
    paths skip the intermediate dedup compaction sort)."""
    reads = low_cov_reads(rng, n=96)
    codes, qual_ok, lens = reads_to_block(reads, B=96, L=64)
    k, m = 21, 15
    rec = C.read_kmer_records(jnp.asarray(codes), jnp.asarray(qual_ok), jnp.asarray(lens), k, m)
    args = (rec["words"], rec["left"], rec["right"], rec["count"], rec["valid"])
    agg = C.aggregate_records(*args)
    want = C.split_run(*agg)
    got = C.aggregate_split_records(*args)
    for w, g in zip(want, got):
        assert np.array_equal(np.asarray(w), np.asarray(g))

    # merge: two split runs (trim to unequal pow2 occupancies first)
    reads2 = low_cov_reads(rng, n=64)
    codes2, q2, l2 = reads_to_block(reads2, B=64, L=64)
    rec2 = C.read_kmer_records(jnp.asarray(codes2), jnp.asarray(q2), jnp.asarray(l2), k, m)
    agg2 = C.aggregate_records(rec2["words"], rec2["left"], rec2["right"], rec2["count"], rec2["valid"])
    run2 = C.split_run(*agg2)
    a = KmerCountStore._trim(want, int(want[4]), int(want[7]))
    b = KmerCountStore._trim(run2, int(run2[4]), int(run2[7]))
    sets = (
        a[:4], C.expand_singles(a[5], a[6], a[7]),
        b[:4], C.expand_singles(b[5], b[6], b[7]),
    )
    want_m = C.split_run(*C.merge_aggregates4(*sets))
    got_m = C.merge_split4(*sets)
    assert int(want_m[4]) == int(got_m[4]) and int(want_m[7]) == int(got_m[7])
    nm, ns = int(got_m[4]), int(got_m[7])
    for i, sl in ((0, nm), (1, nm), (2, nm), (3, nm), (5, ns), (6, ns)):
        assert np.array_equal(np.asarray(want_m[i])[:sl], np.asarray(got_m[i])[:sl]), i
