"""Multi-device sharded counting/lookup on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhm2_proxy_tpu.kcount import KmerCountStore
from mhm2_proxy_tpu.parallel import ShardedCounter, make_shard_mesh, sharded_lookup
from mhm2_proxy_tpu.oracle.pyref import count_kmers_oracle, target_shard, minimizer_len_for_k
from tests.test_count import reads_to_block


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_shard_mesh(8)


def make_read_set(rng, k, n_reads=96, L=64):
    genome = "".join(rng.choice(list("ACGT"), size=400))
    reads = []
    for _ in range(n_reads):
        s = int(rng.integers(0, 400 - L))
        reads.append((genome[s : s + L], chr(33 + 38) * L))
    return reads


@pytest.mark.parametrize("use_supermers", [False, True])
def test_sharded_count_matches_oracle(rng, mesh, use_supermers):
    k = 21
    reads = make_read_set(rng, k)
    codes, qual_ok, lens = reads_to_block(reads, B=96, L=64)
    counter = ShardedCounter(k, mesh, bucket_cap=4096, use_supermers=use_supermers)
    counter.add_reads_block(codes, qual_ok, lens)
    assert counter.dropped == 0
    table = counter.finalize()

    exp = count_kmers_oracle(reads, k)
    got = {}
    for ft in table.shard_tables():
        got.update(ft.to_host_dict())
    assert got == exp

    # each kmer must live on its minimizer-hash shard
    m = minimizer_len_for_k(k)
    for s, ft in enumerate(table.shard_tables()):
        for km in ft.to_host_dict():
            assert target_shard(km, m, 8) == s, km


def test_sharded_count_multiblock(rng, mesh):
    k = 21
    reads = make_read_set(rng, k, n_reads=192)
    counter = ShardedCounter(k, mesh, bucket_cap=4096)
    for lo in (0, 96):
        codes, qual_ok, lens = reads_to_block(reads[lo : lo + 96], B=96, L=64)
        counter.add_reads_block(codes, qual_ok, lens)
    table = counter.finalize()
    got = {}
    for ft in table.shard_tables():
        got.update(ft.to_host_dict())
    assert got == count_kmers_oracle(reads, k)


def test_sharded_lookup_roundtrip(rng, mesh):
    k = 21
    reads = make_read_set(rng, k)
    codes, qual_ok, lens = reads_to_block(reads, B=96, L=64)
    counter = ShardedCounter(k, mesh, bucket_cap=4096)
    counter.add_reads_block(codes, qual_ok, lens)
    table = counter.finalize()

    # query every shard's own kmers from every other shard (rotate by 1)
    S = table.S
    Q = int(np.asarray(table.n).max())
    qw = np.roll(np.asarray(table.words[:, :Q]), 1, axis=0)
    qv = np.roll(np.asarray((np.arange(Q)[None, :] < np.asarray(table.n)[:, None])), 1, axis=0)
    found, count, left, right, oidx = sharded_lookup(table, jnp.asarray(qw), jnp.asarray(qv))
    found = np.asarray(found)
    assert found[qv].all()
    # counts/exts must match the owning shard's table
    count = np.asarray(count)
    src_count = np.roll(np.asarray(table.count[:, :Q]), 1, axis=0)
    assert (count[qv] == src_count[qv]).all()

    # missing kmers must come back not-found
    miss = np.asarray(table.words[:, :Q]).copy()
    miss[..., -1] ^= 0x5A5A0000  # corrupt trailing bits -> almost surely absent
    f2, _, _, _, _ = sharded_lookup(table, jnp.asarray(np.roll(miss, 1, axis=0)), jnp.asarray(qv))
    assert np.asarray(f2)[qv].mean() < 0.05


def test_sharded_traversal_matches_single(rng, mesh):
    """Multi-shard traversal == single-store traversal (same reads)."""
    from mhm2_proxy_tpu.dbjg import traverse_debruijn_graph, traverse_debruijn_graph_sharded

    k = 21
    genome = "".join(rng.choice(list("ACGT"), size=600))
    reads = []
    for _ in range(96):
        s = int(rng.integers(0, 600 - 64))
        reads.append((genome[s : s + 64], chr(33 + 38) * 64))

    codes, qual_ok, lens = reads_to_block(reads, B=96, L=64)
    counter = ShardedCounter(k, mesh, bucket_cap=4096)
    counter.add_reads_block(codes, qual_ok, lens)
    table = counter.finalize()
    got = traverse_debruijn_graph_sharded(table, k)

    store = KmerCountStore(k)
    store.add_reads_block(codes, qual_ok, lens)
    exp = traverse_debruijn_graph(store.finalize(), k)

    norm = lambda cs: sorted((s, round(d, 9)) for s, d in cs)
    assert norm(got) == norm(exp)


def test_sharded_ctg_pass_matches_single(rng, mesh):
    """Sharded round-2 (ctg kmers) == single-store round-2."""
    from mhm2_proxy_tpu.ops.bitkmer import ascii_to_codes

    k = 21
    genome = "".join(rng.choice(list("ACGT"), size=500))
    reads = []
    for _ in range(96):
        s = int(rng.integers(0, 500 - 64))
        reads.append((genome[s : s + 64], chr(33 + 38) * 64))
    ctgs = [(genome[100:300], 9), ("".join(rng.choice(list("ACGT"), size=120)), 4)]

    codes, qual_ok, lens = reads_to_block(reads, B=96, L=64)
    ccodes = np.full((8, 256), 4, np.uint8)
    clens = np.zeros((8,), np.int32)
    cdeps = np.zeros((8,), np.int32)
    for i, (cs, d) in enumerate(ctgs):
        ccodes[i, : len(cs)] = ascii_to_codes(cs.encode())
        clens[i] = len(cs)
        cdeps[i] = d

    counter = ShardedCounter(k, mesh, bucket_cap=4096)
    counter.add_reads_block(codes, qual_ok, lens)
    counter.add_ctgs_block(ccodes, clens, cdeps)
    table = counter.finalize()
    got = {}
    for ft in table.shard_tables():
        got.update(ft.to_host_dict())

    exp = count_kmers_oracle(reads, k, ctgs=ctgs)
    assert got == exp


def test_sharded_assembler_end_to_end(rng, mesh):
    """Full two-round assembly with the sharded backend == single backend."""
    from mhm2_proxy_tpu.models import Assembler, AssemblerConfig
    from mhm2_proxy_tpu.utils.synth import random_genome, simulate_reads

    genome = random_genome(rng, 2000)
    ids, seqs, quals = simulate_reads(rng, genome, coverage=20.0, read_len=80, err_rate=0.002)

    def run(n_shards):
        # one round: the sharded ctg pass has its own equivalence test above,
        # and a second k would compile a whole extra kernel family
        cfg = AssemblerConfig(kmer_lens=(21,), block_reads=256, n_shards=n_shards, bucket_cap=16384)
        asm = Assembler(cfg)
        asm.add_interleaved(seqs, quals)
        return asm.run()

    single = run(0)
    sharded = run(8)
    assert sorted(c.seq for c in sharded) == sorted(c.seq for c in single)


def test_spill_loop_lossless_tiny_cap(rng, mesh):
    """Bucket overflow re-exchanges in spill rounds; nothing is ever dropped.

    Tiny caps on the raw-record path force multiple spill rounds; the final
    table must still equal the oracle exactly (reference aggregating stores
    never drop either, flat_aggr_store.hpp:41-72)."""
    k = 21
    reads = make_read_set(rng, k)
    codes, qual_ok, lens = reads_to_block(reads, B=96, L=64)
    counter = ShardedCounter(k, mesh, bucket_cap=16, use_supermers=False)
    counter.add_reads_block(codes, qual_ok, lens)
    assert counter.spill_rounds > 0 and counter.spilled > 0
    assert counter.dropped == 0
    table = counter.finalize()
    got = {}
    for ft in table.shard_tables():
        got.update(ft.to_host_dict())
    assert got == count_kmers_oracle(reads, k)


def test_poly_a_storm_lossless(rng, mesh):
    """Worst-case skew: every record routes to ONE shard (poly-A minimizers).

    Quality dips make records distinct so sender presum can't collapse them
    all; counts must still equal the oracle with zero drops (round-1 verdict:
    the old fixed caps silently dropped exactly this case)."""
    k = 21
    L = 64
    reads = []
    for _ in range(96):
        q = np.full(L, 33 + 38, np.uint8)
        q[rng.integers(0, L, 3)] = 33 + 2  # random low-quality dips
        reads.append(("A" * L, "".join(chr(c) for c in q)))
    codes, qual_ok, lens = reads_to_block(reads, B=96, L=64)
    counter = ShardedCounter(k, mesh, bucket_cap=256)
    counter.add_reads_block(codes, qual_ok, lens)
    assert counter.dropped == 0
    # identical dip-free windows collapse sender-side (the HHSS analog)
    assert counter.stat_collapsed > 0
    table = counter.finalize()
    got = {}
    for ft in table.shard_tables():
        got.update(ft.to_host_dict())
    assert got == count_kmers_oracle(reads, k)


def test_sharded_lookup_retries_on_overflow(rng, mesh):
    """An undersized lookup cap retries with doubled capacity, losslessly."""
    k = 21
    reads = make_read_set(rng, k)
    codes, qual_ok, lens = reads_to_block(reads, B=96, L=64)
    counter = ShardedCounter(k, mesh, bucket_cap=4096)
    counter.add_reads_block(codes, qual_ok, lens)
    table = counter.finalize()
    Q = int(np.asarray(table.n).max())
    qw = np.roll(np.asarray(table.words[:, :Q]), 1, axis=0)
    qv = np.roll(np.asarray(np.arange(Q)[None, :] < np.asarray(table.n)[:, None]), 1, axis=0)
    found, count, _, _, _ = sharded_lookup(
        table, jnp.asarray(qw), jnp.asarray(qv), cap=max(Q // 4, 1)
    )
    assert np.asarray(found)[qv].all()
    src_count = np.roll(np.asarray(table.count[:, :Q]), 1, axis=0)
    assert (np.asarray(count)[qv] == src_count[qv]).all()


def test_sharded_raw_records_path(rng, mesh):
    """The non-supermer exchange path stays equivalent."""
    k = 21
    reads = make_read_set(rng, k)
    codes, qual_ok, lens = reads_to_block(reads, B=96, L=64)
    counter = ShardedCounter(k, mesh, bucket_cap=4096, use_supermers=False)
    counter.add_reads_block(codes, qual_ok, lens)
    table = counter.finalize()
    got = {}
    for ft in table.shard_tables():
        got.update(ft.to_host_dict())
    assert got == count_kmers_oracle(reads, k)


def test_sharded_stitch_long_paths_and_cycle(rng, mesh):
    """Stress the locality-advanced doubling: paths far longer than the
    local-advance window plus a cycle, vs the single-shard stitcher; the
    executed collective rounds must beat the static bound."""
    from mhm2_proxy_tpu.dbjg import traverse_debruijn_graph, traverse_debruijn_graph_sharded

    k = 21
    genome = "".join(rng.choice(list("ACGT"), size=2400))
    circle = "".join(rng.choice(list("ACGT"), size=260))
    reads = []
    for _ in range(420):
        s = int(rng.integers(0, len(genome) - 64))
        reads.append((genome[s : s + 64], chr(33 + 38) * 64))
    ring = circle + circle[: k + 40]  # wraps: every kmer has both neighbors
    for s in range(0, len(circle), 24):
        reads.append((ring[s : s + 64], chr(33 + 38) * 64))
        reads.append((ring[s : s + 64], chr(33 + 38) * 64))
    B = 1024
    codes, qual_ok, lens = reads_to_block(reads, B=B, L=64)
    counter = ShardedCounter(k, mesh, bucket_cap=65536)
    counter.add_reads_block(codes, qual_ok, lens)
    table = counter.finalize()
    stats = {}
    got = traverse_debruijn_graph_sharded(table, k, stats=stats)

    store = KmerCountStore(k)
    store.add_reads_block(codes, qual_ok, lens)
    exp = traverse_debruijn_graph(store.finalize(), k)

    norm = lambda cs: sorted((s, round(d, 9)) for s, d in cs)
    assert norm(got) == norm(exp)
    sr = stats["stitch_rounds"]
    assert sr["doubling"] <= sr["static_bound"]
    assert sr["post_cut"] < sr["static_bound"]
