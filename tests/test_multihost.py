"""Multi-host (DCN) path: hierarchical exchange over a ("dcn","ici") mesh.

Single-process tests run on the 8-device virtual CPU mesh shaped 2 hosts x 4
devices; the separate test_multiprocess.py covers true multi-process
execution. Equivalence target: the flat ShardedCounter (itself oracle-pinned
in test_sharded.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhm2_proxy_tpu.kcount import KmerCountStore
from mhm2_proxy_tpu.parallel import (
    HierarchicalCounter,
    make_host_mesh,
    sharded_lookup,
    host_byte_ranges,
)
from mhm2_proxy_tpu.oracle.pyref import count_kmers_oracle, target_shard, minimizer_len_for_k
from tests.test_count import reads_to_block
from tests.test_sharded import make_read_set


@pytest.fixture(scope="module")
def mesh2d():
    assert len(jax.devices()) >= 8
    return make_host_mesh(n_hosts=2, per_host=4)


def _table_dict(table):
    got = {}
    for ft in table.shard_tables():
        got.update(ft.to_host_dict())
    return got


def test_hierarchical_count_matches_oracle(rng, mesh2d):
    k = 21
    reads = make_read_set(rng, k)
    codes, qual_ok, lens = reads_to_block(reads, B=96, L=64)
    counter = HierarchicalCounter(k, mesh2d, bucket_cap=4096)
    counter.add_reads_block(codes, qual_ok, lens)
    assert counter.dropped == 0
    table = counter.finalize()
    assert _table_dict(table) == count_kmers_oracle(reads, k)

    # each kmer must live on its host-major minimizer-hash shard
    m = minimizer_len_for_k(k)
    for s, ft in enumerate(table.shard_tables()):
        for km in ft.to_host_dict():
            assert target_shard(km, m, 8) == s, km


def test_hierarchical_spill_lossless(rng, mesh2d):
    """Stage-A overflow spills and re-exchanges; nothing dropped."""
    k = 21
    reads = make_read_set(rng, k)
    codes, qual_ok, lens = reads_to_block(reads, B=96, L=64)
    counter = HierarchicalCounter(k, mesh2d, bucket_cap=16, use_supermers=False)
    counter.add_reads_block(codes, qual_ok, lens)
    assert counter.spill_rounds > 0 and counter.dropped == 0
    table = counter.finalize()
    assert _table_dict(table) == count_kmers_oracle(reads, k)


def test_hierarchical_ctg_pass(rng, mesh2d):
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

    counter = HierarchicalCounter(k, mesh2d, bucket_cap=4096)
    counter.add_reads_block(codes, qual_ok, lens)
    counter.add_ctgs_block(ccodes, clens, cdeps)
    table = counter.finalize()
    assert _table_dict(table) == count_kmers_oracle(reads, k, ctgs=ctgs)


def test_hierarchical_lookup_and_traversal(rng, mesh2d):
    """Cross-shard lookup + full traversal work over the 2-D mesh."""
    from mhm2_proxy_tpu.dbjg import traverse_debruijn_graph, traverse_debruijn_graph_sharded

    k = 21
    genome = "".join(rng.choice(list("ACGT"), size=600))
    reads = []
    for _ in range(96):
        s = int(rng.integers(0, 600 - 64))
        reads.append((genome[s : s + 64], chr(33 + 38) * 64))
    codes, qual_ok, lens = reads_to_block(reads, B=96, L=64)

    counter = HierarchicalCounter(k, mesh2d, bucket_cap=4096)
    counter.add_reads_block(codes, qual_ok, lens)
    table = counter.finalize()

    # lookup roundtrip over the combined ("dcn","ici") axis
    Q = int(np.asarray(table.n).max())
    qw = np.roll(np.asarray(table.words[:, :Q]), 1, axis=0)
    qv = np.roll(np.asarray(np.arange(Q)[None, :] < np.asarray(table.n)[:, None]), 1, axis=0)
    found, count, _, _, _ = sharded_lookup(table, jnp.asarray(qw), jnp.asarray(qv))
    assert np.asarray(found)[qv].all()

    got = traverse_debruijn_graph_sharded(table, k)
    store = KmerCountStore(k)
    store.add_reads_block(codes, qual_ok, lens)
    exp = traverse_debruijn_graph(store.finalize(), k)
    norm = lambda cs: sorted((s, round(d, 9)) for s, d in cs)
    assert norm(got) == norm(exp)


def test_host_byte_ranges():
    rgs = host_byte_ranges(1000, 3)
    assert rgs == [(0, 333), (333, 666), (666, 1000)]
    assert rgs[-1][1] == 1000


def test_write_fasta_singleproc(tmp_path):
    from mhm2_proxy_tpu.parallel import write_fasta_multihost

    f = str(tmp_path / "out.fasta")
    payloads = [b">Contig0 1.0\nACGT\n", b">Contig1 2.0\nGGTT\n"]
    sizes = [len(p) for p in payloads]
    for pid, pl in enumerate(payloads):
        write_fasta_multihost(f, pl, pid, 2, sizes=sizes)
    assert open(f, "rb").read() == b"".join(payloads)


def test_min_sum_max_single_process():
    from mhm2_proxy_tpu.parallel import min_sum_max

    s = min_sum_max(3.5)
    assert s == dict(min=3.5, avg=3.5, max=3.5, n=1)
